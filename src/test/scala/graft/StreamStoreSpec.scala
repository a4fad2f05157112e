package graft

import graft.engine.StreamStore
import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Bounded-buffer + TTL store (reference stream/manager.go) with an
  * injected clock for determinism. */
class StreamStoreSpec extends AnyFunSuite {

  private val schema = StructType(Seq(
    StructField("a", LongType), StructField("b", LongType)))
  private def rows(n: Int): Seq[Row] = (1 to n).map(i => Row(i.toLong, i.toLong))

  test("size estimate is rows × cols × 8 (manager.go:419-427)") {
    val st = new StreamStore()
    assert(st.estimateSize(10, 2) == 160)
  }

  test("drop-oldest eviction respects the byte budget (manager.go:286-310)") {
    // budget fits exactly 2 batches of 10×2×8=160 bytes
    val st = new StreamStore(maxBytesPerStream = 320)
    assert(st.append("t", schema, rows(10)) == 0)
    assert(st.append("t", schema, rows(10)) == 0)
    // third batch evicts the first (10 rows dropped)
    assert(st.append("t", schema, rows(10)) == 10)
    assert(st.currentBytes("t") == 320)
    assert(st.droppedRows("t") == 10)
  }

  test("a batch larger than the whole budget is refused (manager.go:286-310)") {
    val st = new StreamStore(maxBytesPerStream = 100)
    assert(st.append("t", schema, rows(10)) == 10) // 160 > 100
    assert(st.currentBytes("t") == 0)
  }

  test("idle streams expire after TTL; appends refresh (manager.go:150-184)") {
    var clock = 0L
    val st = new StreamStore(ttlMillis = 60000, now = () => clock)
    st.append("fresh", schema, rows(1))
    st.append("stale", schema, rows(1))
    clock = 30000
    st.append("fresh", schema, rows(1)) // refresh
    clock = 70000                       // stale idle 70s > 60s; fresh idle 40s
    assert(st.expire() == Seq("stale"))
    assert(st.listTopics() == Seq("fresh"))
  }

  test("catalog listing + schema fetch (flight/server.go:82-230)") {
    val st = new StreamStore()
    st.append("topic_a", schema, rows(3))
    assert(st.listTopics() == Seq("topic_a"))
    assert(st.schemaOf("topic_a").contains(schema))
    assert(st.schemaOf("nope").isEmpty)
  }
}

/** Spark-coupled store tests (scan / temp views) split into a suite
  * that owns a session. */
class StreamStoreSparkSpec extends SparkSuite {
  private val schema = StructType(Seq(
    StructField("a", LongType), StructField("b", LongType)))

  test("full-scan serve returns buffered rows; reads keep streams alive (manager.go:376-386)") {
    var clock = 0L
    val st = new StreamStore(ttlMillis = 60000, now = () => clock)
    st.append("t", schema, Seq(Row(1L, 2L), Row(3L, 4L)))
    st.append("t", schema, Seq(Row(5L, 6L)))
    val df = st.scan(spark, "t").get
    assert(df.count() == 3)
    clock = 59000
    st.scan(spark, "t") // read refreshes TTL
    clock = 70000       // idle only 11s since read
    assert(st.expire().isEmpty)
  }

  test("registerViews exposes streams as catalog tables (O16-O18)") {
    val st = new StreamStore()
    st.append("my-topic", schema, Seq(Row(1L, 2L)))
    st.registerViews(spark)
    assert(spark.table("my_topic").count() == 1)
  }
}

package graft

import graft.engine.{FlightServe, StreamStore}
import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import java.sql.Timestamp

/** Arrow-IPC serving layer (the Flight analog): ListFlights /
  * GetSchema / DoGet over the stream store, with a full IPC
  * roundtrip proving the bytes are real Arrow. */
class FlightServeSpec extends SparkSuite {

  private val schema = StructType(Seq(
    StructField("kafka_key", StringType),
    StructField("kafka_timestamp", TimestampType),
    StructField("kafka_offset", LongType),
    StructField("amount", DoubleType),
    StructField("ok", BooleanType),
    StructField("blob", BinaryType)))

  private def row(o: Long) = Row(
    s"k$o", Timestamp.valueOf("2024-01-01 10:00:00"), o, o * 1.5, o % 2 == 0,
    Array[Byte](o.toByte, (o + 1).toByte))

  private def storeWith2Batches(): StreamStore = {
    val st = new StreamStore()
    st.append("orders", schema, (0L until 3L).map(row))
    st.append("orders", schema, (3L until 5L).map(row))
    st
  }

  test("listFlights mirrors the catalog (one info per stream, rows + batches)") {
    val st = storeWith2Batches()
    st.append("other", StructType(Seq(StructField("a", LongType))), Seq(Row(1L)))
    val infos = FlightServe.listFlights(st).map(i => i.topic -> i).toMap
    assert(infos.keySet == Set("orders", "other"))
    assert(infos("orders").rows == 5 && infos("orders").nBatches == 2)
    assert(infos("orders").bytes == st.currentBytes("orders"))
  }

  test("getSchema converts the full ingest type surface to Arrow") {
    val st = storeWith2Batches()
    val as = FlightServe.getSchema(st, "orders").get
    assert(as.getFields.size() == 6)
    assert(as.findField("kafka_offset").getType ==
      new org.apache.arrow.vector.types.pojo.ArrowType.Int(64, true))
    assert(as.findField("kafka_timestamp").getType.isInstanceOf[
      org.apache.arrow.vector.types.pojo.ArrowType.Timestamp])
    assert(FlightServe.getSchema(st, "nope").isEmpty)
  }

  test("doGet streams real Arrow IPC: roundtrip preserves batch boundaries and values") {
    val st = storeWith2Batches()
    val bytes = FlightServe.doGet(st, "orders").get
    // Arrow IPC streams open with a 0xFFFFFFFF continuation marker
    assert(bytes.length > 8 && (bytes(0) & 0xff) == 0xff)
    val (as, batches) = FlightServe.readIpc(bytes)
    assert(as.getFields.size() == 6)
    assert(batches.map(_.size) == Seq(3, 2), "one IPC batch per store batch")
    val first = batches.head.head
    assert(first(0).toString == "k0")
    // timestamp surfaces as epoch-micros in UTC
    assert(first(2) == 0L && first(3) == 0.0 && first(4) == true)
    val blob = first(5).asInstanceOf[Array[Byte]]
    assert(blob.toSeq == Seq[Byte](0, 1))
    val last = batches(1).last
    assert(last(0).toString == "k4" && last(2) == 4L && last(3) == 6.0)
    assert(FlightServe.doGet(st, "nope").isEmpty, "NotFound analog")
  }

  test("doGet handles nulls and empty batches") {
    val st = new StreamStore()
    val s = StructType(Seq(StructField("a", LongType), StructField("b", StringType)))
    st.append("t", s, Seq(Row(1L, null), Row(null, "x")))
    val (_, batches) = FlightServe.readIpc(FlightServe.doGet(st, "t").get)
    assert(batches.head(0)(1) == null)
    assert(batches.head(1)(0) == null && batches.head(1)(1).toString == "x")
  }
}

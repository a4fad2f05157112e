package graft

import graft.engine.Sinks
import org.apache.spark.sql.functions._

class SinksSpec extends SparkSuite {
  import spark.implicits._

  test("CSV round-trip preserves commas, quotes and newlines (cmd/client.go:249-257)") {
    val r = Sinks.qCsvRoundtrip(spark, sf)
    assert(r.count() > 0)
    assert(r.filter(!col("row_match")).count() == 0, "all rows must round-trip")
  }

  test("partitioned writes enable partition pruning at the scan (PartitionFilters)") {
    val dir = java.nio.file.Files.createTempDirectory("graft_part").toString
    val ev = graft.engine.Tables.events(spark, sf)
    Sinks.writePartitioned(ev, dir, "event_type")
    val back = spark.read.parquet(dir).filter(col("event_type") === "purchase")
    val plan = back.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [isnotnull(event_type"),
      s"expected partition pruning in:\n${plan.take(800)}")
    val expected = ev.filter(col("event_type") === "purchase").count()
    assert(back.count() == expected)
  }

  test("q_partition_prune scans only the two filtered partitions") {
    val plan = Sinks.qPartitionPrune(spark, sf).queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("event_type"),
      s"expected a partition filter on event_type in:\n${plan.take(800)}")
    assert(!plan.contains("PushedFilters: [In(event_type"),
      "the type filter must prune partitions, not just push to the row reader")
  }

  test("JSON-lines round-trip preserves rows and schema") {
    val dir = java.nio.file.Files.createTempDirectory("graft_json").toString
    val src = graft.engine.Tables.documents(spark, sf)
      .select("doc_id", "lang", "n_chars")
    Sinks.writeJsonLines(src, dir)
    val back = Sinks.readJsonLines(spark, dir, src.schema)
    assert(back.count() == src.count())
    assert(back.schema == src.schema)
    assert(src.exceptAll(back).count() == 0)
  }

  test("CSV nulls become empty fields and read back as nulls") {
    val dir = java.nio.file.Files.createTempDirectory("graft_csv_nulls").toString
    val src = Seq((1L, Some("x")), (2L, None)).toDF("id", "s")
    Sinks.writeCsv(src, dir)
    val back = Sinks.readCsv(spark, dir, src.schema).orderBy("id").collect()
    assert(back(0).getString(1) == "x")
    assert(back(1).isNullAt(1))
  }
}

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

  test("CSV nulls become empty fields and read back as nulls") {
    val dir = java.nio.file.Files.createTempDirectory("graft_csv_nulls").toString
    val src = Seq((1L, Some("x")), (2L, None)).toDF("id", "s")
    Sinks.writeCsv(src, dir)
    val back = Sinks.readCsv(spark, dir, src.schema).orderBy("id").collect()
    assert(back(0).getString(1) == "x")
    assert(back(1).isNullAt(1))
  }
}

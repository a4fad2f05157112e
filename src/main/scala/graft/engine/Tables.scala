package graft.engine

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Central accessor for the driver-generated parquet fixtures
  * (TESTDATA.md). One parquet file per table under `sfDir`.
  *
  * Scale note: `spark.read.parquet` gives Catalyst a file-source
  * relation with column pruning + predicate pushdown; every query
  * downstream must keep its filters/projections expressible on
  * columns so they reach the scan (verified via `.explain` —
  * `PushedFilters`/`ReadSchema`). At 100 TB the same call reads a
  * partitioned directory tree; nothing here assumes single files.
  */
object Tables {
  def table(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame    = table(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame    = table(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame  = table(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame  = table(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame      = table(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame    = table(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame  = table(s, d, "lineitem")
  /** The events fixture stores `ts` as parquet TIMESTAMP(NANOS), which
    * Spark 4 refuses to read as a timestamp. Sessions set
    * `spark.sql.legacy.parquet.nanosAsLong=true`, so `ts` arrives as a
    * nanosecond long; convert to a µs timestamp with exact integer
    * division (`DIV`, not `/` — double division loses precision above
    * 2^53 ns). Truncation to µs matches DuckDB's CAST(ns AS TIMESTAMP). */
  def events(s: SparkSession, d: String): DataFrame = {
    val raw = table(s, d, "events")
    raw.schema("ts").dataType match {
      case LongType => raw.withColumn("ts", timestamp_micros(expr("ts DIV 1000")))
      case _        => raw
    }
  }
  def documents(s: SparkSession, d: String): DataFrame = table(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = table(s, d, "embeddings")
}

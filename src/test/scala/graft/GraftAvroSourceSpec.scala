package graft

import java.nio.file.Files

import org.apache.spark.sql.Row
import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.sources.{AvroSink, GraftAvroScan}

/** The graft-avro DataSource V2 format: per-partition container
  * files, header schema inference, full atomic-type round-trip
  * (nulls included), and column pruning asserted on the executed
  * plan's scan. */
class GraftAvroSourceSpec extends SparkSuite {

  private def freshDir(): String =
    Files.createTempDirectory("graft_avro_spec").toString

  test("atomic types + nulls round-trip through sink and source") {
    val dir = freshDir()
    val schema = StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("n", IntegerType),
      StructField("x", DoubleType),
      StructField("f", FloatType),
      StructField("ok", BooleanType),
      StructField("s", StringType),
      StructField("b", BinaryType)))
    val rows = Seq(
      Row(1L, 7, 1.5, 2.5f, true, "hello", Array[Byte](1, 2, 3)),
      Row(2L, null, null, null, null, null, null))
    AvroSink.write(spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 2), schema), dir)
    val back = spark.read.format("graft-avro").option("path", dir).load()
    assert(back.schema.fieldNames.toSeq ==
      Seq("id", "n", "x", "f", "ok", "s", "b"))
    val got = back.orderBy("id").collect()
    assert(got.length == 2)
    assert(got(0).getLong(0) == 1L && got(0).getInt(1) == 7 &&
      got(0).getDouble(2) == 1.5 && got(0).getFloat(3) == 2.5f &&
      got(0).getBoolean(4) && got(0).getString(5) == "hello" &&
      got(0).getAs[Array[Byte]](6).toSeq == Seq[Byte](1, 2, 3))
    assert(got(1).isNullAt(1) && got(1).isNullAt(5) && got(1).isNullAt(6))
  }

  test("one input partition per container file; pruning reaches the scan") {
    val dir = freshDir()
    import spark.implicits._
    AvroSink.write((1L to 100L).toDF("v")
      .withColumn("s", concat(lit("r"), col("v"))).repartition(4), dir)
    val df = spark.read.format("graft-avro").option("path", dir).load()
      .select("v")
    df.collect()
    val scan = df.queryExecution.executedPlan.collect {
      case b: BatchScanExec => b
    }.head.scan.asInstanceOf[GraftAvroScan]
    assert(scan.toBatch.planInputPartitions().length == 4)
    assert(scan.readSchema().fieldNames.toSeq == Seq("v"))
    assert(df.agg(sum("v")).head.getLong(0) == 5050L)
  }

  test("fixture-scale roundtrip preserves every row (orders)") {
    val dir = freshDir()
    val src = graft.engine.Tables.orders(spark, sf)
      .select(col("o_orderkey"), col("o_orderpriority"))
    AvroSink.write(src, dir)
    val back = spark.read.format("graft-avro").option("path", dir).load()
    assert(back.count() == src.count())
    assert(back.except(src).isEmpty && src.except(back).isEmpty)
  }
}

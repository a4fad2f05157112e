package graft.sources

import java.io.File
import java.util

import scala.jdk.CollectionConverters._

import org.apache.avro.{Schema, SchemaBuilder}
import org.apache.avro.file.{DataFileReader, DataFileWriter}
import org.apache.avro.generic.{GenericData, GenericDatumReader, GenericDatumWriter, GenericRecord}
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.catalyst.{CatalystTypeConverters, InternalRow}
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder, SupportsPushDownRequiredColumns}
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** Avro container-file source + sink built directly on the avro-core
  * jars the Spark distribution bundles (the spark-avro MODULE is not
  * in the offline distribution — this supplies the format through the
  * same DataSource V2 connector API as GraftStoreSource, so
  * `spark.read.format("graft-avro")` behaves like any file source:
  * schema inference from the container header, one input partition
  * per file, column pruning honored by converting only the projected
  * fields).
  *
  * Type mapping (the flat subset the engine's tables need):
  * long/int/double/float/boolean/string/bytes, each nullable via
  * union[null, T]. Nested records are out of scope — the engine's
  * sink path flattens first (same stance as the reference's DuckDB
  * sink, duckdb/sink.go, which stringifies complex payloads).
  *
  * Paths are java.io local-FS — correct for local[n] CI; a cluster
  * deployment swaps in the Hadoop FS API at the two file-touch
  * points (list + open) without changing the connector contract. */
object AvroSchemas {
  def toAvro(schema: StructType, name: String): Schema = {
    val fields = SchemaBuilder.record(name).namespace("graft").fields()
    schema.fields.foldLeft(fields) { (fs, f) =>
      val base = f.dataType match {
        case LongType => Schema.create(Schema.Type.LONG)
        case IntegerType => Schema.create(Schema.Type.INT)
        case DoubleType => Schema.create(Schema.Type.DOUBLE)
        case FloatType => Schema.create(Schema.Type.FLOAT)
        case BooleanType => Schema.create(Schema.Type.BOOLEAN)
        case StringType => Schema.create(Schema.Type.STRING)
        case BinaryType => Schema.create(Schema.Type.BYTES)
        case other => throw new IllegalArgumentException(
          s"graft-avro supports flat atomic columns only, got $other")
      }
      val t = if (f.nullable)
        Schema.createUnion(util.Arrays.asList(
          Schema.create(Schema.Type.NULL), base))
      else base
      fs.name(f.name).`type`(t).noDefault()
    }.endRecord()
  }

  def toStruct(schema: Schema): StructType = {
    def atom(s: Schema): (DataType, Boolean) = s.getType match {
      case Schema.Type.UNION =>
        val inner = s.getTypes.asScala.filter(_.getType != Schema.Type.NULL)
        require(inner.size == 1, s"unsupported union $s")
        (atom(inner.head)._1, true)
      case Schema.Type.LONG => (LongType, false)
      case Schema.Type.INT => (IntegerType, false)
      case Schema.Type.DOUBLE => (DoubleType, false)
      case Schema.Type.FLOAT => (FloatType, false)
      case Schema.Type.BOOLEAN => (BooleanType, false)
      case Schema.Type.STRING => (StringType, false)
      case Schema.Type.BYTES => (BinaryType, false)
      case other => throw new IllegalArgumentException(
        s"graft-avro cannot map avro type $other")
    }
    StructType(schema.getFields.asScala.map { f =>
      val (dt, nullable) = atom(f.schema())
      StructField(f.name(), dt, nullable)
    }.toSeq)
  }

  /** avro runtime value → Spark Row value for the mapped subset. */
  def fromAvroValue(v: Any): Any = v match {
    case null => null
    case u: org.apache.avro.util.Utf8 => u.toString
    case b: java.nio.ByteBuffer =>
      val a = new Array[Byte](b.remaining()); b.duplicate().get(a); a
    case other => other
  }
}

/** Distributed Avro sink: one container file per partition, written
  * inside `foreachPartition` (the executor-side pattern every file
  * sink uses — no driver collect, no row ever crosses back). */
object AvroSink {
  def write(df: DataFrame, dir: String): Unit = {
    val schema = df.schema
    new File(dir).mkdirs()
    df.foreachPartition { (rows: Iterator[Row]) =>
      val pid = org.apache.spark.TaskContext.getPartitionId()
      val avro = AvroSchemas.toAvro(schema, "row")
      val w = new DataFileWriter(new GenericDatumWriter[GenericRecord](avro))
      w.create(avro, new File(dir, f"part-$pid%05d.avro"))
      try rows.foreach { r =>
        val rec = new GenericData.Record(avro)
        schema.fields.zipWithIndex.foreach { case (f, i) =>
          val v = if (r.isNullAt(i)) null else f.dataType match {
            case BinaryType => java.nio.ByteBuffer.wrap(
              r.get(i).asInstanceOf[Array[Byte]])
            case _ => r.get(i).asInstanceOf[AnyRef]
          }
          rec.put(f.name, v)
        }
        w.append(rec)
      } finally w.close()
    }
  }
}

final class GraftAvroProvider extends TableProvider with DataSourceRegister {
  override def shortName(): String = "graft-avro"

  private def files(dir: String): Seq[File] = {
    val fs = Option(new File(dir).listFiles()).getOrElse(Array.empty)
      .filter(_.getName.endsWith(".avro")).sortBy(_.getName).toSeq
    require(fs.nonEmpty, s"no .avro files under $dir")
    fs
  }

  override def inferSchema(options: CaseInsensitiveStringMap): StructType = {
    val first = files(options.get("path")).head
    val r = new DataFileReader(first,
      new GenericDatumReader[GenericRecord]())
    try AvroSchemas.toStruct(r.getSchema) finally r.close()
  }

  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: util.Map[String, String]): Table =
    new GraftAvroTable(properties.get("path"), schema)
}

final class GraftAvroTable(dir: String, schema: StructType)
    extends Table with SupportsRead {
  override def name(): String = s"graft-avro:$dir"
  override def schema(): StructType = schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new GraftAvroScanBuilder(dir, schema)
}

final class GraftAvroScanBuilder(dir: String, full: StructType)
    extends ScanBuilder with SupportsPushDownRequiredColumns {
  private var required: StructType = full
  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema
  override def build(): Scan = new GraftAvroScan(dir, full, required)
}

final class GraftAvroScan(dir: String, full: StructType, required: StructType)
    extends Scan with Batch {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description(): String =
    s"GraftAvroScan(path=$dir, ReadSchema=${required.simpleString})"

  override def planInputPartitions(): Array[InputPartition] =
    Option(new java.io.File(dir).listFiles()).getOrElse(Array.empty)
      .filter(_.getName.endsWith(".avro")).sortBy(_.getName)
      .map(f => GraftAvroPartition(f.getAbsolutePath): InputPartition)

  override def createReaderFactory(): PartitionReaderFactory =
    new GraftAvroReaderFactory(required)
}

final case class GraftAvroPartition(path: String) extends InputPartition

final class GraftAvroReaderFactory(required: StructType)
    extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val path = partition.asInstanceOf[GraftAvroPartition].path
    val reader = new DataFileReader(new File(path),
      new GenericDatumReader[GenericRecord]())
    val toCatalyst = CatalystTypeConverters.createToCatalystConverter(required)
    val names = required.fieldNames
    new PartitionReader[InternalRow] {
      private var cur: InternalRow = _
      override def next(): Boolean =
        if (reader.hasNext) {
          val rec = reader.next()
          cur = toCatalyst(Row.fromSeq(names.toIndexedSeq.map(n =>
            AvroSchemas.fromAvroValue(rec.get(n))))).asInstanceOf[InternalRow]
          true
        } else false
      override def get(): InternalRow = cur
      override def close(): Unit = reader.close()
    }
  }
}

package graft.engine

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.types._

/** Relational-sink DDL generation (reference O22,
  * duckdb/sink.go:184-250: Arrow schema → `CREATE TABLE IF NOT
  * EXISTS` with NOT NULL constraints; unsigned ints widened; complex
  * types → VARCHAR) plus the reference's client-side table formatting
  * (O20, cmd/client.go:174-224: ASCII table, nulls as "NULL").
  *
  * Our primary sink is parquet (schema self-describing), but the DDL
  * path is what a JDBC/warehouse sink uses. */
object Ddl {

  /** Spark type → ANSI-ish SQL type, mirroring the reference's map
    * (duckdb/sink.go:212-250). Spark has no unsigned types — the
    * reference's UInt8/16/32/64 arrive already widened
    * (SURVEY.md §1.3) so the map is total over what we can see.
    * Complex types fall back to VARCHAR exactly like the reference
    * (duckdb/sink.go:246-248). */
  def sqlType(t: DataType): String = t match {
    case ByteType                 => "TINYINT"
    case ShortType                => "SMALLINT"
    case IntegerType              => "INTEGER"
    case LongType                 => "BIGINT"
    case FloatType                => "REAL"
    case DoubleType               => "DOUBLE"
    case BooleanType              => "BOOLEAN"
    case StringType               => "VARCHAR"
    case BinaryType               => "BLOB"
    case DateType                 => "DATE"
    case TimestampType            => "TIMESTAMP"
    case d: DecimalType           => s"DECIMAL(${d.precision},${d.scale})"
    case _: StructType | _: ArrayType | _: MapType => "VARCHAR"
    case other                    => "VARCHAR"
  }

  /** Schema → CREATE TABLE IF NOT EXISTS, NOT NULL from nullability
    * (duckdb/sink.go:184-209). Identifiers are double-quoted. */
  def createTableSql(table: String, schema: StructType): String = {
    val cols = schema.fields.map { f =>
      val nn = if (f.nullable) "" else " NOT NULL"
      s""""${f.name}" ${sqlType(f.dataType)}$nn"""
    }
    s"""CREATE TABLE IF NOT EXISTS "$table" (${cols.mkString(", ")})"""
  }

  /** ASCII table formatting with nulls rendered as "NULL"
    * (cmd/client.go:174-224). Row cap applied like the client's
    * --limit (cmd/client.go:65). Collects ONLY the capped rows. */
  def formatTable(df: DataFrame, limit: Int = 10): String = {
    val header = df.columns
    val rows = df.limit(limit).collect().map(_.toSeq.map {
      case null => "NULL"
      case v    => v.toString
    })
    val widths = header.indices.map { i =>
      (header(i).length +: rows.map(_(i).length)).max
    }
    def line(cells: Seq[String]) =
      cells.zip(widths).map { case (c, w) => c.padTo(w, ' ') }
        .mkString("| ", " | ", " |")
    val sep = widths.map("-" * _).mkString("+-", "-+-", "-+")
    (Seq(sep, line(header.toSeq), sep) ++ rows.map(r => line(r.map(_.toString))) :+ sep)
      .mkString("\n")
  }
}

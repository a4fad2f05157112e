package graft.engine

import org.apache.spark.sql.types._

/** Schema inference + type-promotion lattice, re-expressing the
  * reference's rules (kafka/consumer.go:913-943 `inferJsonFieldType`,
  * kafka/consumer.go:946-982 `commonSuperType`) on Spark's type system.
  *
  * Reference lattice:
  *  - JSON number  → Int64 if integral else Float64  (consumer.go:918-925)
  *  - RFC3339 string → Timestamp                     (consumer.go:927-930)
  *  - bool → Boolean                                 (consumer.go:932-933)
  *  - nested object / array → String (stringified)   (consumer.go:934-939)
  *  - null → nullable String                         (consumer.go:914-916)
  * Promotion:
  *  - int widening Byte<Short<Int<Long               (consumer.go:953-959)
  *  - float widening Float<Double                    (consumer.go:962-968)
  *  - int ⊔ float → Double                           (consumer.go:971-978)
  *  - anything else → String                         (consumer.go:981)
  *  - nullability is OR-ed                           (consumer.go:888-895)
  *
  * All of this is driver-side schema metadata work on a bounded sample —
  * no data-path cost at any scale.
  */
object SchemaRules {

  private val intOrder: Map[DataType, Int] =
    Map(ByteType -> 0, ShortType -> 1, IntegerType -> 2, LongType -> 3)
  private val floatOrder: Map[DataType, Int] =
    Map(FloatType -> 0, DoubleType -> 1)

  def isIntegral(t: DataType): Boolean = intOrder.contains(t)
  def isFloating(t: DataType): Boolean = floatOrder.contains(t)

  /** Common supertype of two leaf types. Follows the reference lattice
    * (consumer.go:971-978) for int⊔int and float⊔float, but DEVIATES
    * intentionally on int⊔float: the reference returns the float side
    * unchanged (Int64 ⊔ Float32 → Float32, lossy above 2^24); we widen
    * to DoubleType so no sampled integer loses precision. */
  def commonSuperType(a: DataType, b: DataType): DataType = (a, b) match {
    case (x, y) if x == y => x
    case (x, y) if isIntegral(x) && isIntegral(y) =>
      if (intOrder(x) >= intOrder(y)) x else y
    case (x, y) if isFloating(x) && isFloating(y) =>
      if (floatOrder(x) >= floatOrder(y)) x else y
    case (x, y) if (isIntegral(x) && isFloating(y)) || (isFloating(x) && isIntegral(y)) =>
      DoubleType
    case _ => StringType
  }

  /** RFC3339 / ISO-8601 detector used for the string→timestamp rule
    * (reference parses with time.RFC3339, consumer.go:927-930). */
  def looksLikeRfc3339(s: String): Boolean = {
    if (s == null || s.length < 19) return false
    try { java.time.OffsetDateTime.parse(s); true }
    catch {
      case _: java.time.format.DateTimeParseException =>
        // RFC3339 requires an offset, but accept the 'Z'-less local form
        // Spark's JSON reader also accepts.
        try { java.time.LocalDateTime.parse(s); true }
        catch { case _: java.time.format.DateTimeParseException => false }
    }
  }

  /** Unsigned-integer widening (reference duckdb/sink.go:222-229 maps
    * UInt8/16/32/64; Spark has no unsigned types — SURVEY.md §1.3):
    * each unsigned width widens to the next signed type that can hold
    * its full range; UInt64 → Decimal(20,0). Keyed by the names
    * Arrow-side schemas use. */
  val unsignedWidening: Map[String, DataType] = Map(
    "uint8"  -> ShortType,
    "uint16" -> IntegerType,
    "uint32" -> LongType,
    "uint64" -> DecimalType(20, 0))

  /** Normalize a Spark-inferred JSON schema onto the reference lattice:
    * nested struct/array/map → String (consumer.go:934-939), decimal →
    * Double, date → Timestamp. Field order is preserved. */
  def normalize(schema: StructType): StructType =
    StructType(schema.fields.map { f =>
      val t = f.dataType match {
        case _: StructType | _: ArrayType | _: MapType => StringType
        case _: DecimalType                            => DoubleType
        case DateType                                  => TimestampType
        case other                                     => other
      }
      StructField(f.name, t, nullable = f.nullable)
    })

  /** Merge two flat schemas field-wise with commonSuperType; a field
    * present on only one side becomes nullable (missing → null,
    * consumer.go:630-634). Field order: left order, then right-only. */
  def promote(a: StructType, b: StructType): StructType = {
    val bByName = b.fields.map(f => f.name -> f).toMap
    val merged = a.fields.map { fa =>
      bByName.get(fa.name) match {
        case Some(fb) =>
          StructField(fa.name, commonSuperType(fa.dataType, fb.dataType),
            nullable = fa.nullable || fb.nullable)
        case None => fa.copy(nullable = true)
      }
    }
    val aNames = a.fieldNames.toSet
    val rightOnly = b.fields.filterNot(f => aNames(f.name)).map(_.copy(nullable = true))
    StructType(merged ++ rightOnly)
  }
}

package graft

import graft.engine.SchemaRules
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Mirrors the reference lattice table (kafka/consumer.go:913-982) as
  * unit + exhaustive-property tests (SURVEY.md §5.2/§5.3). */
class SchemaRulesSpec extends AnyFunSuite {
  import SchemaRules._

  test("int widening follows type-id order (consumer.go:953-959)") {
    assert(commonSuperType(ByteType, ShortType) == ShortType)
    assert(commonSuperType(ShortType, IntegerType) == IntegerType)
    assert(commonSuperType(IntegerType, LongType) == LongType)
    assert(commonSuperType(LongType, ByteType) == LongType)
  }

  test("float widening (consumer.go:962-968)") {
    assert(commonSuperType(FloatType, DoubleType) == DoubleType)
    assert(commonSuperType(DoubleType, FloatType) == DoubleType)
  }

  test("int ⊔ float → double (consumer.go:971-978)") {
    assert(commonSuperType(LongType, DoubleType) == DoubleType)
    assert(commonSuperType(FloatType, IntegerType) == DoubleType)
  }

  test("incompatible → string (consumer.go:981)") {
    assert(commonSuperType(BooleanType, LongType) == StringType)
    assert(commonSuperType(TimestampType, DoubleType) == StringType)
    assert(commonSuperType(StringType, LongType) == StringType)
  }

  test("identical types are preserved") {
    for (t <- Seq(StringType, BooleanType, TimestampType, LongType, DoubleType))
      assert(commonSuperType(t, t) == t)
  }

  private val leafTypes: Seq[DataType] = Seq(
    ByteType, ShortType, IntegerType, LongType, FloatType, DoubleType,
    StringType, BooleanType, TimestampType)

  test("promotion is commutative, associative, idempotent (exhaustive over the lattice)") {
    for (a <- leafTypes; b <- leafTypes; c <- leafTypes) {
      assert(commonSuperType(a, b) == commonSuperType(b, a), s"comm $a $b")
      assert(commonSuperType(a, a) == a, s"idem $a")
      assert(
        commonSuperType(commonSuperType(a, b), c) ==
          commonSuperType(a, commonSuperType(b, c)), s"assoc $a $b $c")
    }
  }

  test("RFC3339 detector (consumer.go:927-930)") {
    assert(looksLikeRfc3339("2024-01-01T10:00:00Z"))
    assert(looksLikeRfc3339("2024-01-01T10:00:00+02:00"))
    assert(looksLikeRfc3339("2024-01-01T10:00:00.123456Z"))
    assert(!looksLikeRfc3339("2024-01-01"))
    assert(!looksLikeRfc3339("not a time"))
    assert(!looksLikeRfc3339(""))
    assert(!looksLikeRfc3339(null))
  }

  test("normalize stringifies nested, widens decimal (consumer.go:934-939)") {
    val in = StructType(Seq(
      StructField("s", StructType(Seq(StructField("x", LongType)))),
      StructField("a", ArrayType(LongType)),
      StructField("d", DecimalType(10, 2)),
      StructField("keep", LongType)))
    val out = normalize(in)
    assert(out("s").dataType == StringType)
    assert(out("a").dataType == StringType)
    assert(out("d").dataType == DoubleType)
    assert(out("keep").dataType == LongType)
  }

  test("promote merges fields; one-sided fields become nullable (consumer.go:630-634)") {
    val a = StructType(Seq(
      StructField("k", LongType, nullable = false),
      StructField("only_a", BooleanType, nullable = false)))
    val b = StructType(Seq(
      StructField("k", DoubleType, nullable = true),
      StructField("only_b", StringType, nullable = false)))
    val m = promote(a, b)
    assert(m("k").dataType == DoubleType)
    assert(m("k").nullable) // OR-ed (consumer.go:888-895)
    assert(m("only_a").nullable && m("only_b").nullable)
    assert(m.fieldNames.toSeq == Seq("k", "only_a", "only_b"))
  }
}

package graft

import graft.engine.{SchemaRules, StreamStore}
import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import org.scalacheck.{Gen, Prop, Properties}
import org.scalacheck.Prop.forAll

/** ScalaCheck invariants (SURVEY.md §5.3): promotion-lattice laws over
  * random schemas and the eviction byte-budget invariant under random
  * append sequences. */
object SchemaRulesProps extends Properties("SchemaRules") {

  private val leaf: Gen[DataType] = Gen.oneOf(
    ByteType, ShortType, IntegerType, LongType, FloatType, DoubleType,
    StringType, BooleanType, TimestampType)

  private val field: Gen[StructField] = for {
    name <- Gen.oneOf("a", "b", "c", "d", "e", "f")
    t <- leaf
    n <- Gen.oneOf(true, false)
  } yield StructField(name, t, n)

  private val schema: Gen[StructType] = for {
    fields <- Gen.listOfN(4, field)
  } yield StructType(fields.groupBy(_.name).map(_._2.head).toSeq)

  property("promote is commutative up to field membership") = forAll(schema, schema) { (a, b) =>
    val ab = SchemaRules.promote(a, b)
    val ba = SchemaRules.promote(b, a)
    ab.fields.map(f => (f.name, f.dataType, f.nullable)).toSet ==
      ba.fields.map(f => (f.name, f.dataType, f.nullable)).toSet
  }

  property("promote(s, s) == s") = forAll(schema) { s =>
    SchemaRules.promote(s, s) == s
  }

  property("promote is associative") = forAll(schema, schema, schema) { (a, b, c) =>
    val l = SchemaRules.promote(SchemaRules.promote(a, b), c)
    val r = SchemaRules.promote(a, SchemaRules.promote(b, c))
    l.fields.map(f => (f.name, f.dataType, f.nullable)).toSet ==
      r.fields.map(f => (f.name, f.dataType, f.nullable)).toSet
  }

  property("promoted type can represent both inputs (upper bound)") =
    forAll(leaf, leaf) { (a, b) =>
      val s = SchemaRules.commonSuperType(a, b)
      def fits(t: DataType, in: DataType): Boolean =
        in == t || in == StringType ||
          (SchemaRules.isIntegral(t) && SchemaRules.isIntegral(in)) ||
          (SchemaRules.isFloating(t) && SchemaRules.isFloating(in)) ||
          ((SchemaRules.isIntegral(t) || SchemaRules.isFloating(t)) && in == DoubleType)
      fits(a, s) && fits(b, s)
    }
}

object StreamStoreProps extends Properties("StreamStore") {

  private val schema = StructType(Seq(StructField("x", LongType)))
  private val batchSizes: Gen[List[Int]] =
    Gen.listOfN(30, Gen.choose(1, 40))

  property("current bytes never exceed the budget (manager.go:286-310)") =
    forAll(batchSizes, Gen.choose(100L, 2000L)) { (sizes, budget) =>
      val st = new StreamStore(maxBytesPerStream = budget)
      sizes.foreach { n =>
        st.append("t", schema, (1 to n).map(i => Row(i.toLong)))
      }
      st.currentBytes("t") <= budget
    }

  property("rows are conserved: retained + dropped == appended") =
    forAll(batchSizes) { sizes =>
      val st = new StreamStore(maxBytesPerStream = 500)
      var appended = 0L
      sizes.foreach { n =>
        st.append("t", schema, (1 to n).map(i => Row(i.toLong)))
        appended += n
      }
      val retained = st.listTopics().headOption.map { _ =>
        // count retained rows via the store's own accounting
        st.currentBytes("t") / 8 // 1 col × 8 bytes
      }.getOrElse(0L)
      retained + st.droppedRows("t") == appended
    }
}

/** Invariants of the native n-gram expressions over random (multibyte)
  * strings and token lists — count, length, and positional coherence
  * against the definition. */
object NgramProps extends Properties("NgramOps") {
  import graft.expressions.NgramOps
  import org.apache.spark.unsafe.types.UTF8String
  import org.apache.spark.sql.catalyst.util.GenericArrayData

  // BMP-safe generator with ASCII + 2/3-byte UTF-8 chars
  private val bmpChar: Gen[Char] =
    Gen.frequency(8 -> Gen.alphaNumChar, 1 -> Gen.oneOf('é', 'ß', 'ü'),
      1 -> Gen.oneOf('日', '本', '語'))
  private val str: Gen[String] = Gen.listOf(bmpChar).map(_.mkString)
  private val nGen: Gen[Int] = Gen.choose(1, 4)

  property("char ngrams: count = max(chars - n + 1, 0), each n chars long") =
    forAll(str, nGen) { (s, n) =>
      val out = NgramOps.charNgrams(UTF8String.fromString(s), n)
      val chars = s.codePointCount(0, s.length)
      val grams = (0 until out.numElements()).map(out.getUTF8String(_).toString)
      grams.length == math.max(chars - n + 1, 0) &&
        grams.forall(g => g.codePointCount(0, g.length) == n)
    }

  property("char ngrams: gram i equals the substring starting at char i") =
    forAll(str, nGen) { (s, n) =>
      val out = NgramOps.charNgrams(UTF8String.fromString(s), n)
      (0 until out.numElements()).forall { i =>
        out.getUTF8String(i).toString ==
          new String(s.codePoints().toArray.slice(i, i + n), 0, n)
      }
    }

  property("word ngrams: sliding windows joined by single spaces") =
    forAll(Gen.listOf(Gen.alphaNumStr.suchThat(_.nonEmpty)), nGen) { (toks, n) =>
      val arr = new GenericArrayData(
        toks.map(t => UTF8String.fromString(t): Any).toArray)
      val out = NgramOps.wordNgrams(arr, n)
      val expected = if (toks.length < n) Seq.empty
        else toks.sliding(n).map(_.mkString(" ")).toSeq
      (0 until out.numElements()).map(out.getUTF8String(_).toString) == expected
    }

  property("within-edit-1: agrees with full levenshtein on BMP strings") =
    forAll(str, str, Gen.choose(0, 3), Gen.choose(0, 3)) { (a, b, drop, mode) =>
      // bias toward near pairs: mutate a into b' by 0-3 edits sometimes
      val bb = mode match {
        case 0 => b
        case 1 => a // equal
        case 2 => if (a.nonEmpty) a.substring(0, a.length - 1) else a // 1 delete
        case _ => a + "x" // 1 insert
      }
      val got = graft.expressions.EditOps.withinEdit1(
        UTF8String.fromString(a), UTF8String.fromString(bb))
      val lev = {
        // reference DP
        val (x, y) = (a.toCharArray, bb.toCharArray)
        val dp = Array.tabulate(x.length + 1)(i => i)
        for (j <- 1 to y.length) {
          var prev = dp(0); dp(0) = j
          for (i <- 1 to x.length) {
            val t = dp(i)
            dp(i) = math.min(math.min(dp(i) + 1, dp(i - 1) + 1),
              prev + (if (x(i - 1) == y(j - 1)) 0 else 1))
            prev = t
          }
        }
        dp(x.length)
      }
      val expected = if (lev <= 1) lev else -1
      got == expected
    }

  property("topk aggregator: partition-order-independent, equals sort-take") =
    forAll(Gen.listOf(Gen.zip(Gen.choose(0.0, 100.0), Gen.choose(0L, 50L))),
           Gen.choose(1, 5)) { (rows, splits) =>
      import graft.expressions.{ScoredRow, TopKByScore}
      val agg = new TopKByScore(3)
      val data = rows.map { case (s, i) => ScoredRow(math.floor(s * 4) / 4, i) }
      val reference = data.sortBy(r => (-r.score, r.id)).take(3)
      // fold in arbitrary partition splits, merge in reverse order
      val chunks = if (data.isEmpty) Seq(Seq.empty[ScoredRow])
        else data.grouped(math.max(1, data.length / splits)).toSeq
      val buffers = chunks.map(_.foldLeft(agg.zero)(agg.reduce))
      val merged = buffers.reverse.foldLeft(agg.zero)(agg.merge)
      agg.finish(merged) == reference
    }

  property("md5 minhash: 8 mins of the reference hex-slice definition") =
    forAll(Gen.listOf(Gen.frequency(
      8 -> Gen.alphaNumStr, 2 -> str).suchThat(_.nonEmpty))) { shingles =>
      val arr = new GenericArrayData(
        shingles.map(t => UTF8String.fromString(t): Any).toArray)
      val out = graft.expressions.Md5MinHashOps.signature(arr)
      def ref(p: Int): Long = shingles.map { sh =>
        val hex = java.security.MessageDigest.getInstance("MD5")
          .digest(s"${p / 2}:$sh".getBytes("UTF-8"))
          .map("%02x".format(_)).mkString
        java.lang.Long.parseLong(hex.substring(15 * (p % 2), 15 * (p % 2) + 15), 16)
      }.min
      if (shingles.isEmpty) out.numElements() == 0
      else (0 until 8).forall(p => out.getLong(p) == ref(p))
    }
}

/** Round-6 invariants: exact money arithmetic is order-independent and
  * the Arrow-IPC serve layer round-trips arbitrary rows. */
object ExactnessProps extends Properties("Exactness") {

  // cents in [1, 10^7], rate-hundredths in [0, 10]: the fixture's domain
  private val moneyRow: Gen[(Long, Long)] = for {
    cents <- Gen.chooseNum(1L, 10000000L)
    d100 <- Gen.chooseNum(0L, 10L)
  } yield (cents, d100)

  property("integer unit-sums are permutation-invariant (the float sum is not)") =
    forAll(Gen.listOfN(50, moneyRow)) { rows =>
      val units = rows.map { case (c, d) => c * (100L - d) }
      val shuffled = scala.util.Random.shuffle(units)
      units.sum == shuffled.sum &&
        units.foldLeft(0L)(_ + _) == units.reverse.foldLeft(0L)(_ + _)
    }

  property("cents rounding of unit sums: (s+50) div 100 == round half-up") =
    forAll(Gen.chooseNum(0L, 1000000000L)) { s =>
      val cents = (s + 50L) / 100L
      val expect = math.round(s / 100.0)
      cents == expect
    }
}

/** Arrow IPC serve roundtrip over random typed rows. */
object FlightServeProps extends Properties("FlightServe") {
  import graft.engine.{FlightServe, StreamStore}

  private val row: Gen[Row] = for {
    s <- Gen.alphaNumStr.map(_.take(12))
    l <- Gen.chooseNum(Long.MinValue + 1, Long.MaxValue)
    d <- Gen.chooseNum(-1e6, 1e6)
    b <- Gen.oneOf(true, false)
    nullStr <- Gen.oneOf(true, false)
  } yield Row(if (nullStr) null else s, l, d, b)

  private val schema = StructType(Seq(
    StructField("s", StringType), StructField("l", LongType),
    StructField("d", DoubleType), StructField("b", BooleanType)))

  property("doGet IPC bytes decode back to the exact appended rows") =
    forAll(Gen.listOfN(17, row)) { rows =>
      val st = new StreamStore()
      st.append("t", schema, rows.take(9))
      st.append("t", schema, rows.drop(9))
      val (_, batches) = FlightServe.readIpc(FlightServe.doGet(st, "t").get)
      val got = batches.flatten
      got.size == rows.size && rows.zip(got).forall { case (r, g) =>
        (Option(r.get(0)).map(_.toString) == Option(g(0)).map(_.toString)) &&
          r.get(1) == g(1) && r.get(2) == g(2) && r.get(3) == g(3)
      }
    }
}

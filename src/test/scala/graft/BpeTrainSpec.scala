package graft

import graft.engine.{Tables, TextOps}
import org.apache.spark.sql.functions._

/** In-JVM reference replay for the BPE trainer. The DuckDB
  * differential can't catch SHARED generated-construct bugs (both
  * engines evaluate the same wrong template — observed during
  * development: a merge pattern with a single `|` between symbols
  * never matched the `||` boundary, so NO merge ever applied and both
  * engines happily agreed on compression_ratio = 1.0 forever). This
  * spec replays the full training loop with an independent
  * array-based streaming implementation and requires every step's
  * chosen pair, weighted count, vocabulary stats, and compression to
  * match exactly. */
class BpeTrainSpec extends SparkSuite {

  /** Reference BPE: symbols as Vector[String], left-to-right
    * non-overlapping merge, freq-weighted pair counts, (n desc, pa
    * asc, pb asc) tie-break — no string encodings anywhere. */
  private def refTrain(vocab: Map[String, Long], k: Int)
      : Seq[(Int, String, Long, Long, Long)] = {
    var syms: Map[String, (Vector[String], Long)] =
      vocab.map { case (w, f) => w -> (w.map(_.toString).toVector, f) }
    (1 to k).map { step =>
      val counts = scala.collection.mutable.Map[(String, String), Long]()
      syms.values.foreach { case (v, f) =>
        v.indices.dropRight(1).foreach { i =>
          val p = (v(i), v(i + 1))
          counts(p) = counts.getOrElse(p, 0L) + f
        }
      }
      val ((pa, pb), n) = counts.toSeq
        .sortBy { case ((a, b), c) => (-c, a, b) }.head
      def applyMerge(v: Vector[String]): Vector[String] = {
        val out = Vector.newBuilder[String]
        var i = 0
        while (i < v.length) {
          if (i + 1 < v.length && v(i) == pa && v(i + 1) == pb) {
            out += (pa + pb); i += 2
          } else { out += v(i); i += 1 }
        }
        out.result()
      }
      syms = syms.map { case (w, (v, f)) => w -> (applyMerge(v), f) }
      val tokensTotal = syms.values.map { case (v, f) => v.length * f }.sum
      val nSymbols = syms.values.flatMap(_._1).toSet.size.toLong
      (step, pa + pb, n, nSymbols, tokensTotal)
    }
  }

  test("q_bpe_train: every step matches the in-JVM reference trainer exactly") {
    val vocab = Tables.documents(spark, sf)
      .select(explode(split(trim(col("text")), "\\s+")).as("w"))
      .filter(col("w").rlike("^[a-z]+$"))
      .groupBy("w").agg(count(lit(1)).as("f"))
      .collect().map(r => r.getAs[String]("w") -> r.getAs[Long]("f")).toMap
    val expected = refTrain(vocab, 8)
    val charsTotal = vocab.map { case (w, f) => w.length * f }.sum
    val got = TextOps.qBpeTrain(spark, sf).collect()
    assert(got.length == 8)
    got.sortBy(_.getAs[Long]("step")).zip(expected).foreach {
      case (r, (step, pair, n, nSym, tok)) =>
        assert(r.getAs[Long]("step") == step.toLong)
        assert(r.getAs[String]("merge_pair") == pair,
          s"step $step chose ${r.getAs[String]("merge_pair")}, reference chose $pair")
        assert(r.getAs[Long]("pair_n") == n, s"step $step count")
        assert(r.getAs[Long]("n_symbols") == nSym, s"step $step vocab size")
        assert(r.getAs[Long]("tokens_total") == tok, s"step $step tokens")
        assert(r.getAs[Double]("compression_ratio") ==
          math.floor(tok.toDouble / charsTotal * 10000.0 + 0.5) / 10000.0,
          s"step $step compression")
    }
    // the trainer must actually compress: monotone non-increasing
    // token totals, strictly below 1.0 by the final step
    val toks = expected.map(_._5)
    assert(toks.zip(toks.tail).forall { case (a, b) => b <= a })
    assert(toks.last < charsTotal, "8 merges must beat character-level")
  }

  test("q_bpe_train: multi-char merges appear (later steps build on earlier symbols)") {
    val got = TextOps.qBpeTrain(spark, sf).collect()
    assert(got.exists(_.getAs[String]("merge_pair").length > 2),
      "with 8 merges at least one chosen pair must involve a previously-merged symbol")
  }
}

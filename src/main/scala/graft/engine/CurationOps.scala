package graft.engine

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus-curation operators for a training-data pipeline: vocabulary
  * construction, length histograms, class re-weighting, and
  * dictionary encoding. The north star (BASELINE.json) asks for the
  * data-prep surface the reference's read-only gateway lacks —
  * these are the steps between "buffered documents" and "training
  * shards".
  *
  * Scale notes inline; the common trick is that every global sort or
  * window here runs on a bounded aggregate (vocab top-k, bucket
  * table, dimension table), never on raw rows.
  */
object CurationOps {
  import Tables._

  /** Tokenizer shared by vocab/length ops — whitespace split of
    * trimmed text, matching DuckDB's regexp_split_to_array. */
  private def toks = split(trim(col("text")), "\\s+")

  /** Vocabulary build: top-200 terms by corpus frequency with dense
    * ids and cumulative coverage. The global ORDER BY ... LIMIT is a
    * distributed top-k (TakeOrderedAndProject — per-partition heaps,
    * never a full sort), so the id-assigning window runs on 200 rows;
    * the total-token count rides along as a broadcast scalar. */
  def qVocabBuild(s: SparkSession, d: String): DataFrame = {
    val terms = documents(s, d)
      .select(explode(toks).as("term"))
    val counts = terms.groupBy("term").agg(count(lit(1)).as("n"))
    val total = counts.agg(sum("n").cast("double").as("total"))
    val top = counts.orderBy(col("n").desc, col("term")).limit(200)
    val w = Window.orderBy(col("n").desc, col("term"))
    top
      .withColumn("term_id", row_number().over(w).cast("long"))
      .crossJoin(broadcast(total))
      .withColumn("cum_share",
        round(sum("n").over(w.rowsBetween(Window.unboundedPreceding, 0)) /
          col("total"), 4))
      .select("term_id", "term", "n", "cum_share")
      .orderBy("term_id")
  }

  /** Power-of-2 token-length histogram: bucket = ⌊log₂ n_tokens⌋
    * computed EXACTLY as binary-digit count (floating log₂ mis-floors
    * at exact powers of two), with per-bucket doc share — the shape
    * a sequence-length-aware batch packer reads first. */
  def qLengthBuckets(s: SparkSession, d: String): DataFrame = {
    val n = documents(s, d)
      .select(size(toks).cast("long").as("n_tok"))
      .filter(col("n_tok") >= 1)
    val all = n.agg(count(lit(1)).cast("double").as("n_total"))
    n.groupBy((length(bin(col("n_tok"))) - 1).cast("long").as("bucket"))
      .agg(count(lit(1)).as("n_docs"),
        min("n_tok").as("min_tok"), max("n_tok").as("max_tok"),
        round(avg("n_tok"), 2).as("avg_tok"))
      .crossJoin(broadcast(all))
      .withColumn("share", round(col("n_docs") / col("n_total"), 4))
      .select("bucket", "n_docs", "min_tok", "max_tok", "avg_tok", "share")
      .orderBy("bucket")
  }

  /** Class re-weighting for an imbalanced label (lang): inverse-
    * frequency weight total/(k·n_c) and the class-balanced
    * "effective number of samples" weight (1−β)/(1−βⁿ), β=0.999.
    * One tiny aggregate + arithmetic — the sampler multiplies these
    * against per-row sampling rates downstream. */
  def qClassWeights(s: SparkSession, d: String): DataFrame = {
    val c = documents(s, d).groupBy("lang").agg(count(lit(1)).as("n_docs"))
    val tot = c.agg(sum("n_docs").cast("double").as("total"),
      count(lit(1)).cast("double").as("k"))
    c.crossJoin(broadcast(tot))
      .select(col("lang"), col("n_docs"),
        round(col("total") / (col("k") * col("n_docs")), 4).as("inv_freq_w"),
        round((lit(1.0) - lit(0.999)) /
          (lit(1.0) - pow(lit(0.999), col("n_docs"))), 6).as("cb_w"))
      .orderBy("lang")
  }

  /** Dictionary-encode the low-cardinality columns (source, lang)
    * into dense int codes: each dimension is a distinct-scan sorted
    * once (dim-cardinality-sized), then broadcast-joined back — the
    * id-assignment step of building a feature store / star schema
    * from a flat corpus. Codes are 1-based in lexicographic order so
    * DuckDB's dense_rank reproduces them. */
  def qDictEncode(s: SparkSession, d: String): DataFrame = {
    def dim(c: String): DataFrame =
      documents(s, d).select(c).distinct()
        .withColumn(s"${c}_code",
          row_number().over(Window.orderBy(col(c))).cast("long"))
    documents(s, d)
      .select("doc_id", "source", "lang")
      .join(broadcast(dim("source")), "source")
      .join(broadcast(dim("lang")), "lang")
      .select("doc_id", "source", "source_code", "lang", "lang_code")
      .orderBy("doc_id")
  }
}

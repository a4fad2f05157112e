package graft.engine

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
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

  /** Pointwise mutual information for bigram collocations: PMI =
    * ln(P(ab) / (P(a)·P(b))) with unigram/bigram counts from one
    * tokenize pass each, unigram marginals shuffle-joined onto the
    * bigram table twice on their word keys (the unigram table is
    * vocabulary-sized — broadcasting it would OOM at 100 TB; AQE
    * still broadcasts when it genuinely fits). Only the two 1-row
    * totals are broadcast. Min support 5 keeps noise out; ORDER BY uses the
    * ROUNDED score (ties broken by bigram) so both engines sort
    * identically. The collocation detector a tokenizer-merge step
    * (BPE-ish) runs over a corpus. */
  def qPmi(s: SparkSession, d: String): DataFrame = {
    val tok = documents(s, d).select(toks.as("ts"))
    // r15 note: checkpointing uni/bi was measured SLOWER (0.83 ->
    // 0.94 s) — the bigram table is near-corpus-sized and its eager
    // materialization beats the re-tokenize it saves
    val uni = tok.select(explode(col("ts")).as("w"))
      .groupBy("w").agg(count(lit(1)).as("c"))
    val nUni = uni.agg(sum("c").cast("double").as("n_uni"))
    val bi = tok
      .select(explode(zip_with(
        slice(col("ts"), lit(1), greatest(size(col("ts")) - 1, lit(0))),
        slice(col("ts"), lit(2), greatest(size(col("ts")) - 1, lit(0))),
        (a, b) => struct(a.as("w1"), b.as("w2")))).as("p"))
      .select(col("p.w1"), col("p.w2"))
      .groupBy("w1", "w2").agg(count(lit(1)).as("c_ab"))
    val nBi = bi.agg(sum("c_ab").cast("double").as("n_bi"))
    bi.filter(col("c_ab") >= 5)
      .join(uni.toDF("w1", "c_a"), "w1")
      .join(uni.toDF("w2", "c_b"), "w2")
      .crossJoin(broadcast(nUni)).crossJoin(broadcast(nBi))
      .select(
        concat_ws(" ", col("w1"), col("w2")).as("bigram"),
        col("c_ab"),
        round(log((col("c_ab") / col("n_bi")) /
          ((col("c_a") / col("n_uni")) * (col("c_b") / col("n_uni")))), 4)
          .as("pmi"))
      .orderBy(col("pmi").desc, col("bigram"))
      .limit(30)
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

  /** Term drift between two corpus halves (doc_id parity): smoothed
    * log-ratio of term frequencies — the distribution-shift screen a
    * training pipeline runs between crawl snapshots before mixing
    * them. One tokenize+explode, one term aggregate with BOTH halves
    * as conditional sums (no self-join of the corpus), 1-row totals
    * broadcast; top-30 movers by |drift|. */
  def qTermDrift(s: SparkSession, d: String): DataFrame = {
    val tok = documents(s, d)
      .select((col("doc_id") % 2 === 0).as("half_a"), explode(toks).as("w"))
    val freq = tok.groupBy("w").agg(
      sum(when(col("half_a"), 1L).otherwise(0L)).as("c_a"),
      sum(when(!col("half_a"), 1L).otherwise(0L)).as("c_b"))
    val totals = freq.agg(
      sum("c_a").cast("double").as("n_a"), sum("c_b").cast("double").as("n_b"))
    freq.filter(col("c_a") + col("c_b") >= 10)
      .crossJoin(broadcast(totals))
      .select(col("w").as("term"), col("c_a"), col("c_b"),
        round(log(((col("c_a") + 1.0) / (col("n_a") + 1.0)) /
                  ((col("c_b") + 1.0) / (col("n_b") + 1.0))), 4).as("drift"))
      .orderBy(abs(col("drift")).desc, col("term"))
      .limit(30)
  }

  /** Repetition score (the Gopher/MassiveText "repeated n-gram"
    * quality rule): per document, the fraction of word-trigram
    * occurrences that are duplicates — 1 − distinct/total. High
    * scores flag boilerplate/spam for the corpus filter. Pure
    * per-document HOF arithmetic (one narrow projection, no explode,
    * no shuffle); floor-rounded ratio so both engines agree at the
    * x.xxx5 boundary. */
  def qRepetitionScore(s: SparkSession, d: String): DataFrame = {
    def r4(x: Column): Column = floor(x * 10000.0 + 0.5) / 10000.0
    val ts = toks
    val n = greatest(size(ts) - 2, lit(0))
    val grams = zip_with(
      slice(ts, lit(1), greatest(size(ts) - 2, lit(1))),
      zip_with(
        slice(ts, lit(2), greatest(size(ts) - 2, lit(1))),
        slice(ts, lit(3), greatest(size(ts) - 2, lit(1))),
        (b, c) => concat_ws(" ", b, c)),
      (a, bc) => concat_ws(" ", a, bc))
    documents(s, d)
      .select(col("doc_id"), n.cast("long").as("n_trigrams"),
        size(array_distinct(grams)).cast("long").as("n_distinct"))
      .filter(col("n_trigrams") > 0)
      .withColumn("repetition",
        r4(lit(1.0) - col("n_distinct").cast("double") / col("n_trigrams")))
      .orderBy("doc_id")
  }

  /** Character-class distribution per language: alpha / digit /
    * whitespace / symbol shares of the corpus text — the
    * symbol-to-word family of quality rules, aggregated per lang in
    * ONE conditional regexp-count scan. */
  def qCharDist(s: SparkSession, d: String): DataFrame = {
    def r4(x: Column): Column = floor(x * 10000.0 + 0.5) / 10000.0
    documents(s, d)
      .select(col("lang"),
        length(col("text")).cast("long").as("n_chars"),
        regexp_count(col("text"), lit("[A-Za-z]")).cast("long").as("alpha"),
        regexp_count(col("text"), lit("[0-9]")).cast("long").as("digit"),
        regexp_count(col("text"), lit("\\s")).cast("long").as("ws"))
      .groupBy("lang")
      .agg(sum("n_chars").as("n_chars"), sum("alpha").as("n_alpha"),
        sum("digit").as("n_digit"), sum("ws").as("n_ws"))
      .select(col("lang"), col("n_chars"),
        r4(col("n_alpha") / col("n_chars")).as("alpha_share"),
        r4(col("n_digit") / col("n_chars")).as("digit_share"),
        r4(col("n_ws") / col("n_chars")).as("ws_share"),
        r4((col("n_chars") - col("n_alpha") - col("n_digit") - col("n_ws"))
          / col("n_chars")).as("symbol_share"))
      .orderBy("lang")
  }

  /** Training-mix sampling weights: given a target language mix
    * (uniform here), the per-doc sampling weight that reshapes the
    * corpus to it — weight = target_share / actual_share, the number
    * a mixture sampler multiplies into per-row keep probabilities.
    * One lang-cardinality aggregate + a 1-row broadcast; expected
    * post-mix share ride along as the sanity column. */
  def qMixWeights(s: SparkSession, d: String): DataFrame = {
    def r4(x: Column): Column = floor(x * 10000.0 + 0.5) / 10000.0
    val byLang = documents(s, d).groupBy("lang").agg(count(lit(1)).as("n_docs"))
    val tot = byLang.agg(sum("n_docs").cast("double").as("total"),
      count(lit(1)).cast("double").as("k"))
    byLang.crossJoin(broadcast(tot))
      .select(col("lang"), col("n_docs"),
        r4(col("n_docs") / col("total")).as("actual_share"),
        r4(lit(1.0) / col("k")).as("target_share"),
        r4((lit(1.0) / col("k")) / (col("n_docs") / col("total"))).as("weight"))
      .orderBy("lang")
  }

  /** Temperature-scaled sampling weights toward a FLATTENED language
    * mix (the multilingual-pretraining rebalance of Conneau et al.,
    * "Unsupervised Cross-lingual Representation Learning at Scale":
    * sample language l with probability pₗ^α / Σ p^α). α = 0.5 makes
    * the exponent an exact IEEE sqrt. The normalizer sums the five
    * per-language terms IN ONE PINNED ORDER — the shares pivot to
    * columns via conditional aggregation and the sum is written
    * lang-alphabetically as a literal expression chain in BOTH
    * engines — because a 5-term float sum folded in aggregate order
    * would be the only nondeterminism in the query. Complements
    * qMixWeights (uniform target) with the standard temperature
    * interpolation between natural and uniform. */
  def qTemperatureSampling(s: SparkSession, d: String): DataFrame = {
    def r6(x: Column): Column = floor(x * 1e6 + 0.5) / 1e6
    val byLang = documents(s, d).groupBy("lang").agg(count(lit(1)).as("n_docs"))
    val piv = byLang.agg(
      sum("n_docs").as("total"),
      sum(when(col("lang") === "de", col("n_docs")).otherwise(0L)).as("n_de"),
      sum(when(col("lang") === "en", col("n_docs")).otherwise(0L)).as("n_en"),
      sum(when(col("lang") === "es", col("n_docs")).otherwise(0L)).as("n_es"),
      sum(when(col("lang") === "fr", col("n_docs")).otherwise(0L)).as("n_fr"),
      sum(when(col("lang") === "zh", col("n_docs")).otherwise(0L)).as("n_zh"))
    def sh(c: String) = sqrt(col(c) / col("total").cast("double"))
    val denom = piv.select((sh("n_de") + sh("n_en") + sh("n_es") +
      sh("n_fr") + sh("n_zh")).as("denom"), col("total"))
    byLang.crossJoin(broadcast(denom))
      .select(col("lang"), col("n_docs"),
        r6(col("n_docs") / col("total").cast("double")).as("p_natural"),
        r6(sqrt(col("n_docs") / col("total").cast("double")) / col("denom"))
          .as("p_sampled"),
        r6(sqrt(col("n_docs") / col("total").cast("double")) / col("denom")
          / (col("n_docs") / col("total").cast("double"))).as("boost"))
      .orderBy("lang")
  }

  /** Simpson diversity of SOURCES within each language — the
    * concentration check a corpus release runs next to its language
    * mix (a language whose documents all come from one source is a
    * contamination/bias risk however large it is). Simpson's
    * λ = Σ n_s(n_s−1) / (N(N−1)) is an EXACT RATIONAL of integer
    * counts (the unbiased finite-sample form), D = 1 − λ its
    * diversity; effective source count 1/λ is the only other float.
    * One two-key aggregate to a |lang|×|source| table. */
  def qSimpsonDiversity(s: SparkSession, d: String): DataFrame = {
    val bySrc = documents(s, d)
      .groupBy("lang", "source").agg(count(lit(1)).as("n"))
    bySrc.groupBy("lang")
      .agg(count(lit(1)).as("n_sources"),
        sum("n").as("n_docs"),
        sum(col("n") * (col("n") - 1)).as("pairs_same"))
      .filter(col("n_docs") > 1)
      .select(col("lang"), col("n_sources"), col("n_docs"),
        (floor((lit(1.0) - col("pairs_same")
          / (col("n_docs") * (col("n_docs") - 1)).cast("double"))
          * 1e6 + 0.5) / 1e6).as("simpson_d"),
        when(col("pairs_same") > 0,
          floor((col("n_docs") * (col("n_docs") - 1)).cast("double")
            / col("pairs_same") * 1e4 + 0.5) / 1e4)
          .as("effective_sources"))
      .orderBy("lang")
  }

  /** Zipf-law slope of the term-frequency distribution: least-squares
    * fit of ln(freq) on ln(rank) over the top-200 vocabulary. A
    * healthy natural-language corpus sits near slope −1; template/
    * boilerplate-heavy corpora flatten it — a one-number corpus
    * health check. The top-k is a distributed TakeOrderedAndProject
    * (per-partition heaps), so the rank window and the closed-form
    * regression run on ≤200 rows regardless of corpus size. */
  def qZipfSlope(s: SparkSession, d: String): DataFrame = {
    val counts = documents(s, d).select(explode(toks).as("term"))
      .groupBy("term").agg(count(lit(1)).as("n"))
    val w = Window.orderBy(col("n").desc, col("term"))
    val xy = counts.orderBy(col("n").desc, col("term")).limit(200)
      .withColumn("x", log(row_number().over(w).cast("double")))
      .withColumn("y", log(col("n").cast("double")))
    val slope = (col("k") * col("sxy") - col("sx") * col("sy")) /
      (col("k") * col("sxx") - col("sx") * col("sx"))
    xy.agg(count(lit(1)).cast("double").as("k"),
        sum("x").as("sx"), sum("y").as("sy"),
        sum(col("x") * col("y")).as("sxy"),
        sum(col("x") * col("x")).as("sxx"))
      .select(col("k").cast("long").as("n_terms"),
        round(slope, 4).as("slope"),
        round((col("sy") - slope * col("sx")) / col("k"), 4).as("intercept"))
  }

  /** Per-source KL divergence of the source's unigram distribution
    * from the corpus distribution — the "is this source unlike the
    * rest" signal a mixture curator reads before re-weighting.
    * KL(s‖corpus) = Σ p_s(w)·ln(p_s(w)/p_c(w)), finite by
    * construction (every source term exists in the corpus marginal).
    * ONE tokenize pass, via the log decomposition
    * KL = (Σc·ln c − Σc·ln cc)/ns − ln ns + ln n (exact because
    * Σ p_s = 1): the (source,term) aggregate is the only corpus-sized
    * shuffle, the term marginal cc is a window sum over it, the three
    * Σ terms ride ONE per-source aggregate, and the grand total n is
    * a window over the per-source result (|sources| rows — a bounded
    * dim). No second scan, no token-level join, no vocabulary-sized
    * broadcast. */
  def qKlDivergence(s: SparkSession, d: String): DataFrame = {
    val sw = documents(s, d).select(col("source"), explode(toks).as("w"))
      .groupBy("source", "w").agg(count(lit(1)).as("c"))
    sw.withColumn("cc", sum("c").over(Window.partitionBy("w")))
      .groupBy("source")
      .agg(sum("c").as("ns"),
        sum(col("c") * log(col("c"))).as("a"),
        sum(col("c") * log(col("cc"))).as("b"))
      .withColumn("n", sum("ns").over(
        Window.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)))
      .select(col("source"), col("ns").cast("long").as("n_tokens"),
        round((col("a") - col("b")) / col("ns").cast("double") -
          log(col("ns")) + log(col("n")), 4).as("kl"))
      .orderBy("source")
  }

  /** Deterministic 16-way shard assignment by content-hash of the key
    * — the final "write the training shards" step. Hash sharding is
    * reproducible across engines, runs and partitionings (unlike
    * round-robin, which is partitioning-dependent), so a re-run of a
    * 100 TB shard job lands every doc in the same shard. Emits the
    * per-shard balance audit (docs, bytes, ratio vs ideal) a shard
    * writer checks before committing the layout. One aggregate. */
  def qShardAssign(s: SparkSession, d: String): DataFrame = {
    def r4(x: Column): Column = floor(x * 10000.0 + 0.5) / 10000.0
    val sh = documents(s, d).select(
      (conv(substring(md5(col("doc_id").cast("string")), 1, 6), 16, 10)
        .cast("long") % 16).as("shard"),
      col("n_chars"))
    val tot = sh.agg(count(lit(1)).cast("double").as("n"))
    sh.groupBy("shard")
      .agg(count(lit(1)).as("n_docs"),
        sum("n_chars").cast("long").as("total_chars"))
      .crossJoin(broadcast(tot))
      .select(col("shard"), col("n_docs"), col("total_chars"),
        r4(col("n_docs") / (col("n") / 16.0)).as("balance"))
      .orderBy("shard")
  }

  /** Deterministic k-fold cross-validation split with a per-(fold,
    * lang) stratification audit: fold = content-hash mod 5, so the
    * assignment survives re-partitioning and re-runs, and the audit
    * shows whether any fold is language-skewed enough to bias eval.
    * Same scale shape as qShardAssign: one projection, one bounded
    * aggregate (5 folds × |langs| rows). */
  def qCrossvalFolds(s: SparkSession, d: String): DataFrame =
    documents(s, d)
      .select(
        (conv(substring(md5(col("doc_id").cast("string")), 1, 2), 16, 10)
          .cast("long") % 5).as("fold"),
        col("lang"))
      .groupBy("fold", "lang")
      .agg(count(lit(1)).as("n_docs"))
      .orderBy("fold", "lang")

  /** Out-of-vocabulary rate per document against the corpus top-1000
    * vocabulary — the tokenizer-coverage gate run before committing a
    * vocab (a doc family with high OOV is about to be shredded into
    * UNK tokens). The vocab is a top-k bounded by a CONSTANT, so
    * broadcasting it is size-safe at any corpus scale (unlike the
    * full-vocabulary broadcasts removed in round 6); the corpus-sized
    * work is one tokenize-explode plus a map-side broadcast probe and
    * one doc-key aggregate. */
  def qOovRate(s: SparkSession, d: String): DataFrame = {
    def r4(x: Column): Column = floor(x * 10000.0 + 0.5) / 10000.0
    val vocab = documents(s, d)
      .select(explode(toks).as("term"))
      .groupBy("term").agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("term")).limit(1000)
      .select("term").withColumn("in_vocab", lit(1))
    documents(s, d)
      .select(col("doc_id"), explode(toks).as("term"))
      .join(broadcast(vocab), Seq("term"), "left")
      .groupBy("doc_id")
      .agg(
        count(lit(1)).as("n_tokens"),
        sum(when(col("in_vocab").isNull, 1L).otherwise(0L)).as("n_oov"))
      .withColumn("oov_rate", r4(col("n_oov") / col("n_tokens").cast("double")))
      .orderBy("doc_id")
  }

  /** Deterministic negative sampling for contrastive training pairs:
    * each document draws 3 pseudo-random partners via a content-free
    * hash of (doc_id, draw) mapped into the id domain, stepping past
    * an accidental self-pair. Hash-derived draws are the trick that
    * makes the sample reproducible across re-runs, engines, and
    * partitionings (same reason qShardAssign/qCrossvalFolds hash):
    * no RNG state, no driver loop — one projection, one fan-out of
    * constant arity 3, one (small-domain) join to resolve the
    * partner's language for the cross-language audit flag. The id
    * domain size rides along as a broadcast 1-row scalar (no driver
    * action). */
  def qNegativeSample(s: SparkSession, d: String): DataFrame = {
    val docs = documents(s, d).select(col("doc_id"), col("lang"))
    val nDocs = docs.agg(count(lit(1)).as("n_ids"))
    val draws = docs
      .select(col("doc_id"), col("lang").as("lang_a"),
        explode(array(lit(0), lit(1), lit(2))).as("draw"))
      .crossJoin(broadcast(nDocs))
      .withColumn("h",
        conv(substring(md5(concat_ws(":", col("doc_id"), col("draw"))), 1, 14),
          16, 10).cast("long") % col("n_ids"))
      .withColumn("neg_id",
        when(col("h") === col("doc_id"), (col("h") + 1) % col("n_ids"))
          .otherwise(col("h")))
    draws
      .join(docs.select(col("doc_id").as("neg_id"), col("lang").as("lang_b")),
        "neg_id")
      .select(col("doc_id"), col("draw"), col("neg_id"),
        (col("lang_a") =!= col("lang_b")).cast("int").as("cross_lang"))
      .orderBy("doc_id", "draw")
  }

  /** Per-domain quota sampling: keep at most K documents per source,
    * chosen by DETERMINISTIC hash order (md5 of doc_id) so the
    * sample is reproducible across engines, re-runs and
    * partitionings — the standard "no domain may dominate the mix"
    * curation valve (C4/Gopher cap per registrable domain). Reported
    * per source: total, kept, and the kept-id checksum that lets a
    * downstream stage assert the exact same sample.
    *
    * Scale: the per-source row_number sorts only within each
    * source's partition (one hash shuffle on source). A pathological
    * mega-domain makes that partition large; production first
    * computes per-source counts (tiny agg), then keeps rows whose
    * hash falls under the K/n quantile of the hash space — an
    * approximate-K filter with NO window — and only exact-K's the
    * survivors. The fixture path keeps the exact window. */
  def qDomainCap(s: SparkSession, d: String): DataFrame = {
    val k = 10
    val rk = row_number().over(
      Window.partitionBy("source")
        .orderBy(md5(col("doc_id").cast("string")), col("doc_id")))
    documents(s, d)
      .select(col("source"), col("doc_id"))
      .withColumn("rk", rk)
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("rk") <= k, 1L).otherwise(0L)).as("n_kept"),
        sum(when(col("rk") <= k, col("doc_id"))).as("kept_id_sum"))
      .orderBy("source")
  }

  /** Weighted sampling without replacement, Efraimidis–Spirakis
    * exponential-clocks form: each document draws key = −ln(u)/w
    * (u a deterministic md5 uniform, w = n_chars), and the 50
    * smallest keys ARE a weighted sample without replacement —
    * length-biased here, the "sample long documents preferentially"
    * curation knob. One projection + a distributed top-k
    * (TakeOrderedAndProject), no shuffle of the corpus, fully
    * reproducible across engines/partitionings; the final rank
    * window runs on the 50 selected rows only. */
  def qWeightedSample(s: SparkSession, d: String): DataFrame = {
    def r6(x: Column): Column = floor(x * 1e6 + 0.5) / 1e6
    val u = (conv(substring(md5(col("doc_id").cast("string")), 1, 8),
      16, 10).cast("double") + 0.5) / 4294967296.0
    val key = -log(u) / greatest(col("n_chars"), lit(1L)).cast("double")
    val top = documents(s, d)
      .select(col("doc_id"), col("n_chars"), key.as("k"))
      .orderBy(col("k"), col("doc_id"))
      .limit(50)
    top
      .withColumn("rank", row_number().over(
        Window.orderBy(col("k"), col("doc_id"))).cast("long"))
      .select(col("rank"), col("doc_id"), col("n_chars"),
        r6(col("k") * 1000.0).as("key_x1000"))
      .orderBy("rank")
  }

  /** Dataset card: the one-row corpus summary a dataset release
    * ships with — sizes, vocabulary, language concentration, exact-
    * duplicate rate. Every input is a bounded aggregate (three
    * single-pass aggs + a 1-row top-language pick) broadcast-joined
    * into one row; nothing here grows with corpus size except the
    * map-side-combined aggregations themselves. */
  def qDatasetCard(s: SparkSession, d: String): DataFrame = {
    val docs = documents(s, d)
    val base = docs.agg(
      count(lit(1)).as("n_docs"),
      countDistinct(col("source")).as("n_sources"),
      countDistinct(col("lang")).as("n_langs"),
      countDistinct(md5(col("text"))).as("n_unique_texts"))
    val tok = docs.select(explode(toks).as("w"))
      .agg(count(lit(1)).as("n_tokens"), countDistinct("w").as("vocab_size"))
    val topLang = docs.groupBy("lang").agg(count(lit(1)).as("ln"))
      .orderBy(col("ln").desc, col("lang")).limit(1)
      .select(col("lang").as("top_lang"), col("ln").as("top_lang_n"))
    base.crossJoin(broadcast(tok)).crossJoin(broadcast(topLang))
      .select(col("n_docs"), col("n_sources"), col("n_langs"),
        col("n_tokens"), col("vocab_size"),
        round(col("n_tokens") / col("n_docs"), 4).as("mean_tokens"),
        col("top_lang"),
        round(col("top_lang_n") / col("n_docs"), 4).as("top_lang_share"),
        round(lit(1.0) - col("n_unique_texts") / col("n_docs"), 4)
          .as("dup_rate"))
  }

  /** Quality-gate funnel: how many documents survive each successive
    * curation gate (min length → word-shape → stopword floor →
    * repetition ceiling), the report that tells a pipeline owner
    * WHICH gate is eating the corpus. One projection computes all
    * gate flags per document (no shuffle), one 4-group aggregate
    * counts cumulative survivors — the gates short-circuit in one
    * pass instead of materializing four filtered copies. */
  def qQualityFunnel(s: SparkSession, d: String): DataFrame = {
    val t = toks
    val nTok = size(t)
    val meanWl = (length(regexp_replace(trim(col("text")), "\\s+", ""))
      .cast("double") / nTok)
    val stopRatio = aggregate(t, lit(0),
      (acc, w) => acc + when(w.isin("a", "the", "and", "of", "to"), 1)
        .otherwise(0)).cast("double") / nTok
    val g1 = nTok >= 20
    val g2 = g1 && meanWl >= 2.0 && meanWl <= 10.0
    val g3 = g2 && stopRatio >= 0.02
    val flags = documents(s, d).select(
      g1.cast("long").as("g1"), g2.cast("long").as("g2"),
      g3.cast("long").as("g3"), lit(1L).as("n"))
      .agg(sum("n").as("n_in"), sum("g1").as("s1"),
        sum("g2").as("s2"), sum("g3").as("s3"))
    flags.select(explode(array(
      struct(lit(1L).as("stage"), lit("min_length").as("gate"),
        col("n_in").as("n_in"), col("s1").as("n_out")),
      struct(lit(2L).as("stage"), lit("word_shape").as("gate"),
        col("s1").as("n_in"), col("s2").as("n_out")),
      struct(lit(3L).as("stage"), lit("stopword_floor").as("gate"),
        col("s2").as("n_in"), col("s3").as("n_out")))).as("x"))
      .select(col("x.stage"), col("x.gate"), col("x.n_in"), col("x.n_out"),
        round(col("x.n_out").cast("double") / col("x.n_in"), 4)
          .as("pass_rate"))
      .orderBy("stage")
  }

  /** Gopher-style per-rule quality report (Rae et al. 2021 §A1.1 /
    * C4, Raffel et al. 2020): unlike [[qQualityFunnel]]'s sequential
    * gates, each rule is evaluated INDEPENDENTLY so the report shows
    * which filters actually bite on this corpus before anyone picks
    * an AND-order. Rules: word-count bounds, mean-word-length bounds,
    * type/token-ratio floor (the repetition rule), stopword floor,
    * max-word-length cap. Every comparison is exact-integer
    * (mean-word-length and TTR are cross-multiplied, never divided),
    * so no float boundary can flap between engines. One tokenize
    * projection (split bound to a column FIRST — the lambda-slot
    * tokenizer lesson) into a lang-cardinality hash aggregate:
    * map-side combinable, one shuffle of ~5 groups at any corpus
    * size. */
  def qGopherRules(s: SparkSession, d: String): DataFrame = {
    def r4(x: Column): Column = floor(x * 10000.0 + 0.5) / 10000.0
    val stops = Seq("the", "a", "and", "of", "to", "in", "is")
    val flags = documents(s, d)
      .select(col("lang"), toks.as("t"), trim(col("text")).as("txt"))
      .select(
        col("lang"),
        size(col("t")).cast("long").as("n"),
        length(regexp_replace(col("txt"), "\\s+", "")).cast("long").as("wchars"),
        size(array_distinct(col("t"))).cast("long").as("ndistinct"),
        size(filter(col("t"), w => w.isin(stops: _*))).cast("long").as("nstop"),
        array_max(transform(col("t"), w => length(w))).cast("long").as("maxwl"))
      .select(
        col("lang"),
        (col("n") >= 30 && col("n") <= 90).cast("long").as("r1"),
        (col("wchars") >= lit(3L) * col("n") &&
          col("wchars") <= lit(10L) * col("n")).cast("long").as("r2"),
        (lit(2L) * col("ndistinct") >= col("n")).cast("long").as("r3"),
        (col("nstop") >= 2).cast("long").as("r4"),
        (col("maxwl") <= 15).cast("long").as("r5"))
    flags
      .groupBy("lang")
      .agg(
        count(lit(1)).as("n_docs"),
        sum("r1").as("word_count_pass"),
        sum("r2").as("mean_word_len_pass"),
        sum("r3").as("ttr_pass"),
        sum("r4").as("stopword_pass"),
        sum("r5").as("max_word_len_pass"),
        sum(col("r1") * col("r2") * col("r3") * col("r4") * col("r5"))
          .as("all_pass"))
      .withColumn("keep_rate", r4(col("all_pass") / col("n_docs").cast("double")))
      .orderBy("lang")
  }

  /** URL canonicalization dedup — the FIRST dedup stage of every web
    * crawl pipeline (CCNet, RefinedWeb): raw URLs differ by host
    * case, tracking parameters, fragments and trailing slashes while
    * naming the same resource. Raw URLs are synthesized
    * deterministically from event columns (the qUrlParse convention),
    * then canonicalized with Spark's dedicated `parse_url`
    * (lowercased host, trailing-slash-stripped path, whitelisted
    * query params only, fragment dropped); the oracle re-derives the
    * canonical form with REGEXES — two independent URL
    * implementations checked against each other. Grouping is by
    * canonical URL (bounded: type × id-bucket domain); the
    * distinct-raw-variant count inside each group is exact. At crawl
    * scale this is one hash aggregate on the canonical key — the
    * cheap stage that removes ~40% of a crawl before any content
    * hashing runs. */
  def qUrlDedup(s: SparkSession, d: String): DataFrame = {
    val raw = events(s, d).select(
      col("event_id"), col("user_id"), col("event_type"),
      concat(
        lit("https://"),
        when(col("event_id") % 2 === 0, lit("Shop.Example.COM"))
          .otherwise(lit("shop.example.com")),
        lit("/p/"), col("event_type"),
        when(col("event_id") % 3 === 0, lit("/")).otherwise(lit("")),
        lit("?id="), (col("user_id") % 50).cast("string"),
        when(col("event_id") % 4 === 0, lit("&utm_source=mail&utm_campaign=x"))
          .otherwise(lit("")),
        when(col("event_id") % 5 === 0, lit("#frag")).otherwise(lit("")))
        .as("url"))
    raw
      .select(col("url"),
        concat(
          lit("https://"), lower(parse_url(col("url"), lit("HOST"))),
          rtrim(parse_url(col("url"), lit("PATH")), "/"),
          lit("?id="), parse_url(col("url"), lit("QUERY"), lit("id")))
          .as("canonical_url"))
      .groupBy("canonical_url")
      .agg(count(lit(1)).as("n_events"),
        countDistinct(col("url")).as("n_raw_variants"))
      .orderBy("canonical_url")
  }

  /** The end-to-end curation pipeline as ONE declarative plan — the
    * composition capstone: quality gate (the Gopher word-count +
    * stopword rules) → exact dedup (min doc_id per surviving text)
    * → hash shard assignment → per-(shard, lang) manifest with doc
    * and token totals. The point is that the whole chain stays a
    * single Catalyst plan: the filter is map-side before the dedup
    * shuffle, the dedup aggregate carries (doc_id, lang, tokens)
    * through one groupBy(text), the shard key is computed from the
    * kept doc — three narrow stages and two shuffles end to end, the
    * shape that holds at 100 TB because every stage prunes before
    * the next pays for it. */
  def qPipelineE2e(s: SparkSession, d: String): DataFrame = {
    val stops = Seq("the", "a", "and", "of", "to", "in", "is")
    val kept = documents(s, d)
      .select(col("doc_id"), col("lang"), col("text"), toks.as("t"))
      .select(col("doc_id"), col("lang"), col("text"),
        size(col("t")).cast("long").as("n_tok"),
        size(filter(col("t"), w => w.isin(stops: _*))).cast("long").as("n_stop"))
      .filter(col("n_tok") >= 30 && col("n_tok") <= 90 && col("n_stop") >= 2)
    kept
      .groupBy("text")
      .agg(min(struct(col("doc_id"), col("lang"), col("n_tok"))).as("keep"))
      .select(col("keep.doc_id").as("doc_id"), col("keep.lang").as("lang"),
        col("keep.n_tok").as("n_tok"))
      .withColumn("shard",
        conv(substring(md5(col("doc_id").cast("string")), 1, 6), 16, 10)
          .cast("long") % 8L)
      .groupBy("shard", "lang")
      .agg(count(lit(1)).as("n_docs"), sum("n_tok").as("n_tokens"))
      .orderBy("shard", "lang")
  }

  /** robots.txt compliance filter — the legally-load-bearing step of
    * every crawl pipeline, with the semantics people get wrong: the
    * LONGEST matching prefix rule wins (so `Allow: /p/click` beats
    * `Disallow: /p`), and no match at all defaults to allowed. URL
    * paths come from the event synthesis (with the trailing-slash
    * variant so prefix matching is exercised against both shapes);
    * the 5-rule table joins against DISTINCT paths only — the
    * verdict table is path-cardinality (bounded) and events never
    * join a rules table row-by-row at scale; the final count rides
    * the broadcast verdicts. The oracle restates the longest-prefix
    * arbitration relationally. */
  def qRobotsFilter(s: SparkSession, d: String): DataFrame = {
    val spark = s
    import spark.implicits._
    val rules = Seq(
      ("/p", 0L), ("/p/click", 1L), ("/p/purchase", 1L),
      ("/p/error", 0L), ("/static", 1L))
      .toDF("prefix", "rule_allow")
    val paths = events(s, d)
      .select(concat(lit("/p/"), col("event_type"),
        when(col("event_id") % 3 === 0, lit("/")).otherwise(lit("")))
        .as("path"))
    val verdicts = paths.distinct()
      .join(rules, col("path").startsWith(col("prefix")), "left")
      .groupBy("path")
      .agg(
        sum(col("prefix").isNotNull.cast("long")).as("n_rules_matched"),
        coalesce(
          max(struct(length(col("prefix")).as("l"), col("rule_allow").as("a")))
            .getField("a"),
          lit(1L)).as("allowed"))
    paths.join(broadcast(verdicts), "path")
      .groupBy("path", "n_rules_matched", "allowed")
      .agg(count(lit(1)).as("n_events"))
      .orderBy("path")
  }

  /** Rendezvous-hashing (HRW, Thaler & Ravishankar 1998) resize
    * audit — the measurement behind "use consistent hashing, not
    * mod-N": when the shard count grows 8 → 10, highest-random-
    * weight assignment moves ONLY the keys whose new-shard score
    * wins (~2/10 of keys, all landing on the new shards), while
    * mod-N reshuffles almost everything. Both assignments and both
    * movement counts are computed in one map-side pass — the argmax
    * is a `greatest` over score·16+shard packed integers (exact,
    * tie-free by construction since the shard id is the low bits),
    * no explode, no join — then a single global aggregate. The
    * oracle regenerates every score from the same md5 formula. */
  def qRendezvousResize(s: SparkSession, d: String): DataFrame = {
    def r4(x: Column): Column = floor(x * 10000.0 + 0.5) / 10000.0
    def score(sh: Int) =
      conv(substring(md5(concat(col("user_id").cast("string"),
        lit(":"), lit(sh.toString))), 1, 8), 16, 10).cast("long") * 16L + sh
    def hrw(n: Int) = (greatest((0 until n).map(score): _*) % 16L)
    events(s, d).select("user_id").distinct()
      .select(
        hrw(8).as("s8"), hrw(10).as("s10"),
        (col("user_id") % 8).as("m8"), (col("user_id") % 10).as("m10"))
      .agg(
        count(lit(1)).as("n_keys"),
        sum((col("s8") =!= col("s10")).cast("long")).as("hrw_moved"),
        sum((col("s10") >= 8).cast("long")).as("hrw_moved_to_new"),
        sum((col("m8") =!= col("m10")).cast("long")).as("mod_moved"))
      .select(col("n_keys"), col("hrw_moved"), col("hrw_moved_to_new"),
        r4(col("hrw_moved") / col("n_keys").cast("double")).as("hrw_moved_share"),
        col("mod_moved"),
        r4(col("mod_moved") / col("n_keys").cast("double")).as("mod_moved_share"))
  }

  /** DuckDB oracle for [[qRendezvousResize]]: every score regenerated
    * from the same md5 packing formula, GREATEST generated from the
    * same shard loop. */
  lazy val rendezvousResizeOracleSql: String = {
    def score(sh: Int) =
      s"(('0x' || substr(md5(CAST(user_id AS VARCHAR) || ':$sh'), 1, 8))::BIGINT * 16 + $sh)"
    def hrw(n: Int) =
      s"(GREATEST(${(0 until n).map(score).mkString(", ")}) % 16)"
    s"""WITH u AS (SELECT DISTINCT user_id FROM events),
       |a AS (SELECT ${hrw(8)} AS s8, ${hrw(10)} AS s10,
       |        user_id % 8 AS m8, user_id % 10 AS m10 FROM u)
       |SELECT CAST(COUNT(*) AS BIGINT) AS n_keys,
       |  CAST(SUM(CASE WHEN s8 <> s10 THEN 1 ELSE 0 END) AS BIGINT)
       |    AS hrw_moved,
       |  CAST(SUM(CASE WHEN s10 >= 8 THEN 1 ELSE 0 END) AS BIGINT)
       |    AS hrw_moved_to_new,
       |  FLOOR(SUM(CASE WHEN s8 <> s10 THEN 1 ELSE 0 END) * 1.0 / COUNT(*)
       |        * 10000.0 + 0.5) / 10000.0 AS hrw_moved_share,
       |  CAST(SUM(CASE WHEN m8 <> m10 THEN 1 ELSE 0 END) AS BIGINT)
       |    AS mod_moved,
       |  FLOOR(SUM(CASE WHEN m8 <> m10 THEN 1 ELSE 0 END) * 1.0 / COUNT(*)
       |        * 10000.0 + 0.5) / 10000.0 AS mod_moved_share
       |FROM a""".stripMargin
  }

  /** Feature-hashing (hashing-trick) collision audit (Weinberger et
    * al. 2009): before a pipeline commits to hashing its vocabulary
    * into 2^k buckets instead of materializing a dictionary, it
    * measures how much signal the collisions destroy. Every distinct
    * token hashes (md5 → first 8 hex digits → mod 1024) to a bucket;
    * the report is the bucket-LOAD histogram — for each load L (L
    * distinct tokens sharing a bucket): how many buckets, how many
    * token types, and how many corpus occurrences now alias each
    * other — plus the load-0 row (empty buckets) so the histogram
    * sums to exactly 1024. Vocabulary is corpus-bounded (Heaps' law)
    * but the aggregate chain is vocab → 1024 buckets → ≤ vocab
    * loads: each stage map-side combinable, nothing broadcast. */
  def qFeatureHashing(s: SparkSession, d: String): DataFrame = {
    val tf = documents(s, d)
      .select(explode(toks).as("token"))
      .groupBy("token")
      .agg(count(lit(1)).as("occ"))
      .withColumn("bucket",
        conv(substring(md5(col("token")), 1, 8), 16, 10).cast("long") % 1024L)
    val perBucket = tf.groupBy("bucket")
      .agg(count(lit(1)).as("load"), sum("occ").as("occ"))
    val loaded = perBucket.groupBy("load")
      .agg(count(lit(1)).as("n_buckets"),
        (sum("load")).as("n_token_types"),
        sum("occ").as("n_occurrences"))
    val empty = perBucket.agg(
      (lit(1024L) - count(lit(1))).as("n_buckets"))
      .select(lit(0L).as("load"), col("n_buckets"),
        lit(0L).as("n_token_types"), lit(0L).as("n_occurrences"))
    loaded.unionByName(empty).filter(col("n_buckets") > 0).orderBy("load")
  }

  /** Randomized response (Warner 1965) — the LOCAL-DP mechanism that
    * completes the privacy family (k-anonymity/l-diversity restructure,
    * central-DP Laplace release, pseudonymization; this one randomizes
    * AT THE SOURCE so the collector never holds a truthful bit): each
    * user reports their true converted-bit with p = 3/4 and the flip
    * with 1/4 (ε = ln 3 local DP), the coin derived from md5(user_id)
    * so the mechanism is reproducible and the oracle replays every
    * coin; the collector debiases with the closed form
    * π̂ = 2·r̄ − 1/2. Corpus work is one user aggregate + one scalar
    * aggregate; the estimate and truth ride together for measured
    * error. */
  def qRandomizedResponse(s: SparkSession, d: String): DataFrame = {
    def r4(x: Column): Column = floor(x * 10000.0 + 0.5) / 10000.0
    val u = Tables.events(s, d).groupBy("user_id")
      .agg(max(when(col("event_type") === "purchase", 1L).otherwise(0L))
        .as("truth"))
    val coin = conv(substring(md5(concat(col("user_id").cast("string"),
      lit(":rr"))), 1, 8), 16, 10).cast("long") % 4
    u.withColumn("report",
        when(coin < 3, col("truth")).otherwise(lit(1L) - col("truth")))
      .agg(count(lit(1)).as("n_users"), sum("truth").as("n_true"),
        sum("report").as("n_reported"))
      .withColumn("true_rate", r4(col("n_true") / col("n_users").cast("double")))
      .withColumn("est_rate",
        r4(lit(2.0) * col("n_reported") / col("n_users") - 0.5))
  }

  /** DuckDB oracle for [[qRandomizedResponse]]: every md5 coin
    * replayed, the same debias arithmetic. */
  val randomizedResponseOracleSql: String =
    """WITH u AS (SELECT user_id,
      |    MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS truth
      |  FROM events GROUP BY user_id),
      |r AS (SELECT user_id, truth,
      |    CASE WHEN ('0x' || substr(md5(CAST(user_id AS VARCHAR) || ':rr'), 1, 8))::BIGINT
      |              % 4 < 3
      |         THEN truth ELSE 1 - truth END AS report
      |  FROM u)
      |SELECT CAST(COUNT(*) AS BIGINT) AS n_users,
      |       CAST(SUM(truth) AS BIGINT) AS n_true,
      |       CAST(SUM(report) AS BIGINT) AS n_reported,
      |       FLOOR(SUM(truth) / CAST(COUNT(*) AS DOUBLE) * 10000.0 + 0.5)
      |         / 10000.0 AS true_rate,
      |       FLOOR((2.0 * SUM(report) / COUNT(*) - 0.5) * 10000.0 + 0.5)
      |         / 10000.0 AS est_rate
      |FROM r""".stripMargin

  /** DSIR — Data Selection via Importance Resampling (Xie et al.
    * 2023), the modern pretraining-curation selector: score every raw
    * document by how target-like its hashed n-gram distribution is,
    * then sample with Gumbel-top-k so selection is importance
    * RESAMPLING rather than greedy thresholding (greedy top-k
    * saturates on near-identical highest-weight docs; the Gumbel
    * noise makes inclusion probability proportional to the
    * importance weight — the paper's key move). Mechanics here:
    * tokens hash into m = 64 buckets (the hashing trick — the model
    * is m numbers, never a vocabulary), bag-of-hashed-tokens unigram
    * models fit on target (lang = 'en') and raw (all docs) with
    * add-one smoothing, and the per-doc log importance weight is
    * Σ_b c_b(doc)·(ln p̂_t(b) − ln p̂_r(b)) in the micro-nat
    * fixed-point discipline (ln quantized to 1e-6 — the q_lang_id
    * pattern, so both engines land on identical longs; per-doc sums
    * are doc-length-bounded). The Gumbel key is seeded from
    * md5(doc_id) (u ∈ [1e-6, 0.999999] by construction, endpoints
    * unreachable — the q_dp_noise inverse-CDF discipline), quantized
    * to micro-units, and added to the log weight; top-200 under a
    * (key desc, doc_id) total order. Distributed shape at 100 TB:
    * one corpus tokenize, a 64-row broadcast model, one doc-keyed
    * aggregate, a distributed top-k — no vocabulary table, no
    * broadcast that grows with data. */
  def qDsirSelect(s: SparkSession, d: String): DataFrame = {
    def unats(x: Column): Column = floor(log(x) * 1e6 + 0.5).cast("long")
    val m = 64
    val b = documents(s, d)
      .select(col("doc_id"), col("lang"), explode(toks).as("w"))
      .select(col("doc_id"), col("lang"),
        (conv(substring(md5(col("w")), 1, 8), 16, 10).cast("long") % m)
          .as("bucket"))
    // ONE tokenize+hash pass: the (doc, lang, bucket) count table is
    // ≤ |docs|·m rows and every model table (raw/target/totals) and
    // the per-doc weight join are sums over it — previously each of
    // the four references re-ran the corpus tokenize+md5 (r15: 5
    // document scans -> 2)
    val dw = b.groupBy("doc_id", "lang", "bucket")
      .agg(count(lit(1)).as("cb"))
      .localCheckpoint(true)
    val raw = dw.groupBy("bucket").agg(sum("cb").as("c_r"))
    val tgt = dw.filter(col("lang") === "en")
      .groupBy("bucket").agg(sum("cb").as("c_t"))
    val tots = dw.agg(sum("cb").as("tr"),
      sum(when(col("lang") === "en", col("cb")).otherwise(0L)).as("tt"))
    val delta = s.range(m).select(col("id").as("bucket"))
      .join(raw, Seq("bucket"), "left")
      .join(tgt, Seq("bucket"), "left")
      .crossJoin(broadcast(tots))
      .select(col("bucket"),
        (unats((coalesce(col("c_t"), lit(0L)) + 1L).cast("double") /
          (col("tt") + m).cast("double")) -
         unats((coalesce(col("c_r"), lit(0L)) + 1L).cast("double") /
           (col("tr") + m).cast("double"))).as("d_u"))
    val lw = dw
      .join(broadcast(delta), "bucket")
      .groupBy("doc_id").agg(sum(col("cb") * col("d_u")).as("lw_u"))
    val u = ((conv(substring(md5(concat(col("doc_id").cast("string"),
      lit(":dsir"))), 1, 8), 16, 10).cast("long") % 999999L) + 1L)
      .cast("double") / 1e6
    documents(s, d).select(col("doc_id"), col("lang"))
      .join(lw, "doc_id")
      .withColumn("gumbel_u",
        floor(-log(-log(u)) * 1e6 + 0.5).cast("long"))
      .withColumn("key_u", col("lw_u") + col("gumbel_u"))
      .orderBy(col("key_u").desc, col("doc_id"))
      .limit(200)
      .select("doc_id", "lang", "lw_u", "gumbel_u", "key_u")
  }

  /** DuckDB oracle for [[qDsirSelect]]: identical hashed buckets,
    * smoothed micro-nat model, Gumbel seed, and total order. */
  val dsirSelectOracleSql: String =
    """WITH tok AS (SELECT doc_id, lang,
      |               UNNEST(regexp_split_to_array(trim(text), '\s+')) AS w
      |             FROM documents),
      |bk AS (SELECT doc_id, lang,
      |         ('0x' || substr(md5(w), 1, 8))::BIGINT % 64 AS bucket
      |       FROM tok),
      |raw AS (SELECT bucket, CAST(COUNT(*) AS BIGINT) AS c_r
      |        FROM bk GROUP BY 1),
      |tgt AS (SELECT bucket, CAST(COUNT(*) AS BIGINT) AS c_t
      |        FROM bk WHERE lang = 'en' GROUP BY 1),
      |tots AS (SELECT CAST(COUNT(*) AS BIGINT) AS tr,
      |                CAST(SUM(CASE WHEN lang = 'en' THEN 1 ELSE 0 END)
      |                     AS BIGINT) AS tt
      |         FROM bk),
      |grid AS (SELECT g AS bucket FROM range(64) t(g)),
      |delta AS (SELECT grid.bucket,
      |    CAST(FLOOR(ln((COALESCE(c_t, 0) + 1)
      |                  / CAST(tt + 64 AS DOUBLE)) * 1e6 + 0.5) AS BIGINT)
      |  - CAST(FLOOR(ln((COALESCE(c_r, 0) + 1)
      |                  / CAST(tr + 64 AS DOUBLE)) * 1e6 + 0.5) AS BIGINT)
      |    AS d_u
      |  FROM grid LEFT JOIN raw USING (bucket) LEFT JOIN tgt USING (bucket)
      |  CROSS JOIN tots),
      |dw AS (SELECT doc_id, bucket, CAST(COUNT(*) AS BIGINT) AS cb
      |       FROM bk GROUP BY 1, 2),
      |lw AS (SELECT doc_id, CAST(SUM(cb * d_u) AS BIGINT) AS lw_u
      |       FROM dw JOIN delta USING (bucket) GROUP BY 1),
      |keyed AS (SELECT d.doc_id, d.lang, lw.lw_u,
      |    CAST(FLOOR(-ln(-ln((('0x' || substr(md5(CAST(d.doc_id AS VARCHAR)
      |                 || ':dsir'), 1, 8))::BIGINT % 999999 + 1) / 1e6))
      |               * 1e6 + 0.5) AS BIGINT) AS gumbel_u
      |  FROM documents d JOIN lw ON lw.doc_id = d.doc_id)
      |SELECT doc_id, lang, lw_u, gumbel_u, lw_u + gumbel_u AS key_u
      |FROM keyed
      |ORDER BY key_u DESC, doc_id
      |LIMIT 200""".stripMargin
}

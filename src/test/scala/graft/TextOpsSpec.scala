package graft

import graft.engine.TextOps
import org.apache.spark.sql.functions._

/** Dedup / text-analysis operators: ground-truth recall on planted
  * duplicates plus self-similarity invariants (SURVEY.md §7.3: gate by
  * property tests since there is no SQL oracle for LSH). */
class TextOpsSpec extends SparkSuite {
  import spark.implicits._

  test("minhash: identical docs have signature-estimated jaccard 1.0") {
    val corpus = Seq((1L, "alpha beta gamma delta epsilon"),
                     (2L, "alpha beta gamma delta epsilon"))
      .toDF("doc_id", "text")
    val pairs = TextOps.minhashPairs(corpus, threshold = 0.9).collect()
    assert(pairs.length == 1)
    assert(pairs.head.getDouble(2) == 1.0)
  }

  test("minhash: disjoint docs produce no candidate pairs") {
    val corpus = Seq((1L, "aa bb cc dd ee ff gg hh"),
                     (2L, "zz yy xx ww vv uu tt ss"))
      .toDF("doc_id", "text")
    assert(TextOps.minhashPairs(corpus, threshold = 0.1).count() == 0)
  }

  test("minhash LSH recalls every planted exact duplicate at sf0.001") {
    val nDocs = graft.engine.Tables.documents(spark, sf).count()
    val pairs = TextOps.qDedupMinhash(spark, sf)
    // every original doc k must be paired with its exact copy
    // k+1000000 at j=1.0 (restrict doc_a to originals: ids ≥1000000 on
    // the left would be exact-copy-vs-near-copy pairs)
    val exact = pairs
      .filter(col("doc_a") < 1000000 &&
        col("doc_b") === col("doc_a") + 1000000 && col("jaccard") === 1.0)
      .count()
    assert(exact == nDocs)
  }

  test("simhash: identical docs at hamming 0; perturbed docs nearby") {
    val pairs = TextOps.qDedupSimhash(spark, sf)
      .filter(col("doc_a") < 1000000 && col("doc_b") === col("doc_a") + 1000000)
    assert(pairs.count() > 0)
    assert(pairs.agg(max("hamming")).head().getLong(0) == 0)
  }

  test("exact dedup halves the doubled corpus (north star)") {
    val docs = graft.engine.Tables.documents(spark, sf).count()
    val dedup = TextOps.qDedupExact(spark, sf)
    assert(dedup.count() == docs)
    assert(dedup.agg(min("n_copies"), max("n_copies")).head() ==
      org.apache.spark.sql.Row(2L, 2L))
  }

  test("token counts: whitespace and regex tokenizers on a known doc") {
    val df = Seq((1L, "Hello, world! foo bar")).toDF("doc_id", "text")
    val r = df.select(
      size(TextOps.tokens(col("text"))).as("ws"),
      regexp_count(col("text"), lit("[A-Za-z0-9]+|[^A-Za-z0-9\\s]")).as("re")).head()
    assert(r.getInt(0) == 4)  // Hello, world! foo bar
    assert(r.getInt(1) == 6)  // Hello , world ! foo bar
  }

  test("language ID predicts en for stopword-heavy english") {
    val r = TextOps.qLangId(spark, sf)
    // fixture texts are english-vocabulary word salads; the en profile
    // must dominate predictions regardless of the synthetic label
    val counts = r.groupBy("predicted_lang").count()
      .orderBy(desc("count")).head()
    assert(counts.getString(0) == "en")
  }

  test("stopword filter removes exactly the profile words") {
    val df = Seq((1L, "the quick fox and the dog")).toDF("doc_id", "text")
    val r = df.select(
      array_join(filter(TextOps.tokens(col("text")),
        t => !t.isin("the", "a", "of", "and", "to", "in", "is", "it", "for", "on")), " "))
      .head().getString(0)
    assert(r == "quick fox dog")
  }

  test("ngram freq counts a known bigram correctly") {
    val freq = TextOps.qNgramFreq(spark, sf).collect()
    assert(freq.length == 50)
    // counts are descending, ties broken by bigram text
    val ns = freq.map(_.getLong(1))
    assert(ns.sameElements(ns.sorted.reverse))
  }

  test("pii redaction scrubs every synthetic email and phone") {
    val r = TextOps.qPiiRedact(spark, sf)
    assert(r.filter(col("redacted").contains("@")).count() == 0)
    assert(r.filter(col("redacted").rlike("555-[0-9]")).count() == 0)
    assert(r.agg(min("n_pii")).head().getLong(0) >= 2)
  }

  test("sequence packing conserves tokens and respects pack order") {
    val packs = TextOps.qSequencePack(spark, sf).collect()
    val chunkTokens = TextOps.qDocChunking(spark, sf)
      .agg(sum("chunk_len")).head().getLong(0)
    assert(packs.map(_.getLong(3)).sum == chunkTokens,
      "packing must conserve total chunk tokens")
    // pack ids are dense from 0 within each source
    packs.groupBy(_.getString(0)).foreach { case (_, rows) =>
      val ids = rows.map(_.getLong(1)).sorted
      assert(ids.head == 0 && ids.last == ids.length - 1)
    }
  }

  test("fingerprints are deterministic and content-sensitive") {
    val fp1 = TextOps.qDocFingerprint(spark, sf).collect()
    val fp2 = TextOps.qDocFingerprint(spark, sf).collect()
    assert(fp1.sameElements(fp2))
    val distinct = TextOps.qDocFingerprint(spark, sf)
      .select(countDistinct("order_fp")).head().getLong(0)
    assert(distinct > fp1.length * 9 / 10) // near-unique across docs
  }
}

package graft

import graft.engine.{CurationOps, ScaleOps, Tables}
import org.apache.spark.sql.functions._

/** Invariant checks for the round-17 additions. The three-SF DuckDB
  * differential is the primary gate; these pin what hash-compare
  * can't: full in-JVM replays (shared-template bugs) and physical
  * layout facts (file counts on disk). */
class Round17OpsSpec extends SparkSuite {

  test("q_dsir_select: full in-JVM replay of the model, weights, Gumbel keys") {
    // independent third implementation: JVM md5 + math.log, no Spark
    // expressions, no SQL — pins the hashed-bucket model and the
    // seeded Gumbel recipe against both engines' shared design
    def md5hex(s: String): String = {
      val d = java.security.MessageDigest.getInstance("MD5")
      d.digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    }
    def bucket(w: String): Long =
      java.lang.Long.parseLong(md5hex(w).take(8), 16) % 64L
    def unats(x: Double): Long = math.floor(math.log(x) * 1e6 + 0.5).toLong
    val docs = Tables.documents(spark, sf)
      .select(col("doc_id"), col("lang"), col("text")).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    val toks = docs.map { case (id, lang, text) =>
      (id, lang, text.trim.split("\\s+").toSeq.map(bucket))
    }
    val cR = scala.collection.mutable.Map[Long, Long]().withDefaultValue(0L)
    val cT = scala.collection.mutable.Map[Long, Long]().withDefaultValue(0L)
    toks.foreach { case (_, lang, bs) =>
      bs.foreach { b => cR(b) += 1; if (lang == "en") cT(b) += 1 }
    }
    val tr = cR.values.sum
    val tt = cT.values.sum
    val dU = (0L until 64L).map(b => b ->
      (unats((cT(b) + 1).toDouble / (tt + 64)) -
       unats((cR(b) + 1).toDouble / (tr + 64)))).toMap
    val expected = toks.map { case (id, lang, bs) =>
      val lw = bs.map(dU).sum
      val u = ((java.lang.Long.parseLong(
        md5hex(s"$id:dsir").take(8), 16) % 999999L) + 1L).toDouble / 1e6
      val g = math.floor(-math.log(-math.log(u)) * 1e6 + 0.5).toLong
      id -> (lang, lw, g, lw + g)
    }.toMap
    val got = CurationOps.qDsirSelect(spark, sf).collect()
    assert(got.length == math.min(200, docs.length))
    // the selected SET must be the reference's own Gumbel-top-200
    val refTop = expected.toSeq
      .sortBy { case (id, (_, _, _, key)) => (-key, id) }
      .take(200).map(_._1).toSet
    assert(got.map(_.getAs[Long]("doc_id")).toSet == refTop,
      "selected set must equal the reference trainer's Gumbel-top-k")
    got.foreach { r =>
      val id = r.getAs[Long]("doc_id")
      val (lang, lw, g, key) = expected(id)
      assert(r.getAs[String]("lang") == lang)
      assert(r.getAs[Long]("lw_u") == lw, s"doc $id log-weight")
      assert(r.getAs[Long]("gumbel_u") == g, s"doc $id gumbel")
      assert(r.getAs[Long]("key_u") == key, s"doc $id key")
    }
  }

  test("q_ann_beam: visited is budget-bounded, beam never beats brute force") {
    val rows = graft.engine.VectorOps.qAnnBeam(spark, sf).collect()
    assert(rows.length == 8)
    rows.foreach { r =>
      // visited ≤ 1 + H·B·(M+1) with (M, B, H) = (8, 8, 6)
      assert(r.getAs[Long]("n_visited") <= 1 + 6 * 8 * 9, "beam budget")
      assert(r.getAs[Long]("ann_best") <= r.getAs[Long]("exact_best"),
        "an ANN result can never outscore the exact top-1")
      val nHit = r.getAs[Long]("n_hit")
      assert(nHit >= 0 && nHit <= 5)
      assert(r.getAs[Double]("recall") ==
        math.floor(nHit.toDouble / 5 * 10000.0 + 0.5) / 10000.0)
      val annTop = r.getAs[String]("ann_top").split(",")
      assert(annTop.length == annTop.distinct.length, "top-k ids unique")
    }
  }

  test("q_late_interaction: in-JVM MaxSim replay; score is the pivot sum") {
    def md5hex(s: String): String = {
      val d = java.security.MessageDigest.getInstance("MD5")
      d.digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    }
    def bits16(w: String): Long = java.lang.Long.parseLong(md5hex(w).take(4), 16)
    val qtoks = Seq("fast", "query", "stream", "vector")
    val qbits = qtoks.map(t => t -> bits16(t)).toMap
    val docs = Tables.documents(spark, sf)
      .select(col("doc_id"), col("text")).collect()
      .map(r => r.getLong(0) ->
        r.getString(1).trim.split("\\s+").toSet.map(bits16)).toMap
    val rows = graft.engine.TextOps.qLateInteraction(spark, sf).collect()
    assert(rows.length == 20)
    rows.foreach { r =>
      val id = r.getAs[Long]("doc_id")
      val perTok = qtoks.map { t =>
        t -> docs(id).map(wb =>
          16L - 2L * java.lang.Long.bitCount(qbits(t) ^ wb)).max
      }.toMap
      qtoks.foreach { t =>
        assert(r.getAs[Long](s"ms_$t") == perTok(t), s"doc $id ms_$t")
      }
      assert(r.getAs[Long]("score") == perTok.values.sum,
        s"doc $id score must equal the sum of its per-query-token maxes")
    }
  }

  test("q_unigram_train: backtrace reconstructs the string at exactly the Viterbi cost; longest-wins ties") {
    import graft.engine.TextOps
    val pieces = TextOps.UnigramPieces
      .map { case (p, c) => (p, p.length, c.toLong) }.toArray
    val costs = TextOps.UnigramPieces.toMap
    Tables.documents(spark, sf)
      .select(translate(trim(col("text")), " ", "").as("sq"))
      .filter(length(col("sq")) >= TextOps.UnigramPrefixLen)
      .select(substring(col("sq"), 1, TextOps.UnigramPrefixLen))
      .collect().map(_.getString(0)).take(50).foreach { str =>
      val steps = TextOps.unigramViterbiSteps(str, pieces)
      // steps tile the string exactly (reversed order: backtrace walks right→left)
      val lens = steps.map(p => if (p == "<char>") 1 else p.length)
      assert(lens.sum == str.length, s"steps must tile '$str'")
      var pos = str.length
      steps.foreach { p =>
        if (p != "<char>") {
          assert(str.regionMatches(pos - p.length, p, 0, p.length),
            s"step $p must match '$str' ending at $pos")
        }
        pos -= (if (p == "<char>") 1 else p.length)
      }
      // step costs sum to the DP minimum — argmin is genuinely optimal
      val stepCost = steps.map(p =>
        if (p == "<char>") TextOps.UnigramCharCost.toLong
        else costs(p).toLong).sum
      assert(stepCost == TextOps.unigramSegmentCosts(str, pieces)._1,
        s"backtrace cost must equal Viterbi min for '$str'")
    }
    // crafted exact tie: piece 'ab' at cost 22 == char+char (11+11);
    // the longest-achieving-piece rule must pick the piece
    val tiePieces = Array(("ab", 2, 22L))
    assert(TextOps.unigramViterbiSteps("ab", tiePieces) == Seq("ab"),
      "cost tie between a piece and char-fallback must resolve longest-first")
  }

  test("store runtime filtering: zone check plans exactly the matching batches") {
    import graft.engine.StreamStore
    import graft.sources.{GraftScan, GraftStoreRegistry, GraftScanMetrics}
    import org.apache.spark.sql.types._
    import org.apache.spark.sql.Row
    val schema = StructType(Seq(StructField("k", LongType),
      StructField("s", StringType)))
    val store = new StreamStore()
    // four batches with disjoint contiguous key ranges
    (0 until 4).foreach { b =>
      store.append("zp", schema,
        (0L until 50L).map(i => Row(b * 50L + i, s"v$b")))
    }
    GraftStoreRegistry.register("zp_store", store)
    try {
      def scan() = new GraftScan("zp_store", "zp", schema, schema, Array.empty)
      // no runtime filter → all four batches planned
      assert(scan().planInputPartitions().length == 4)
      // IN values inside batch 1's range only → one batch planned
      val s1 = scan()
      s1.filter(Array[org.apache.spark.sql.sources.Filter](
        org.apache.spark.sql.sources.In("k", Array[Any](60L, 70L, 95L))))
      assert(s1.planInputPartitions().length == 1)
      assert(GraftScanMetrics.lastPlanned("zp_store", "zp").contains((1, 4)))
      // values straddling two ranges → two batches
      val s2 = scan()
      s2.filter(Array[org.apache.spark.sql.sources.Filter](
        org.apache.spark.sql.sources.In("k", Array[Any](10L, 160L))))
      assert(s2.planInputPartitions().length == 2)
      // a filter on a non-eligible (string) column is ignored
      val s3 = scan()
      s3.filter(Array[org.apache.spark.sql.sources.Filter](
        org.apache.spark.sql.sources.In("s", Array[Any]("v1"))))
      assert(s3.planInputPartitions().length == 4)
      // the eligible-attribute list is the integral columns
      assert(scan().filterAttributes().map(_.describe()).toSeq == Seq("k"))
      // O(#batches) plan-time contract: zone stats were computed once
      // per APPEND; the four plannings above recomputed nothing (no
      // plan-time row scans — the Iceberg-footer discipline)
      assert(store.zoneComputations("zp") == 4L,
        "zones must be computed at append time only, never at planning")
      // and the stats themselves are the per-batch append-time ranges
      val zs = store.batchZonesOf("zp")
      assert(zs.map(_("k")) == (0 until 4).map(b =>
        StreamStore.Zone(b * 50L, b * 50L + 49L, hasNull = false)))
    } finally GraftStoreRegistry.unregister("zp_store")
  }

  test("q_compaction_exec: physical layouts on disk match the logical plan") {
    val (small, big) = ScaleOps.ensureCompactionExec(spark, sf)
    def parquetFiles(dir: String): Seq[java.io.File] = {
      def walk(f: java.io.File): Seq[java.io.File] =
        if (f.isDirectory) f.listFiles().toSeq.flatMap(walk)
        else if (f.getName.endsWith(".parquet")) Seq(f) else Nil
      walk(new java.io.File(dir))
    }
    val nDays = Tables.events(spark, sf)
      .select(date_format(col("ts"), "yyyy-MM-dd")).distinct().count()
    assert(parquetFiles(small).size == nDays,
      "before layout must hold exactly one physical file per day")
    val after = parquetFiles(big).size
    assert(after < nDays && after <= 9,
      s"compacted layout must shrink to ~8 bins, got $after files")
    // row conservation through BOTH rewrites, against the source table
    val n0 = Tables.events(spark, sf).count()
    assert(spark.read.parquet(small).count() == n0)
    assert(spark.read.parquet(big).count() == n0)
  }
}

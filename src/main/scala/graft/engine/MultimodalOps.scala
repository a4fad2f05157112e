package graft.engine

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal (image/audio/video) column plumbing for a training-data
  * pipeline: payloads are opaque `binary` columns with a typed
  * metadata struct; decode / feature-extract / resize / frame-sample
  * run as per-partition batch transforms.
  *
  * DECODE IS A STUB: the container has no image/audio codecs, so
  * `stubDecode` derives deterministic fake properties from the payload
  * bytes (clearly marked below). Everything AROUND the stub — schema,
  * binary handling, partition-batch iteration (`mapPartitions`, the
  * Scala analog of a vectorized Python `mapInPandas`), explode
  * fan-out for frame sampling, and the aggregation layer — is real,
  * tested Spark plumbing that a codec drop-in would inherit unchanged.
  *
  * Scale notes: payload bytes stay on the executors end-to-end (no
  * collect); frame sampling is an explode (rows fan out in place, no
  * shuffle); the stats query aggregates only extracted scalars, so the
  * shuffle after decode carries metadata, never media bytes.
  */
object MultimodalOps {

  /** Typed media-asset row: binary payload + envelope metadata. */
  final case class Asset(asset_id: Long, mime: String, payload: Array[Byte])

  /** Decoded-properties row produced by the (stub) decoder. */
  final case class DecodedAsset(
      asset_id: Long, mime: String, byte_len: Long,
      width: Int, height: Int, channels: Int, duration_ms: Long)

  /** Shared CTE prefix for the multimodal DuckDB oracles: rebuilds the
    * asset table (mime assignment, byte length) and replays the
    * FNV-1a stub decode exactly — list_reduce over code points
    * (fixture text is ASCII, so code point == byte), multiply-mod-2^64
    * in HUGEINT, xor on the low byte, and sign-extended emulation of
    * Scala's arithmetic `>>` for the duration field. Yields CTE `d`:
    * (asset_id, mime, byte_len, w, dur). */
  val fnvOracleCommonSql: String =
    """WITH a AS (SELECT doc_id AS asset_id,
      |             (['image/png','audio/wav','video/mp4'])[CAST(doc_id % 3 + 1 AS INT)] AS mime,
      |             text, CAST(length(text) AS BIGINT) AS byte_len
      |           FROM documents),
      |h AS (SELECT asset_id, mime, byte_len,
      |        list_reduce(
      |          list_prepend(CAST(14695981039346656037 AS HUGEINT),
      |            list_transform(range(1, length(text)+1), i -> CAST(unicode(text[i]) AS HUGEINT))),
      |          (acc, b) -> ((acc - acc % 256 + CAST(xor(CAST(acc % 256 AS BIGINT), CAST(b AS BIGINT)) AS HUGEINT)) * 1099511628211)
      |                      % CAST(18446744073709551616 AS HUGEINT)) AS u
      |      FROM a),
      |d AS (SELECT asset_id, mime, byte_len,
      |        160 + CAST(abs((CASE WHEN u >= CAST(9223372036854775808 AS HUGEINT)
      |                             THEN u - CAST(18446744073709551616 AS HUGEINT) ELSE u END) % 8) AS BIGINT) * 160 AS w,
      |        1000 + CAST(abs((CASE WHEN (u // 65536 + CASE WHEN u >= CAST(9223372036854775808 AS HUGEINT)
      |                                                      THEN CAST(18446744073709551616 AS HUGEINT) - CAST(281474976710656 AS HUGEINT) ELSE 0 END)
      |                                    >= CAST(9223372036854775808 AS HUGEINT)
      |                         THEN (u // 65536 + CAST(18446744073709551616 AS HUGEINT) - CAST(281474976710656 AS HUGEINT)) - CAST(18446744073709551616 AS HUGEINT)
      |                         ELSE u // 65536 END) % 60000) AS BIGINT) AS dur
      |      FROM h)""".stripMargin

  /** DuckDB oracle for qMediaEmbed: replays the FNV-derived feature
    * fold exactly. The per-position prefix hash is computed with a
    * RECURSIVE CTE (one iteration advances every asset one byte — no
    * struct accumulators, which DuckDB's list_reduce mis-evaluates
    * beyond its first 128 rows); float32 accumulation order is
    * reproduced by folding each slot's deltas in position order with
    * a CAST-to-REAL after every add. Bounded by [[FeatureBytes]]. */
  lazy val mediaEmbedOracleSql: String = {
    val two63 = "CAST(9223372036854775808 AS HUGEINT)"
    val two64 = "CAST(18446744073709551616 AS HUGEINT)"
    s"""WITH RECURSIVE a AS (SELECT doc_id AS asset_id,
       |             list_transform(range(1, least(length(text), $FeatureBytes) + 1),
       |                            k -> CAST(unicode(text[k]) AS HUGEINT)) AS bs
       |           FROM documents),
       |r AS (
       |  SELECT asset_id, 0 AS pos, CAST(14695981039346656037 AS HUGEINT) AS h FROM a
       |  UNION ALL
       |  SELECT r.asset_id, r.pos + 1,
       |         ((r.h - r.h % 256 + CAST(xor(CAST(r.h % 256 AS BIGINT), CAST(a.bs[r.pos + 1] AS BIGINT)) AS HUGEINT)) * 1099511628211) % $two64
       |  FROM r JOIN a ON a.asset_id = r.asset_id
       |  WHERE r.pos < len(a.bs)
       |),
       |ds AS (SELECT asset_id, pos, (pos - 1) % 16 AS slot,
       |         CAST(CAST((CASE WHEN h >= $two63 THEN h - $two64 ELSE h END) % 1000 AS REAL)
       |              / CAST(1000 AS REAL) AS REAL) AS delta
       |       FROM r WHERE pos >= 1),
       |sf AS (SELECT asset_id, slot,
       |         list_reduce(list_prepend(CAST(0 AS REAL), list(delta ORDER BY pos)),
       |                     (x, y) -> CAST(x + y AS REAL)) AS fv
       |       FROM ds GROUP BY asset_id, slot),
       |slots AS (SELECT asset_id, UNNEST(range(0, 16)) AS slot FROM a),
       |sfull AS (SELECT s.asset_id, s.slot, COALESCE(sf.fv, CAST(0 AS REAL)) AS fv
       |          FROM slots s LEFT JOIN sf ON sf.asset_id = s.asset_id AND sf.slot = s.slot),
       |folded AS (SELECT asset_id, list(fv ORDER BY slot) AS f FROM sfull GROUP BY asset_id),
       |q AS (SELECT CAST(f AS DOUBLE[]) AS qf FROM folded WHERE asset_id = 0)
       |SELECT folded.asset_id,
       |       ROUND(list_cosine_similarity(CAST(folded.f AS DOUBLE[]), q.qf), 6) AS cos_sim
       |FROM folded, q WHERE folded.asset_id <> 0
       |ORDER BY cos_sim DESC, asset_id LIMIT 10""".stripMargin
  }

  /** Build an asset table from the documents fixture: text bytes play
    * the role of media payloads; mime is assigned deterministically.
    * In production this is `spark.read.format("binaryFile")` or a
    * parquet table with a binary column — identical downstream. */
  def assetTable(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d).select(
      col("doc_id").as("asset_id"),
      element_at(
        array(lit("image/png"), lit("audio/wav"), lit("video/mp4")),
        (col("doc_id") % 3 + 1).cast("int")).as("mime"),
      col("text").cast("binary").as("payload"))

  /** REAL image decode for image mimes via `javax.imageio` (JDK
    * builtin — zero added deps). Header-only: width/height/bands come
    * from the format reader WITHOUT decoding pixel data, so a 50 MB
    * JPEG costs a few hundred header bytes of work — the property
    * that matters when this runs over billions of images. Returns
    * None when no installed reader recognizes the payload (then the
    * caller falls back to the stub — audio/video have no JDK codec).
    * `ImageIO.setUseCache(false)` keeps executors from writing temp
    * cache files per image. */
  def decodeImageHeader(payload: Array[Byte]): Option[(Int, Int, Int)] = {
    javax.imageio.ImageIO.setUseCache(false)
    val iis = javax.imageio.ImageIO.createImageInputStream(
      new java.io.ByteArrayInputStream(payload))
    if (iis == null) return None // stripped JRE without stream SPIs
    try {
      val readers = javax.imageio.ImageIO.getImageReaders(iis)
      if (!readers.hasNext) None
      else {
        val r = readers.next()
        try {
          r.setInput(iis, true, true)
          val w = r.getWidth(0)
          val h = r.getHeight(0)
          val types = r.getImageTypes(0)
          val bands = if (types.hasNext) types.next().getNumBands else 3
          Some((w, h, bands))
        } finally r.dispose()
      }
    } catch { case _: Exception => None }
    finally iis.close()
  }

  /** REAL audio decode for RIFF/WAVE payloads — pure-JVM header
    * parsing, zero deps (the WAV container is a 44-byte-ish header;
    * no codec library needed for PCM metadata). Walks the chunk list
    * for `fmt ` (channels, sample rate, byte rate, bits/sample) and
    * `data` (payload size), and derives duration = dataBytes·1000 /
    * byteRate. Header-only like [[decodeImageHeader]]: cost is
    * independent of audio length, the property that matters over
    * billions of clips. Returns (sampleRate, bitsPerSample, channels,
    * durationMs); None for non-WAV payloads (then the caller falls
    * back to the stub — compressed audio needs a real codec). */
  def decodeWavHeader(payload: Array[Byte]): Option[(Int, Int, Int, Long)] = {
    def u16(i: Int): Int =
      (payload(i) & 0xff) | ((payload(i + 1) & 0xff) << 8)
    def u32(i: Int): Long =
      (payload(i) & 0xffL) | ((payload(i + 1) & 0xffL) << 8) |
        ((payload(i + 2) & 0xffL) << 16) | ((payload(i + 3) & 0xffL) << 24)
    def tag(i: Int): String =
      new String(payload, i, 4, java.nio.charset.StandardCharsets.US_ASCII)
    if (payload.length < 44 || tag(0) != "RIFF" || tag(8) != "WAVE") return None
    var pos = 12
    var fmt: Option[(Int, Int, Int, Long)] = None // channels, rate, bits, byteRate
    var dataBytes = -1L
    while (pos + 8 <= payload.length && (fmt.isEmpty || dataBytes < 0)) {
      val id = tag(pos)
      val sz = u32(pos + 4)
      if (id == "fmt " && pos + 24 <= payload.length)
        fmt = Some((u16(pos + 10), u32(pos + 12).toInt, u16(pos + 22), u32(pos + 16)))
      else if (id == "data") dataBytes = sz
      pos += 8 + sz.toInt + (sz.toInt & 1) // chunks are word-aligned
    }
    fmt.collect { case (ch, rate, bits, byteRate) if byteRate > 0 && dataBytes >= 0 =>
      (rate, bits, ch, dataBytes * 1000L / byteRate)
    }
  }

  // ======================= STUB DECODER ========================== //
  // Deterministic FAKE media decode for the mimes the JDK has no
  // codec for (audio/video) and for payloads no reader recognizes:
  // properties are derived from the payload bytes via FNV-1a so tests
  // are reproducible. A real implementation replaces ONLY this
  // function with a codec call (ffmpeg bindings etc.); the Spark
  // plumbing around it is unchanged.
  def stubDecode(payload: Array[Byte]): (Int, Int, Int, Long) = {
    var h = 0xcbf29ce484222325L
    var i = 0
    while (i < payload.length) {
      h ^= payload(i) & 0xffL; h *= 0x100000001b3L; i += 1
    }
    val w = 160 + (math.abs(h % 8) * 160).toInt        // 160..1280
    val ht = 120 + (math.abs((h >> 8) % 8) * 120).toInt // 120..960
    val ch = if (h % 2 == 0) 3 else 1
    val dur = 1000L + math.abs((h >> 16) % 60000L)
    (w, ht, ch, dur)
  }
  // ================================================================ //

  /** Decode stage: per-partition batch iteration over typed rows —
    * the Scala analog of a vectorized Python `mapInPandas` (one
    * decoder init per PARTITION, amortized across its rows, which is
    * the property that matters for a real codec). Image-mime payloads
    * go through the REAL javax.imageio header decode (duration 0 —
    * stills have none); everything else, plus unreadable image
    * payloads, falls back to the deterministic stub. */
  def decodeAssets(assets: DataFrame): Dataset[DecodedAsset] = {
    val spark = assets.sparkSession
    import spark.implicits._
    assets.select("asset_id", "mime", "payload").as[Asset]
      .mapPartitions { it =>
        // real decoder: codec context initialized here, once per partition
        javax.imageio.ImageIO.setUseCache(false)
        it.map { a =>
          // audio rides the same row shape: width=sampleRate,
          // height=bitsPerSample (documented field overloading — the
          // DecodedAsset columns are generic media properties)
          val real =
            if (a.mime.startsWith("image/")) decodeImageHeader(a.payload).map {
              case (iw, ih, bands) => (iw, ih, bands, 0L)
            }
            else if (a.mime.startsWith("audio/")) decodeWavHeader(a.payload).map {
              case (rate, bits, ch, dur) => (rate, bits, ch, dur)
            }
            else None
          val (w, h, c, dur) = real.getOrElse(stubDecode(a.payload))
          DecodedAsset(a.asset_id, a.mime, a.payload.length.toLong, w, h, c, dur)
        }
      }
  }

  /** Feature-extraction stage: fixed-dim deterministic fake embedding
    * from payload bytes (stub; a real model call has the same
    * signature). Emitted as Array[Float] — the same column shape the
    * VectorOps ANN/near-dup family consumes. Only the first
    * [[FeatureBytes]] payload bytes feed the fingerprint: per-asset
    * cost is CONSTANT regardless of media size (a 4 GB video costs
    * the same as a thumbnail), which is what keeps the feature pass
    * scan-bound at 100 TB — and what keeps the differential oracle's
    * replay of this fold bounded. */
  val FeatureBytes = 256

  def extractFeatures(assets: DataFrame, dim: Int = 16): DataFrame = {
    val spark = assets.sparkSession
    import spark.implicits._
    assets.select("asset_id", "payload").as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, payload) =>
          val f = new Array[Float](dim)
          var h = 0xcbf29ce484222325L
          var i = 0
          val n = math.min(payload.length, FeatureBytes)
          while (i < n) {
            h ^= payload(i) & 0xffL; h *= 0x100000001b3L
            f(i % dim) += ((h % 1000L) / 1000.0f)
            i += 1
          }
          (id, f)
        }
      }.toDF("asset_id", "features")
  }

  /** Resize stage (stub): rewrites target dimensions in metadata and
    * truncates the payload proportionally — stands in for a pixel
    * resample, preserving the binary-in/binary-out column contract. */
  def resizeAssets(decoded: Dataset[DecodedAsset], assets: DataFrame,
                   targetW: Int, targetH: Int): DataFrame =
    decoded.toDF().join(assets.select("asset_id", "payload"), "asset_id")
      .select(
        col("asset_id"), col("mime"),
        lit(targetW).as("width"), lit(targetH).as("height"),
        // STUB: proportional byte truncation in place of resampling
        substring(col("payload"), 0,  64).as("payload"))

  /** Frame sampling for video assets: one row per sampled frame,
    * produced by explode — fan-out happens in place on the executor
    * holding the payload, no shuffle. Frame payloads are byte slices
    * (stub for a real frame grab). */
  def sampleFrames(assets: DataFrame, everyMs: Long = 10000): DataFrame = {
    val decoded = decodeAssets(assets).toDF()
    decoded.filter(col("mime") === "video/mp4")
      .join(assets.select("asset_id", "payload"), "asset_id")
      .withColumn("frame_no",
        explode(sequence(lit(0L), (col("duration_ms") / everyMs).cast("long"))))
      .select(
        col("asset_id"), col("frame_no"),
        (col("frame_no") * everyMs).as("ts_ms"),
        // STUB: slice of payload in place of a decoded frame
        substring(col("payload"), 1, 32).as("frame_bytes"))
  }

  /** Pipeline stats query (driver contract entry): decode everything,
    * aggregate per mime type. The shuffle carries only scalars. */
  def qMultimodalMeta(s: SparkSession, d: String): DataFrame =
    decodeAssets(assetTable(s, d)).toDF()
      .groupBy("mime")
      .agg(
        count(lit(1)).as("n_assets"),
        sum("byte_len").as("total_bytes"),
        round(avg("width"), 2).as("avg_width"),
        round(avg("duration_ms"), 2).as("avg_duration_ms"))
      .orderBy("mime")

  /** Frame-sample query: fan-out plumbing under the driver contract. */
  def qFrameSample(s: SparkSession, d: String): DataFrame =
    sampleFrames(assetTable(s, d))
      .select("asset_id", "frame_no", "ts_ms")
      .orderBy("asset_id", "frame_no")

  /** Media-embedding similarity: feature-extract every asset (stub
    * model), then brute-force cosine top-k against asset 0 — the
    * decode → embed → similarity-search composition a multimodal
    * training pipeline runs. Features flow straight into the same
    * array<float> column shape VectorOps consumes; the top-k is
    * TakeOrderedAndProject (per-partition heaps), no global sort. */
  def qMediaEmbed(s: SparkSession, d: String, k: Int = 10): DataFrame = {
    val feats = extractFeatures(assetTable(s, d))
    val q = feats.filter(col("asset_id") === 0)
      .select("features").head().getSeq[Float](0)
    val qLit = array(q.map(lit): _*)
    feats.filter(col("asset_id") =!= 0)
      .select(col("asset_id"),
        round(VectorOps.nativeCosine(s, col("features"), qLit), 6).as("cos_sim"))
      .orderBy(col("cos_sim").desc, col("asset_id").asc)
      .limit(k)
  }
}

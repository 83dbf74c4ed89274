package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.{Dbf, HtmlForm, Listing, ParquetSink, ReportCsv, Staging, Tables}
import graft.operators._

/** Multimodal: binary image/audio/video decode, frame sampling, perceptual
  * dedup, cross-modal audits.
  *
  * Registry shard of [[SparkEntry]] — entries moved verbatim; see SURVEY.md §2
  * for the operator-row mapping.
  */
private[graft] trait RegistryMultimodal extends RegistryBase {

  protected def queriesMultimodal: Map[String, (SparkSession, String) => DataFrame] = Map(

    // §2 row 35 — multimodal binary column + typed metadata (decode kernel
    // stubbed; Spark-side plumbing in llm.Multimodal.decodeBatches).
    "q35_multimodal_meta" -> { (s, dir) =>
      val blobbed = llm.Multimodal.withBlob(
        Tables.documents(s, dir), "text", "payload")
      val meta = llm.Multimodal.blobMeta(col("payload"))
      ordered(blobbed.select(
        col("doc_id") +: col("lang") +: meta.map { case (n, c) => c.as(n) }: _*))
    },

    // REAL image decode round-trip: solid-color PNGs are encoded from
    // documents columns (ImageIO.write), then decoded by the pure-JDK
    // ImageIO kernel through the batched harness. The oracle predicts the
    // decoded width/height/channels/means from the SAME source columns, so
    // a decode that lies about dimensions or pixel content hash-mismatches.
    "q45_image_decode" -> { (s, dir) =>
      // Spread: the encode/decode kernels are pure CPU per row — a single
      // byte-split input would serialize them.
      val src = llm.Spread(Tables.documents(s, dir)).select(
        col("doc_id"),
        (pmod(col("doc_id"), lit(16)) + 1).cast("int").as("larg"),
        (pmod(col("n_chars").cast("long"), lit(16)) + 1).cast("int").as("alt"),
        pmod(col("doc_id"), lit(256)).cast("int").as("r"),
        pmod(col("doc_id") * 7, lit(256)).cast("int").as("g"),
        pmod(col("n_chars").cast("long"), lit(256)).cast("int").as("b"))
      val blobbed = llm.Multimodal.encodePng(
        src, "larg", "alt", "r", "g", "b", "payload")
      val decoded = llm.Multimodal.decodeBatches(
        blobbed, "payload", kernel = llm.Multimodal.decodeImage)
      // Graded contract flattens the feature vector to scalar columns: the
      // driver's row-compare sorts via pandas, which cannot hash array cells
      // (the library API keeps the array form for real feature pipelines).
      ordered(decoded.select(
        col("doc_id"), col("alt_px"), col("larg_px"), col("canais"),
        element_at(col("recursos"), 1).as("media_r"),
        element_at(col("recursos"), 2).as("media_g"),
        element_at(col("recursos"), 3).as("media_b"),
        element_at(col("recursos"), 4).as("media_luma")))
    },

    // REAL audio decode round-trip: square-wave PCM WAVs are encoded from
    // documents columns (genuine RIFF containers, real 16-bit samples),
    // then decoded by the zero-dependency RIFF/PCM parser through the
    // batched harness. Every |sample| equals the amplitude, so the oracle
    // predicts the full decode — rate/channels/frames/peak/mean — from the
    // SAME source columns; a parser that mis-reads the container or the
    // sample bytes hash-mismatches.
    "q50_audio_decode" -> { (s, dir) =>
      // Spread: encode/decode are pure CPU per row (see q45)
      val src = llm.Spread(Tables.documents(s, dir)).select(
        col("doc_id"),
        ((pmod(col("doc_id"), lit(3)) + 1) * 8000).cast("int").as("taxa"),
        (pmod(col("n_chars").cast("long"), lit(100)) + 50).cast("int").as("quadros"),
        (pmod(col("doc_id"), lit(2)) + 1).cast("int").as("can"),
        (pmod(col("doc_id") * 13, lit(30000)) + 100).cast("int").as("amp"),
        (pmod(col("n_chars").cast("long"), lit(7)) + 1).cast("int").as("meio_periodo"))
      val blobbed = llm.Multimodal.encodeWav(
        src, "taxa", "quadros", "can", "amp", "meio_periodo", "payload")
      val decoded = llm.Multimodal.decodeBatches(
        blobbed, "payload", kernel = llm.Multimodal.decodeWav,
        decodedSchema = llm.Multimodal.DecodedAudioSchema)
      ordered(decoded.select(
        col("doc_id"), col("taxa_hz"), col("canais"), col("bits"),
        col("n_amostras"), col("pico"), col("media_abs")))
    },

    // REAL video frame sampling round-trip: uncompressed RIFF-AVI
    // containers are encoded from documents columns (one solid-color DIB
    // frame per index, color shifted by frame number), then every 2nd
    // frame is extracted by the zero-dependency chunk-tree walker and its
    // pixel rows decoded to exact channel means. The frame-shifted colors
    // prove the right frame BYTES were extracted, not just counted; the
    // oracle reproduces the fan-out with a lateral generate_series.
    "q51_video_frames" -> { (s, dir) =>
      // Spread: encode/decode are pure CPU per row (see q45)
      val src = llm.Spread(Tables.documents(s, dir)).select(
        col("doc_id"),
        (pmod(col("doc_id"), lit(8)) + 1).cast("int").as("larg"),
        (pmod(col("n_chars").cast("long"), lit(8)) + 1).cast("int").as("alt"),
        (pmod(col("doc_id"), lit(10)) + 1).cast("int").as("quadros"),
        pmod(col("doc_id"), lit(256)).cast("int").as("r"),
        pmod(col("doc_id") * 7, lit(256)).cast("int").as("g"),
        pmod(col("n_chars").cast("long"), lit(256)).cast("int").as("b"))
      val blobbed = llm.Multimodal.encodeAvi(
        src, "larg", "alt", "quadros", "r", "g", "b", "payload")
      ordered(llm.Multimodal.sampleFramesAvi(blobbed, "payload", stride = 2)
        .select(col("doc_id"), col("frame_indice"), col("alt_px"), col("larg_px"),
          col("media_r"), col("media_g"), col("media_b")))
    },

    // REAL compressed-video (MJPEG) frame sampling: AVI containers whose
    // frames are genuine JPEG images (ImageIO.write) assembled from
    // documents columns, decoded back by the same chunk walker + ImageIO.
    // JPEG is lossy, so the graded contract checks the EXACT parts of the
    // decode — the frame fan-out and the per-frame dimensions, which
    // survive compression bit-for-bit; color accuracy is bounded in
    // scalatest (OperatorSpec) where tolerance assertions are possible.
    "q57_video_mjpeg" -> { (s, dir) =>
      // Spread: JPEG encode/decode is pure CPU per row (see q45)
      val src = llm.Spread(Tables.documents(s, dir)
          .filter(col("doc_id") % 5 === 0)) // CPU-heavy: sample the corpus
        .select(
          col("doc_id"),
          (pmod(col("doc_id"), lit(6)) + 1).cast("int").as("larg"),
          (pmod(col("n_chars").cast("long"), lit(6)) + 1).cast("int").as("alt"),
          (pmod(col("doc_id"), lit(6)) + 1).cast("int").as("quadros"),
          pmod(col("doc_id"), lit(200)).cast("int").as("r"),
          pmod(col("doc_id") * 7, lit(200)).cast("int").as("g"),
          pmod(col("n_chars").cast("long"), lit(200)).cast("int").as("b"))
      val blobbed = llm.Multimodal.encodeAviMjpeg(
        src, "larg", "alt", "quadros", "r", "g", "b", "payload")
      ordered(llm.Multimodal.sampleFramesAvi(blobbed, "payload", stride = 2)
        .select(col("doc_id"), col("frame_indice"), col("alt_px"), col("larg_px")))
    },

    // Perceptual-hash image dedup, oracle-exact END-TO-END through real
    // PNG bytes: md5-pattern images (one per doc + a one-block-edited
    // variant per doc_id%7) are ImageIO-encoded, decoded by the dHash56
    // kernel, and near-dup'd by 14-bit pigeonhole bands + exact
    // bit_count(xor) verify. The oracle predicts every hash bit from the
    // same (seed, delta) columns — a kernel that mis-decodes one pixel
    // block hash-mismatches.
    "q124_image_phash_dedup" -> { (s, dir) =>
      val base = Tables.documents(s, dir).select(col("doc_id"))
      val src = base
        .select(col("doc_id"), col("doc_id").cast("string").as("seed"),
          lit(0).as("delta"))
        .unionByName(base.filter(col("doc_id") % 7 === 0)
          .select((col("doc_id") + 1000000).as("doc_id"),
            col("doc_id").cast("string").as("seed"), lit(8).as("delta")))
      val blobbed = llm.Multimodal.encodePatternPng(
        llm.Spread(src), "seed", "delta", "payload")
      val hashed = llm.Multimodal.decodeBatches(
        blobbed, "payload", kernel = llm.Multimodal.dHash56,
        decodedSchema = llm.Multimodal.DHashSchema)
      ordered(llm.Dedup.hammingNearDups(
        hashed.select("doc_id", "dhash"), "doc_id", "dhash", maxDist = 4))
    },

    // Audio near-dup through REAL WAV bytes: md5-pattern loudness
    // envelopes (57 DC segments), the Haitsma-Kalker-family energy
    // difference hash, pigeonhole bands + bit_count verify — every
    // envelope bit oracle-predicted from (seed, delta) through genuine
    // RIFF encode→parse. delta re-masters segment 0 (≤1 bit moves).
    "q129_audio_phash_dedup" -> { (s, dir) =>
      val base = Tables.documents(s, dir).select(col("doc_id"))
      val src = base
        .select(col("doc_id"), col("doc_id").cast("string").as("seed"),
          lit(0).as("delta"))
        .unionByName(base.filter(col("doc_id") % 11 === 0)
          .select((col("doc_id") + 1000000).as("doc_id"),
            col("doc_id").cast("string").as("seed"), lit(777).as("delta")))
      val blobbed = llm.Multimodal.encodeWavPattern(
        llm.Spread(src), "seed", "delta", "payload")
      val hashed = llm.Multimodal.decodeBatches(
        blobbed, "payload", kernel = llm.Multimodal.audioHash56,
        decodedSchema = llm.Multimodal.AudioHashSchema)
      ordered(llm.Dedup.hammingNearDups(
        hashed.select("doc_id", "ahash"), "doc_id", "ahash", maxDist = 4))
    },

    // Video near-dup through REAL AVI bytes: 4 md5-pattern DIB frames
    // per doc (+ a per-frame one-block-edited variant per doc_id%9),
    // per-frame dHash56 fingerprints, frame-vote aggregation — ≥3 of 4
    // frames within 4 bits. Every frame hash is oracle-predicted from
    // (seed, delta) through genuine encode→chunk-walk→decode.
    "q128_video_phash_dedup" -> { (s, dir) =>
      val base = Tables.documents(s, dir).select(col("doc_id"))
      val src = base
        .select(col("doc_id"), col("doc_id").cast("string").as("seed"),
          lit(0).as("delta"))
        .unionByName(base.filter(col("doc_id") % 9 === 0)
          .select((col("doc_id") + 1000000).as("doc_id"),
            col("doc_id").cast("string").as("seed"), lit(8).as("delta")))
      val blobbed = llm.Multimodal.encodeAviPattern(
        llm.Spread(src), "seed", "delta", "payload", nFrames = 4)
      val hashed = llm.Multimodal.frameHashesAvi(blobbed, "payload", stride = 1)
      ordered(llm.Dedup.videoNearDups(
        hashed.select("doc_id", "frame_indice", "dhash"),
        "doc_id", "frame_indice", "dhash", maxDist = 4, minFrames = 3))
    },

    // Cross-modal consistency audit (paired text+image curation, the
    // LAION discipline) — oracle-exact END-TO-END through real PNG
    // bytes: every doc gets an md5-pattern image keyed by its TEXT;
    // %6 plants are true multimodal duplicates (same text, same image),
    // %9 plants are caption-dup/image-mismatch rows (same text, an
    // unrelated pattern). Pairs form only within exact-text groups; the
    // verdict is one bit_count(xor) per pair. The oracle predicts every
    // image hash from the seed algebra and replays the text grouping.
    "q135_crossmodal_audit" -> { (s, dir) =>
      val docs = Tables.documents(s, dir).select("doc_id", "text")
      def withSeed(d: DataFrame, shift: Long, seedSuffix: String) =
        d.select((col("doc_id") + shift).as("doc_id"), col("text"),
          concat(md5(col("text").cast("binary")), lit(seedSuffix)).as("seed"),
          lit(0).as("delta"))
      val src = withSeed(docs, 0L, "")
        .unionByName(withSeed(docs.filter(col("doc_id") % 6 === 0), 1000000L, ""))
        .unionByName(withSeed(docs.filter(col("doc_id") % 9 === 0), 2000000L, "x"))
      val blobbed = llm.Multimodal.encodePatternPng(
        llm.Spread(src), "seed", "delta", "payload")
      val hashed = llm.Multimodal.decodeBatches(
        blobbed, "payload", kernel = llm.Multimodal.dHash56,
        decodedSchema = llm.Multimodal.DHashSchema)
      val paired = hashed.select("doc_id", "dhash")
        .join(src.select("doc_id", "text"), "doc_id")
      ordered(llm.Dedup.crossModalConsistency(
        paired, "doc_id", "text", "dhash", maxDist = 4))
    },
  )

  protected def oraclesMultimodal: Map[String, String] = Map(

    "q35_multimodal_meta" ->
      """SELECT doc_id, lang,
        |  CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
        |  lower(substr(hex(encode(text)), 1, 8)) AS magic_hex,
        |  sha256(text) AS conteudo_sha256
        |FROM documents ORDER BY ALL NULLS FIRST""".stripMargin,

    // Predicts the ImageIO encode→decode round-trip from the source
    // columns: solid-color PNGs must decode to exactly the encoded
    // dimensions, 3 RGB components, and integer channel means.
    "q45_image_decode" ->
      """SELECT doc_id,
        |  CAST(1 + n_chars % 16 AS INT) AS alt_px,
        |  CAST(1 + doc_id % 16 AS INT) AS larg_px,
        |  CAST(3 AS INT) AS canais,
        |  CAST(doc_id % 256 AS REAL) AS media_r,
        |  CAST((doc_id * 7) % 256 AS REAL) AS media_g,
        |  CAST(n_chars % 256 AS REAL) AS media_b,
        |  CAST((doc_id % 256 + (doc_id * 7) % 256 + n_chars % 256) / 3.0 AS REAL)
        |    AS media_luma
        |FROM documents ORDER BY ALL NULLS FIRST""".stripMargin,

    // Predicts the WAV encode→decode round-trip from the source columns: a
    // square wave at amplitude A has every |sample| = A, so peak and mean
    // absolute sample must both decode to exactly A, and the container
    // must yield exactly the encoded rate/channels/frame count.
    "q50_audio_decode" ->
      """SELECT doc_id,
        |  CAST((doc_id % 3 + 1) * 8000 AS INT) AS taxa_hz,
        |  CAST(doc_id % 2 + 1 AS INT) AS canais,
        |  CAST(16 AS INT) AS bits,
        |  CAST(n_chars % 100 + 50 AS BIGINT) AS n_amostras,
        |  CAST((doc_id * 13) % 30000 + 100 AS INT) AS pico,
        |  CAST((doc_id * 13) % 30000 + 100 AS DOUBLE) AS media_abs
        |FROM documents ORDER BY ALL NULLS FIRST""".stripMargin,

    // Predicts the AVI encode→sample round-trip: sampled frame indices are
    // 0,2,… below the frame count, dimensions echo the encode columns, and
    // frame f's solid color means are the base color shifted by f mod 256.
    "q51_video_frames" ->
      """SELECT d.doc_id,
        |  CAST(u.f AS INT) AS frame_indice,
        |  CAST(1 + n_chars % 8 AS INT) AS alt_px,
        |  CAST(1 + doc_id % 8 AS INT) AS larg_px,
        |  CAST((doc_id % 256 + u.f) % 256 AS DOUBLE) AS media_r,
        |  CAST(((doc_id * 7) % 256 + u.f) % 256 AS DOUBLE) AS media_g,
        |  CAST((n_chars % 256 + u.f) % 256 AS DOUBLE) AS media_b
        |FROM documents d, LATERAL unnest(generate_series(0, CAST(doc_id % 10 AS INT), 2)) u(f)
        |ORDER BY ALL NULLS FIRST""".stripMargin,

    // The lossless half of the MJPEG round-trip: sampled frame indices and
    // per-frame dimensions survive JPEG compression exactly.
    "q57_video_mjpeg" ->
      """SELECT doc_id,
        |  CAST(u.f AS INT) AS frame_indice,
        |  CAST(1 + n_chars % 6 AS INT) AS alt_px,
        |  CAST(1 + doc_id % 6 AS INT) AS larg_px
        |FROM documents d, LATERAL unnest(generate_series(0, CAST(doc_id % 6 AS INT), 2)) u(f)
        |WHERE doc_id % 5 = 0
        |ORDER BY ALL NULLS FIRST""".stripMargin,

    // Every dHash bit predicted from the same md5 block pattern the PNGs
    // were painted with; same 4×14-bit bands, same bit_count verify.
    "q124_image_phash_dedup" ->
      """WITH ids AS (
        |  SELECT doc_id, CAST(doc_id AS VARCHAR) AS seed, 0 AS delta
        |  FROM documents
        |  UNION ALL
        |  SELECT doc_id + 1000000, CAST(doc_id AS VARCHAR), 8
        |  FROM documents WHERE doc_id % 7 = 0),
        |blocks AS (
        |  SELECT doc_id,
        |    flatten([[
        |      (CAST(('0x' || substring(md5(seed || ':' || CAST(bx AS VARCHAR)
        |         || ':' || CAST(by AS VARCHAR)), 1, 8)) AS BIGINT) % 256
        |       + CASE WHEN bx = 0 AND by = 0 THEN delta ELSE 0 END) % 256
        |      for bx in range(0, 8)] for by in range(0, 8)]) AS v
        |  FROM ids),
        |hashes AS (
        |  SELECT doc_id,
        |    CAST(list_sum(flatten([[
        |      CASE WHEN v[by * 8 + bx + 1] > v[by * 8 + bx + 2]
        |           THEN (CAST(1 AS BIGINT) << (by * 7 + bx)) ELSE 0 END
        |      for bx in range(0, 7)] for by in range(0, 8)])) AS BIGINT) AS h
        |  FROM blocks),
        |banded AS (
        |  SELECT doc_id, h, band, (h >> (band * 14)) % 16384 AS bhash
        |  FROM hashes, (SELECT unnest(range(0, 4)) AS band)),
        |cand AS (
        |  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b,
        |    a.h AS ha, b.h AS hb
        |  FROM banded a JOIN banded b
        |    ON a.band = b.band AND a.bhash = b.bhash AND a.doc_id < b.doc_id)
        |SELECT id_a, id_b, CAST(bit_count(xor(ha, hb)) AS BIGINT) AS dist
        |FROM cand WHERE bit_count(xor(ha, hb)) <= 4
        |ORDER BY ALL NULLS FIRST""".stripMargin,

    // The 57-segment envelope algebra replayed: segment levels from the
    // same md5, equal segment lengths so "louder" is a direct compare.
    "q129_audio_phash_dedup" ->
      """WITH ids AS (
        |  SELECT doc_id, CAST(doc_id AS VARCHAR) AS seed, 0 AS delta
        |  FROM documents
        |  UNION ALL
        |  SELECT doc_id + 1000000, CAST(doc_id AS VARCHAR), 777
        |  FROM documents WHERE doc_id % 11 = 0),
        |env AS (
        |  SELECT doc_id,
        |    [CAST(('0x' || substring(md5(seed || ':' || CAST(s AS VARCHAR)),
        |       1, 8)) AS BIGINT) % 16384
        |     + CASE WHEN s = 0 THEN delta ELSE 0 END
        |     for s in range(0, 57)] AS v
        |  FROM ids),
        |hashes AS (
        |  SELECT doc_id,
        |    CAST(list_sum([
        |      CASE WHEN v[s + 1] > v[s + 2]
        |           THEN (CAST(1 AS BIGINT) << s) ELSE 0 END
        |      for s in range(0, 56)]) AS BIGINT) AS h
        |  FROM env),
        |banded AS (
        |  SELECT doc_id, h, band, (h >> (band * 14)) % 16384 AS bhash
        |  FROM hashes, (SELECT unnest(range(0, 4)) AS band)),
        |cand AS (
        |  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b,
        |    a.h AS ha, b.h AS hb
        |  FROM banded a JOIN banded b
        |    ON a.band = b.band AND a.bhash = b.bhash AND a.doc_id < b.doc_id)
        |SELECT id_a, id_b, CAST(bit_count(xor(ha, hb)) AS BIGINT) AS dist
        |FROM cand WHERE bit_count(xor(ha, hb)) <= 4
        |ORDER BY ALL NULLS FIRST""".stripMargin,

    // q124's block algebra with a frame key folded into the md5; same
    // bands, same bit_count verify, one frame-vote aggregation on top.
    "q128_video_phash_dedup" ->
      """WITH ids AS (
        |  SELECT doc_id, CAST(doc_id AS VARCHAR) AS seed, 0 AS delta
        |  FROM documents
        |  UNION ALL
        |  SELECT doc_id + 1000000, CAST(doc_id AS VARCHAR), 8
        |  FROM documents WHERE doc_id % 9 = 0),
        |fv AS (
        |  SELECT doc_id, f,
        |    flatten([[
        |      (CAST(('0x' || substring(md5(seed || ':' || CAST(f AS VARCHAR)
        |         || ':' || CAST(bx AS VARCHAR) || ':' || CAST(by AS VARCHAR)),
        |         1, 8)) AS BIGINT) % 256
        |       + CASE WHEN bx = 0 AND by = 0 THEN delta ELSE 0 END) % 256
        |      for bx in range(0, 8)] for by in range(0, 8)]) AS v
        |  FROM ids, (SELECT unnest(range(0, 4)) AS f)),
        |fh AS (
        |  SELECT doc_id, f,
        |    CAST(list_sum(flatten([[
        |      CASE WHEN v[by * 8 + bx + 1] > v[by * 8 + bx + 2]
        |           THEN (CAST(1 AS BIGINT) << (by * 7 + bx)) ELSE 0 END
        |      for bx in range(0, 7)] for by in range(0, 8)])) AS BIGINT) AS h
        |  FROM fv),
        |banded AS (
        |  SELECT doc_id, f, h, band, (h >> (band * 14)) % 16384 AS bhash
        |  FROM fh, (SELECT unnest(range(0, 4)) AS band)),
        |cand AS (
        |  SELECT DISTINCT a.doc_id AS id_a, a.f AS fa, a.h AS ha,
        |    b.doc_id AS id_b, b.f AS fb, b.h AS hb
        |  FROM banded a JOIN banded b
        |    ON a.band = b.band AND a.bhash = b.bhash AND a.doc_id < b.doc_id)
        |SELECT id_a, id_b, CAST(count(DISTINCT fa) AS BIGINT) AS n_frames_casados
        |FROM cand WHERE bit_count(xor(ha, hb)) <= 4
        |GROUP BY id_a, id_b HAVING count(DISTINCT fa) >= 3
        |ORDER BY ALL NULLS FIRST""".stripMargin,

    // q124's dHash block algebra (delta = 0), seeds derived from md5 of
    // the TEXT; pairs from exact-text groups, verdict = bit_count(xor)
    "q135_crossmodal_audit" ->
      """WITH ids AS (
        |  SELECT doc_id, text, md5(text) AS seed FROM documents
        |  UNION ALL
        |  SELECT doc_id + 1000000, text, md5(text)
        |  FROM documents WHERE doc_id % 6 = 0
        |  UNION ALL
        |  SELECT doc_id + 2000000, text, md5(text) || 'x'
        |  FROM documents WHERE doc_id % 9 = 0),
        |blocks AS (
        |  SELECT doc_id, text,
        |    flatten([[
        |      CAST(('0x' || substring(md5(seed || ':' || CAST(bx AS VARCHAR)
        |         || ':' || CAST(by AS VARCHAR)), 1, 8)) AS BIGINT) % 256
        |      for bx in range(0, 8)] for by in range(0, 8)]) AS v
        |  FROM ids),
        |hashes AS (
        |  SELECT doc_id, text,
        |    CAST(list_sum(flatten([[
        |      CASE WHEN v[by * 8 + bx + 1] > v[by * 8 + bx + 2]
        |           THEN (CAST(1 AS BIGINT) << (by * 7 + bx)) ELSE 0 END
        |      for bx in range(0, 7)] for by in range(0, 8)])) AS BIGINT) AS h
        |  FROM blocks)
        |SELECT a.doc_id AS id_a, b.doc_id AS id_b,
        |  CAST(bit_count(xor(a.h, b.h)) AS BIGINT) AS dist,
        |  bit_count(xor(a.h, b.h)) <= 4 AS consistente
        |FROM hashes a JOIN hashes b ON a.text = b.text AND a.doc_id < b.doc_id
        |ORDER BY ALL NULLS FIRST""".stripMargin,
  )
}

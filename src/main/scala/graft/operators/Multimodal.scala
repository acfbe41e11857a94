package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.QueryDef
import graft.sources.Tables

/** Multimodal-column plumbing: media payloads as opaque `binary` columns
  * with typed metadata, and a batched decode/feature-extract stage.
  *
  * The decode itself is a clearly-marked deterministic STUB (this
  * container has no image/audio codecs); everything around it — schema,
  * partitioning, batched per-partition execution shape, feature schema —
  * is real. Swapping `decodeBatch` for a JNI/codec call is the only
  * change needed on a real cluster.
  *
  * Scale shape: decode is narrow (mapPartitions, no shuffle); batches of
  * [[BatchSize]] amortize per-call setup exactly the way an Arrow-batched
  * pandas/tensor UDF would.
  */
object Multimodal {

  case class MediaRow(doc_id: Long, media: Array[Byte], source: String, n_chars: Long)
  case class MediaFeatures(doc_id: Long, n_bytes: Long, width: Int, height: Int,
      n_frames: Int, mean_level: Double)

  case class ResizedMeta(doc_id: Long, width: Int, height: Int, new_w: Int, new_h: Int)

  val BatchSize = 64

  /** STUB decoder: deterministic pseudo-features from the raw bytes.
    * A real implementation would decode image/audio here; the signature
    * (batch in → features out) is the real contract. The fake features
    * derive from the portable 60-bit md5 hash of the payload (same
    * definition as TextOps.phash) so the whole stage — including the
    * mapPartitions plumbing — is oracle-checkable end to end.
    */
  def decodeBatch(batch: Seq[MediaRow]): Seq[MediaFeatures] = {
    // one digest per batch (reset between rows) — this per-call setup
    // amortization is exactly what the BatchSize plumbing exists for
    val md = java.security.MessageDigest.getInstance("MD5")
    batch.map { r =>
      md.reset()
      val d = md.digest(r.media)
      // portable 60-bit hash = first 15 hex chars = high 60 bits of
      // the first 8 digest bytes
      val top64 = java.nio.ByteBuffer.wrap(d, 0, 8).getLong
      val h = top64 >>> 4
      MediaFeatures(
        doc_id = r.doc_id,
        n_bytes = r.media.length.toLong,
        width = (64 + h % 512).toInt,
        height = (64 + (h / 512) % 512).toInt,
        n_frames = (1 + r.media.length % 30),
        mean_level = (h % 10000L).toDouble / 10000.0)
    }
  }

  /** STUB resize: fit-to-box dimension computation in pure integer math
    * (so the oracle reproduces it with `//`). A real implementation
    * would transform pixel bytes here; batch-in → batch-out is the
    * contract, same as decode.
    */
  def resizeBatch(batch: Seq[MediaFeatures], box: Int = 224): Seq[ResizedMeta] =
    batch.map { f =>
      val m = math.max(f.width, f.height).toLong
      ResizedMeta(f.doc_id, f.width, f.height,
        (f.width.toLong * box / m).toInt, (f.height.toLong * box / m).toInt)
    }

  /** Non-ASCII probe planted in the media fixture (doc_id -1): 2-byte
    * (é/ö), 3-byte (CJK + em dash), and 4-byte (emoji) UTF-8 sequences.
    * The corpus in documents.parquet is ASCII, so without this row the
    * byte-vs-char length split (DuckDB strlen vs length; Spark
    * length(binary) vs length(string)) would pass untested — exactly
    * the latent trap the round-3 audit flagged. The SAME literal is
    * union'd on both the Spark and oracle sides, so the m1-m4
    * hash-match genuinely exercises byte semantics end to end.
    */
  val NonAsciiProbe = "héllo wörld — 多模态 🎬 café"

  /** The m-table document source: documents plus the probe row. */
  def mediaDocs(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val cols = Seq("doc_id", "text", "source", "n_chars")
    val probe = Seq((-1L, NonAsciiProbe, "synthetic")).toDF("doc_id", "text", "source")
      .withColumn("n_chars", length(col("text")).cast("long")) // CHAR count, like the corpus column
    Tables.documents(s, d).select(cols.map(col): _*)
      .unionByName(probe.select(cols.map(col): _*))
  }

  /** Oracle twin of [[mediaDocs]] (a CTE both engines agree on). */
  private val docsSql: String =
    s"""docs AS (
      |  SELECT doc_id, text, source, n_chars FROM documents
      |  UNION ALL
      |  SELECT CAST(-1 AS BIGINT), '$NonAsciiProbe', 'synthetic',
      |         CAST(length('$NonAsciiProbe') AS BIGINT))""".stripMargin

  /** Binary probe (doc_id -2): bytes that are NOT valid UTF-8 — 0xFF
    * (never legal in UTF-8), an embedded NUL, and a truncated 2-byte
    * sequence (0xC3 followed by 0x28). The UTF-8 probe above fixed
    * byte-vs-char LENGTH semantics, but every payload was still text
    * cast to binary; this row proves the md5/length path over arbitrary
    * bytes. DuckDB's `md5` only accepts VARCHAR (no BLOB overload), so
    * the oracle side carries the independently precomputed constants
    * below (Python hashlib over the same 11 bytes) instead of computing
    * them in SQL — still an engine-independent check of Spark's
    * md5-over-binary. n_chars is -1: char count is undefined for a
    * non-text payload (sentinel on both sides).
    */
  val BinaryProbeHex = "FF00C328DEADBEEF41429F"
  val BinaryProbeBytes = 11L
  val BinaryProbeMd5 = "e7f3948628b1d9a17f3ce3e9f5041407" // hashlib.md5
  val BinaryProbeH = 1044616621626957210L // int(md5[:15], 16)

  /** The binary-level media table: docs text cast to UTF-8 bytes, plus
    * the non-UTF-8 probe row. This is the frame m1-m4 read — every
    * oracle-checked media query sees the arbitrary-bytes row.
    */
  def mediaBin(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val probe = Seq((-2L, BinaryProbeHex, "synthetic", -1L))
      .toDF("doc_id", "hex", "source", "n_chars")
      .select(col("doc_id"), unhex(col("hex")).as("media"),
        col("source"), col("n_chars"))
    mediaDocs(s, d)
      .select(col("doc_id"), col("text").cast("binary").as("media"),
        col("source"), col("n_chars"))
      .unionByName(probe)
  }

  /** documents → media table: text bytes stand in for the media payload
    * (plus the non-UTF-8 probe row).
    */
  def mediaTable(s: SparkSession, d: String): Dataset[MediaRow] = {
    import s.implicits._
    mediaBin(s, d).as[MediaRow]
  }

  /** The batched decode stage: per-partition, grouped into BatchSize
    * chunks — no shuffle, no driver involvement.
    */
  def extractFeatures(media: Dataset[MediaRow]): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions(_.grouped(BatchSize).flatMap(g => decodeBatch(g.toSeq)))
  }

  /** Single source for the oracle's stub-feature derivation (used by
    * m2/m3/m4 — keep in lockstep with [[decodeBatch]]): n_bytes and the
    * portable 60-bit md5 hash per document. NOTE DuckDB `strlen` is
    * BYTE length (UTF-8 octets; `length` is the char count —
    * strlen('héllo')=6, length('héllo')=5), so it matches the engine's
    * `media.length` byte semantics for non-ASCII documents too.
    */
  private val featsSql: String =
    s"""$docsSql,
      |f AS (
      |  SELECT doc_id,
      |         CAST(strlen(text) AS BIGINT) AS n_bytes,
      |         CAST(concat('0x', substr(md5(text), 1, 15)) AS BIGINT) AS h
      |  FROM docs
      |  UNION ALL
      |  SELECT CAST(-2 AS BIGINT), CAST($BinaryProbeBytes AS BIGINT),
      |         CAST($BinaryProbeH AS BIGINT))""".stripMargin

  val defs: Seq[QueryDef] = Seq(

    // M1: media catalog — binary payload length + content digest
    // (oracle-checkable part of the multimodal surface). The engine
    // computes md5/length over the binary column — including the
    // non-UTF-8 probe, whose oracle row is the precomputed constant
    // (see BinaryProbeMd5).
    QueryDef.sql("m1_media_catalog",
      s"""WITH $docsSql
        |SELECT doc_id, source, n_chars, media_bytes, media_md5 FROM (
        |  SELECT doc_id, source, n_chars,
        |         CAST(strlen(text) AS BIGINT) AS media_bytes,
        |         md5(text) AS media_md5
        |  FROM docs
        |  UNION ALL
        |  SELECT CAST(-2 AS BIGINT), 'synthetic', CAST(-1 AS BIGINT),
        |         CAST($BinaryProbeBytes AS BIGINT), '$BinaryProbeMd5')
        |ORDER BY doc_id""".stripMargin) { (s, d) =>
      mediaBin(s, d)
        .select(col("doc_id"), col("source"), col("n_chars"),
          length(col("media")).cast("long").as("media_bytes"),
          md5(col("media")).as("media_md5"))
        .orderBy("doc_id")
    },

    // M2: batched stub decode + feature extraction. The stub features
    // are defined on the portable md5 hash, so the oracle reproduces
    // them in SQL and checks the whole mapPartitions stage.
    QueryDef.sql("m2_media_features",
      s"""WITH $featsSql
        |SELECT doc_id, n_bytes,
        |       CAST(64 + (h % 512) AS INT) AS width,
        |       CAST(64 + ((h // 512) % 512) AS INT) AS height,
        |       CAST(1 + (n_bytes % 30) AS INT) AS n_frames,
        |       CAST(h % 10000 AS DOUBLE) / 10000.0 AS mean_level
        |FROM f ORDER BY doc_id""".stripMargin) { (s, d) =>
      extractFeatures(mediaTable(s, d)).toDF().orderBy("doc_id")
    },

    // M3: frame sampling — every 5th frame index per media item, driven
    // by the decoded n_frames. The explode(sequence(...)) generator is
    // the real plumbing a video pipeline uses to fan one row out to its
    // sampled frames (narrow, no shuffle); a real build would follow
    // with a per-frame decode.
    QueryDef.sql("m3_frame_sample",
      s"""WITH $featsSql,
        |feats AS (SELECT doc_id, 1 + (n_bytes % 30) AS n_frames FROM f)
        |SELECT doc_id, n_frames, frame_idx FROM (
        |  SELECT doc_id, n_frames,
        |         unnest(generate_series(0, n_frames - 1, 5)) AS frame_idx
        |  FROM feats)
        |ORDER BY doc_id, frame_idx""".stripMargin) { (s, d) =>
      import org.apache.spark.sql.functions.{explode, sequence}
      extractFeatures(mediaTable(s, d)).toDF()
        .select(col("doc_id"), col("n_frames").cast("long").as("n_frames"))
        .withColumn("frame_idx",
          explode(sequence(lit(0L), col("n_frames") - 1, lit(5L))))
        .orderBy("doc_id", "frame_idx")
    },

    // M4: resize stage — second batched mapPartitions hop chained after
    // decode (the decode→transform pipeline shape), fit-to-224 box in
    // integer math so the oracle reproduces the dims exactly.
    QueryDef.sql("m4_resize",
      s"""WITH $featsSql,
        |dims AS (
        |  SELECT doc_id,
        |         CAST(64 + (h % 512) AS INT) AS width,
        |         CAST(64 + ((h // 512) % 512) AS INT) AS height
        |  FROM f)
        |SELECT doc_id, width, height,
        |       CAST(width * 224 // GREATEST(width, height) AS INT) AS new_w,
        |       CAST(height * 224 // GREATEST(width, height) AS INT) AS new_h
        |FROM dims ORDER BY doc_id""".stripMargin) { (s, d) =>
      import s.implicits._
      extractFeatures(mediaTable(s, d))
        .mapPartitions(_.grouped(BatchSize).flatMap(g => resizeBatch(g.toSeq)))
        .toDF()
        .orderBy("doc_id")
    }
  )
}

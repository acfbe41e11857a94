package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.QueryDef
import graft.sources.Tables

/** Multimodal-column plumbing: media payloads as opaque `binary` columns
  * with typed metadata, and a batched decode/feature-extract stage.
  *
  * As of round 12 the image path is REAL: each document carries an
  * actual PNG payload (8-bit grayscale, generated deterministically
  * from the doc's portable content hash — dims and pixel values follow
  * closed-form formulas), [[decodeBatch]] decodes it with the JDK's
  * `javax.imageio` (no new dependencies) and measures width/height/
  * mean level from the DECODED PIXELS, and the DuckDB oracle
  * reproduces the same features analytically from the generating
  * formulas — so a lossy or misbehaving encode→decode→measure chain
  * hash-mismatches. Audio/video codecs remain out of scope in this
  * container; frame COUNT rides as typed metadata next to the binary
  * column (the container-metadata shape a video pipeline reads),
  * which m3's sampler consumes.
  *
  * Scale shape: encode and decode are narrow batched `mapPartitions`
  * hops (no shuffle, no driver involvement); batches of [[BatchSize]]
  * amortize per-call setup exactly the way an Arrow-batched
  * pandas/tensor UDF would.
  */
object Multimodal {

  case class MediaRow(doc_id: Long, media: Array[Byte], source: String, n_chars: Long)

  /** A real image payload plus its typed metadata: `media` is a PNG
    * byte stream; `n_frames` is container metadata (a still PNG is one
    * frame — the fixture models multi-frame media by carrying the
    * count alongside the payload, where a video container stores it).
    */
  case class PngRow(doc_id: Long, media: Array[Byte], n_frames: Int)

  /** Decoded-pixel features: `n_bytes` is the DECODED payload size
    * (width × height at 8-bit gray — encoder-independent, unlike the
    * PNG stream length, which no oracle could reproduce), `mean_level`
    * the mean decoded pixel value normalized to [0, 1].
    */
  case class MediaFeatures(doc_id: Long, n_bytes: Long, width: Int, height: Int,
      n_frames: Int, mean_level: Double)

  case class ResizedMeta(doc_id: Long, width: Int, height: Int, new_w: Int, new_h: Int)

  /** 64-bit dHash split into two 32-bit halves so the value survives any
    * engine's signed-BIGINT arithmetic without touching the sign bit
    * (`h_lo` = comparison bits 0-31, `h_hi` = bits 32-63; each half
    * < 2^32).
    */
  case class DHashRow(doc_id: Long, h_hi: Long, h_lo: Long)

  val BatchSize = 64

  /** ImageIO's default stream cache is DISK-backed: wrapping a plain
    * Input/OutputStream spins up a temp FILE in java.io.tmpdir
    * (FileCacheImage{Input,Output}Stream) — two file create/deletes
    * PER ROW in the encode/decode hops. The round-14 30× spot check
    * measured exactly that going SUPER-LINEAR (m4 t30/t10 = 4.14,
    * implied exponent 1.29): per-image CPU is constant-bounded
    * (dims ≤ 16×13), so the growing term was tmp-dir churn contention
    * across 32 concurrent tasks, which scales with file-op count, not
    * pixel count. Memory caching is strictly better for KB-scale
    * payloads; the produced/decoded BYTES are identical, so m1-m4's
    * oracle rows are untouched. Called at the top of each ImageIO
    * batch hop (a static JVM-wide setter — cheap, idempotent, and
    * executor-local so it needs no driver-side init ordering).
    */
  private def disableImageIoDiskCache(): Unit =
    if (javax.imageio.ImageIO.getUseCache) javax.imageio.ImageIO.setUseCache(false)

  /** Deterministic PNG fixture formulas, shared (in lockstep) with the
    * oracle SQL: from the doc's portable 60-bit hash `h`,
    * width = 4 + h % 13, height = 3 + (h / 13) % 11, and the pixel at
    * (x, y) is (h + 31x + 17y) mod 256. Everything downstream of the
    * ENCODE is real decoding — these formulas only pin what image got
    * generated.
    */
  def pngDims(h: Long): (Int, Int) =
    ((4 + h % 13).toInt, (3 + (h / 13) % 11).toInt)

  /** Batched PNG ENCODE (the fixture's media source): one reusable
    * stream per batch, real `ImageIO` PNG writing per row.
    */
  def encodePngBatch(batch: Seq[(Long, Long)]): Seq[PngRow] = {
    disableImageIoDiskCache()
    val baos = new java.io.ByteArrayOutputStream(4096)
    batch.map { case (docId, h) =>
      val (w, ht) = pngDims(h)
      val img = new java.awt.image.BufferedImage(
        w, ht, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
      val raster = img.getRaster
      var y = 0
      while (y < ht) {
        var x = 0
        while (x < w) {
          raster.setSample(x, y, 0, ((h + 31L * x + 17L * y) % 256).toInt)
          x += 1
        }
        y += 1
      }
      baos.reset()
      javax.imageio.ImageIO.write(img, "png", baos)
      PngRow(docId, baos.toByteArray, (1 + h % 30).toInt)
    }
  }

  /** REAL batched decode: `ImageIO.read` over the PNG bytes, features
    * measured from the decoded raster (not from the generating
    * formulas — the oracle holds the two equal). A payload that fails
    * to decode fails the batch loudly; a real pipeline would divert
    * such rows to a quarantine sink instead.
    */
  def decodeBatch(batch: Seq[PngRow]): Seq[MediaFeatures] = {
    disableImageIoDiskCache()
    batch.map { r =>
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(r.media))
      require(img != null, s"doc ${r.doc_id}: payload is not a decodable image")
      val (w, ht) = (img.getWidth, img.getHeight)
      val raster = img.getRaster
      var sum = 0L
      var y = 0
      while (y < ht) {
        var x = 0
        while (x < w) { sum += raster.getSample(x, y, 0); x += 1 }
        y += 1
      }
      MediaFeatures(r.doc_id, w.toLong * ht, w, ht, r.n_frames,
        sum.toDouble / (w.toLong * ht * 255.0))
    }
  }

  /** A real AUDIO payload: `media` is a complete RIFF/WAV byte stream
    * (PCM unsigned 8-bit, mono) written by the JDK's
    * `javax.sound.sampled` — the audio sibling of [[PngRow]].
    */
  case class WavRow(doc_id: Long, media: Array[Byte])

  /** Decoded-audio features, all measured from the DECODED container
    * and samples (never from the generating formulas — the oracle
    * holds the two equal): container sample rate, decoded frame
    * count, integer duration, analysis-window count at the standard
    * 256-sample frame / 128-sample hop, peak sample, and mean level
    * normalized to [0, 1].
    */
  case class AudioFeatures(doc_id: Long, sample_rate: Long, n_samples: Long,
      duration_ms: Long, n_windows: Long, peak_level: Long, mean_level: Double)

  /** Deterministic WAV fixture formulas, shared (in lockstep) with the
    * oracle SQL: from the doc's portable 60-bit hash `h`, the sample
    * rate is 8000·(1 + h mod 2) (8/16 kHz — the rate must survive the
    * container round-trip, so it varies), the clip is
    * 400 + (h div 2) mod 800 samples (always ≥ 400, so every clip
    * holds ≥ 2 analysis windows), and sample i is (h + 37i) mod 256
    * (8-bit unsigned PCM — lossless through WAV, unlike any
    * compressed codec, which is exactly why the fixture uses it).
    */
  def wavParams(h: Long): (Int, Int) =
    ((8000L * (1 + h % 2)).toInt, (400 + (h / 2) % 800).toInt)

  /** The JDK's own WAVE reader/writer, resolved ONCE per executor JVM
    * through the public `javax.sound.sampled.spi` ServiceLoader path.
    * Going through `AudioSystem.getAudioInputStream`/`write` per ROW
    * funnels every one of the 32 task threads through
    * `JDK13Services.getProviders` — a SYNCHRONIZED static — and that
    * class-level lock is a scale-killer the round-17 ScaleBench run
    * caught red-handed (m6 10× ratio 18.6×, 30× exponent 1.28, the
    * m4-ImageIO signature). The providers themselves (WaveFileReader /
    * WaveFileWriter) are stateless and thread-safe; hoisting the
    * lookup out of the row loop keeps the REAL JDK RIFF codec while
    * removing the shared lock.
    */
  private lazy val wavReader: javax.sound.sampled.spi.AudioFileReader = {
    val it = java.util.ServiceLoader
      .load(classOf[javax.sound.sampled.spi.AudioFileReader]).iterator()
    var found: javax.sound.sampled.spi.AudioFileReader = null
    while (it.hasNext && found == null) {
      val r = it.next()
      if (r.getClass.getName.toLowerCase.contains("wave")) found = r
    }
    require(found != null, "no WAVE AudioFileReader provider on this JDK")
    found
  }

  private lazy val wavWriter: javax.sound.sampled.spi.AudioFileWriter = {
    import javax.sound.sampled.AudioFileFormat
    val it = java.util.ServiceLoader
      .load(classOf[javax.sound.sampled.spi.AudioFileWriter]).iterator()
    var found: javax.sound.sampled.spi.AudioFileWriter = null
    while (it.hasNext && found == null) {
      val w = it.next()
      if (w.isFileTypeSupported(AudioFileFormat.Type.WAVE)) found = w
    }
    require(found != null, "no WAVE AudioFileWriter provider on this JDK")
    found
  }

  /** Batched WAV ENCODE (the fixture's audio source): real JDK RIFF
    * emission per row over one reusable buffer — the audio twin of
    * [[encodePngBatch]]. Pure byte-array streams end to end: no audio
    * device, no temp files (the ImageIO disk-cache hazard has no
    * javax.sound analogue here); the writer is the once-resolved
    * [[wavWriter]] (see its note for why not `AudioSystem.write`).
    */
  def encodeWavBatch(batch: Seq[(Long, Long)]): Seq[WavRow] = {
    import javax.sound.sampled.{AudioFileFormat, AudioFormat, AudioInputStream}
    val baos = new java.io.ByteArrayOutputStream(4096)
    batch.map { case (docId, h) =>
      val (sr, n) = wavParams(h)
      val samples = new Array[Byte](n)
      var i = 0
      while (i < n) { samples(i) = ((h + 37L * i) % 256).toByte; i += 1 }
      val fmt = new AudioFormat(AudioFormat.Encoding.PCM_UNSIGNED,
        sr.toFloat, 8, 1, 1, sr.toFloat, false)
      baos.reset()
      wavWriter.write(
        new AudioInputStream(new java.io.ByteArrayInputStream(samples), fmt, n.toLong),
        AudioFileFormat.Type.WAVE, baos)
      WavRow(docId, baos.toByteArray)
    }
  }

  /** REAL batched audio decode: the JDK's actual RIFF parser
    * ([[wavReader]], the same WaveFileReader `AudioSystem` would pick)
    * over the WAV bytes, with every feature measured from the decoded
    * format and sample stream. A payload that fails to parse fails the
    * batch loudly (quarantine-sink caveat as [[decodeBatch]]).
    */
  def decodeAudioBatch(batch: Seq[WavRow]): Seq[AudioFeatures] = {
    batch.map { r =>
      val in = wavReader.getAudioInputStream(new java.io.ByteArrayInputStream(r.media))
      val fmt = in.getFormat
      require(fmt.getChannels == 1 && fmt.getSampleSizeInBits == 8,
        s"doc ${r.doc_id}: unexpected decoded format $fmt")
      val sr = fmt.getSampleRate.toLong
      val bytes = in.readAllBytes()
      val n = bytes.length.toLong
      require(n == in.getFrameLength || in.getFrameLength < 0,
        s"doc ${r.doc_id}: stream length $n != container frame count ${in.getFrameLength}")
      var sum = 0L
      var peak = 0L
      var i = 0
      while (i < bytes.length) {
        val v = (bytes(i) & 0xff).toLong
        sum += v
        if (v > peak) peak = v
        i += 1
      }
      AudioFeatures(r.doc_id, sr, n, 1000L * n / sr, (n - 256) / 128 + 1,
        peak, sum.toDouble / (n * 255.0))
    }
  }

  /** The WAV media table m6 reads: one REAL RIFF/WAV payload per doc
    * (probe included), generated in a batched narrow encode hop from
    * the doc's portable hash — the audio sibling of [[mediaPng]].
    */
  def mediaWav(s: SparkSession, d: String): Dataset[WavRow] = {
    import s.implicits._
    mediaDocs(s, d)
      .select(col("doc_id"), TextOps.phash(col("text")).as("h"))
      .as[(Long, Long)]
      .mapPartitions(_.grouped(BatchSize).flatMap(g => encodeWavBatch(g.toSeq)))
  }

  /** Perceptual difference-hash (dHash) over the DECODED raster — the
    * standard image near-dup fingerprint (resize to a (GridW+1)×GridH
    * thumbnail, set one bit per horizontally-adjacent brightness
    * increase). The thumbnail here is a nearest-neighbor downsample
    * (sample at x = i·w/(GridW+1), y = j·h/GridH in integer math) so the
    * DuckDB oracle can reproduce every sampled pixel analytically from
    * the fixture's generating formula; a production build would swap in
    * area-averaging without changing any plumbing. Everything upstream
    * of the bit loop is REAL decoding — a lossy encode/decode or a
    * broken sampler hash-mismatches against the oracle.
    *
    * Same batched narrow hop as [[decodeBatch]]: no shuffle, no driver.
    */
  val GridW = 8 // comparisons per row (samples GridW+1 columns)
  val GridH = 8

  def dhashBatch(batch: Seq[PngRow]): Seq[DHashRow] = {
    disableImageIoDiskCache()
    batch.map { r =>
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(r.media))
      require(img != null, s"doc ${r.doc_id}: payload is not a decodable image")
      val w = img.getWidth; val ht = img.getHeight
      val raster = img.getRaster
      def px(i: Int, j: Int): Int =
        raster.getSample(i * w / (GridW + 1), j * ht / GridH, 0)
      var hi = 0L; var lo = 0L
      var j = 0
      while (j < GridH) {
        var i = 0
        while (i < GridW) {
          if (px(i + 1, j) > px(i, j)) {
            val idx = j * GridW + i
            if (idx < 32) lo |= 1L << idx else hi |= 1L << (idx - 32)
          }
          i += 1
        }
        j += 1
      }
      DHashRow(r.doc_id, hi, lo)
    }
  }

  /** Fit-to-box resize dimension computation in pure integer math (so
    * the oracle reproduces it with `//`) over the REAL decoded dims; a
    * full build would also rescale the raster here (same batched hop).
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
    * non-text payload (sentinel on both sides). It pins m1's
    * arbitrary-bytes catalog path only — it is deliberately NOT an
    * encodable image, so the PNG table (m2-m4) excludes it.
    */
  val BinaryProbeHex = "FF00C328DEADBEEF41429F"
  val BinaryProbeBytes = 11L
  val BinaryProbeMd5 = "e7f3948628b1d9a17f3ce3e9f5041407" // hashlib.md5
  val BinaryProbeH = 1044616621626957210L // int(md5[:15], 16)

  /** The binary-level media table: docs text cast to UTF-8 bytes, plus
    * the non-UTF-8 probe row. This is the frame m1 reads — the
    * catalog query sees the arbitrary-bytes row.
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

  /** The PNG media table m2-m4 read: one REAL PNG payload per doc (incl.
    * the -1 text probe; the -2 binary probe is m1's, see its scaladoc),
    * generated in a batched narrow encode hop from the doc's portable
    * hash, with the frame-count metadata column alongside.
    */
  def mediaPng(s: SparkSession, d: String): Dataset[PngRow] = {
    import s.implicits._
    mediaDocs(s, d)
      .select(col("doc_id"), TextOps.phash(col("text")).as("h"))
      .as[(Long, Long)]
      .mapPartitions(_.grouped(BatchSize).flatMap(g => encodePngBatch(g.toSeq)))
  }

  /** The batched decode stage: per-partition, grouped into BatchSize
    * chunks — no shuffle, no driver involvement.
    */
  def extractFeatures(media: Dataset[PngRow]): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions(_.grouped(BatchSize).flatMap(g => decodeBatch(g.toSeq)))
  }

  /** Single source for the oracle's analytic feature derivation (kept
    * in lockstep with [[pngDims]]/[[encodePngBatch]]'s generating
    * formulas — the engine side measures DECODED pixels; equality of
    * the two is exactly what the hash-match proves): per doc the
    * portable hash, the generated dims, and the closed-form pixel sum.
    */
  private val featsSql: String =
    s"""$docsSql,
      |hs AS (
      |  SELECT doc_id,
      |         CAST(concat('0x', substr(md5(text), 1, 15)) AS BIGINT) AS h
      |  FROM docs),
      |dims AS (
      |  SELECT doc_id, h,
      |         CAST(4 + (h % 13) AS BIGINT) AS w,
      |         CAST(3 + ((h // 13) % 11) AS BIGINT) AS hh
      |  FROM hs),
      |gx AS (SELECT doc_id, h, w, hh, unnest(generate_series(0, w - 1)) AS x FROM dims),
      |gxy AS (SELECT doc_id, h, w, hh, x, unnest(generate_series(0, hh - 1)) AS y FROM gx),
      |px AS (SELECT doc_id, SUM((h + 31 * x + 17 * y) % 256) AS sum_px FROM gxy GROUP BY doc_id),
      |f AS (SELECT d2.doc_id, d2.h, d2.w, d2.hh, p.sum_px
      |      FROM dims d2 JOIN px p USING (doc_id))""".stripMargin

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

    // M2: REAL batched decode + feature extraction — ImageIO decodes
    // each generated PNG and measures dims + mean level from the
    // raster; the oracle derives the same numbers analytically from
    // the generating formulas, so any encode/decode lossiness (or a
    // broken measurement loop) hash-mismatches.
    QueryDef.sql("m2_media_features",
      s"""WITH $featsSql
        |SELECT doc_id, CAST(w * hh AS BIGINT) AS n_bytes,
        |       CAST(w AS INT) AS width,
        |       CAST(hh AS INT) AS height,
        |       CAST(1 + (h % 30) AS INT) AS n_frames,
        |       CAST(sum_px AS DOUBLE) / (w * hh * 255.0) AS mean_level
        |FROM f ORDER BY doc_id""".stripMargin) { (s, d) =>
      extractFeatures(mediaPng(s, d)).toDF().orderBy("doc_id")
    },

    // M3: frame sampling — every 5th frame index per media item, driven
    // by the container's frame-count metadata riding next to the
    // payload. The explode(sequence(...)) generator is the real
    // plumbing a video pipeline uses to fan one row out to its sampled
    // frames (narrow, no shuffle); a real build would follow with a
    // per-frame decode.
    QueryDef.sql("m3_frame_sample",
      s"""WITH $featsSql,
        |feats AS (SELECT doc_id, 1 + (h % 30) AS n_frames FROM f)
        |SELECT doc_id, n_frames, frame_idx FROM (
        |  SELECT doc_id, n_frames,
        |         unnest(generate_series(0, n_frames - 1, 5)) AS frame_idx
        |  FROM feats)
        |ORDER BY doc_id, frame_idx""".stripMargin) { (s, d) =>
      import org.apache.spark.sql.functions.{explode, sequence}
      extractFeatures(mediaPng(s, d)).toDF()
        .select(col("doc_id"), col("n_frames").cast("long").as("n_frames"))
        .withColumn("frame_idx",
          explode(sequence(lit(0L), col("n_frames") - 1, lit(5L))))
        .orderBy("doc_id", "frame_idx")
    },

    // M4: resize stage — second batched mapPartitions hop chained after
    // the REAL decode (the decode→transform pipeline shape), fit-to-224
    // box in integer math over the decoded dims so the oracle
    // reproduces them exactly.
    QueryDef.sql("m4_resize",
      s"""WITH $featsSql,
        |dims2 AS (
        |  SELECT doc_id, CAST(w AS INT) AS width, CAST(hh AS INT) AS height
        |  FROM f)
        |SELECT doc_id, width, height,
        |       CAST(width * 224 // GREATEST(width, height) AS INT) AS new_w,
        |       CAST(height * 224 // GREATEST(width, height) AS INT) AS new_h
        |FROM dims2 ORDER BY doc_id""".stripMargin) { (s, d) =>
      import s.implicits._
      extractFeatures(mediaPng(s, d))
        .mapPartitions(_.grouped(BatchSize).flatMap(g => resizeBatch(g.toSeq)))
        .toDF()
        .orderBy("doc_id")
    },

    // M5: perceptual-hash (dHash) image dedup — the multimodal twin of
    // d1's exact text dedup: decode every payload (REAL ImageIO), sample
    // a 9×8 nearest-neighbor thumbnail, emit the 64-bit
    // adjacent-brightness hash as two 32-bit halves, then one hash
    // groupBy finds byte-identical AND re-encoded duplicate images
    // (dHash is encoder-independent: it fingerprints decoded pixels,
    // not the PNG stream). Scale shape: decode+hash is a narrow batched
    // hop; the only exchange carries (doc_id, 2×long) — the raster
    // never shuffles. The oracle reproduces every sampled pixel
    // analytically from the fixture's generating formula, so a lossy
    // codec path or a broken sampler hash-mismatches.
    QueryDef.sql("m5_phash_dedup",
      s"""WITH $docsSql,
        |hs AS (
        |  SELECT doc_id,
        |         CAST(concat('0x', substr(md5(text), 1, 15)) AS BIGINT) AS h
        |  FROM docs),
        |dims AS (
        |  SELECT doc_id, h,
        |         CAST(4 + (h % 13) AS BIGINT) AS w,
        |         CAST(3 + ((h // 13) % 11) AS BIGINT) AS hh
        |  FROM hs),
        |gi AS (SELECT doc_id, h, w, hh, unnest(generate_series(0, ${GridW - 1})) AS i FROM dims),
        |gij AS (SELECT doc_id, h, w, hh, i, unnest(generate_series(0, ${GridH - 1})) AS j FROM gi),
        |bits AS (
        |  SELECT doc_id, j * $GridW + i AS idx,
        |         CASE WHEN (h + 31 * (((i + 1) * w) // ${GridW + 1}) + 17 * ((j * hh) // $GridH)) % 256
        |                 > (h + 31 * ((i * w) // ${GridW + 1}) + 17 * ((j * hh) // $GridH)) % 256
        |              THEN CAST(1 AS BIGINT) ELSE CAST(0 AS BIGINT) END AS bit
        |  FROM gij),
        |hsh AS (
        |  SELECT doc_id,
        |         CAST(SUM(CASE WHEN idx >= 32 THEN bit << (idx - 32) ELSE 0 END) AS BIGINT) AS h_hi,
        |         CAST(SUM(CASE WHEN idx < 32 THEN bit << idx ELSE 0 END) AS BIGINT) AS h_lo
        |  FROM bits GROUP BY doc_id),
        |grp AS (
        |  SELECT h_hi, h_lo, COUNT(*) AS n_copies, MIN(doc_id) AS canon_id
        |  FROM hsh GROUP BY h_hi, h_lo)
        |SELECT doc_id, h_hi, h_lo, n_copies, canon_id
        |FROM hsh JOIN grp USING (h_hi, h_lo)
        |ORDER BY doc_id""".stripMargin) { (s, d) =>
      import s.implicits._
      import org.apache.spark.sql.expressions.Window
      val hashes = mediaPng(s, d)
        .mapPartitions(_.grouped(BatchSize).flatMap(g => dhashBatch(g.toSeq)))
        .toDF()
      val grp = Window.partitionBy("h_hi", "h_lo")
      hashes
        .withColumn("n_copies", count(lit(1)).over(grp))
        .withColumn("canon_id", min("doc_id").over(grp))
        .select("doc_id", "h_hi", "h_lo", "n_copies", "canon_id")
        .orderBy("doc_id")
    },

    // M6: REAL audio decode + feature extraction — the audio modality
    // the multimodal surface was missing by name (m1-m5 are image;
    // frame sampling rides container metadata). Each doc carries a
    // complete RIFF/WAV payload (PCM u8 mono, generated in a batched
    // narrow encode hop from the portable hash), the decode hop parses
    // it with the JDK's javax.sound.sampled (the real RIFF parser —
    // no external codec libs needed for PCM, so nothing is stubbed),
    // and every feature is measured from the DECODED container and
    // sample stream: rate, frame count, integer duration, the
    // 256/128 analysis-window count (the STFT framing a real audio
    // featurizer hops by), peak, mean level. The oracle derives the
    // same numbers analytically from the generating formulas, so
    // container corruption, a lossy round-trip, or a broken
    // measurement loop hash-mismatches (a compressed codec could not
    // be oracled this way — which is why the fixture is PCM).
    // 100 TB shape: encode and decode are narrow batched mapPartitions
    // hops (m2's shape — no shuffle, no driver hop, per-row constant
    // work); the only exchange is the presentation sort. javax.sound
    // streams pure byte arrays (no ImageIO-style disk cache hazard).
    QueryDef.sql("m6_audio_features",
      s"""WITH $docsSql,
        |hs AS (SELECT doc_id,
        |              CAST(concat('0x', substr(md5(text), 1, 15)) AS BIGINT) AS h
        |       FROM docs),
        |au AS (SELECT doc_id, h,
        |              CAST(8000 * (1 + h % 2) AS BIGINT) AS sr,
        |              CAST(400 + ((h // 2) % 800) AS BIGINT) AS n
        |       FROM hs),
        |sm AS (SELECT doc_id,
        |              CAST(SUM((h + 37 * i) % 256) AS BIGINT) AS ssum,
        |              CAST(MAX((h + 37 * i) % 256) AS BIGINT) AS speak
        |       FROM (SELECT doc_id, h, unnest(generate_series(0, n - 1)) AS i FROM au)
        |       GROUP BY doc_id)
        |SELECT a.doc_id, a.sr AS sample_rate, a.n AS n_samples,
        |       CAST((1000 * a.n) // a.sr AS BIGINT) AS duration_ms,
        |       CAST((a.n - 256) // 128 + 1 AS BIGINT) AS n_windows,
        |       s.speak AS peak_level,
        |       CAST(s.ssum AS DOUBLE) / (a.n * 255.0) AS mean_level
        |FROM au a JOIN sm s USING (doc_id)
        |ORDER BY a.doc_id""".stripMargin) { (s, d) =>
      import s.implicits._
      mediaWav(s, d)
        .mapPartitions(_.grouped(BatchSize).flatMap(g => decodeAudioBatch(g.toSeq)))
        .toDF()
        .orderBy("doc_id")
    }
  )
}

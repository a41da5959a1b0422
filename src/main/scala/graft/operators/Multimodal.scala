package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing: images/audio/video as opaque `binary`
  * columns plus a typed metadata struct, with decode / feature-extract /
  * frame-sample stages running as partition-local batch transforms.
  *
  * The Spark-side shape is the real thing — schema, encoders, partition
  * batching, null handling — while the codec itself is a pluggable
  * `MediaDecoder`. Real JDK-built-in codecs cover images
  * ([[JdkImageDecoder]], `javax.imageio`) and audio
  * ([[JdkAudioDecoder]], `javax.sound.sampled`), routed per record by
  * [[JdkMediaDecoder]]; the default remains `StubDecoder`, a
  * clearly-marked deterministic fake for formats with no in-container
  * codec (video). Swapping decoders is a one-line constructor change
  * and touches none of the distributed plumbing.
  *
  * Scale notes (100 TB):
  *  - media bytes never pass through a shuffle here: every stage is
  *    mapPartitions (narrow), so the only data movement is the initial
  *    scan. Partition sizing is governed by
  *    `spark.sql.files.maxPartitionBytes` against the parquet binary
  *    column — decode cost scales per-byte, not per-row.
  *  - the decoder is constructed once per partition (not per record),
  *    mirroring the batch-init pattern of a vectorized Python UDF
  *    (`mapInPandas`), which is where a real codec would amortize model
  *    or codec-context setup.
  *  - feature rows (small, fixed-width) are what flow into downstream
  *    joins/aggregations — the binary payload is dropped as early as the
  *    query allows.
  */
object Multimodal {

  /** Typed metadata carried alongside the opaque payload. */
  val metaSchema: StructType = StructType(Seq(
    StructField("fmt", StringType, nullable = false),
    StructField("n_bytes", LongType, nullable = false),
    StructField("width", IntegerType, nullable = true),
    StructField("height", IntegerType, nullable = true)))

  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("content", BinaryType, nullable = true),
    StructField("meta", metaSchema, nullable = false)))

  /** Decoded-feature output schema of [[decodeFeatures]]. */
  val featureSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("fmt", StringType, nullable = false),
    StructField("n_bytes", LongType, nullable = false),
    StructField("width", IntegerType, nullable = true),
    StructField("height", IntegerType, nullable = true),
    StructField("n_frames", IntegerType, nullable = false),
    StructField("mean_byte", DoubleType, nullable = true)))

  /** Partition-local codec contract. Implementations must be
    * serializable and are constructed once per partition. */
  trait MediaDecoder extends Serializable {
    /** (width, height, nFrames, meanByte) for a payload; None for null/empty. */
    def decode(fmt: String, bytes: Array[Byte]): Option[(Int, Int, Int, Double)]
  }

  /** Deterministic fake decoder — STUB for the absent media libraries.
    * "Dimensions" are derived from payload length, "frames" from a fixed
    * chunk size, mean byte value from the real bytes, so tests get stable
    * values while exercising the exact plumbing a real codec would use. */
  final class StubDecoder(frameBytes: Int = 64) extends MediaDecoder {
    override def decode(fmt: String, bytes: Array[Byte]): Option[(Int, Int, Int, Double)] = {
      if (bytes == null || bytes.isEmpty) None
      else {
        val n = bytes.length
        val w = math.max(1, math.sqrt(n.toDouble).toInt)
        val h = math.max(1, n / w)
        val frames = (n + frameBytes - 1) / frameBytes
        var s = 0L
        var i = 0
        while (i < n) { s += (bytes(i) & 0xff); i += 1 }
        Some((w, h, frames, s.toDouble / n))
      }
    }
  }

  /** REAL image decoder over the JDK's built-in `javax.imageio` (PNG,
    * BMP, GIF, JPEG — no external dependency): width/height from the
    * actual decoded raster, n_frames = 1, mean_byte = mean luminance
    * ((r+g+b)/3 averaged over every pixel). Proves the `MediaDecoder`
    * seam carries a real codec through the distributed plumbing
    * unchanged; payloads ImageIO cannot parse decode to None (the same
    * null-feature path as empty payloads). Stateless → trivially
    * serializable; ImageIO readers are obtained per call, which is the
    * codec-context cost a heavier codec would amortize per partition. */
  object JdkImageDecoder {
    // ImageIO's default is a DISK-backed image input stream cache: with
    // it on, every decode copies the (already in-memory) payload to a
    // temp file — doubled I/O and /tmp churn on the per-record hot
    // path. This is a DELIBERATE JVM-global flip (it also affects any
    // other ImageIO user in the executor/driver JVM), applied exactly
    // once per classload from this static initializer rather than as a
    // hidden side effect of each decoder instantiation; memory-backed
    // streams are strictly better for byte-array input.
    javax.imageio.ImageIO.setUseCache(false)
    private[operators] def ensureInit(): Unit = ()

    /** Σ per-pixel (r+g+b)/3 and the pixel count — the shared luminance
      * kernel of the image decoder and the MJPG frame path. Bulk getRGB:
      * one ColorModel conversion per ROW of pixels, not one virtual call
      * + bounds check per pixel; the scratch buffer stays O(width). */
    private[operators] def luminanceSum(
        img: java.awt.image.BufferedImage): (Double, Long) = {
      val (w, h) = (img.getWidth, img.getHeight)
      val row = new Array[Int](w)
      var s = 0.0
      var y = 0
      while (y < h) {
        img.getRGB(0, y, w, 1, row, 0, w)
        var x = 0
        while (x < w) {
          val rgb = row(x)
          s += (((rgb >> 16) & 0xff) + ((rgb >> 8) & 0xff) + (rgb & 0xff)) / 3.0
          x += 1
        }
        y += 1
      }
      (s, w.toLong * h)
    }
  }

  final class JdkImageDecoder extends MediaDecoder {
    override def decode(fmt: String, bytes: Array[Byte]): Option[(Int, Int, Int, Double)] = {
      // in decode(), not the constructor: the decoder ships to executors
      // via closure SERIALIZATION, which never runs constructors — this
      // is the first line that provably executes in the decoding JVM.
      // After the first call it is a no-op static-init check.
      JdkImageDecoder.ensureInit()
      if (bytes == null || bytes.isEmpty) None
      else {
        // NonFatal, not just IOException: ImageIO plugins throw
        // unchecked exceptions (IllegalArgument, CMMException, ...) on
        // corrupt payloads, and one bad record must not kill the stage
        val img =
          try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
          catch { case scala.util.control.NonFatal(_) => null }
        if (img == null) None
        else {
          val (s, px) = JdkImageDecoder.luminanceSum(img)
          Some((img.getWidth, img.getHeight, 1, s / px))
        }
      }
    }
  }

  /** REAL audio decoder over the JDK's built-in `javax.sound.sampled`
    * (WAV, AIFF, AU — no external dependency). Feature mapping for the
    * shared tuple: width = channels, height = sample rate (Hz),
    * n_frames = PCM frame count, mean_byte = mean ABSOLUTE sample
    * amplitude normalized to 0..255 (a loudness proxy on the same scale
    * as image luminance, so downstream thresholds stay unit-compatible).
    * Supports 8/16-bit PCM, signed or unsigned, either endianness —
    * everything the JDK WAV/AIFF readers themselves emit. Unparseable
    * payloads take the None path like any other corrupt record. */
  final class JdkAudioDecoder extends MediaDecoder {
    override def decode(fmt: String, bytes: Array[Byte]): Option[(Int, Int, Int, Double)] = {
      if (bytes == null || bytes.isEmpty) None
      else {
        val in =
          try javax.sound.sampled.AudioSystem.getAudioInputStream(
            new java.io.ByteArrayInputStream(bytes))
          catch { case scala.util.control.NonFatal(_) => null }
        if (in == null) None
        else try {
          val f = in.getFormat
          val bits = f.getSampleSizeInBits
          val signed =
            f.getEncoding == javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED
          val unsigned =
            f.getEncoding == javax.sound.sampled.AudioFormat.Encoding.PCM_UNSIGNED
          if ((bits != 8 && bits != 16) || !(signed || unsigned)) None
          else {
            val pcm = in.readAllBytes()
            val bytesPerSample = bits / 8
            val n = pcm.length / bytesPerSample
            if (n == 0) None
            else {
              // mean |amplitude| in one integer pass; full-scale = 2^(bits-1)
              var s = 0.0
              var i = 0
              while (i < n) {
                val off = i * bytesPerSample
                val v =
                  if (bits == 8) {
                    val raw = pcm(off) & 0xff
                    if (signed) pcm(off).toInt else raw - 128
                  } else {
                    val (lo, hi) =
                      if (f.isBigEndian) (pcm(off + 1) & 0xff, pcm(off).toInt)
                      else (pcm(off) & 0xff, pcm(off + 1).toInt)
                    val raw = (hi << 8) | lo
                    if (signed) raw.toShort.toInt else (raw & 0xffff) - 32768
                  }
                s += math.abs(v)
                i += 1
              }
              val fullScale = 1 << (bits - 1)
              val frames = n / math.max(1, f.getChannels)
              Some((f.getChannels, f.getSampleRate.toInt, frames,
                s / n / fullScale * 255.0))
            }
          }
        } catch { case scala.util.control.NonFatal(_) => None }
        finally in.close()
      }
    }
  }

  /** REAL video decoder for the RIFF/AVI container: walks the chunk
    * tree (plain byte structure, no codec needed) to the `avih` main
    * header for width/height/frame-count metadata, and — when the video
    * stream's fourcc is MJPG — DECODES the actual frames: every MJPG
    * frame chunk is a standalone JPEG, so the existing `javax.imageio`
    * path reads real pixels (width/height from the decoded raster,
    * n_frames = frames decoded, mean_byte = mean luminance across every
    * frame's pixels, the image decoder's kernel). Codecs the JDK does
    * not ship (XVID, H.264, ...) keep the metadata probe: avih
    * dimensions + payload byte mean — the remaining stub boundary, now
    * confined to genuinely absent codecs. Truncated or non-AVI payloads
    * probe to None like any other unparseable record. Chunk sizes are
    * validated against the buffer before every read — a hostile length
    * field cannot index out of bounds. */
  final class RiffAviProbe extends MediaDecoder {
    private def le32(b: Array[Byte], off: Int): Long =
      ((b(off) & 0xffL)) | ((b(off + 1) & 0xffL) << 8) |
        ((b(off + 2) & 0xffL) << 16) | ((b(off + 3) & 0xffL) << 24)
    private def tag(b: Array[Byte], off: Int): String =
      new String(b, off, 4, java.nio.charset.StandardCharsets.US_ASCII)

    /** Bounds-checked iteration over one RIFF chunk run [from, until):
      * (id, dataStart, dataSize) per chunk; stops at the first chunk
      * whose declared size leaves the window (lying header). */
    private def chunkRun(b: Array[Byte], from: Int,
        until: Int): Iterator[(String, Int, Int)] =
      new Iterator[(String, Int, Int)] {
        private var off = from
        private var nxt: (String, Int, Int) = _
        private def advance(): Unit = {
          nxt = null
          if (off + 8 <= until) {
            val id = tag(b, off)
            val size = le32(b, off + 4)
            val ds = off + 8
            if (size >= 0 && ds + size <= until) {
              nxt = (id, ds, size.toInt)
              off = ds + size.toInt + (size.toInt & 1) // chunks even-padded
            }
          }
        }
        advance()
        override def hasNext: Boolean = nxt != null
        override def next(): (String, Int, Int) = { val r = nxt; advance(); r }
      }

    private def listType(b: Array[Byte], ds: Int, size: Int): String =
      if (size >= 4) tag(b, ds) else ""

    /** First 'vids' stream: (stream index, fourcc) — the fourcc from
      * strh's fccHandler, falling back to strf's biCompression (writers
      * disagree on which carries it). */
    private def findVideoStream(b: Array[Byte]): Option[(Int, String)] = {
      var streamIdx = -1
      for ((id, ds, size) <- chunkRun(b, 12, b.length)
           if id == "LIST" && listType(b, ds, size) == "hdrl";
           (id2, ds2, size2) <- chunkRun(b, ds + 4, ds + size)
           if id2 == "LIST" && listType(b, ds2, size2) == "strl") {
        streamIdx += 1
        var isVids = false
        var handler = ""
        var compression = ""
        for ((id3, ds3, size3) <- chunkRun(b, ds2 + 4, ds2 + size2)) {
          if (id3 == "strh" && size3 >= 8) {
            isVids = tag(b, ds3) == "vids"
            handler = tag(b, ds3 + 4).trim
          } else if (id3 == "strf" && size3 >= 20)
            compression = tag(b, ds3 + 16).trim
        }
        if (isVids)
          return Some((streamIdx, if (handler.nonEmpty) handler else compression))
      }
      None
    }

    /** The video stream's frame chunks (`NNdc`/`NNdb` inside the movi
      * list, including `rec ` groupings) as (dataStart, size) spans. */
    private def frameChunks(b: Array[Byte], streamIdx: Int): Seq[(Int, Int)] = {
      val want = f"$streamIdx%02d"
      val out = Seq.newBuilder[(Int, Int)]
      // real RIFF files nest LIST movi/`rec ` fewer than 5 deep; a
      // hostile payload can nest a 12-byte LIST per level, so an
      // unbounded walk would recurse ~len/12 frames deep and blow the
      // stack (a StackOverflowError the NonFatal decode guards do NOT
      // absorb). Over-deep branches are treated as unparseable — the
      // walk just stops descending, and a frameless result falls back
      // to the metadata probe like any other corrupt stream.
      def walk(from: Int, until: Int, inMovi: Boolean, depth: Int): Unit =
        if (depth <= 16)
          for ((id, ds, size) <- chunkRun(b, from, until)) {
            val lt = if (id == "LIST") listType(b, ds, size) else ""
            if (lt == "movi" || (inMovi && lt == "rec "))
              walk(ds + 4, ds + size, inMovi = true, depth + 1)
            else if (inMovi && id.startsWith(want) &&
                (id.endsWith("dc") || id.endsWith("db")))
              out += ((ds, size))
          }
      walk(12, b.length, inMovi = false, depth = 0)
      out.result()
    }

    /** Decode every MJPG frame chunk as a standalone JPEG; None when no
      * frame decodes (corrupt stream → the metadata fallback). */
    private def decodeMjpgFrames(b: Array[Byte],
        streamIdx: Int): Option[(Int, Int, Int, Double)] = {
      JdkImageDecoder.ensureInit()
      var w = 0
      var h = 0
      var n = 0
      var lum = 0.0
      var pixels = 0L
      frameChunks(b, streamIdx).foreach { case (ds, size) =>
        val img =
          try javax.imageio.ImageIO.read(
            new java.io.ByteArrayInputStream(b, ds, size))
          catch { case scala.util.control.NonFatal(_) => null }
        if (img != null) {
          if (n == 0) { w = img.getWidth; h = img.getHeight }
          val (s, px) = JdkImageDecoder.luminanceSum(img)
          lum += s
          pixels += px
          n += 1
        }
      }
      if (n == 0 || pixels == 0) None else Some((w, h, n, lum / pixels))
    }

    /** Depth-first walk over a chunk run [from, until); returns the data
      * offset of the first `avih` chunk whose DECLARED size covers the
      * 40 header bytes read below — a shorter declaration means those
      * bytes belong to the next chunk, not the header. */
    private def findAvih(b: Array[Byte], from: Int, until: Int): Option[Int] = {
      var off = from
      while (off + 8 <= until) {
        val id = tag(b, off)
        val size = le32(b, off + 4)
        val dataStart = off + 8
        if (size < 0 || dataStart + size > until) return None // lying header
        if (id == "avih") return if (size >= 40) Some(dataStart) else None
        if (id == "LIST" && size >= 4) {
          // LIST data = 4-byte list type + nested chunk run
          val hit = findAvih(b, dataStart + 4, dataStart + size.toInt)
          if (hit.isDefined) return hit
        }
        off = dataStart + size.toInt + (size.toInt & 1) // chunks are even-padded
      }
      None
    }

    override def decode(fmt: String, bytes: Array[Byte]): Option[(Int, Int, Int, Double)] = {
      if (bytes == null || bytes.length < 12) None
      else if (tag(bytes, 0) != "RIFF" || tag(bytes, 8) != "AVI ") None
      else
        findAvih(bytes, 12, bytes.length).flatMap { at =>
          // avih layout (little-endian u32s from data start): +16 total
          // frames, +32 width, +36 height
          val frames = le32(bytes, at + 16)
          val w = le32(bytes, at + 32)
          val h = le32(bytes, at + 36)
          // u32 fields that would wrap a signed Int are corrupt, not
          // metadata — the contract is None, never negative dimensions
          if (w > Int.MaxValue || h > Int.MaxValue || frames > Int.MaxValue) None
          else {
            // MJPG: real pixels through ImageIO (each frame is a
            // standalone JPEG); any other fourcc — or an MJPG stream
            // whose frames all fail to decode — keeps the metadata
            // probe with the payload byte mean
            val decoded = findVideoStream(bytes) match {
              case Some((idx, cc)) if cc.equalsIgnoreCase("MJPG") =>
                decodeMjpgFrames(bytes, idx)
              case _ => None
            }
            decoded.orElse {
              var s = 0L
              var i = 0
              while (i < bytes.length) { s += (bytes(i) & 0xff); i += 1 }
              Some((w.toInt, h.toInt, frames.toInt, s.toDouble / bytes.length))
            }
          }
        }
    }
  }

  /** Format-routing decoder: dispatch each record to the real JDK codec
    * for its modality — `javax.imageio` for raster formats,
    * `javax.sound.sampled` for audio containers, the RIFF walker for
    * AVI video metadata — so one decoder instance serves a mixed media
    * corpus. Unknown formats decode to None (quarantine-shaped, not a
    * crash), keeping "a format we cannot decode" distinguishable from
    * "a payload that failed to decode". */
  final class JdkMediaDecoder extends MediaDecoder {
    private val image = new JdkImageDecoder
    private val audio = new JdkAudioDecoder
    private val video = new RiffAviProbe
    private val imageFmts = Set("png", "bmp", "gif", "jpg", "jpeg", "wbmp")
    private val audioFmts = Set("wav", "wave", "aiff", "aif", "au", "snd")
    private val videoFmts = Set("avi")
    override def decode(fmt: String, bytes: Array[Byte]): Option[(Int, Int, Int, Double)] = {
      val f = if (fmt == null) "" else fmt.toLowerCase
      if (imageFmts(f)) image.decode(fmt, bytes)
      else if (audioFmts(f)) audio.decode(fmt, bytes)
      else if (videoFmts(f)) video.decode(fmt, bytes)
      else None
    }
  }

  /** Wrap a text/bytes DataFrame into the media shape: `(media_id,
    * content: binary, meta)`. Used by tests and by q42 to manufacture a
    * deterministic multimodal table from `documents`. */
  def fromDocuments(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id").as("media_id"),
      encode(col("text"), "UTF-8").as("content"),
      struct(
        lit("txt").as("fmt"),
        length(encode(col("text"), "UTF-8")).cast("long").as("n_bytes"),
        lit(null).cast("int").as("width"),
        lit(null).cast("int").as("height")).as("meta"))

  /** Typed views of [[mediaSchema]] / [[featureSchema]] for Dataset ops. */
  final case class MediaMeta(fmt: String, n_bytes: Long, width: Option[Int], height: Option[Int])
  final case class MediaRecord(media_id: Long, content: Array[Byte], meta: MediaMeta)
  final case class MediaFeatures(
      media_id: Long, fmt: String, n_bytes: Long,
      width: Option[Int], height: Option[Int],
      n_frames: Int, mean_byte: Option[Double])

  /** Decode + feature-extract: one decoder instance per partition (the
    * batch-init point a real codec amortizes), one output row per media
    * row. Narrow — no shuffle; the binary column is dropped on output. */
  def decodeFeatures(media: DataFrame, decoder: MediaDecoder = new StubDecoder()): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.as[MediaRecord].mapPartitions { it =>
      // per-partition init — where a real codec opens its context once
      val d = decoder
      it.map { r =>
        d.decode(r.meta.fmt, r.content) match {
          case Some((w, h, frames, mean)) =>
            MediaFeatures(r.media_id, r.meta.fmt, r.meta.n_bytes,
              Some(w), Some(h), frames, Some(mean))
          case None =>
            MediaFeatures(r.media_id, r.meta.fmt, r.meta.n_bytes,
              None, None, 0, None)
        }
      }
    }
  }

  /** Resize: shrink each payload to at most `targetBytes` — STUBBED as
    * deterministic byte decimation (ceil-stride sampling), standing in
    * for a real image/audio resampler. The distributed plumbing is the
    * real thing — narrow mapPartitions over the typed Dataset, metadata
    * updated alongside the payload; a real implementation threads a
    * codec the way [[decodeFeatures]] threads its `MediaDecoder`. */
  def resize(media: DataFrame, targetBytes: Int): Dataset[MediaRecord] = {
    require(targetBytes > 0)
    import media.sparkSession.implicits._
    media.as[MediaRecord].mapPartitions { it =>
      it.map { r =>
        if (r.content == null || r.content.length <= targetBytes) r
        else {
          // ceil stride keeps output <= targetBytes (floor would leave
          // up to ~2x the target: len=127/target=64 → stride 1 = no-op)
          val stride = (r.content.length + targetBytes - 1) / targetBytes
          // pre-sized while loop: the indices.collect form boxed every
          // byte of a multi-MB payload on this bulk-media hot path
          val n = (r.content.length + stride - 1) / stride
          val out = new Array[Byte](n.toInt)
          var i = 0
          var j = 0
          while (j < out.length) { out(j) = r.content(i); i += stride.toInt; j += 1 }
          r.copy(content = out,
            meta = r.meta.copy(n_bytes = out.length))
        }
      }
    }
  }

  /** Distinct frame fingerprints per media item: fixed-size payload
    * chunks digested to md5 — the perceptual-hash-shaped signature set
    * that media dedup joins on. (The digest is over the frame's hex
    * encoding so a SQL oracle without blob-md5 support can reproduce it;
    * the hex detour is byte-lossless.) Narrow until the final distinct,
    * which shuffles 16-byte digests — never payload bytes. */
  def frameFingerprints(media: DataFrame, frameBytes: Int = 64,
      stride: Int = 1): DataFrame =
    sampleFrames(media, frameBytes, stride)
      .select(col("media_id"), md5(hex(col("frame_bytes"))).as("fp"))
      .distinct()

  /** Media near-duplicate pairs by frame-set Jaccard ≥ threshold — the
    * video/audio analog of document shingle dedup: two items that share
    * most of their (sampled) frames are versions of the same asset
    * (re-encode, trim, watermark). Same scale rules as Dedup: the pair
    * stage joins on fixed-width digests, so the quadratic mass is the
    * shared-frame mass, not |media|². For corpus-scale use, band the
    * fingerprints (Dedup.minHashLshPairs over the fp strings) before
    * pairing; this exact variant is the oracle-checkable baseline. */
  def nearDupMedia(media: DataFrame, frameBytes: Int = 64, stride: Int = 1,
      threshold: Double = 0.5): DataFrame = {
    val fps = frameFingerprints(media, frameBytes, stride)
      .localCheckpoint(true) // three consumers: sizes + both join sides
    val sizes = fps.groupBy("media_id").agg(count(lit(1)).as("n"))
    val out = fps.select(col("media_id").as("media_a"), col("fp"))
      .join(fps.select(col("media_id").as("media_b"), col("fp")), "fp")
      .filter(col("media_a") < col("media_b"))
      .groupBy("media_a", "media_b")
      .agg(count(lit(1)).as("inter"))
      .join(sizes.select(col("media_id").as("media_a"), col("n").as("na")), "media_a")
      .join(sizes.select(col("media_id").as("media_b"), col("n").as("nb")), "media_b")
      .withColumn("jaccard",
        col("inter").cast("double") / (col("na") + col("nb") - col("inter")))
      .filter(col("jaccard") >= threshold)
      .select("media_a", "media_b", "jaccard")
      // pair-scale result; checkpointing it lets the corpus-scale
      // fingerprint blocks be FREED instead of leaking across repeated
      // calls (the Dedup.freeLocalCheckpoint discipline)
      .localCheckpoint(true)
    Dedup.freeLocalCheckpoint(fps)
    out
  }

  /** Deterministic per-media embedding from sampled frames: the 16-dim
    * hex-digit histogram of the payload's sampled frames, pooled by
    * EXACT integer summation (order-independent — no float pooling
    * noise to round away). Stands in for a real frame-encoder model the
    * way [[StubDecoder]] stands in for a codec: the pipeline shape —
    * frames → per-frame features → integer-exact pooling → fixed-width
    * vector per media — is precisely what a production embed stage
    * does, and everything downstream (ANN, near-dup, clustering from
    * graft.operators.Similarity) consumes it unchanged. Narrow until
    * the final 16-column aggregate; frame bytes never shuffle. */
  def hexHistogramEmbedding(media: DataFrame, frameBytes: Int = 64,
      stride: Int = 4): DataFrame = {
    val digits = "0123456789ABCDEF"
    val withHex = sampleFrames(media, frameBytes, stride)
      .select(col("media_id"), hex(col("frame_bytes")).as("__h"))
    val counts = digits.map(ch =>
      (length(col("__h")) - length(expr(s"replace(__h, '$ch', '')")))
        .cast("long").as(s"__c$ch"))
    withHex.select(col("media_id") +: counts: _*)
      .groupBy("media_id")
      .agg(sum(s"__c${digits.head}").as(s"__s${digits.head}"),
        digits.tail.map(ch => sum(s"__c$ch").as(s"__s$ch")): _*)
      .select(col("media_id"),
        array(digits.map(ch => col(s"__s$ch")): _*).as("v"))
  }

  /** Frame sampling: every `stride`-th fixed-size chunk of the payload,
    * exploded to one row per sampled frame (narrow, shuffle-free). */
  def sampleFrames(media: DataFrame, frameBytes: Int = 64, stride: Int = 4): DataFrame = {
    require(frameBytes > 0 && stride > 0)
    media
      .select(col("media_id"), col("content"))
      // empty payloads have zero frames — and sequence(0, -1) would
      // otherwise produce a DESCENDING [0, -1] and emit a phantom frame
      .where(col("content").isNotNull && length(col("content")) > 0)
      .select(col("media_id"),
        posexplode(expr(
          s"""transform(
                filter(sequence(0, CAST(ceil(length(content) / $frameBytes.0D) AS INT) - 1),
                       i -> i % $stride = 0),
                i -> substring(content, i * $frameBytes + 1, $frameBytes))""")))
      .toDF("media_id", "sample_idx", "frame_bytes")
      .withColumn("frame_no", col("sample_idx") * stride)
      .select("media_id", "frame_no", "frame_bytes")
  }
}

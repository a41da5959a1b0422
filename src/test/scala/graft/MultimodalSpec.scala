package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Multimodal

class MultimodalSpec extends AnyFunSuite with SparkSpec {

  // filter (pushed to the scan), not limit: limit injects a
  // single-partition Exchange that would mask narrow-plan assertions
  private def media = Multimodal.fromDocuments(
    Tables.documents(spark, sf("sf0.001")).filter(col("doc_id") < 50))

  test("fromDocuments produces the opaque-binary media schema") {
    val sch = media.schema
    assert(sch("content").dataType == BinaryType)
    assert(sch("meta").dataType.asInstanceOf[StructType].fieldNames.toSeq ==
      Seq("fmt", "n_bytes", "width", "height"))
    val r = media.orderBy("media_id").head()
    val bytes = r.getAs[Array[Byte]]("content")
    val meta = r.getStruct(r.fieldIndex("meta"))
    assert(meta.getAs[Long]("n_bytes") == bytes.length)
  }

  test("decodeFeatures: stub codec yields deterministic per-row features") {
    val feats = Multimodal.decodeFeatures(media).collect()
    assert(feats.length == media.count())
    feats.foreach { f =>
      assert(f.n_frames == (f.n_bytes + 63) / 64, s"frames for ${f.media_id}")
      assert(f.width.exists(_ >= 1) && f.height.exists(_ >= 1))
      // content is ASCII text → mean byte strictly inside (32, 127)
      assert(f.mean_byte.exists(m => m > 32 && m < 127))
    }
    // determinism across runs
    val again = Multimodal.decodeFeatures(media).collect()
    assert(feats.sortBy(_.media_id).toSeq == again.sortBy(_.media_id).toSeq)
  }

  test("decodeFeatures: JdkImageDecoder decodes REAL PNG/BMP payloads") {
    import spark.implicits._
    // paint deterministic images in-memory, round-trip through the real
    // PNG/BMP encoders, and drive the bytes through the full distributed
    // decode path — width/height must come from the actual rasters
    def imageBytes(w: Int, h: Int, format: String): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(
        w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until h; x <- 0 until w)
        img.setRGB(x, y, ((x * 7 + y * 13) % 256) * 0x010101) // gray ramp
      val out = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, format, out)
      out.toByteArray
    }
    val rows = Seq(
      (1L, imageBytes(17, 9, "png"), "png"),
      (2L, imageBytes(4, 23, "bmp"), "bmp"),
      (3L, "not an image at all".getBytes("UTF-8"), "png"))
    val m = rows.toDF("media_id", "content", "fmt")
      .select(col("media_id"), col("content"),
        struct(col("fmt"), length(col("content")).cast("long").as("n_bytes"),
          lit(null).cast("int").as("width"),
          lit(null).cast("int").as("height")).as("meta"))
    val f = Multimodal.decodeFeatures(m, new Multimodal.JdkImageDecoder)
      .collect().sortBy(_.media_id)
    assert(f(0).width.contains(17) && f(0).height.contains(9) && f(0).n_frames == 1)
    assert(f(1).width.contains(4) && f(1).height.contains(23))
    // gray ramp pixels: mean luminance strictly inside (0, 255), and
    // identical for the lossless PNG round-trip of the same painting rule
    assert(f(0).mean_byte.exists(mb => mb > 0 && mb < 255))
    // undecodable payload → the None path, not a crash
    assert(f(2).width.isEmpty && f(2).n_frames == 0 && f(2).mean_byte.isEmpty)
  }

  test("decodeFeatures: JdkAudioDecoder decodes REAL WAV payloads") {
    import spark.implicits._
    // synthesize 16-bit signed PCM in-memory, round-trip through the real
    // JDK WAV writer, and decode through the full distributed path:
    // channels/sample-rate/frame-count must come from the actual header,
    // mean_byte from the actual samples
    def wavBytes(channels: Int, rate: Float, frames: Int,
        amplitude: Double): Array[Byte] = {
      val fmt = new javax.sound.sampled.AudioFormat(rate, 16, channels, true, false)
      val pcm = new Array[Byte](frames * channels * 2)
      for (i <- 0 until frames; c <- 0 until channels) {
        val v = (amplitude * Short.MaxValue *
          math.sin(2 * math.Pi * i / 32.0)).toInt
        val off = (i * channels + c) * 2
        pcm(off) = (v & 0xff).toByte
        pcm(off + 1) = ((v >> 8) & 0xff).toByte
      }
      val ais = new javax.sound.sampled.AudioInputStream(
        new java.io.ByteArrayInputStream(pcm), fmt, frames.toLong)
      val out = new java.io.ByteArrayOutputStream()
      javax.sound.sampled.AudioSystem.write(ais,
        javax.sound.sampled.AudioFileFormat.Type.WAVE, out)
      out.toByteArray
    }
    val rows = Seq(
      (1L, wavBytes(1, 8000f, 640, 0.5), "wav"),
      (2L, wavBytes(2, 44100f, 256, 0.5), "wav"),
      (3L, "not audio".getBytes("UTF-8"), "wav"))
    val m = rows.toDF("media_id", "content", "fmt")
      .select(col("media_id"), col("content"),
        struct(col("fmt"), length(col("content")).cast("long").as("n_bytes"),
          lit(null).cast("int").as("width"),
          lit(null).cast("int").as("height")).as("meta"))
    val f = Multimodal.decodeFeatures(m, new Multimodal.JdkAudioDecoder)
      .collect().sortBy(_.media_id)
    assert(f(0).width.contains(1) && f(0).height.contains(8000) && f(0).n_frames == 640)
    assert(f(1).width.contains(2) && f(1).height.contains(44100) && f(1).n_frames == 256)
    // half-scale sine: mean |sin| = 2/pi, so mean_byte ≈ 0.5 * 2/pi * 255
    val expected = 0.5 * 2 / math.Pi * 255
    assert(f(0).mean_byte.exists(mb => math.abs(mb - expected) < 3), f(0).mean_byte)
    // undecodable payload → the None path, not a crash
    assert(f(2).width.isEmpty && f(2).n_frames == 0 && f(2).mean_byte.isEmpty)
  }

  test("decodeFeatures: JdkMediaDecoder routes a MIXED image+audio corpus") {
    import spark.implicits._
    def png(w: Int, h: Int): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(
        w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
      val out = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", out)
      out.toByteArray
    }
    def wav(frames: Int): Array[Byte] = {
      val fmt = new javax.sound.sampled.AudioFormat(16000f, 16, 1, true, false)
      val ais = new javax.sound.sampled.AudioInputStream(
        new java.io.ByteArrayInputStream(new Array[Byte](frames * 2)), fmt, frames.toLong)
      val out = new java.io.ByteArrayOutputStream()
      javax.sound.sampled.AudioSystem.write(ais,
        javax.sound.sampled.AudioFileFormat.Type.WAVE, out)
      out.toByteArray
    }
    val rows = Seq(
      (1L, png(5, 3), "png"),
      (2L, wav(100), "wav"),
      (3L, Array[Byte](1, 2, 3), "mp4")) // no in-container codec → None
    val m = rows.toDF("media_id", "content", "fmt")
      .select(col("media_id"), col("content"),
        struct(col("fmt"), length(col("content")).cast("long").as("n_bytes"),
          lit(null).cast("int").as("width"),
          lit(null).cast("int").as("height")).as("meta"))
    val f = Multimodal.decodeFeatures(m, new Multimodal.JdkMediaDecoder)
      .collect().sortBy(_.media_id)
    assert(f(0).width.contains(5) && f(0).height.contains(3))   // image route
    assert(f(1).width.contains(1) && f(1).height.contains(16000) // audio route
      && f(1).n_frames == 100)
    assert(f(2).width.isEmpty && f(2).n_frames == 0)             // unknown fmt
  }

  test("RiffAviProbe reads REAL AVI container metadata; hostile sizes stay in bounds") {
    def aviBytes(w: Int, h: Int, frames: Int): Array[Byte] = {
      // RIFF('AVI ' LIST('hdrl' avih(56-byte main header)))
      val buf = java.nio.ByteBuffer.allocate(88)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      buf.put("RIFF".getBytes("US-ASCII")).putInt(80)
        .put("AVI ".getBytes("US-ASCII"))
      buf.put("LIST".getBytes("US-ASCII")).putInt(4 + 8 + 56)
        .put("hdrl".getBytes("US-ASCII"))
      buf.put("avih".getBytes("US-ASCII")).putInt(56)
      buf.putInt(33333).putInt(0).putInt(0).putInt(0) // usec/frame, ...
      buf.putInt(frames).putInt(0).putInt(0).putInt(0) // dwTotalFrames @ +16
      buf.putInt(w).putInt(h)                          // dwWidth/dwHeight @ +32
      buf.putInt(0).putInt(0).putInt(0).putInt(0)
      buf.array()
    }
    val probe = new Multimodal.RiffAviProbe
    val ok = probe.decode("avi", aviBytes(320, 240, 42))
    assert(ok.map(t => (t._1, t._2, t._3)).contains((320, 240, 42)))
    // routed through the mixed-corpus decoder by format
    assert(new Multimodal.JdkMediaDecoder()
      .decode("avi", aviBytes(64, 48, 7)).map(_._3).contains(7))
    // truncated mid-header, non-RIFF, and a lying chunk size → None
    assert(probe.decode("avi", aviBytes(320, 240, 42).take(40)).isEmpty)
    assert(probe.decode("avi", "not media at all".getBytes).isEmpty)
    val lying = aviBytes(320, 240, 42)
    val bb = java.nio.ByteBuffer.wrap(lying).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.putInt(16, Int.MaxValue) // LIST size now points far past the buffer
    assert(probe.decode("avi", lying).isEmpty)
  }

  test("MJPG AVI decodes REAL pixels; a non-MJPG fourcc keeps the metadata probe") {
    // minimal RIFF writer: chunk = id + le32(size) + data (+ pad byte)
    def le32(n: Int): Array[Byte] = java.nio.ByteBuffer.allocate(4)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN).putInt(n).array()
    def chunk(id: String, data: Array[Byte]): Array[Byte] =
      id.getBytes("US-ASCII") ++ le32(data.length) ++ data ++
        (if (data.length % 2 == 1) Array[Byte](0) else Array.empty[Byte])
    def list(typ: String, children: Array[Byte]*): Array[Byte] =
      chunk("LIST", typ.getBytes("US-ASCII") ++ children.flatten)
    def avih(w: Int, h: Int, frames: Int): Array[Byte] = {
      val b = java.nio.ByteBuffer.allocate(56)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      b.putInt(33333).putInt(0).putInt(0).putInt(0)
      b.putInt(frames).putInt(0).putInt(0).putInt(0)
      b.putInt(w).putInt(h); b.array()
    }
    def strh(fourcc: String): Array[Byte] = {
      val b = java.nio.ByteBuffer.allocate(56)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      b.put("vids".getBytes("US-ASCII")).put(fourcc.getBytes("US-ASCII"))
      b.array()
    }
    def strf(fourcc: String, w: Int, h: Int): Array[Byte] = {
      val b = java.nio.ByteBuffer.allocate(40)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      b.putInt(40).putInt(w).putInt(h).putShort(1).putShort(24)
      b.put(fourcc.getBytes("US-ASCII")); b.array()
    }
    def jpeg(gray: Int, w: Int, h: Int): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(
        w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
      val g = img.createGraphics()
      g.setColor(new java.awt.Color(gray, gray, gray))
      g.fillRect(0, 0, w, h); g.dispose()
      val out = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "jpg", out)
      out.toByteArray
    }
    def avi(fourcc: String, declaredW: Int, declaredH: Int,
        declaredFrames: Int, frames: Array[Byte]*): Array[Byte] = {
      val body = list("hdrl", chunk("avih", avih(declaredW, declaredH,
          declaredFrames)),
          list("strl", chunk("strh", strh(fourcc)),
            chunk("strf", strf(fourcc, declaredW, declaredH)))) ++
        list("movi", frames.map(f => chunk("00dc", f)): _*)
      "RIFF".getBytes("US-ASCII") ++ le32(4 + body.length) ++
        "AVI ".getBytes("US-ASCII") ++ body
    }
    val probe = new Multimodal.RiffAviProbe
    // the avih DECLARES 999x777/50 frames, but the decoded JPEG rasters
    // are 8x6 with gray levels 100 and 200 — real pixels must win
    val mjpg = avi("MJPG", 999, 777, 50, jpeg(100, 8, 6), jpeg(200, 8, 6))
    val got = probe.decode("avi", mjpg).get
    assert((got._1, got._2, got._3) == (8, 6, 2), got)
    assert(math.abs(got._4 - 150.0) < 4, s"mean luminance ${got._4}")
    // a one-frame stream reports that frame's own luminance
    val one = probe.decode("avi", avi("MJPG", 1, 1, 1, jpeg(200, 8, 6))).get
    assert(one._3 == 1 && math.abs(one._4 - 200.0) < 4, one)
    // non-MJPG fourcc: codec genuinely absent → metadata + byte-mean
    // (the remaining stub boundary), never a pixel decode
    val xvidFrame = Array.tabulate[Byte](64)(i => i.toByte)
    val xvid = avi("XVID", 320, 240, 9, xvidFrame)
    val gotX = probe.decode("avi", xvid).get
    assert((gotX._1, gotX._2, gotX._3) == (320, 240, 9), gotX)
    // an MJPG stream whose frames are all corrupt falls back to
    // metadata rather than returning None for a parseable container
    val corrupt = avi("MJPG", 44, 33, 3, Array[Byte](1, 2, 3, 4))
    val gotC = probe.decode("avi", corrupt).get
    assert((gotC._1, gotC._2, gotC._3) == (44, 33, 3), gotC)
    // routed by format through the mixed-corpus decoder too
    assert(new Multimodal.JdkMediaDecoder()
      .decode("avi", mjpg).map(_._3).contains(2))
  }

  test("frame walk survives hostile LIST nesting (depth-capped, no StackOverflow)") {
    def le32(n: Int): Array[Byte] = java.nio.ByteBuffer.allocate(4)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN).putInt(n).array()
    def chunk(id: String, data: Array[Byte]): Array[Byte] =
      id.getBytes("US-ASCII") ++ le32(data.length) ++ data ++
        (if (data.length % 2 == 1) Array[Byte](0) else Array.empty[Byte])
    def list(typ: String, children: Array[Byte]*): Array[Byte] =
      chunk("LIST", typ.getBytes("US-ASCII") ++ children.flatten)
    def avih(w: Int, h: Int, frames: Int): Array[Byte] = {
      val b = java.nio.ByteBuffer.allocate(56)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      b.putInt(33333).putInt(0).putInt(0).putInt(0)
      b.putInt(frames).putInt(0).putInt(0).putInt(0)
      b.putInt(w).putInt(h); b.array()
    }
    def strh(): Array[Byte] = {
      val b = java.nio.ByteBuffer.allocate(56)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      b.put("vids".getBytes("US-ASCII")).put("MJPG".getBytes("US-ASCII"))
      b.array()
    }
    def jpeg(gray: Int): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(
        8, 6, java.awt.image.BufferedImage.TYPE_INT_RGB)
      val g = img.createGraphics()
      g.setColor(new java.awt.Color(gray, gray, gray))
      g.fillRect(0, 0, 8, 6); g.dispose()
      val out = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "jpg", out)
      out.toByteArray
    }
    val hdrl = list("hdrl", chunk("avih", avih(44, 33, 5)),
      list("strl", chunk("strh", strh())))
    def riff(body: Array[Byte]): Array[Byte] =
      "RIFF".getBytes("US-ASCII") ++ le32(4 + body.length) ++
        "AVI ".getBytes("US-ASCII") ++ body
    // 4 levels of `rec ` nesting is a legal-if-odd real file: the frame
    // at the bottom must still decode (real pixels beat the lying avih)
    var shallow = chunk("00dc", jpeg(200))
    (1 to 4).foreach(_ => shallow = list("rec ", shallow))
    val probe = new Multimodal.RiffAviProbe
    val ok = probe.decode("avi", riff(hdrl ++ list("movi", shallow))).get
    assert((ok._1, ok._2, ok._3) == (8, 6, 1), ok)
    // 3000 levels of 12-byte LIST nesting is a stack bomb: a per-level
    // recursive walk would StackOverflow (which NonFatal does NOT
    // catch). The capped walk treats the over-deep branch as
    // unparseable and falls back to the container metadata.
    var deep = chunk("00dc", jpeg(100))
    (1 to 3000).foreach(_ => deep = list("rec ", deep))
    val got = probe.decode("avi", riff(hdrl ++ list("movi", deep))).get
    assert((got._1, got._2, got._3) == (44, 33, 5), got)
  }

  test("decodeFeatures: null/empty payload → empty features, no crash") {
    import spark.implicits._
    val m = Multimodal.fromDocuments(
      Seq((1L, "hello world"), (2L, "")).toDF("doc_id", "text"))
    val f = Multimodal.decodeFeatures(m).collect().sortBy(_.media_id)
    assert(f(0).width.nonEmpty)
    assert(f(1).width.isEmpty && f(1).n_frames == 0 && f(1).mean_byte.isEmpty)
  }

  test("resize: stub decimation hits the target size, metadata tracks payload") {
    val resized = Multimodal.resize(media, targetBytes = 64).collect()
    assert(resized.nonEmpty)
    resized.foreach { r =>
      assert(r.content.length <= 64, s"media ${r.media_id}: ${r.content.length}")
      assert(r.meta.n_bytes == r.content.length)
    }
    // deterministic
    val again = Multimodal.resize(media, targetBytes = 64).collect()
    assert(resized.map(r => (r.media_id, r.content.toSeq)).sortBy(_._1).toSeq ==
      again.map(r => (r.media_id, r.content.toSeq)).sortBy(_._1).toSeq)
  }

  test("sampleFrames: strided fixed-size chunks, narrow plan") {
    val frames = Multimodal.sampleFrames(media, frameBytes = 64, stride = 4)
    val byDoc = frames.groupBy("media_id").agg(count(lit(1)).as("n"),
      max("frame_no").as("max_no")).collect()
    assert(byDoc.nonEmpty)
    byDoc.foreach { r =>
      assert(r.getAs[Long]("n") >= 1)
      assert(r.getAs[Int]("max_no") % 4 == 0)
    }
    // narrow: no exchange in the plan
    val plan = frames.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"unexpected shuffle:\n$plan")
    // chunk payloads are at most frameBytes long and non-overlapping prefixes
    val one = frames.filter(col("media_id") === media.head().getLong(0))
      .orderBy("frame_no").collect()
    one.foreach(r => assert(r.getAs[Array[Byte]]("frame_bytes").length <= 64))
  }

  test("nearDupMedia: a truncated copy scores by shared-frame fraction; disjoint payloads never pair") {
    import spark.implicits._
    // media 1 = 8 frames of 64 bytes; media 2 = the first 6 frames of it
    // (a trimmed re-upload); media 3 = entirely different bytes
    def bytes(seed: Int, n: Int): Array[Byte] =
      Array.tabulate(n)(i => ((i * 31 + seed * 97) % 251).toByte)
    val rows = Seq(
      (1L, bytes(1, 512)), (2L, bytes(1, 512).take(384)), (3L, bytes(7, 512)))
    val m = rows.toDF("media_id", "content")
      .select(col("media_id"), col("content"),
        org.apache.spark.sql.functions.struct(
          lit("bin").as("fmt"),
          org.apache.spark.sql.functions.length(col("content")).cast("long").as("n_bytes"),
          lit(null).cast("int").as("width"),
          lit(null).cast("int").as("height")).as("meta"))
    val pairs = Multimodal.nearDupMedia(m, frameBytes = 64, stride = 1,
      threshold = 0.5).collect()
    assert(pairs.length == 1)
    val p = pairs.head
    assert((p.getLong(0), p.getLong(1)) == (1L, 2L))
    // 6 shared frames of 8 distinct total → jaccard 6/8
    assert(math.abs(p.getDouble(2) - 0.75) < 1e-9, p.getDouble(2))
  }
}

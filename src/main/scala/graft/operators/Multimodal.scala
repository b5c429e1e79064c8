package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Dataset, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing (builder-prompt first-class surface): media
  * (image/audio/video) travels as opaque `binary` columns plus a typed metadata
  * struct; decode / feature-extract run per-partition over iterator batches
  * (the Scala analog of `mapInPandas` — one JVM call per batch, not per row).
  *
  * Image (PNG/JPEG/BMP/GIF) and audio (WAV/AIFF PCM) decode are REAL — the
  * JDK ships those codecs (`javax.imageio`, `javax.sound.sampled`):
  * [[decodeImages]]/[[resizeImages]]/[[decodeAudio]]. Video codecs are not
  * in the JDK, so the video path keeps the clearly-marked deterministic
  * stub ([[sampleFrames]]); [[byteFeatures]] is the byte-level (pre-decode)
  * fingerprint path — named so nobody mistakes it for a decoder.
  */
object Multimodal {

  /** Typed metadata carried alongside every media blob. */
  val mediaMetaType: StructType = StructType(Seq(
    StructField("kind", StringType),        // image | audio | video
    StructField("format", StringType),      // png | wav | mp4 | ...
    StructField("width", IntegerType),      // image/video
    StructField("height", IntegerType),
    StructField("sample_rate", IntegerType), // audio
    StructField("n_frames", LongType)))

  /** Wrap a text column as a fake media blob (UTF-8 bytes) + metadata — the
    * test-data stand-in for real image/audio bytes. */
  def packAsMedia(df: DataFrame, id: Column, payload: Column, kind: String): DataFrame =
    df.select(
      id.as("media_id"),
      encode(payload, "UTF-8").as("blob"),
      struct(
        lit(kind).as("kind"), lit("raw").as("format"),
        lit(null).cast(IntegerType).as("width"),
        lit(null).cast(IntegerType).as("height"),
        lit(null).cast(IntegerType).as("sample_rate"),
        octet_length(encode(payload, "UTF-8")).cast(LongType).as("n_frames")).as("meta"))

  /** Feature row produced by the byte-level (non-decoding) path. */
  case class MediaFeatures(media_id: Long, byte_len: Long, head_sum: Long,
      kind: String, feature: Array[Double])

  /** BYTE-LEVEL features — explicitly NOT a decoder (real decode lives in
    * [[decodeImages]]/[[decodeAudio]]): byte length, sum of the first 64
    * bytes, and an 8-dim "embedding" = normalized byte histogram over 8
    * bins. Useful as a cheap pre-decode fingerprint (dedup/triage on raw
    * blobs) and as the deterministic stand-in for codecs the JVM lacks
    * (video). Batched per partition — the mapInPandas batch shape. */
  def byteFeatures(media: DataFrame): Dataset[MediaFeatures] = {
    implicit val enc = Encoders.product[MediaFeatures]
    media.select(col("media_id"), col("blob"), col("meta.kind"))
      .as[(Long, Array[Byte], String)](Encoders.tuple(
        Encoders.scalaLong, Encoders.BINARY, Encoders.STRING))
      .mapPartitions { it: Iterator[(Long, Array[Byte], String)] =>
        it.map { case (id, bytes, kind) => byteFeaturesOne(id, bytes, kind) }
      }
  }

  private def byteFeaturesOne(id: Long, bytes: Array[Byte], kind: String): MediaFeatures = {
    val headSum = bytes.iterator.take(64).map(b => (b & 0xff).toLong).sum
    val hist = new Array[Double](8)
    var i = 0
    while (i < bytes.length) { hist((bytes(i) & 0xff) >> 5) += 1.0; i += 1 }
    val n = math.max(bytes.length, 1).toDouble
    MediaFeatures(id, bytes.length.toLong, headSum, kind, hist.map(_ / n))
  }

  // ── real decoders (pure JDK — no external codec jars needed) ──────────────

  /** Decoded-image features: dimensions, channel means, and a 64-bit aHash
    * (average hash — 8×8 block-mean grayscale, bit = block > global mean; the
    * classic perceptual fingerprint for image near-dup bucketing). `ok=false`
    * rows carry the undecodable blob's id (failure side-channel, same shape
    * as AsyncTransformer's). */
  case class ImageFeatures(media_id: Long, ok: Boolean, width: Int, height: Int,
      mean_r: Double, mean_g: Double, mean_b: Double, ahash: Long)

  /** REAL image decode + feature extraction over `javax.imageio`
    * (PNG/JPEG/BMP/GIF ship with the JDK), batched per partition like
    * [[byteFeatures]]. The aHash grid uses exact integer block sums —
    * no Graphics2D interpolation — so results are deterministic across
    * JVMs/partitionings. */
  def decodeImages(media: DataFrame): Dataset[ImageFeatures] = {
    implicit val enc = Encoders.product[ImageFeatures]
    media.select(col("media_id"), col("blob"))
      .as[(Long, Array[Byte])](Encoders.tuple(Encoders.scalaLong, Encoders.BINARY))
      .mapPartitions { it =>
        it.map { case (id, bytes) =>
          // ImageIO plugins throw RuntimeExceptions (IllegalArgument, CMM,
          // ArrayIndexOOB) on corrupt-but-recognized blobs, not just IOException
          val img =
            try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
            catch { case scala.util.control.NonFatal(_) => null }
          if (img == null) ImageFeatures(id, ok = false, -1, -1, 0, 0, 0, 0L)
          else {
            val (w, h) = (img.getWidth, img.getHeight)
            var (sr, sg, sb) = (0L, 0L, 0L)
            val gray = new Array[Long](64) // 8×8 block sums
            val cnt = new Array[Long](64)
            var y = 0
            while (y < h) {
              var x = 0
              while (x < w) {
                val p = img.getRGB(x, y)
                val (r, g, b) = ((p >> 16) & 0xff, (p >> 8) & 0xff, p & 0xff)
                sr += r; sg += g; sb += b
                val cell = math.min(y * 8 / h, 7) * 8 + math.min(x * 8 / w, 7)
                gray(cell) += (r + g + b); cnt(cell) += 1
                x += 1
              }
              y += 1
            }
            val n = (w.toLong * h).toDouble
            var total = 0.0
            val means = Array.tabulate(64)(i => if (cnt(i) == 0) 0.0 else gray(i).toDouble / cnt(i))
            means.foreach(total += _)
            val avg = total / 64
            var hash = 0L
            var i = 0
            while (i < 64) { if (means(i) > avg) hash |= (1L << i); i += 1 }
            ImageFeatures(id, ok = true, w, h, sr / n, sg / n, sb / n, hash)
          }
        }
      }
  }

  /** REAL image resize (area-preserving `Graphics2D` bilinear) re-encoded as
    * PNG: (media_id, blob) in → (media_id, blob) out, per-partition batches —
    * the thumbnail/normalize stage of an image-training pipeline. */
  def resizeImages(media: DataFrame, width: Int, height: Int): DataFrame = {
    val sess = media.sparkSession
    import sess.implicits._
    media.select(col("media_id"), col("blob"))
      .as[(Long, Array[Byte])](Encoders.tuple(Encoders.scalaLong, Encoders.BINARY))
      .mapPartitions { it =>
        it.flatMap { case (id, bytes) =>
          val img =
            try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
            catch { case scala.util.control.NonFatal(_) => null }
          if (img == null) Iterator.empty
          else {
            val out = new java.awt.image.BufferedImage(width, height,
              java.awt.image.BufferedImage.TYPE_INT_RGB)
            val g = out.createGraphics()
            g.setRenderingHint(java.awt.RenderingHints.KEY_INTERPOLATION,
              java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
            g.drawImage(img, 0, 0, width, height, null)
            g.dispose()
            val buf = new java.io.ByteArrayOutputStream()
            javax.imageio.ImageIO.write(out, "png", buf)
            Iterator.single((id, buf.toByteArray))
          }
        }
      }.toDF("media_id", "blob")
  }

  /** Deterministic two-tone PNG: left half `rgbLeft`, right half `rgbRight`
    * (0xRRGGBB). PNG is lossless, so [[decodeImages]] recovers the exact
    * channel values — which makes every decoded feature (means, aHash)
    * closed-form computable from the two colors: the fixture behind the
    * `multimodal_decode` oracle query and MultimodalSpec. */
  def twoTonePng(w: Int, h: Int, rgbLeft: Int, rgbRight: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        img.setRGB(x, y, if (x < w / 2) rgbLeft else rgbRight)
        x += 1
      }
      y += 1
    }
    val buf = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", buf)
    buf.toByteArray
  }

  /** Image near-dup pairs: decode → 64-bit aHash → SimHash-style band
    * equi-join within `maxDist` Hamming bits ([[graft.operators.Dedup
    * .hash64DupPairs]] — no all-pairs comparison, survives corpus scale).
    * Undecodable blobs are excluded. */
  def imageDupPairs(media: DataFrame, maxDist: Int = 3, bands: Int = 4): DataFrame =
    Dedup.hash64DupPairs(
      decodeImages(media).filter(col("ok"))
        .select(col("media_id").as("id"), col("ahash").as("_sig")),
      maxDist, bands)

  /** Decoded-audio features over `javax.sound.sampled` (WAV/AIFF PCM ship
    * with the JDK): format metadata + RMS amplitude of the 16-bit samples. */
  case class AudioFeatures(media_id: Long, ok: Boolean, sample_rate: Int,
      channels: Int, n_frames: Long, rms: Double)

  def decodeAudio(media: DataFrame): Dataset[AudioFeatures] = {
    implicit val enc = Encoders.product[AudioFeatures]
    media.select(col("media_id"), col("blob"))
      .as[(Long, Array[Byte])](Encoders.tuple(Encoders.scalaLong, Encoders.BINARY))
      .mapPartitions { it =>
        it.map { case (id, bytes) =>
          try {
            val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
              new java.io.ByteArrayInputStream(bytes))
            val fmt = in.getFormat
            val frames = in.getFrameLength
            val data = in.readAllBytes()
            // 16-bit PCM RMS (the WAV default); other depths report rms=0
            var sumSq = 0.0; var n = 0
            if (fmt.getSampleSizeInBits == 16) {
              val bb = java.nio.ByteBuffer.wrap(data).order(
                if (fmt.isBigEndian) java.nio.ByteOrder.BIG_ENDIAN
                else java.nio.ByteOrder.LITTLE_ENDIAN)
              while (bb.remaining() >= 2) {
                val s = bb.getShort.toDouble / 32768.0
                sumSq += s * s; n += 1
              }
            }
            AudioFeatures(id, ok = true, fmt.getSampleRate.toInt, fmt.getChannels,
              frames, if (n == 0) 0.0 else math.sqrt(sumSq / n))
          } catch {
            case _: Exception => AudioFeatures(id, ok = false, -1, -1, -1L, 0.0)
          }
        }
      }
  }

  /** Deterministic 16-bit mono PCM WAV from raw samples — the audio twin of
    * [[twoTonePng]]: WAV is lossless, so [[decodeAudio]] recovers the exact
    * sample values and every decoded feature (rate, frames, RMS) is
    * closed-form computable. Fixture behind the `multimodal_audio` oracle. */
  def pcmWav(sampleRate: Int, samples: Array[Short]): Array[Byte] = {
    val data = new Array[Byte](samples.length * 2)
    java.nio.ByteBuffer.wrap(data).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      .asShortBuffer().put(samples)
    val fmt = new javax.sound.sampled.AudioFormat(sampleRate.toFloat, 16, 1, true, false)
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(data), fmt, samples.length.toLong)
    val buf = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(ais,
      javax.sound.sampled.AudioFileFormat.Type.WAVE, buf)
    buf.toByteArray
  }

  // ── REAL video decode: MJPEG-in-AVI (r17) ──────────────────────────────────
  //
  // The JDK ships no video codec, but Motion-JPEG inside an AVI container is
  // decodable with what it DOES ship: the AVI RIFF structure is a plain
  // chunk walk, and each '..dc' frame chunk is a standalone JPEG that
  // ImageIO reads. That makes the video path REAL for MJPEG-AVI (the
  // classic camera/capture format); other codecs (H.264 etc.) remain
  // documented out of scope — [[sampleFrames]] keeps the deterministic
  // stand-in shape for them.

  /** Minimal MJPEG-AVI writer (RIFF/hdrl/movi/idx1) — builds real fixtures
    * from JPEG frames; also a usable sink for frame streams. */
  def mjpegAvi(frames: Seq[Array[Byte]], width: Int, height: Int,
      fps: Int = 25): Array[Byte] = {
    def le32(v: Int): Array[Byte] = Array[Byte](
      (v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
      ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)
    def fourcc(s: String): Array[Byte] = s.getBytes("US-ASCII")
    def chunk(cc: String, body: Array[Byte]): Array[Byte] = {
      val padded = if (body.length % 2 == 1) body :+ 0.toByte else body
      fourcc(cc) ++ le32(body.length) ++ padded
    }
    def list(tpe: String, body: Array[Byte]): Array[Byte] =
      chunk("LIST", fourcc(tpe) ++ body)
    val avih = chunk("avih", le32(1000000 / fps) ++ le32(0) ++ le32(0) ++
      le32(0x10) ++ le32(frames.size) ++ le32(0) ++ le32(1) ++ le32(0) ++
      le32(width) ++ le32(height) ++ Array.fill(16)(0.toByte))
    val strh = chunk("strh", fourcc("vids") ++ fourcc("MJPG") ++
      le32(0) ++ le32(0) ++ le32(0) ++ le32(1) ++ le32(fps) ++ le32(0) ++
      le32(frames.size) ++ le32(0) ++ le32(-1) ++ le32(0) ++
      Array.fill(8)(0.toByte))
    val strf = chunk("strf", le32(40) ++ le32(width) ++ le32(height) ++
      Array[Byte](1, 0, 24, 0) ++ fourcc("MJPG") ++
      le32(width * height * 3) ++ Array.fill(16)(0.toByte))
    val hdrl = list("hdrl", avih ++ list("strl", strh ++ strf))
    val movi = list("movi", frames.flatMap(f => chunk("00dc", f)).toArray)
    val body = fourcc("AVI ") ++ hdrl ++ movi
    fourcc("RIFF") ++ le32(body.length) ++ body
  }

  /** Parse an AVI blob into its MJPEG frame payloads ('..dc'/'..dj' chunks
    * under 'movi'): a linear RIFF chunk walk, no codec needed. Empty for
    * non-AVI blobs. */
  private[graft] def aviFrames(bytes: Array[Byte]): Vector[Array[Byte]] = {
    def le32(off: Int): Int =
      (bytes(off) & 0xff) | ((bytes(off + 1) & 0xff) << 8) |
        ((bytes(off + 2) & 0xff) << 16) | ((bytes(off + 3) & 0xff) << 24)
    def cc(off: Int): String =
      new String(bytes, off, 4, "US-ASCII")
    val out = Vector.newBuilder[Array[Byte]]
    if (bytes.length < 12 || cc(0) != "RIFF" || cc(8) != "AVI ") return Vector.empty
    def walk(from: Int, to: Int): Unit = {
      var off = from
      while (off + 8 <= to) {
        val id = cc(off); val size = le32(off + 4)
        // bounds check in Long: a corrupt chunk can declare size ~2^31 and
        // overflow an Int sum past the guard
        if (size < 0 || off.toLong + 8L + size > to) return // corrupt chunk: stop
        if (id == "LIST") walk(off + 12, off + 8 + size)
        else if (id.endsWith("dc") || id.endsWith("dj"))
          out += java.util.Arrays.copyOfRange(bytes, off + 8, off + 8 + size)
        off += 8 + size + (size % 2)
      }
    }
    walk(12, bytes.length)
    out.result()
  }

  /** REAL frame decode for MJPEG-AVI video blobs: every `stride`-th frame
    * decodes through ImageIO into (media_id, frame_idx, ok, width, height,
    * ahash) rows — the frame-sampling stage of a video-training pipeline,
    * distributed as a per-partition kernel like [[decodeImages]]. Non-AVI
    * blobs yield a single ok=false row (the failure channel). */
  def decodeVideoFrames(media: DataFrame, stride: Int = 1): DataFrame = {
    val sess = media.sparkSession
    import sess.implicits._
    media.select(col("media_id"), col("blob"))
      .as[(Long, Array[Byte])](Encoders.tuple(Encoders.scalaLong, Encoders.BINARY))
      .mapPartitions { it =>
        it.flatMap { case (id, bytes) =>
          // a corrupt container must land on the ok=false failure channel,
          // not fail the task — same contract as the per-frame decode below
          val frames =
            try aviFrames(bytes)
            catch { case scala.util.control.NonFatal(_) => Vector.empty[Array[Byte]] }
          if (frames.isEmpty) Iterator((id, -1L, false, -1, -1, 0L))
          else frames.zipWithIndex.iterator
            .filter { case (_, i) => i % stride == 0 }
            .map { case (jpeg, i) =>
              val img =
                try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(jpeg))
                catch { case scala.util.control.NonFatal(_) => null }
              if (img == null) (id, i.toLong, false, -1, -1, 0L)
              else (id, i.toLong, true, img.getWidth, img.getHeight, aHash64(img))
            }
        }
      }.toDF("media_id", "frame_idx", "ok", "width", "height", "ahash")
  }

  /** 8×8 average-hash of a decoded image (shared with the image path's
    * near-dup banding). */
  private[graft] def aHash64(img: java.awt.image.BufferedImage): Long = {
    val (w, h) = (img.getWidth, img.getHeight)
    val gray = new Array[Long](64); val cnt = new Array[Long](64)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val p = img.getRGB(x, y)
        val cell = math.min(y * 8 / h, 7) * 8 + math.min(x * 8 / w, 7)
        gray(cell) += ((p >> 16) & 0xff) + ((p >> 8) & 0xff) + (p & 0xff)
        cnt(cell) += 1
        x += 1
      }
      y += 1
    }
    val means = Array.tabulate(64)(i => if (cnt(i) == 0) 0.0 else gray(i).toDouble / cnt(i))
    val avg = means.sum / 64
    var hash = 0L; var i = 0
    while (i < 64) { if (means(i) > avg) hash |= (1L << i); i += 1 }
    hash
  }

  /** Frame sampling stub for video-kind blobs: every `stride`-th 16-byte block
    * becomes a "frame" row — exercises the explode/partition shape of real
    * frame extraction. */
  def sampleFrames(media: DataFrame, stride: Int): DataFrame = {
    val nBlocks = floor(octet_length(col("blob")) / 16).cast("int")
    media
      .withColumn("frame_idx",
        explode(sequence(lit(0), greatest(nBlocks - 1, lit(0)), lit(stride))))
      .withColumn("frame_bytes",
        col("blob").substr(col("frame_idx") * 16 + 1, lit(16)))
      .select(col("media_id"), col("frame_idx").cast("long").as("frame_idx"),
        col("frame_bytes"))
  }
}

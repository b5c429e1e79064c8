package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Multimodal

/** Real-codec multimodal paths: PNG/JPEG via javax.imageio, WAV via
  * javax.sound.sampled — both ship with the JDK, so decode here is real,
  * not stubbed (the video path stays a stub; no video codec in the JDK). */
class MultimodalSpec extends AnyFunSuite {
  private val spark = SparkTestBase.spark
  import spark.implicits._

  private def pngBytes(w: Int, h: Int)(rgb: (Int, Int) => Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) img.setRGB(x, y, rgb(x, y))
    val buf = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", buf)
    buf.toByteArray
  }

  private def wavBytes(sampleRate: Int, nSamples: Int, amp: Double): Array[Byte] = {
    val pcm = new Array[Byte](nSamples * 2)
    val bb = java.nio.ByteBuffer.wrap(pcm).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    (0 until nSamples).foreach { i =>
      bb.putShort((math.sin(2 * math.Pi * 440 * i / sampleRate) * amp * 32767).toShort)
    }
    val fmt = new javax.sound.sampled.AudioFormat(sampleRate.toFloat, 16, 1, true, false)
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(pcm), fmt, nSamples.toLong)
    val out = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(ais,
      javax.sound.sampled.AudioFileFormat.Type.WAVE, out)
    out.toByteArray
  }

  test("decodeImages: real PNG decode — dims, channel means, aHash separates light/dark") {
    val white = pngBytes(32, 16)((_, _) => 0xFFFFFF)
    val halves = pngBytes(32, 16)((x, _) => if (x < 16) 0xFFFFFF else 0x000000)
    val junk = Array[Byte](1, 2, 3)
    val df = Seq((1L, white), (2L, halves), (3L, junk)).toDF("media_id", "blob")
    val out = Multimodal.decodeImages(df).collect().map(f => f.media_id -> f).toMap
    assert(out(1L).ok && out(1L).width == 32 && out(1L).height == 16)
    assert(out(1L).mean_r == 255.0 && out(1L).mean_g == 255.0 && out(1L).mean_b == 255.0)
    // uniform image: no block above the global mean → ahash 0
    assert(out(1L).ahash == 0L)
    // left-half-white: exactly half the blocks above mean
    assert(java.lang.Long.bitCount(out(2L).ahash) == 32)
    assert(!out(3L).ok) // undecodable bytes surface on the failure channel
  }

  test("resizeImages: real bilinear resize re-encodes decodable PNGs at target dims") {
    val src = pngBytes(64, 64)((x, y) => if ((x + y) % 2 == 0) 0xFF0000 else 0x0000FF)
    val df = Seq((7L, src), (8L, Array[Byte](9, 9))).toDF("media_id", "blob")
    val out = Multimodal.resizeImages(df, 16, 8).collect()
    assert(out.map(_.getLong(0)).toSeq == Seq(7L)) // junk row dropped
    val back = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(out.head.getAs[Array[Byte]]("blob")))
    assert(back.getWidth == 16 && back.getHeight == 8)
  }

  test("imageDupPairs: near-identical images pair by aHash band join, distinct scenes don't") {
    def scene(noise: Int) = pngBytes(64, 64) { (x, y) =>
      val v = if ((x / 8 + y / 8) % 2 == 0) 200 else 40
      val n = math.min(255, math.max(0, v + (if ((x + y) % 13 == 0) noise else 0)))
      (n << 16) | (n << 8) | n
    }
    val gradient = pngBytes(64, 64)((x, _) => { val v = x * 4 min 255; (v << 16) | (v << 8) | v })
    val df = Seq((1L, scene(0)), (2L, scene(12)), (3L, gradient)).toDF("media_id", "blob")
    val pairs = Multimodal.imageDupPairs(df, maxDist = 3)
      .select("id1", "id2").as[(Long, Long)].collect().toSet
    assert(pairs == Set((1L, 2L))) // noisy twin pairs; the gradient doesn't
  }

  test("decodeAudio: real WAV decode — format metadata and RMS of a sine") {
    val wav = wavBytes(8000, 4000, amp = 0.5)
    val df = Seq((1L, wav), (2L, Array[Byte](0, 0, 0))).toDF("media_id", "blob")
    val out = Multimodal.decodeAudio(df).collect().map(f => f.media_id -> f).toMap
    assert(out(1L).ok && out(1L).sample_rate == 8000 && out(1L).channels == 1)
    assert(out(1L).n_frames == 4000L)
    // RMS of a 0.5-amplitude sine ≈ 0.5/√2 ≈ 0.354
    assert(math.abs(out(1L).rms - 0.354) < 0.01, s"rms=${out(1L).rms}")
    assert(!out(2L).ok)
  }

  test("REAL video decode: MJPEG-AVI frames parse, decode and hash; stride " +
      "samples; non-AVI blobs take the failure channel (r17)") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // build 5 genuinely different JPEG frames (two-tone split moves across)
    def jpeg(split: Int): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(32, 16,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until 16; x <- 0 until 32)
        img.setRGB(x, y, if (x < split) 0xffffff else 0x000000)
      val buf = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "jpg", buf)
      buf.toByteArray
    }
    val frames = (1 to 5).map(i => jpeg(i * 5))
    val avi = Multimodal.mjpegAvi(frames, 32, 16)
    val media = Seq((1L, avi), (2L, "not a video".getBytes)).toDF("media_id", "blob")
    val out = Multimodal.decodeVideoFrames(media, stride = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2),
        r.getInt(3), r.getInt(4), r.getLong(5)))
    val ok = out.filter(_._1 == 1L).sortBy(_._2)
    assert(ok.map(_._2).toSeq == Seq(0L, 2L, 4L)) // stride 2 over 5 frames
    assert(ok.forall(f => f._3 && f._4 == 32 && f._5 == 16))
    assert(ok.map(_._6).distinct.length == 3) // moving split -> distinct hashes
    val bad = out.filter(_._1 == 2L)
    assert(bad.toSeq == Seq((2L, -1L, false, -1, -1, 0L)))
  }
}

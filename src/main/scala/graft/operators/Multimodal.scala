package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Dataset, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing (builder-prompt first-class surface): media
  * (image/audio/video) travels as opaque `binary` columns plus a typed metadata
  * struct; decode / feature-extract run per-partition over iterator batches
  * (the Scala analog of `mapInPandas` — one JVM call per batch, not per row).
  *
  * The actual codecs are NOT in this container, so the decode step is a
  * clearly-marked deterministic STUB — the Spark-side contract (schema, batch
  * shape, partitioning) is real and tested.
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

  /** Feature row produced by the (stubbed) decoder. */
  case class MediaFeatures(media_id: Long, byte_len: Long, head_sum: Long,
      kind: String, feature: Array[Double])

  /** STUB decode + feature-extract, batched per partition (mapPartitions ≈
    * mapInPandas batch shape). Real deployments swap `decodeOne` for an actual
    * codec call (JNI/ONNX/FFmpeg); everything around it — iterator batching,
    * schema, partition preservation — is production-shaped.
    *
    * Stub features (deterministic): byte length, sum of the first 64 bytes,
    * and an 8-dim "embedding" = normalized byte histogram over 8 bins. */
  def extractFeatures(media: DataFrame): Dataset[MediaFeatures] = {
    implicit val enc = Encoders.product[MediaFeatures]
    media.select(col("media_id"), col("blob"), col("meta.kind"))
      .as[(Long, Array[Byte], String)](Encoders.tuple(
        Encoders.scalaLong, Encoders.BINARY, Encoders.STRING))
      .mapPartitions { it: Iterator[(Long, Array[Byte], String)] =>
        it.map { case (id, bytes, kind) => decodeOne(id, bytes, kind) }
      }
  }

  /** ??? in spirit: replace with a real decoder. Deterministic fake. */
  private def decodeOne(id: Long, bytes: Array[Byte], kind: String): MediaFeatures = {
    val headSum = bytes.iterator.take(64).map(b => (b & 0xff).toLong).sum
    val hist = new Array[Double](8)
    var i = 0
    while (i < bytes.length) { hist((bytes(i) & 0xff) >> 5) += 1.0; i += 1 }
    val n = math.max(bytes.length, 1).toDouble
    MediaFeatures(id, bytes.length.toLong, headSum, kind, hist.map(_ / n))
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

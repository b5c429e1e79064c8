package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** LLM xpack embedder plumbing (reference python/pathway/xpacks/llm/embedders.py):
  * batch a text column through an external embedding endpoint per partition.
  *
  * The Spark-side contract is real — batching, one client per partition, typed
  * output schema — while the endpoint itself is pluggable. `FakeEmbedder` is
  * the deterministic stand-in used in tests (no model libs in this container);
  * swap `client` for an HTTP/gRPC caller in production. The partition-batched
  * shape is exactly the reference's async-executor batching (udfs/executors.py)
  * and scales linearly: no shuffle, no driver involvement. */
object Embedders {

  /** A trivial deterministic "model": dim-sized vector of signed token-hash
    * counts. Stub for the endpoint call — clearly NOT a semantic embedding.
    * Hashing is CrossHash.md5LongJvm so the DuckDB oracle reproduces the
    * vectors bit-exactly; values stay small integers (exact in Float) and are
    * deliberately NOT normalized — cosine is scale-invariant, so downstream
    * KNN is unchanged and the oracle needs no float-rounding replication. */
  final class FakeEmbedder(dim: Int) extends Serializable {
    def embedBatch(texts: Seq[String]): Seq[Array[Float]] =
      texts.map { t =>
        val v = new Array[Float](dim)
        // Locale.ROOT: bit-identical to SQL lower() on any host locale
        t.toLowerCase(java.util.Locale.ROOT).split("\\s+").filter(_.nonEmpty).foreach { tok =>
          val h = graft.functions.CrossHash.md5LongJvm(tok)
          v(math.floorMod(h, dim).toInt) += (if (h < 0) -1f else 1f)
        }
        v
      }
  }

  /** Embed `textCol` of `df` into an `embedding: array<float>` column.
    * Rows flow per partition in `batchSize` groups through one client. */
  /** Known embedder context limits (reference OPENAI_EMBEDDERS_MAX_TOKENS —
    * public OpenAI model limits). */
  val EmbedderMaxTokens: Map[String, Int] = Map(
    "text-embedding-ada-002" -> 8191,
    "text-embedding-3-small" -> 8191,
    "text-embedding-3-large" -> 8191)

  /** OpenAIEmbedder.truncate_context (embedders.py:287; r16 decode of
    * test_openai_context_truncation): strategy "start" KEEPS the first
    * max_tokens, "end" keeps the last; any other strategy is a ValueError;
    * an UNKNOWN model skips truncation (the reference logs and passes the
    * text through rather than failing the pipeline). Token measure is the
    * pluggable partitioning tokenizer (tiktoken not available offline —
    * structural contract decoded, vocabulary divergence documented). */
  def truncateContext(model: String, text: String, strategy: String,
      tokenizer: String => Vector[String] = Splitters.wordRunTokenizer): String = {
    require(strategy == "start" || strategy == "end",
      s"Given truncation strategy $strategy is not supported. " +
        "Strategy must be one of (start, end)")
    EmbedderMaxTokens.get(model) match {
      case None => text // unknown model: skip truncation, like the reference
      case Some(maxTokens) =>
        val tokens = tokenizer(text)
        val kept =
          if (tokens.length <= maxTokens) tokens
          else if (strategy == "start") tokens.take(maxTokens)
          else tokens.takeRight(maxTokens)
        kept.mkString
    }
  }

  def embed(df: DataFrame, textCol: String, dim: Int = 64,
      batchSize: Int = 64): DataFrame = {
    val spark = df.sparkSession
    val outSchema = df.schema.add("embedding", ArrayType(FloatType, containsNull = false))
    val enc = org.apache.spark.sql.Encoders.row(outSchema)
    val idx = df.schema.fieldIndex(textCol)
    df.mapPartitions { it =>
      val client = new FakeEmbedder(dim) // per-partition client, like one per worker
      it.grouped(batchSize).flatMap { batch =>
        val vecs = client.embedBatch(batch.map(_.getString(idx)))
        batch.lazyZip(vecs).map { (row, v) => Row.fromSeq(row.toSeq :+ v.toSeq) }
      }
    }(enc)
  }
}

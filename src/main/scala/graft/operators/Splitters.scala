package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Document splitters (reference xpacks/llm/splitters.py — NullSplitter,
  * RecursiveSplitter, TokenCountSplitter; fixtures
  * xpacks/llm/tests/test_splitters.py).
  *
  * The reference's RecursiveSplitter wraps langchain's
  * RecursiveCharacterTextSplitter (MIT) — the algorithm is re-derived here
  * from its public semantics: descend a separator hierarchy until pieces fit
  * `chunkSize` (measured by a pluggable length function — characters by
  * default, tokens when a tokenizer is supplied), then greedily merge
  * consecutive pieces up to the budget, carrying `chunkOverlap` from the
  * tail of the previous chunk; separators are NOT kept in the output
  * (keep_separator=False default) and joined pieces are stripped.
  *
  * TokenCountSplitter (splitters.py:177): windows of ≤ maxTokens tokens,
  * each truncated back to the LAST sentence punctuation (. ? ! newline) when
  * that punctuation sits past CHARS_PER_TOKEN(=3) × minTokens characters;
  * the cursor advances by the truncated chunk's re-encoded token count, so
  * text after the cut is re-read into the next chunk.
  *
  * The reference measures tokens with tiktoken cl100k_base (not available
  * offline) — the tokenizer here is pluggable with a partitioning
  * word-run default; the STRUCTURE (split points, merge budget, punctuation
  * rule, metadata propagation) is the decoded contract, the vocabulary is
  * not (documented divergence, SEMANTICS.md).
  *
  * Scale shape: per-row string kernels (mapPartitions-style UDFs like the
  * TextOps hash kernels) — linear in document length, no shuffle.
  */
object Splitters {

  val DefaultSeparators: Seq[String] = Seq("\n\n", "\n", " ", "")

  /** A tokenizer that PARTITIONS the string (concat of tokens == input), so
    * decode is concatenation — the property the token-window splitter
    * relies on. Default: runs of whitespace / non-whitespace. */
  type Tokenizer = String => Vector[String]
  val wordRunTokenizer: Tokenizer = s =>
    if (s.isEmpty) Vector.empty
    else "(?s)\\s+|\\S+".r.findAllIn(s).toVector

  // ── RecursiveSplitter ──────────────────────────────────────────────────────

  /** langchain-semantics recursive split: returns the chunk list.
    *
    * `keepSeparator=true` is langchain's RecursiveCharacterTextSplitter
    * default (r17, ADVICE): each separator attaches to the START of the
    * following piece and merged chunks join with `""` — so custom
    * non-whitespace separators stay in the output text. NOTE this changed
    * chunk BOUNDARIES for whitespace hierarchies too (kept separators count
    * against the budget, so pieces that previously merged may now split —
    * SplitterFixtureSpec pins both forms); `keepSeparator = false` restores
    * the pre-r17 plain-split behavior. */
  def recursiveSplit(text: String, chunkSize: Int, chunkOverlap: Int = 0,
      separators: Seq[String] = DefaultSeparators,
      lengthOf: String => Int = _.length,
      keepSeparator: Boolean = true): Seq[String] = {
    require(chunkOverlap < chunkSize, "chunk_overlap must be < chunk_size")

    def splitOn(text: String, sep: String): Seq[String] =
      (if (sep.isEmpty) text.map(_.toString)
       else if (keepSeparator) {
         // langchain _split_text_with_regex(keep_separator=True): the
         // separator prefixes the piece that follows it
         val parts = text.split(java.util.regex.Pattern.quote(sep), -1).toSeq
         if (parts.isEmpty) parts else parts.head +: parts.tail.map(sep + _)
       } else text.split(java.util.regex.Pattern.quote(sep), -1).toSeq)
        .filter(_.nonEmpty)

    def joinDocs(docs: Seq[String], sep: String): Option[String] = {
      val joined = docs.mkString(sep).strip()
      if (joined.isEmpty) None else Some(joined)
    }

    // greedy merge with overlap carry (langchain _merge_splits)
    def merge(splits: Seq[String], sep: String): Seq[String] = {
      val sepLen = lengthOf(sep)
      val out = scala.collection.mutable.ArrayBuffer.empty[String]
      var current = scala.collection.mutable.ArrayBuffer.empty[String]
      var total = 0
      for (d <- splits) {
        val len = lengthOf(d)
        if (total + len + (if (current.nonEmpty) sepLen else 0) > chunkSize) {
          if (current.nonEmpty) {
            joinDocs(current.toSeq, sep).foreach(out += _)
            while (total > chunkOverlap ||
                (total + len + (if (current.nonEmpty) sepLen else 0) > chunkSize && total > 0)) {
              total -= lengthOf(current.head) + (if (current.length > 1) sepLen else 0)
              current.remove(0)
            }
          }
        }
        current += d
        total += len + (if (current.length > 1) sepLen else 0)
      }
      joinDocs(current.toSeq, sep).foreach(out += _)
      out.toSeq
    }

    def split(text: String, seps: Seq[String]): Seq[String] = {
      val idx = seps.indexWhere(s => s.isEmpty || text.contains(s))
      val (sep, remaining) =
        if (idx < 0) (seps.last, Seq.empty[String])
        else (seps(idx), seps.drop(idx + 1))
      val pieces = splitOn(text, sep)
      // langchain: when separators are kept in the pieces, merged chunks
      // join with the empty string
      val joinSep = if (keepSeparator) "" else sep
      val out = scala.collection.mutable.ArrayBuffer.empty[String]
      val good = scala.collection.mutable.ArrayBuffer.empty[String]
      for (p <- pieces) {
        if (lengthOf(p) < chunkSize) good += p
        else {
          if (good.nonEmpty) { out ++= merge(good.toSeq, joinSep); good.clear() }
          if (remaining.isEmpty) out += p else out ++= split(p, remaining)
        }
      }
      if (good.nonEmpty) out ++= merge(good.toSeq, joinSep)
      out.toSeq
    }

    split(text, if (separators.nonEmpty) separators else Seq(""))
  }

  // ── TokenCountSplitter ─────────────────────────────────────────────────────

  val Punctuation: Seq[Char] = Seq('.', '?', '!', '\n')
  val CharsPerToken = 3

  def tokenCountSplit(text: String, minTokens: Int = 50, maxTokens: Int = 500,
      tokenizer: Tokenizer = wordRunTokenizer): Seq[String] = {
    val tokens = tokenizer(text)
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    var i = 0
    while (i < tokens.length) {
      val window = tokens.slice(i, i + maxTokens)
      var chunk = window.mkString
      val lastPunct = Punctuation.map(chunk.lastIndexOf(_)).max
      if (lastPunct != -1 && lastPunct > CharsPerToken * minTokens)
        chunk = chunk.substring(0, lastPunct + 1)
      val advance = tokenizer(chunk).length
      i += math.max(advance, 1) // a pathological tokenizer must still advance
      out += chunk
    }
    out.toSeq
  }

  /** NullSplitter: one chunk, the whole text. */
  def nullSplit(text: String): Seq[String] = Seq(text)

  // ── DataFrame wrappers (chunk + empty-Json metadata, like the reference's
  //    list[(chunk, metadata)] shape) ────────────────────────────────────────

  /** Explode `text` into (chunk_idx, chunk_text) rows with the recursive
    * splitter. Metadata propagates by keeping the input's columns. */
  def recursiveSplitDf(df: DataFrame, text: Column, chunkSize: Int,
      chunkOverlap: Int = 0, separators: Seq[String] = DefaultSeparators,
      byTokens: Boolean = false): DataFrame = {
    val lengthOf: String => Int =
      if (byTokens) s => wordRunTokenizer(s).count(t => !t.forall(_.isWhitespace))
      else _.length
    val f = udf((s: String) =>
      if (s == null) Seq.empty[String]
      else recursiveSplit(s, chunkSize, chunkOverlap, separators, lengthOf))
    df.withColumn("_chunks", f(text))
      .select(df.columns.map(col) :+
        posexplode(col("_chunks")).as(Seq("chunk_idx", "chunk_text")): _*)
      .drop("_chunks")
  }

  def tokenCountSplitDf(df: DataFrame, text: Column,
      minTokens: Int = 50, maxTokens: Int = 500): DataFrame = {
    val f = udf((s: String) =>
      if (s == null) Seq.empty[String] else tokenCountSplit(s, minTokens, maxTokens))
    df.withColumn("_chunks", f(text))
      .select(df.columns.map(col) :+
        posexplode(col("_chunks")).as(Seq("chunk_idx", "chunk_text")): _*)
      .drop("_chunks")
  }
}

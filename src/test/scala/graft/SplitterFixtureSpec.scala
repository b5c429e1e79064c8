package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Llms, Splitters}

/** Replays the reference's splitter and reranker fixtures
  * (xpacks/llm/tests/test_splitters.py, test_rerankers.py) — the recursive
  * separator-hierarchy split, the token-window punctuation rule, the strict
  * score-JSON parse, and the stable top-k filter. Token-vocabulary-dependent
  * boundaries (tiktoken cl100k_base) are replayed with the pluggable
  * tokenizer at an equivalent budget — the structural contract is the
  * decode, the vocabulary is a documented divergence. */
class SplitterFixtureSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark
  import spark.implicits._

  private val txt = "Pójdź, kińże tę chmurność w głąb flaszy 🍾."

  test("test_null / test_tokencount: a short text passes through as one identical chunk") {
    assert(Splitters.nullSplit(txt) == Seq(txt))
    assert(Splitters.tokenCountSplit(txt, minTokens = 50, maxTokens = 500) == Seq(txt))
  }

  test("test_recursive: five \\n\\n-joined copies at a ~26-token budget of 30 → 5 chunks, separator excluded") {
    val bigTxt = Seq.fill(5)(txt).mkString("\n\n")
    // the reference counts 26 cl100k tokens per copy against chunk_size=30;
    // an equivalent budget here: half the codepoint count (~21 per copy) —
    // two copies + separator overflow 30, one fits
    val chunks = Splitters.recursiveSplit(bigTxt, chunkSize = 30, chunkOverlap = 0,
      lengthOf = s => (s.codePointCount(0, s.length) + 1) / 2)
    assert(chunks.length == 5, chunks.map(_.take(12)))
    assert(chunks.forall(_ == txt)) // separators never appear in chunks
  }

  test("recursive split descends the separator hierarchy and greedily merges") {
    // chars-length default: paragraphs of 3 chars, budget 7: "aa bb" fits,
    // "cc" starts the next chunk
    val out = Splitters.recursiveSplit("aa bb cc", chunkSize = 7)
    assert(out == Seq("aa bb", "cc"))
    // a piece larger than the budget recurses to the next separator. With
    // langchain's keep_separator=True default each kept " " counts against
    // the budget, so "bb"/"cc"/"dd" stay separate at size 5 (r17 decode);
    // keepSeparator=false reproduces the plain-split merge "bb cc"
    val out2 = Splitters.recursiveSplit("aaaa\n\nbb cc dd", chunkSize = 5)
    assert(out2 == Seq("aaaa", "bb", "cc", "dd"))
    val out2b = Splitters.recursiveSplit("aaaa\n\nbb cc dd", chunkSize = 5,
      keepSeparator = false)
    assert(out2b == Seq("aaaa", "bb cc", "dd"))
    // overlap carries the tail of the previous chunk when the tail pieces
    // fit the overlap budget (keep mode counts the leading separator: a
    // 3-char " bb" exceeds overlap 2, so nothing carries)
    val out3 = Splitters.recursiveSplit("aa bb cc dd", chunkSize = 7, chunkOverlap = 2)
    assert(out3 == Seq("aa bb", "cc dd"))
    val out3b = Splitters.recursiveSplit("aa bb cc dd", chunkSize = 7, chunkOverlap = 2,
      keepSeparator = false)
    assert(out3b == Seq("aa bb", "bb cc", "cc dd"))
    // custom NON-whitespace separator: the separator text stays in chunks
    // (the divergence the r17 ADVICE flagged — langchain keeps it)
    val out4 = Splitters.recursiveSplit("one;two;three", chunkSize = 8,
      separators = Seq(";"))
    assert(out4 == Seq("one;two", ";three"))
  }

  test("token-window splitter truncates at the last punctuation past 3×min_tokens chars") {
    // maxTokens=6 word-runs; the window "one two. three four " has its last
    // '.' at index 7 > 3*2=6 → chunk cut after the period, the rest re-read
    val text = "one two. three four five six seven."
    val out = Splitters.tokenCountSplit(text, minTokens = 2, maxTokens = 6,
      tokenizer = Splitters.wordRunTokenizer)
    assert(out.head == "one two.")
    assert(out.mkString == text) // partitioning tokenizer: nothing lost
    // below the 3×min threshold the punctuation rule does NOT engage
    val noCut = Splitters.tokenCountSplit("ab. cd ef", minTokens = 50, maxTokens = 500)
    assert(noCut == Seq("ab. cd ef"))
  }

  test("test_llm_reranker: parse_score_json accepts {\"score\": n}, raises the reference ValueError otherwise") {
    val ok = Seq("""{"score": 1}""", """{"score": 5}""", """{"score": 4.7}""").toDF("r")
      .select(Llms.parseScoreJson(col("r"))).as[Double].collect().toSeq
    assert(ok == Seq(1.0, 5.0, 4.0)) // int() truncation
    val err = intercept[Exception] {
      Seq("text").toDF("r").select(Llms.parseScoreJson(col("r"))).collect()
    }
    assert(err.getMessage.contains("Expected a json response, got `text`."))
  }

  test("test_rerank_topk_filter: stable top-k over parallel doc/score lists") {
    val docs = (0 until 10).map(i => s"""{"text": "$i"}""")
    val scores = Seq(1.0, 2.0, 5.5, -10.333, 2.0, 9.5, 5.555, 4.3, 2.8, 9.5)
    val out = Seq((docs, scores)).toDF("docs", "scores")
      .select(Llms.rerankTopkFilter(col("docs"), col("scores"), 3).as("r"))
      .select(col("r.docs"), col("r.scores"))
      .as[(Seq[String], Seq[Double])].collect().head
    // ties at 9.5 keep original order: index 5 before index 9
    assert(out._1 == Seq(5, 9, 6).map(i => s"""{"text": "$i"}"""))
    assert(out._2 == Seq(9.5, 9.5, 5.555))
  }

  test("test_invalid_prompt_template_raises_error: {context}+{query} required, nothing else allowed") {
    import graft.operators.Rag
    // the reference's four invalid templates, verbatim
    for (bad <- Seq(
        "Context: {context}, query: {query}, abc: {abc}",
        "Context: {something}, query: {else}",
        "Context: {context}",
        "No placeholder template.")) {
      intercept[IllegalArgumentException] { Rag.parseRagTemplate(bad) }
    }
    // valid templates compile to a literal concat; {{ }} are literal braces
    val p = Seq(("ctx here", "the question")).toDF("c", "q")
      .select(Rag.ragPrompt(
        "Answer the question. Context: {context}\nQuestion: {query} {{json}}",
        col("c"), col("q"))).as[String].collect().head
    assert(p == "Answer the question. Context: ctx here\nQuestion: the question {json}")
  }

  test("test_openai_context_truncation: start keeps the head, end keeps the tail, unknown model passes through") {
    import graft.operators.Embedders
    // the reference's text: a long A-run then a long B-run, over the limit;
    // word-run tokens here → craft runs of words over the 8191-token budget
    val text = (Seq.fill(9000)("A") ++ Seq.fill(9000)("B")).mkString(" ")
    val start = Embedders.truncateContext("text-embedding-ada-002", text, "start")
    assert(start.contains("A A A") && !start.contains("B"))
    val end = Embedders.truncateContext("text-embedding-ada-002", text, "end")
    assert(end.contains("B B B") && !end.contains("A"))
    // under the limit: identity (test_openai_context_no_truncation)
    val shortText = "A" * 200 + "B" * 200
    for (s <- Seq("start", "end"))
      assert(Embedders.truncateContext("text-embedding-3-large", shortText, s) == shortText)
    // unknown model skips truncation; bad strategy raises
    assert(Embedders.truncateContext("mystery-model", text, "start") == text)
    intercept[IllegalArgumentException] {
      Embedders.truncateContext("text-embedding-ada-002", text, "middle")
    }
  }

  test("test_combine_metadata(+no_to_column/+no_metadata): pair metadata merges in, pair keys win") {
    import graft.operators.Utils
    for (clean <- Seq(true, false)) {
      val df = Seq((("Text", Map("tag" -> "test")), Map("meta" -> "data", "tag" -> "old")))
        .toDF("text", "metadata")
      val out = Utils.combineMetadata(df, "text", "metadata", clean)
      val r = out.collect().head
      assert(r.getMap[String, String](1).toMap ==
        Map("meta" -> "data", "tag" -> "test")) // pair's tag WINS
      if (clean) assert(r.getString(0) == "Text")
      else assert(r.getStruct(0).getString(0) == "Text")
      // no to_column: created from the pair's metadata
      val df2 = Seq(Tuple1(("Text", Map("tag" -> "test")))).toDF("text")
      val out2 = Utils.combineMetadata(df2, "text", "metadata", clean)
      assert(out2.collect().head.getMap[String, String](1).toMap == Map("tag" -> "test"))
      // plain string from_column: empty metadata created, text untouched
      val df3 = Seq(Tuple1("Text")).toDF("text")
      val out3 = Utils.combineMetadata(df3, "text", "metadata", clean)
      val r3 = out3.collect().head
      assert(r3.getString(0) == "Text" && r3.getMap[String, String](1).isEmpty)
    }
  }

  test("rerank_topk_filter on EMPTY lists returns empty lists, not an error") {
    val out = Seq((Seq.empty[String], Seq.empty[Double])).toDF("docs", "scores")
      .select(graft.operators.Llms.rerankTopkFilter(col("docs"), col("scores"), 3).as("r"))
      .select(col("r.docs"), col("r.scores"))
      .as[(Seq[String], Seq[Double])].collect().head
    assert(out._1.isEmpty && out._2.isEmpty)
  }

  test("recursiveSplitDf explodes per-row chunks with metadata columns intact") {
    val df = Seq((7L, "aa bb cc")).toDF("doc_id", "text")
    val out = Splitters.recursiveSplitDf(df, col("text"), chunkSize = 7)
      .select("doc_id", "chunk_idx", "chunk_text")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2))).toSeq
    assert(out == Seq((7L, 0, "aa bb"), (7L, 1, "cc")))
  }
}

package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Adaptive (geometric) RAG — reference
  * python/pathway/xpacks/llm/question_answering.py:
  * `answer_with_geometric_rag_strategy` (:184),
  * `answer_with_geometric_rag_strategy_from_index` (:303) and
  * `AdaptiveRAGQuestionAnswerer` (:819): ask the LLM with the first
  * `nStarting` documents; if it reports no answer, multiply the document
  * count by `factor` and re-ask, up to `maxIterations` rounds. Easy
  * questions cost a 2-document prompt; only the hard tail pays for wide
  * contexts — the Adaptive-RAG token economy (Sarthi et al.-adjacent
  * "geometric" schedule the reference implements).
  *
  * Engine shape: each round is ONE [[Llms.chatComplete]] pass over the
  * still-unanswered subset — per-partition HTTP fan-out, no shuffle, no
  * driver round-trip per question. Round outputs are localCheckpoint'ed
  * before the union so a downstream action can never re-fire paid LLM
  * calls (the AsyncTransformer exactness discipline). The from-store
  * variant retrieves the MAXIMUM document budget once (one KNN pass at
  * `nStarting·factor^(maxIterations-1)`) and feeds prefixes to the rounds
  * — retrieval cost is one index query per question regardless of how
  * many rounds the question needs.
  */
object Rag {

  val DefaultNoAnswer = "No information found."

  /** The reference's `prompt_qa_geometric_rag` role: instruct the model to
    * emit exactly `noAnswer` when the context is insufficient. */
  def geometricPrompt(context: Column, query: Column,
      noAnswer: String = DefaultNoAnswer): Column =
    concat(
      lit("Answer the question based only on the context. If the context " +
        s"""does not contain the answer, reply exactly "$noAnswer".""" +
        "\nContext:\n"),
      context, lit("\n\nQuestion: "), query, lit("\nAnswer:"))

  /** Geometric-escalation answering over a per-question document list
    * (`docsCol`: array<string>, already relevance-ordered). Returns
    * (query_id, query, answer, n_docs_used, iterations, answered):
    * unanswered questions carry `answer = noAnswer`, `answered = false`,
    * `n_docs_used` = the full budget tried. */
  def answerGeometric(questions: DataFrame, qId: Column, qText: Column,
      docsCol: Column, chat: () => Llms.ChatModel,
      noAnswer: String = DefaultNoAnswer,
      nStarting: Int = 2, factor: Int = 2, maxIterations: Int = 4,
      batchSize: Int = 16): DataFrame = {
    require(nStarting > 0 && factor > 1 && maxIterations > 0)
    val outCols = Seq("query_id", "query", "documents", "answer",
      "n_docs_used", "iterations")
    var pending = questions.select(qId.cast("long").as("query_id"),
      qText.cast("string").as("query"), docsCol.as("documents"))
    var done: DataFrame = null
    var n = nStarting
    var iter = 0
    var allAnswered = false
    while (iter < maxIterations && !allAnswered) {
      iter += 1
      val ctx = concat_ws("\n\n", slice(col("documents"), 1, n))
      val asked = Llms.chatComplete(
        pending.withColumn("_prompt", geometricPrompt(ctx, col("query"), noAnswer)),
        col("_prompt"), chat, batchSize = batchSize)
        .withColumn("answer",
          when(col("response") === noAnswer or col("response").isNull,
            lit(null).cast("string")).otherwise(col("response")))
        .withColumn("n_docs_used",
          least(lit(n.toLong), size(col("documents")).cast("long")))
        .withColumn("iterations", lit(iter.toLong))
        .select(outCols.map(col): _*)
        // paid LLM calls must never re-execute under a downstream action
        .transform(Materialize.eager)
      val answered = asked.filter(col("answer").isNotNull)
      done = if (done == null) answered else done.unionByName(answered)
      pending = asked.filter(col("answer").isNull)
        .select(col("query_id"), col("query"), col("documents"))
      n *= factor
      // `asked` is already materialized by the checkpoint, so this is a
      // cheap local filter — skip residual rounds (each would otherwise
      // build a chatComplete plan + force an eager checkpoint job over an
      // empty frame) once every question is answered
      allAnswered = pending.isEmpty
    }
    val exhausted = pending
      .withColumn("answer", lit(null).cast("string"))
      .withColumn("n_docs_used",
        least(lit((n / factor).toLong), size(col("documents")).cast("long")))
      .withColumn("iterations", lit(maxIterations.toLong))
      .select(outCols.map(col): _*)
    done.unionByName(exhausted)
      .withColumn("answered", col("answer").isNotNull)
      .withColumn("answer", coalesce(col("answer"), lit(noAnswer)))
      .drop("documents")
  }

  /** `answer_with_geometric_rag_strategy_from_index`: retrieve the maximum
    * budget (`nStarting·factor^(maxIterations-1)` chunks) from a
    * [[DocumentStore]] once per question, then escalate over prefixes. */
  def answerGeometricFromStore(store: DataFrame, questions: DataFrame,
      qId: Column, qText: Column, chat: () => Llms.ChatModel,
      dim: Int = 64, exact: Boolean = true,
      noAnswer: String = DefaultNoAnswer,
      nStarting: Int = 2, factor: Int = 2, maxIterations: Int = 4,
      batchSize: Int = 16): DataFrame = {
    // saturating budget: large factor/maxIterations must not wrap Int
    // (a wrapped-negative k would silently retrieve nothing and burn
    // maxIterations LLM calls per question)
    val kMax = Rag.saturatingBudget(nStarting, factor, maxIterations)
    val retrieved = DocumentStore.retrieve(store, questions, qId, qText,
      k = kMax, dim = dim, exact = exact)
    val docsPerQ = retrieved.groupBy("query_id").agg(
      transform(array_sort(collect_list(struct(col("rank"), col("chunk_text")))),
        e => e("chunk_text")).as("documents"))
    val qs = questions.select(qId.cast("long").as("query_id"),
        qText.cast("string").as("query"))
      .join(docsPerQ, Seq("query_id"), "left")
      .withColumn("documents",
        coalesce(col("documents"), array().cast("array<string>")))
    answerGeometric(qs, col("query_id"), col("query"), col("documents"),
      chat, noAnswer, nStarting, factor, maxIterations, batchSize)
  }

  /** `nStarting · factor^(maxIterations−1)` with saturation at
    * Int.MaxValue instead of two's-complement wrap. */
  def saturatingBudget(nStarting: Int, factor: Int, maxIterations: Int): Int = {
    val v = nStarting.toDouble * math.pow(factor.toDouble, (maxIterations - 1).toDouble)
    if (v >= Int.MaxValue.toDouble) Int.MaxValue else math.max(v.toInt, 1)
  }

  /** The reference's `prompt_summarize` role: condense a list of texts. */
  /** RAG prompt template (prompts.py:74 RAGPromptTemplate; r16 decode of
    * test_rag.py test_invalid_prompt_template_raises_error): the template
    * must contain BOTH `{context}` and `{query}`, and NOTHING else may be a
    * placeholder (python str.format with only those two keys must succeed —
    * `{{`/`}}` are literal braces). Returns the compiled segments so
    * [[ragPrompt]] lowers to a literal concat (codegen'd), not a UDF. */
  def parseRagTemplate(template: String): Seq[Either[String, String]] = {
    if (!template.contains("{context}") || !template.contains("{query}"))
      throw new IllegalArgumentException(
        "Template must contain `{context}` and `{query}` placeholders.")
    val out = scala.collection.mutable.ArrayBuffer.empty[Either[String, String]]
    val lit = new StringBuilder
    var i = 0
    def expectsOnly(): Nothing = throw new IllegalArgumentException(
      "RAG prompt template expects `context` and `query` placeholders only.")
    while (i < template.length) {
      val c = template.charAt(i)
      if (c == '{') {
        if (template.startsWith("{{", i)) { lit += '{'; i += 2 }
        else if (template.startsWith("{context}", i)) {
          out += Left(lit.result()); lit.clear(); out += Right("context"); i += 9
        } else if (template.startsWith("{query}", i)) {
          out += Left(lit.result()); lit.clear(); out += Right("query"); i += 7
        } else expectsOnly() // another placeholder, or a stray '{'
      } else if (c == '}') {
        if (template.startsWith("}}", i)) { lit += '}'; i += 2 }
        else expectsOnly() // python: "Single '}' encountered"
      } else { lit += c; i += 1 }
    }
    out += Left(lit.result())
    out.toSeq
  }

  /** Build the prompt column from a validated template — a plain concat of
    * literal segments and the two columns. */
  def ragPrompt(template: String, context: Column, query: Column): Column =
    concat(parseRagTemplate(template).map {
      case Left(s) => lit(s)
      case Right("context") => context
      case Right(_) => query
    }: _*)

  def summarizePrompt(texts: Seq[String]): String =
    "Summarize the following texts into a single short summary.\n\n" +
      texts.mkString("\n\n") + "\n\nSummary:"
}

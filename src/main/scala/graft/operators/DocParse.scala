package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Unstructured-document parsing (reference xpacks/llm/parsers.py: Utf8Parser
  * bytes→text at :55, UnstructuredParser format-sniff → clean text at :94).
  *
  * Scope here is the pure-JVM text family — UTF-8 decode, HTML strip,
  * markdown + YAML-front-matter extraction — feeding DocumentStore.build.
  * Binary formats (PDF/DOCX/images) need codec libraries that are absent from
  * this container's offline cache (no pdfbox/poi artifacts — see BASELINE.md);
  * the dispatch seam (`sniff` → per-format CASE) is where they would slot in.
  *
  * Everything lowers to codegen'd built-ins (`regexp_replace`/`replace`/
  * `regexp_extract`), RE2-compatible so the DuckDB oracle runs the identical
  * pipeline: inline `(?is)`/`(?m)` flags, non-greedy `.*?`, no backreferences
  * in patterns.
  */
object DocParse {

  /** Utf8Parser twin: binary column → string. */
  def utf8(bytes: Column): Column = decode(bytes, "UTF-8")

  /** Format sniff on leading bytes: markup → html, front-matter fence →
    * markdown, else plain. */
  def sniff(content: Column): Column =
    when(substring(content, 1, 1) === "<", "html")
      .when(substring(content, 1, 4) === "---\n", "markdown")
      .otherwise("plain")

  /** The common named entities; `&amp;` decoded LAST so `&amp;lt;` yields
    * `&lt;` (single-pass decode), the standard order. */
  private def decodeEntities(c: Column): Column = {
    val steps = Seq("&lt;" -> "<", "&gt;" -> ">", "&quot;" -> "\"",
      "&#39;" -> "'", "&nbsp;" -> " ", "&amp;" -> "&")
    steps.foldLeft(c) { case (acc, (from, to)) => replace(acc, lit(from), lit(to)) }
  }

  /** HTML → clean text: drop the head subtree (title/meta are metadata, not
    * body text) and script/style subtrees, strip tags, decode entities,
    * collapse whitespace. */
  def htmlToText(c: Column): Column = {
    val noHead = regexp_replace(c, "(?is)<head[^>]*>.*?</head>", " ")
    val noBlocks = regexp_replace(noHead,
      "(?is)<(script|style)[^>]*>.*?</(script|style)>", " ")
    val noTags = regexp_replace(noBlocks, "(?s)<[^>]*>", " ")
    trim(regexp_replace(decodeEntities(noTags), "\\s+", " "))
  }

  /** `<title>` of an HTML document, null when absent. */
  def htmlTitle(c: Column): Column =
    nullif(regexp_extract(c, "(?is)<title[^>]*>(.*?)</title>", 1), lit(""))

  /** Raw YAML front-matter block (between leading `---` fences), "" when absent. */
  def mdFrontMatter(c: Column): Column =
    regexp_extract(c, "(?s)^---\n(.*?)\n---\n", 1)

  /** A front-matter scalar field, null when absent. */
  def frontMatterField(fm: Column, field: String): Column =
    nullif(regexp_extract(fm, s"(?m)^$field: *(.*)$$", 1), lit(""))

  /** Markdown → clean text: drop front matter, heading markers, link targets
    * (keep anchor text), emphasis/code markers, collapse whitespace. */
  def mdToText(c: Column): Column = {
    val noFm = regexp_replace(c, "(?s)^---\n.*?\n---\n", "")
    val noHead = regexp_replace(noFm, "(?m)^#{1,6} *", "")
    val noLinks = regexp_replace(noHead, "\\[([^\\]]*)\\]\\([^)]*\\)", "$1")
    val noMarks = replace(replace(noLinks, lit("*"), lit("")), lit("`"), lit(""))
    trim(regexp_replace(noMarks, "\\s+", " "))
  }

  /** Sniff-and-parse a content column: (id, format, title, text), the
    * UnstructuredParser "single" chunking mode shape. Feed `text` to
    * DocumentStore.build / TextOps splitters downstream. */
  def parseDocs(df: DataFrame, id: Column, content: Column): DataFrame = {
    val fmt = sniff(content)
    df.select(
      id.as("doc_id"),
      fmt.as("format"),
      when(fmt === "html", htmlTitle(content))
        .when(fmt === "markdown", frontMatterField(mdFrontMatter(content), "title"))
        .otherwise(lit(null).cast("string")).as("title"),
      when(fmt === "html", htmlToText(content))
        .when(fmt === "markdown", mdToText(content))
        .otherwise(trim(regexp_replace(content, "\\s+", " "))).as("text"))
  }

  /** Magic-byte sniff ahead of any UTF-8 decode: `%PDF` → pdf, the ZIP
    * local-file header `PK\x03\x04` → docx (OOXML containers), else text
    * (handed to [[sniff]] on the decoded string). Caveat: every ZIP-based
    * container (xlsx, jar, plain zip) shares that header — a registered
    * "docx" parser must sniff the OOXML content type internally and use
    * its (title=null, text="") path for non-docx archives. */
  def sniffBytes(b: Column): Column =
    when(substring(b, 1, 4) === lit("%PDF".getBytes("US-ASCII")), "pdf")
      .when(substring(b, 1, 4) === lit(Array[Byte](0x50, 0x4b, 0x03, 0x04)), "docx")
      .otherwise("text")

  /** A binary-format parser: blob → (title-or-null, text). The PDF/DOCX
    * integration seam: pdfbox/poi are absent from this container's offline
    * cache (BASELINE.md), so nothing ships a real implementation, but the
    * day the jar exists the integration is one entry —
    * `parseBinaryDocs(df, id, b, Map("pdf" -> pdfboxExtract))`. */
  type BinaryParser = Array[Byte] => (String, String)

  /** Bytes-in variant (fs binary connector → parser → store pipeline):
    * binary formats dispatch on magic bytes to a registered [[BinaryParser]];
    * a recognized-but-unregistered format keeps its `format` tag with null
    * title/text (the "needs a codec" channel — NOT silently utf8-mangled);
    * everything else takes the text path ([[parseDocs]]). */
  def parseBinaryDocs(df: DataFrame, id: Column, bytes: Column,
      parsers: Map[String, BinaryParser] = Map.empty): DataFrame = {
    val bfmt = sniffBytes(bytes)
    val content = utf8(bytes)
    val tfmt = sniff(content)
    // per registered format, a (title, text) struct from the pluggable fn
    val parsed: Map[String, Column] = parsers.map { case (f, fn) =>
      f -> udf((b: Array[Byte]) => fn(b)).apply(bytes)
    }
    // fold over the sniffable formats ∪ registered keys, so a parser
    // registered for a future sniffBytes format is never silently dead
    val binFormats = (Seq("pdf", "docx") ++ parsers.keys).distinct
    def binCase(field: String, fallthrough: Column): Column =
      binFormats.foldRight(fallthrough) { (f, els) =>
        when(bfmt === f,
          parsed.get(f).map(_.getField(field)).getOrElse(lit(null).cast("string")))
          .otherwise(els)
      }
    df.select(
      id.as("doc_id"),
      when(bfmt === "text", tfmt).otherwise(bfmt).as("format"),
      binCase("_1",
        when(tfmt === "html", htmlTitle(content))
          .when(tfmt === "markdown", frontMatterField(mdFrontMatter(content), "title"))
          .otherwise(lit(null).cast("string"))).as("title"),
      binCase("_2",
        when(tfmt === "html", htmlToText(content))
          .when(tfmt === "markdown", mdToText(content))
          .otherwise(trim(regexp_replace(content, "\\s+", " ")))).as("text"))
  }
}

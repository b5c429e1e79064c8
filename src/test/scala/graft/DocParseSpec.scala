package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.DocParse

class DocParseSpec extends AnyFunSuite {
  private val spark = SparkTestBase.spark
  import spark.implicits._

  test("html: strips script/style subtrees and tags, decodes entities, extracts title") {
    val html =
      """<html><head><title> Release Notes </title>
        |<style>body { color: red }</style></head>
        |<body><h1>V2</h1><script>var tracking = "<p>";</script>
        |<p>Tom &amp; Jerry say &quot;hi&quot; &lt;3&nbsp;&#39;ok&#39;</p></body></html>""".stripMargin
    val out = DocParse.parseDocs(Seq((1L, html)).toDF("id", "content"),
      col("id"), col("content")).collect().head
    assert(out.getAs[String]("format") == "html")
    assert(out.getAs[String]("title") == " Release Notes ") // head subtree dropped from body text
    assert(out.getAs[String]("text") == """V2 Tom & Jerry say "hi" <3 'ok'""")
  }

  test("markdown: front matter fields, heading/link/emphasis stripping") {
    val md = "---\ntitle: The Plan\nlang: en\n---\n# Intro\n\nSee **bold** and [the docs](https://x.y/z) here."
    val out = DocParse.parseDocs(Seq((1L, md)).toDF("id", "content"),
      col("id"), col("content")).collect().head
    assert(out.getAs[String]("format") == "markdown")
    assert(out.getAs[String]("title") == "The Plan")
    assert(out.getAs[String]("text") == "Intro See bold and the docs here.")
  }

  test("plain text passes through with whitespace collapsed; title null") {
    val out = DocParse.parseDocs(Seq((1L, "  two\n words \t here ")).toDF("id", "content"),
      col("id"), col("content")).collect().head
    assert(out.getAs[String]("format") == "plain")
    assert(out.getAs[String]("title") == null)
    assert(out.getAs[String]("text") == "two words here")
  }

  test("binary path: UTF-8 bytes → parsed doc (fs binary connector shape)") {
    val bytes = "---\ntitle: Bin\n---\nBody here.".getBytes("UTF-8")
    val out = DocParse.parseBinaryDocs(Seq((7L, bytes)).toDF("id", "raw"),
      col("id"), col("raw")).collect().head
    assert(out.getAs[Long]("doc_id") == 7L)
    assert(out.getAs[String]("title") == "Bin")
    assert(out.getAs[String]("text") == "Body here.")
  }

  test("pdf seam: magic-byte dispatch routes blobs through a pluggable parser") {
    val pdfBytes = "%PDF-1.4\nBT (Hello from pdf) Tj ET".getBytes("US-ASCII")
    val mdBytes = "---\ntitle: Bin\n---\nBody.".getBytes("UTF-8")
    val docs = Seq((1L, pdfBytes), (2L, mdBytes)).toDF("id", "raw")

    // unregistered: format tagged, title/text null — never utf8-mangled
    val bare = DocParse.parseBinaryDocs(docs, col("id"), col("raw"))
      .collect().map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(bare(1L).getAs[String]("format") == "pdf")
    assert(bare(1L).getAs[String]("title") == null)
    assert(bare(1L).getAs[String]("text") == null)
    assert(bare(2L).getAs[String]("format") == "markdown")
    assert(bare(2L).getAs[String]("text") == "Body.")

    // registered test-double (a pdfbox stand-in: extract BT..ET text ops);
    // the real integration is this one Map entry the day the jar exists
    val fakePdf: DocParse.BinaryParser = b => {
      val s = new String(b, "US-ASCII")
      val m = "\\(([^)]*)\\) Tj".r.findFirstMatchIn(s)
      (null, m.map(_.group(1)).getOrElse(""))
    }
    val parsed = DocParse.parseBinaryDocs(docs, col("id"), col("raw"),
        Map("pdf" -> fakePdf))
      .collect().map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(parsed(1L).getAs[String]("format") == "pdf")
    assert(parsed(1L).getAs[String]("text") == "Hello from pdf")
    assert(parsed(2L).getAs[String]("text") == "Body.") // text path untouched
  }

  test("pdf parse via real pdfbox (auto-enables when a pdfbox jar is present)") {
    // Jar-gated (VERDICT r8 #5): the offline cache has no pdfbox artifact, so
    // this assume-skips today; drop pdfbox-app.jar into the classpath and it
    // runs unchanged — the registration line the DocParse scaladoc promises,
    // against a real decode. Reflection keeps pdfbox off the compile path.
    assume(scala.util.Try(Class.forName("org.apache.pdfbox.text.PDFTextStripper")).isSuccess,
      "pdfbox jar absent from classpath (BASELINE.md jar-absence record)")
    val out = DocParse.parseBinaryDocs(
        Seq((1L, DocParseSpec.minimalPdf("Hello Graft"))).toDF("id", "raw"),
        col("id"), col("raw"), Map("pdf" -> DocParseSpec.pdfboxParser))
      .collect().head
    assert(out.getAs[String]("format") == "pdf")
    assert(out.getAs[String]("text").contains("Hello Graft"))
  }

  test("parsed html text feeds the chunk splitter downstream") {
    val html = "<html><body><p>" + Seq.tabulate(120)(i => s"tok$i").mkString(" ") + "</p></body></html>"
    val parsed = DocParse.parseDocs(Seq((1L, html)).toDF("id", "content"),
      col("id"), col("content"))
    val chunks = graft.operators.TextOps.splitIntoChunks(
      parsed, col("text"), chunkSize = 50, overlap = 10)
    assert(chunks.count() >= 3)
  }
}

object DocParseSpec {
  /** A structurally valid single-page PDF with `text` in its content stream —
    * offsets and xref computed, so a real parser (pdfbox) accepts it without
    * repair. Fixture generator for the jar-gated real-decode test. */
  def minimalPdf(text: String): Array[Byte] = {
    val stream = s"BT /F1 12 Tf 72 712 Td ($text) Tj ET"
    val objs = Seq(
      "<< /Type /Catalog /Pages 2 0 R >>",
      "<< /Type /Pages /Kids [3 0 R] /Count 1 >>",
      "<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] " +
        "/Contents 4 0 R /Resources << /Font << /F1 5 0 R >> >> >>",
      s"<< /Length ${stream.length} >>\nstream\n$stream\nendstream",
      "<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>")
    val sb = new StringBuilder("%PDF-1.4\n")
    val offsets = objs.zipWithIndex.map { case (body, i) =>
      val off = sb.length
      sb.append(s"${i + 1} 0 obj\n$body\nendobj\n")
      off
    }
    val xrefOff = sb.length
    sb.append(s"xref\n0 ${objs.length + 1}\n0000000000 65535 f \n")
    offsets.foreach(o => sb.append(f"$o%010d 00000 n \n"))
    sb.append(s"trailer\n<< /Size ${objs.length + 1} /Root 1 0 R >>\n" +
      s"startxref\n$xrefOff\n%%EOF\n")
    sb.toString.getBytes("US-ASCII")
  }

  /** Reflective pdfbox-backed [[DocParse.BinaryParser]] — compiles without the
    * jar, works with both pdfbox 2.x (`PDDocument.load`) and 3.x
    * (`Loader.loadPDF`). */
  val pdfboxParser: DocParse.BinaryParser = (b: Array[Byte]) => {
    val doc =
      scala.util.Try {
        Class.forName("org.apache.pdfbox.Loader")
          .getMethod("loadPDF", classOf[Array[Byte]]).invoke(null, b)
      }.getOrElse {
        Class.forName("org.apache.pdfbox.pdmodel.PDDocument")
          .getMethod("load", classOf[Array[Byte]]).invoke(null, b)
      }
    try {
      val stripper = Class.forName("org.apache.pdfbox.text.PDFTextStripper")
        .getDeclaredConstructor().newInstance()
      val text = stripper.getClass.getMethod("getText",
          Class.forName("org.apache.pdfbox.pdmodel.PDDocument"))
        .invoke(stripper, doc).asInstanceOf[String]
      (null, text.trim)
    } finally doc.getClass.getMethod("close").invoke(doc)
  }
}

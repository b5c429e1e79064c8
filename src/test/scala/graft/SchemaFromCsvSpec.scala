package graft

import java.nio.file.Files

import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.core.PwSchema

/** Replays test_schema.py:217 `test_schema_from_csv` — header-named columns,
  * python int/float/str type sniffing over the sampled rows (quoted values
  * UNQUOTE first: a quoted "1" is an int), num_parsed_rows/comment/quote/
  * double_quote_escapes knobs. */
class SchemaFromCsvSpec extends AnyFunSuite {

  private def write(content: String): String = {
    val f = Files.createTempDirectory("graft-sfc").resolve("dataset.csv")
    Files.write(f, content.getBytes("UTF-8"))
    f.toString
  }

  private def types(s: PwSchema): Map[String, DataType] =
    s.cols.map(c => c.name -> c.dtype).toMap

  private val file1 = write(
    "ID,value,time,diff\n" +
    "\"a\",\"worrld\",1692262484324,1\n" +
    "#\"b\",\"worrld\",1692262510368,1.1\n" +
    "\"c\",\"worrld\",1692262510368,1\n")

  test("schema1: full sample — mixed int/float column widens to float") {
    assert(types(PwSchema.fromCsv(file1)) == Map(
      "ID" -> StringType, "value" -> StringType,
      "time" -> LongType, "diff" -> DoubleType))
  }

  test("schema2: num_parsed_rows=1 sees only ints in diff") {
    assert(types(PwSchema.fromCsv(file1, numParsedRows = Some(1)))("diff") == LongType)
  }

  test("schema3: comment_character skips the 1.1 row, diff stays int") {
    assert(types(PwSchema.fromCsv(file1, commentCharacter = Some('#')))("diff") == LongType)
  }

  test("schema4: num_parsed_rows=0 — every column is Any (String carrier)") {
    assert(types(PwSchema.fromCsv(file1, numParsedRows = Some(0))).values.toSet ==
      Set[DataType](StringType))
  }

  test("schema5: a non-occurring delimiter yields ONE string column") {
    val s = PwSchema.fromCsv(file1, delimiter = ']')
    assert(s.cols.map(_.name) == Seq("ID,value,time,diff"))
    assert(s.cols.head.dtype == StringType)
  }

  private val file2 = write(
    "ID,\"va\"\"l\"\"ue\"\n" +
    "\"1\",\"worrld\"\n" +
    "\"3\",\"worrld\"\n")

  test("schema6: doubled quotes unescape in the header; quoted \"1\" sniffs as int") {
    val s = PwSchema.fromCsv(file2)
    assert(types(s) == Map("ID" -> LongType, "va\"l\"ue" -> StringType))
  }

  test("schema7: a different quote char leaves double quotes literal (ID stays str)") {
    val s = PwSchema.fromCsv(file2, quote = '\'')
    assert(types(s) == Map("ID" -> StringType, "\"va\"\"l\"\"ue\"" -> StringType))
  }

  test("schema8: double_quote_escapes=false — the quote closes and the rest is literal") {
    val s = PwSchema.fromCsv(file2, doubleQuoteEscapes = false)
    assert(types(s) == Map("ID" -> LongType, "va\"l\"\"ue\"" -> StringType))
  }

  test("an empty file raises the reference ValueError") {
    val e = intercept[IllegalArgumentException] { PwSchema.fromCsv(write("")) }
    assert(e.getMessage.contains("empty CSV file"))
  }
}

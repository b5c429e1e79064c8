package graft

import java.nio.file.{Files, Path}

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.core.{PwColumnDef, PwSchema}
import graft.functions.Errors
import graft.sources.{Connectors, TypedCells}

/** Bit-exact replays of the reference's typed-connector fixtures
  * (tests/test_io.py: test_csv_default_values:468, test_csv_skip_column:501,
  * test_json_default_values:581, test_json_optional_values:955,
  * test_json_optional_values_with_paths:984) plus unit vectors for the
  * decoded cell contract (data_format/mod.rs:490-660, 731, 855):
  * advanced bool vocabulary, optional null vocabulary, strict int/float
  * token shapes, JSON absent-vs-explicit-null, kind-strict JSON typing. */
class ConnectorsTypedSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark

  private def tmpFile(lines: Seq[String]): String = {
    val dir: Path = Files.createTempDirectory("graft-typed")
    val f = dir.resolve("input.txt")
    Files.write(f, lines.mkString("\n").getBytes("UTF-8"))
    f.toString
  }

  private def rows(df: org.apache.spark.sql.DataFrame): Set[Seq[Any]] =
    df.drop(Errors.ErrCol).collect().toSet[Row].map(_.toSeq)

  // ─────────────────────────── CSV ───────────────────────────

  test("test_csv_default_values: empty cell on a defaulted int column takes the default") {
    val path = tmpFile(Seq("k,v", "a,42", "b,43", "c,"))
    val schema = PwSchema(Seq(
      PwColumnDef("k", StringType, primaryKey = true),
      PwColumnDef("v", LongType, defaultValue = Some(0L))))
    val out = Connectors.csvTyped(spark, path, schema)
    assert(rows(out) == Set(Seq("a", 42L), Seq("b", 43L), Seq("c", 0L)))
    assert(out.filter(size(col(Errors.ErrCol)) > 0).count() == 0)
  }

  test("test_csv_skip_column: columns project by HEADER NAME, not position") {
    val path = tmpFile(Seq("k,a,b", "1,foo,a", "2,bar,b", "3,baz,c"))
    val schema = PwSchema(Seq(
      PwColumnDef("k", LongType, primaryKey = true),
      PwColumnDef("b", StringType)))
    val out = Connectors.csvTyped(spark, path, schema)
    assert(rows(out) == Set(Seq(1L, "a"), Seq(2L, "b"), Seq(3L, "c")))
  }

  test("a schema field missing from the CSV header fails like FieldsNotFoundInHeader") {
    val path = tmpFile(Seq("k,a", "1,foo"))
    val schema = PwSchema(Seq(PwColumnDef("k", LongType), PwColumnDef("zz", StringType)))
    val e = intercept[IllegalArgumentException] {
      Connectors.csvTyped(spark, path, schema)
    }
    assert(e.getMessage.contains("zz") && e.getMessage.contains("not found in header"))
  }

  test("advanced bool vocabulary: postgres names + t/f/y/n, trimmed, any case (mod.rs:506)") {
    val toks = Seq("true", "Yes", "ON", "1", "t", "Y", "false", "No", "OFF", "0", "F", "n")
    val path = tmpFile("k,v" +: toks.zipWithIndex.map { case (t, i) => s"$i,$t" })
    val schema = PwSchema(Seq(PwColumnDef("k", LongType), PwColumnDef("v", BooleanType)))
    val out = Connectors.csvTyped(spark, path, schema)
    val expect = toks.zipWithIndex.map { case (t, i) =>
      Seq(i.toLong, Seq("true", "yes", "on", "1", "t", "y").contains(t.toLowerCase))
    }.toSet[Seq[Any]]
    assert(rows(out) == expect)
    // "2" / "maybe" are parse errors, not false
    val bad = tmpFile(Seq("k,v", "0,2", "1,maybe"))
    val outBad = Connectors.csvTyped(spark, bad, schema)
    assert(outBad.filter(size(col(Errors.ErrCol)) > 0).count() == 2)
  }

  test("optional columns parse null/none/'' as None; plain string keeps the token (mod.rs:514)") {
    val path = tmpFile(Seq("k,v,s", "1,NULL,null", "2,none,none", "3,,x", "4,7,"))
    val schema = PwSchema(Seq(
      PwColumnDef("k", LongType),
      PwColumnDef("v", LongType, optional = true),
      PwColumnDef("s", StringType, optional = true)))
    val out = Connectors.csvTyped(spark, path, schema)
    // string column keeps the literal token (String not in the None match arm)
    assert(rows(out) == Set(
      Seq(1L, null, "null"), Seq(2L, null, "none"), Seq(3L, null, "x"), Seq(4L, 7L, "")))
  }

  test("int tokens are Rust-parse strict: no decimals, exponents, or inner spaces") {
    val path = tmpFile(Seq("k,v", "1,5", "2,+7", "3,-9", "4,5.5", "5,1e3", "6,abc"))
    val schema = PwSchema(Seq(PwColumnDef("k", LongType), PwColumnDef("v", LongType)))
    val out = Connectors.csvTyped(spark, path, schema)
    val good = out.filter(size(col(Errors.ErrCol)) === 0)
    assert(rows(good) == Set(Seq(1L, 5L), Seq(2L, 7L), Seq(3L, -9L)))
    val errs = Errors.errorTable(out, col("k")).select("k", "err_col")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(errs == Set((4L, "v"), (5L, "v"), (6L, "v")))
  }

  // ─────────────────────────── JSON-lines ───────────────────────────

  test("test_json_default_values: MISSING field takes default; explicit null does NOT") {
    val path = tmpFile(Seq(
      """{"k": "a", "b": 1, "c": "foo" }""",
      """{"k": "b", "b": 2, "c": null }""",
      """{"k": "c" }"""))
    val schema = PwSchema(Seq(
      PwColumnDef("k", StringType, primaryKey = true),
      PwColumnDef("b", LongType, defaultValue = Some(0L)),
      PwColumnDef("c", StringType, defaultValue = Some("default"), optional = true)))
    val out = Connectors.jsonlinesTyped(spark, path, schema)
    assert(rows(out) == Set(
      Seq("a", 1L, "foo"), Seq("b", 2L, null), Seq("c", 0L, "default")))
    assert(out.filter(size(col(Errors.ErrCol)) > 0).count() == 0)
  }

  test("test_json_optional_values: absent defaulted field fills per row") {
    val path = tmpFile(Seq(
      """{"k": "a", "v": 1}""",
      """{"k": "b", "v": 2, "w": 512}"""))
    val schema = PwSchema(Seq(
      PwColumnDef("k", StringType, primaryKey = true),
      PwColumnDef("v", LongType, defaultValue = Some(0L)),
      PwColumnDef("w", LongType, defaultValue = Some(1024L))))
    val out = Connectors.jsonlinesTyped(spark, path, schema)
    assert(rows(out) == Set(Seq("a", 1L, 1024L), Seq("b", 2L, 512L)))
  }

  test("test_json_optional_values_with_paths: a pointer path that never resolves defaults everywhere") {
    val path = tmpFile(Seq(
      """{"k": "a", "v": 1}""",
      """{"k": "b", "v": 2, "w": 512}"""))
    val schema = PwSchema(Seq(
      PwColumnDef("k", StringType, primaryKey = true),
      PwColumnDef("v", LongType, defaultValue = Some(0L)),
      PwColumnDef("w", LongType, defaultValue = Some(1024L))))
    val out = Connectors.jsonlinesTyped(spark, path, schema,
      fieldPaths = Map("w" -> "/q/w/e/r/t/y/u"))
    // "w": 512 sits at the top level, NOT at /q/w/e/r/t/y/u → default on both
    assert(rows(out) == Set(Seq("a", 1L, 1024L), Seq("b", 2L, 1024L)))
  }

  test("json_field_paths resolve nested objects and array indices") {
    val path = tmpFile(Seq(
      """{"k": "a", "q": {"w": {"e": 7}}, "arr": [10, 20, 30]}"""))
    val schema = PwSchema(Seq(
      PwColumnDef("k", StringType),
      PwColumnDef("deep", LongType),
      PwColumnDef("second", LongType)))
    val out = Connectors.jsonlinesTyped(spark, path, schema,
      fieldPaths = Map("deep" -> "/q/w/e", "second" -> "/arr/1"))
    assert(rows(out) == Set(Seq("a", 7L, 20L)))
  }

  test("JSON int typing is kind-strict: 5 parses; \"5\", 5.0, 1e3 are errors (mod.rs:741 as_i64)") {
    val path = tmpFile(Seq(
      """{"k": 1, "v": 5}""",
      """{"k": 2, "v": "5"}""",
      """{"k": 3, "v": 5.0}""",
      """{"k": 4, "v": 1e3}""",
      """{"k": 5, "v": true}"""))
    val schema = PwSchema(Seq(PwColumnDef("k", LongType), PwColumnDef("v", LongType)))
    val out = Connectors.jsonlinesTyped(spark, path, schema)
    val good = out.filter(size(col(Errors.ErrCol)) === 0)
    assert(rows(good) == Set(Seq(1L, 5L)))
    assert(out.filter(size(col(Errors.ErrCol)) > 0).count() == 4)
  }

  test("JSON float accepts any number kind; bool and string only their own kind") {
    val path = tmpFile(Seq(
      """{"k": 1, "f": 5, "b": true, "s": "x"}""",
      """{"k": 2, "f": 5.5, "b": 1, "s": 3}"""))
    val schema = PwSchema(Seq(
      PwColumnDef("k", LongType), PwColumnDef("f", DoubleType),
      PwColumnDef("b", BooleanType), PwColumnDef("s", StringType)))
    val out = Connectors.jsonlinesTyped(spark, path, schema)
    val r1 = rows(out.filter(size(col(Errors.ErrCol)) === 0))
    assert(r1 == Set(Seq(1L, 5.0, true, "x")))
    val errs = Errors.errorTable(out, col("k")).select("k", "err_col")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(errs == Set((2L, "b"), (2L, "s")))
  }

  test("explicit JSON null on a NON-optional column is a parse error; on optional it is None") {
    val path = tmpFile(Seq("""{"k": 1, "a": null, "b": null}"""))
    val schema = PwSchema(Seq(
      PwColumnDef("k", LongType),
      PwColumnDef("a", LongType, optional = true),
      PwColumnDef("b", LongType)))
    val out = Connectors.jsonlinesTyped(spark, path, schema)
    val r = out.collect().head
    assert(r.isNullAt(out.columns.indexOf("a")) && r.isNullAt(out.columns.indexOf("b")))
    val errs = Errors.errorTable(out, col("k")).select("err_col")
      .collect().map(_.getString(0)).toSet
    assert(errs == Set("b"))
  }

  test("pointer → variant path translation handles escapes, indices and exotic keys") {
    assert(TypedCells.pointerToVariantPath("/q/w/e") == "$.q.w.e")
    assert(TypedCells.pointerToVariantPath("/arr/0/x") == "$.arr[0].x")
    // non-identifier keys bracket-quote (a dotted form would NEST: serde's
    // pointer resolves the literal key "a/b", not a path)
    assert(TypedCells.pointerToVariantPath("/a~1b/c~0d") == "$['a/b']['c~d']")
    assert(TypedCells.pointerToVariantPath("/a.b") == "$['a.b']")
    // and the bracket path actually resolves the literal dotted key
    val path = tmpFile(Seq("""{"k": 1, "a.b": 7}"""))
    val schema = PwSchema(Seq(PwColumnDef("k", LongType), PwColumnDef("v", LongType)))
    val out = Connectors.jsonlinesTyped(spark, path, schema,
      fieldPaths = Map("v" -> "/a.b"))
    assert(rows(out) == Set(Seq(1L, 7L)))
  }

  test("a malformed JSON line lands in _pw_errors instead of killing the scan") {
    val path = tmpFile(Seq("""{"k": 1, "v": 5}""", """{broken"""))
    val schema = PwSchema(Seq(PwColumnDef("k", LongType), PwColumnDef("v", LongType)))
    val out = Connectors.jsonlinesTyped(spark, path, schema)
    val good = out.filter(size(col(Errors.ErrCol)) === 0)
    assert(rows(good) == Set(Seq(1L, 5L)))
    assert(out.filter(size(col(Errors.ErrCol)) > 0).count() == 1)
  }

  test("test_csv_escaping: RFC-4180 round-trip — quotes doubled, backslash is a plain char") {
    import spark.implicits._
    val testText = "ab,,\":,,cdefgh\\ '' \" hello \",, \\ ' \"\" s\"d,sd ,\""
    val dir = Files.createTempDirectory("graft-esc").resolve("out").toString
    Connectors.writeCsv(Seq(testText).toDF("data"), dir)
    val back = Connectors.csv(spark, dir).select("data").as[String].collect().toSet
    assert(back == Set(testText))
    val typedBack = Connectors.csvTyped(spark, dir,
      PwSchema(Seq(PwColumnDef("data", StringType))))
    assert(rows(typedBack) == Set(Seq(testText)))
  }

  test("test_json_csv_serialization: a pw.Json column round-trips jsonlines → csv → csv") {
    import org.apache.spark.sql.types.VariantType
    val testJson = """{"int": 1, "float": 1.1, "string": "hello", "bool_true": true,""" +
      """ "bool_false": false, "list": ["one", "two"],""" +
      """ "map": {"one": "two", "six": true, "nine": 9, "eleven": {"twelve": "thirteen"}}}"""
    val in = tmpFile(Seq(s"""{"data": $testJson}"""))
    val schema = PwSchema(Seq(PwColumnDef("data", VariantType)))
    val t1 = Connectors.jsonlinesTyped(spark, in, schema)
    assert(t1.filter(size(col(Errors.ErrCol)) > 0).count() == 0)
    // write through CSV — the WRITER renders the variant column as its
    // serialized JSON text (the reference's csv.write takes the Json table
    // directly; r19 closes the explicit-to_json workaround) — read back typed
    val out1 = Files.createTempDirectory("graft-jsoncsv").resolve("o1").toString
    Connectors.writeCsv(t1.select(col("data")), out1)
    val t2 = Connectors.csvTyped(spark, out1, schema)
    assert(t2.filter(size(col(Errors.ErrCol)) > 0).count() == 0)
    val parsedBack = t2.select(to_json(col("data"))).collect().head.getString(0)
    // compare as parsed variants (key order is not part of JSON equality)
    val eq = spark.sql(
      s"""SELECT to_json(parse_json('${parsedBack.replace("'", "''")}')) =
         |  to_json(parse_json('${testJson.replace("'", "''")}'))""".stripMargin)
      .collect().head.getBoolean(0)
    assert(eq, s"round-trip mismatch: $parsedBack")
  }

  test("typed datetime columns parse the fixed connector formats (mod.rs:556)") {
    val path = tmpFile(Seq(
      "k,t",
      "1,2023-05-15T10:51:00.000000000",
      "2,2023-05-15T10:51:00"))
    val schema = PwSchema(Seq(PwColumnDef("k", LongType), PwColumnDef("t", TimestampNTZType)))
    val out = Connectors.csvTyped(spark, path, schema)
    val vals = out.select(date_format(col("t"), "yyyy-MM-dd HH:mm:ss"))
      .collect().map(_.getString(0)).toSet
    assert(vals == Set("2023-05-15 10:51:00"))
  }
  test("output sort_by writes rows in sorted order (test_output_column_sorting_by_references)") {
    import spark.implicits._
    val t = Seq((1L, "foo", "bar"), (2L, "bar", "bar"), (3L, "baz", "baz"))
      .toDF("k", "v", "vv")
    def readOrder(dir: String): Seq[Long] = {
      val files = new java.io.File(dir).listFiles()
        .filter(f => f.getName.startsWith("part-")).sortBy(_.getName)
      files.toSeq.flatMap { f =>
        scala.io.Source.fromFile(f, "UTF-8").getLines()
          .map(l => """\"k\":(\d+)""".r.findFirstMatchIn(l).get.group(1).toLong).toList
      }
    }
    val d1 = Files.createTempDirectory("graft-sortby").resolve("o1").toString
    Connectors.writeJsonlines(t, d1, sortBy = Seq(col("v")))
    assert(readOrder(d1) == Seq(2L, 3L, 1L)) // bar, baz, foo
    val d2 = Files.createTempDirectory("graft-sortby").resolve("o2").toString
    Connectors.writeJsonlines(t, d2, sortBy = Seq(col("vv"), col("v")))
    assert(readOrder(d2) == Seq(2L, 1L, 3L)) // (bar,bar), (bar,foo), (baz,baz)
    val d3 = Files.createTempDirectory("graft-sortby").resolve("o3").toString
    Connectors.writeJsonlines(t, d3, sortBy = Seq(col("k")))
    assert(readOrder(d3) == Seq(1L, 2L, 3L))
    // a foreign sort column is an analysis error, like the reference ValueError
    intercept[org.apache.spark.sql.AnalysisException] {
      Connectors.writeJsonlines(t, d3, sortBy = Seq(col("nope")))
    }
  }

  test("directory scans recurse; globs match dirs; matchless globs yield EMPTY (test_io.py:3124-3182)") {
    import spark.implicits._
    val root = Files.createTempDirectory("graft-glob")
    val nested = root.resolve("nested_level_1/nested_level_2/nested_level_3")
    Files.createDirectories(nested)
    Files.write(nested.resolve("a.txt"), "a\nb\nc".getBytes)
    // subdirectories recurse (test_subdirectories)
    assert(Connectors.plaintext(spark,
      root.resolve("nested_level_1").toString).count() == 3)
    // a glob reaching through ** matches (test_glob_pattern)
    Files.write(nested.resolve("b.txt"), "d\ne\nf\ng".getBytes)
    assert(Connectors.plaintext(spark,
      root.resolve("nested_level_1").toString + "/*/*/b.txt").count() == 4)
    // a glob matching a DIRECTORY recurses into it (test_glob_pattern_recurse_subdirs)
    val in2 = root.resolve("input"); Files.createDirectories(in2.resolve("foo/level2"))
    Files.write(in2.resolve("foo/level2/a.txt"), "a\nb\nc".getBytes)
    Files.write(in2.resolve("f1.txt"), "d\ne\nf\ng".getBytes)
    Files.write(in2.resolve("bar.txt"), "h\ni\nj\nk\nl".getBytes)
    assert(Connectors.plaintext(spark, in2.toString + "/f*").count() == 7)
    // a matchless path yields ZERO rows, not PATH_NOT_FOUND
    assert(Connectors.plaintext(spark, in2.toString + "/f").count() == 0)
  }

  test("test_non_ascii_characters: embedded newlines and unicode round-trip through CSV") {
    import spark.implicits._
    val values = Seq("a\na", "ąęćśż", "قطة")
    val dir = Files.createTempDirectory("graft-nonascii").resolve("out").toString
    Connectors.writeCsv(values.toDF("data"), dir)
    val back = Connectors.csv(spark, dir).select("data").as[String].collect().toSet
    assert(back == values.toSet)
  }

  test("test_apply_bytes_full_cycle: bytes survive binary read → transform → " +
      "jsonlines write as BASE64, and csv write base64s too") {
    import spark.implicits._
    val root = Files.createTempDirectory("graft-bytes")
    val in = root.resolve("input.txt")
    val contents = "abc\n\ndef\nghi\n"
    Files.write(in, contents.getBytes("UTF-8"))
    // format="binary": one row per whole file; duplicate the payload like
    // the reference's `pw.apply(duplicate, data)`
    val t = Connectors.binaryByFile(spark, in.toString)
      .select(concat(col("data"), col("data")).as("data"))
    val outJson = root.resolve("out.jsonl").toString
    Connectors.writeJsonlines(t, outJson)
    val line = spark.read.text(outJson).as[String].collect().head
    val expected = java.util.Base64.getEncoder.encodeToString(
      (contents * 2).getBytes("UTF-8"))
    assert(line.contains(s""""data":"$expected""""),
      s"jsonlines must carry bytes as base64: $line")
    // CSV: the writer base64s binary columns (the serialization-variety
    // rule), and the typed reader's Binary cell decodes them back
    val outCsv = root.resolve("out-csv").toString
    Connectors.writeCsv(t, outCsv)
    val back = Connectors.csvTyped(spark, outCsv,
      PwSchema(Seq(PwColumnDef("data", org.apache.spark.sql.types.BinaryType))))
    val bytes = back.select("data").collect().head.getAs[Array[Byte]](0)
    assert(new String(bytes, "UTF-8") == contents * 2)
  }

  test("test_different_types_serialization: a variety table round-trips " +
      "through BOTH jsonlines and csv (write → typed read → same values)") {
    import org.apache.spark.sql.types._
    import spark.implicits._
    val root = Files.createTempDirectory("graft-variety")
    val df = Seq(
      (1L, "hello", 42L, 1.5, true, "payload".getBytes("UTF-8"), Seq(1L, 2L, 3L)),
      (2L, "second row", -7L, -0.25, false, Array[Byte](0, 1, 2, -1), Seq.empty[Long]))
      .toDF("pkey", "s", "i", "f", "b", "bin", "arr")
      .withColumn("js", parse_json(lit("""{"k": [1, true, "x"]}""")))
    val schema = PwSchema(Seq(
      PwColumnDef("pkey", LongType, primaryKey = true),
      PwColumnDef("s", StringType), PwColumnDef("i", LongType),
      PwColumnDef("f", DoubleType), PwColumnDef("b", BooleanType),
      PwColumnDef("bin", BinaryType), PwColumnDef("arr", ArrayType(LongType)),
      PwColumnDef("js", VariantType)))
    def check(back: org.apache.spark.sql.DataFrame): Unit = {
      assert(back.filter(size(col(Errors.ErrCol)) > 0).count() == 0)
      val m = back.select(col("pkey"), col("s"), col("i"), col("f"), col("b"),
          base64(col("bin")).as("bin"), col("arr"), to_json(col("js")).as("js"))
        .collect().map(r => r.getLong(0) -> r).toMap
      assert(m(1L).getString(1) == "hello" && m(2L).getString(1) == "second row")
      assert(m(1L).getLong(2) == 42L && m(2L).getLong(2) == -7L)
      assert(m(1L).getDouble(3) == 1.5 && m(2L).getDouble(3) == -0.25)
      assert(m(1L).getBoolean(4) && !m(2L).getBoolean(4))
      assert(m(1L).getString(5) ==
        java.util.Base64.getEncoder.encodeToString("payload".getBytes("UTF-8")))
      assert(m(2L).getString(5) ==
        java.util.Base64.getEncoder.encodeToString(Array[Byte](0, 1, 2, -1)))
      assert(m(1L).getSeq[Long](6) == Seq(1L, 2L, 3L) && m(2L).getSeq[Long](6).isEmpty)
      assert(m(1L).getString(7).replaceAll("\\s", "") == """{"k":[1,true,"x"]}""")
    }
    val j = root.resolve("j").toString
    Connectors.writeJsonlines(df, j)
    check(Connectors.jsonlinesTyped(spark, j, schema))
    val c = root.resolve("c").toString
    Connectors.writeCsv(df, c)
    check(Connectors.csvTyped(spark, c, schema))
  }

  test("as_duration_seconds: the connector duration vocabulary (io/_utils.py:93)") {
    import graft.sources.Durations.asDurationSeconds
    // all 30-second forms coerce to 30.0
    Seq[Any](30, 30L, 30.0, 30.0f, java.time.Duration.ofSeconds(30),
        scala.concurrent.duration.Duration(30, "s")).foreach { v =>
      assert(asDurationSeconds(v, "param") == 30.0, s"form $v")
    }
    // fractional seconds survive
    assert(asDurationSeconds(java.time.Duration.ofMillis(1500), "param") == 1.5)
    assert(asDurationSeconds(0.25, "param") == 0.25)
    // zero allowed by default (poll-as-fast-as-possible)
    Seq[Any](0, 0.0, java.time.Duration.ZERO).foreach { v =>
      assert(asDurationSeconds(v, "param") == 0.0)
    }
    // negatives rejected
    Seq[Any](-1, -0.5, java.time.Duration.ofSeconds(-1)).foreach { v =>
      val e = intercept[IllegalArgumentException] { asDurationSeconds(v, "param") }
      assert(e.getMessage.contains("'param' must be non-negative"), e.getMessage)
    }
    // non-finite rejected
    Seq[Any](Double.NaN, Double.PositiveInfinity, Double.NegativeInfinity).foreach { v =>
      val e = intercept[IllegalArgumentException] { asDurationSeconds(v, "param") }
      assert(e.getMessage.contains("'param' must be finite"), e.getMessage)
    }
    // wrong types rejected — including booleans, though python bools are ints
    Seq[Any]("30", null, true, Seq(30)).foreach { v =>
      val e = intercept[IllegalArgumentException] { asDurationSeconds(v, "param") }
      assert(e.getMessage.contains("'param' must be a number of seconds"), e.getMessage)
    }
    // timeout-like knobs opt out of the zero allowance
    Seq[Any](0, java.time.Duration.ZERO).foreach { v =>
      val e = intercept[IllegalArgumentException] {
        asDurationSeconds(v, "param", allowZero = false)
      }
      assert(e.getMessage.contains("'param' must be positive"), e.getMessage)
    }
    assert(asDurationSeconds(1, "param", allowZero = false) == 1.0)
  }

}

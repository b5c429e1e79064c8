package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** File-system and message connectors (reference python/pathway/io;
  * formats src/connectors/data_format).
  *
  * Mode mapping (io/fs/__init__.py:32 `mode="static"|"streaming"`):
  * static → `spark.read`, streaming → `spark.readStream` on the same path —
  * Spark's file stream source natively watches directories, which is the
  * reference's filesystem scanner (data_storage/file.rs) behavior.
  *
  * `with_metadata=True` adds the per-file metadata column the reference
  * attaches (path, size, modification time) via Spark's `_metadata` column.
  * S3/MinIO are the same sources on `s3a://` paths — no code difference.
  */
object Connectors {

  sealed trait Mode
  case object Static extends Mode
  case object Streaming extends Mode

  private def reader(spark: SparkSession, mode: Mode, schema: Option[StructType]) =
    mode match {
      case Static =>
        val r = spark.read; schema.foreach(r.schema); Left(r)
      case Streaming =>
        val r = spark.readStream; schema.foreach(r.schema); Right(r)
    }

  private def withMeta(df: DataFrame, wanted: Boolean): DataFrame =
    if (wanted)
      df.withColumn("_metadata_path", col("_metadata.file_path"))
        .withColumn("_metadata_size", col("_metadata.file_size"))
        .withColumn("_metadata_modified_at", col("_metadata.file_modification_time"))
    else df

  /** RFC-4180 escaping (the reference reads/writes with the Rust `csv`
    * crate: quotes are DOUBLED inside quoted fields, backslash is a plain
    * character — test_io.py:3743 test_csv_escaping). Spark's CSV default
    * escape is backslash; setting escape to the quote char gives the
    * crate's doubling on both sides. */
  private val Rfc4180 = Map("quote" -> "\"", "escape" -> "\"")

  /** Directory-scan parity with the reference's filesystem scanner
    * (data_storage/file.rs; test_io.py:3124-3182): reads RECURSE into
    * subdirectories (a glob may match a directory and its tree is read),
    * and quoted embedded newlines round-trip (multiLine) — Spark's default
    * is direct-children-only and line-split CSV. At scale parallelism is
    * per FILE under multiLine; mutable dirs belong on PollingCdc anyway. */
  private val DirScan = Map("recursiveFileLookup" -> "true")
  private val CsvRead = Rfc4180 ++ DirScan + ("multiLine" -> "true")

  /** The reference returns an EMPTY table when a path/glob matches nothing
    * (test_glob_pattern_nothing_matched) — Spark raises PATH_NOT_FOUND. */
  private def globMatches(spark: SparkSession, path: String): Boolean =
    scala.util.Try {
      val p = new org.apache.hadoop.fs.Path(path)
      val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
      val st = fs.globStatus(p)
      st != null && st.nonEmpty
    }.getOrElse(false)

  /** Matchless static path/glob → EMPTY table with the declared schema
    * (test_glob_pattern_nothing_matched; r17 ADVICE — previously only the
    * plaintext path had this guard while csv/jsonlines raised
    * PATH_NOT_FOUND). */
  private def emptyStatic(spark: SparkSession, st: StructType,
      withMetadata: Boolean): DataFrame = {
    import org.apache.spark.sql.types.{LongType, StringType, StructField, TimestampType}
    val full = if (withMetadata) StructType(st.fields ++ Seq(
      StructField("_metadata_path", StringType),
      StructField("_metadata_size", LongType),
      StructField("_metadata_modified_at", TimestampType))) else st
    spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], full)
  }

  /** CSV (io/csv, data_format/dsv.rs). Header + delimiter options mirror
    * `csv.read(…, csv_settings)`. */
  def csv(spark: SparkSession, path: String, mode: Mode = Static,
      schema: Option[StructType] = None, header: Boolean = true,
      delimiter: String = ",", withMetadata: Boolean = false,
      objectPattern: Option[String] = None): DataFrame = {
    if (mode == Static && !globMatches(spark, path))
      return emptyStatic(spark, schema.getOrElse(StructType(Nil)), withMetadata)
    val opts = Map("header" -> header.toString, "sep" -> delimiter) ++ CsvRead ++
      objectPattern.map("pathGlobFilter" -> _)
    val df = reader(spark, mode, schema) match {
      case Left(r)  => r.options(opts).csv(path)
      case Right(r) => r.options(opts).csv(path)
    }
    withMeta(df, withMetadata)
  }

  /** Schema-typed CSV (io/csv.read(schema=…) — data_format/dsv.rs + the
    * mod.rs:586 cell contract; rules in [[TypedCells]]).
    *
    * Divergence this fixes vs plain `.schema(...).csv(...)`: Spark maps an
    * explicit schema to CSV columns POSITIONALLY, the reference selects by
    * HEADER NAME (dsv.rs:97 `column_indices_by_names`) — so a schema that
    * skips a middle column (test_io.py:501 `test_csv_skip_column`) reads
    * the wrong cells under Spark's mapping. Here every cell is read as a
    * raw string, projected by header name (missing name → the reference's
    * FieldsNotFoundInHeader error), then parsed by the decoded cell rules.
    *
    * Parse failures follow the engine's error-value convention: the cell is
    * NULL and a record lands in the `_pw_errors` accumulator
    * ([[graft.functions.Errors]]) — one bad row logs instead of killing the
    * scan. `Errors.removeErrors` drops the accumulator. */
  def csvTyped(spark: SparkSession, path: String, schema: graft.core.PwSchema,
      mode: Mode = Static, delimiter: String = ",",
      withMetadata: Boolean = false): DataFrame = {
    // ONE copy of the cell-parsing rules for both the matchless-glob empty
    // path and the real read (r17 review: two copies would let the empty
    // table's dtypes drift from the populated one)
    val cells = schema.cols.map { c =>
      c.name -> TypedCells.csvCell(col(c.name), c.dtype,
        optional = c.optional, default = c.defaultValue)
    }
    if (mode == Static && !globMatches(spark, path)) {
      val raw = emptyStatic(spark, StructType(schema.cols.map(c =>
        org.apache.spark.sql.types.StructField(c.name,
          org.apache.spark.sql.types.StringType))), withMetadata)
      return applyCells(raw, cells, keep = if (withMetadata) metaCols else Nil)
    }
    // streaming needs an explicit schema UP FRONT, and Spark applies it to
    // CSV files POSITIONALLY — so peek at an existing file's header to build
    // the raw schema in FILE order (name-projection then still works and a
    // schema that skips/reorders columns reads the right cells). No file
    // yet → fall back to schema order (the header check below re-runs per
    // static read; for streaming the first file fixes the order).
    val rawSchema = StructType({
      val headerNames =
        if (mode == Streaming)
          scala.util.Try(
            spark.read.options(Map("header" -> "true", "sep" -> delimiter) ++ CsvRead)
              .csv(path).columns.toSeq).getOrElse(schema.cols.map(_.name))
        else schema.cols.map(_.name)
      headerNames.map(n =>
        org.apache.spark.sql.types.StructField(n, org.apache.spark.sql.types.StringType))
    })
    val raw = reader(spark, mode, if (mode == Streaming) Some(rawSchema) else None) match {
      case Left(r)  => r.options(Map("header" -> "true", "sep" -> delimiter,
        "inferSchema" -> "false") ++ CsvRead).csv(path)
      case Right(r) => r.options(Map("header" -> "true", "sep" -> delimiter) ++ CsvRead).csv(path)
    }
    val present = raw.columns.toSet
    val missing = schema.cols.map(_.name).filterNot(present)
    require(missing.isEmpty,
      s"fields ${missing.mkString(", ")} not found in header ${raw.columns.mkString(", ")}")
    val projected = withMeta(raw, withMetadata)
    applyCells(projected, cells,
      keep = if (withMetadata) metaCols else Nil)
  }

  /** Schema-typed JSON-lines (io/jsonlines.read(schema=…, json_field_paths=…)
    * — data_format/json.rs + mod.rs:855 `values_by_names_from_json`).
    *
    * Each line parses to a VARIANT; fields extract by name or by JSON
    * pointer (`json_field_paths`), with the decoded absent-vs-null split: a
    * MISSING field takes the declared default (else None), an explicit
    * `null` never does (test_io.py:581 `test_json_default_values`). Typed
    * extraction is kind-strict like `parse_value_from_json` (an int column
    * rejects `"5"` and `5.0`). Failures land in `_pw_errors` like
    * [[csvTyped]]. */
  def jsonlinesTyped(spark: SparkSession, path: String, schema: graft.core.PwSchema,
      fieldPaths: Map[String, String] = Map.empty, mode: Mode = Static,
      withMetadata: Boolean = false): DataFrame = {
    val lines = plaintext(spark, path, mode, withMetadata)
    // lenient parse: ONE malformed line must land in _pw_errors as a failed
    // row (the reference's per-row ParseError), not kill the scan
    val payload = try_parse_json(col("data"))
    val lineBad = col("data").isNotNull && payload.isNull
    val cells = schema.cols.map { c =>
      val vpath = fieldPaths.get(c.name)
        .map(TypedCells.pointerToVariantPath)
        .getOrElse("$." + c.name)
      val cell = TypedCells.jsonField(payload, vpath, c.dtype,
        optional = c.optional, default = c.defaultValue)
      c.name -> TypedCells.Cell(cell.value, lineBad || cell.failed)
    }
    applyCells(lines, cells, keep = if (withMetadata) metaCols else Nil)
  }

  private val metaCols =
    Seq("_metadata_path", "_metadata_size", "_metadata_modified_at")

  /** Materialize parsed cells + the `_pw_errors` accumulator in one select. */
  private def applyCells(df: DataFrame, cells: Seq[(String, TypedCells.Cell)],
      keep: Seq[String]): DataFrame = {
    val errs = filter(
      array(cells.map { case (n, cell) =>
        when(cell.failed, struct(lit(n).as("col"),
          lit(s"failed to parse value in field $n").as("msg")))
          .otherwise(lit(null))
      }: _*),
      e => e.isNotNull)
    val out = cells.map { case (n, cell) =>
      when(cell.failed, lit(null)).otherwise(cell.value).as(n)
    } ++ keep.map(col) :+ errs.cast(
      "array<struct<col: string, msg: string>>").as(graft.functions.Errors.ErrCol)
    df.select(out: _*)
  }

  /** JSON-lines (io/jsonlines, data_format/json.rs). */
  def jsonlines(spark: SparkSession, path: String, mode: Mode = Static,
      schema: Option[StructType] = None, withMetadata: Boolean = false,
      objectPattern: Option[String] = None): DataFrame = {
    if (mode == Static && !globMatches(spark, path))
      return emptyStatic(spark, schema.getOrElse(StructType(Nil)), withMetadata)
    val opts = DirScan ++ objectPattern.map("pathGlobFilter" -> _)
    val df = reader(spark, mode, schema) match {
      case Left(r)  => r.options(opts).json(path)
      case Right(r) => r.options(opts).json(path)
    }
    withMeta(df, withMetadata)
  }

  /** Plaintext: one row per line (io/plaintext, data_format/single_column.rs).
    * `objectPattern` is the reference's `object_pattern=` filename filter
    * (test_io.py test_objects_pattern) — Spark's `pathGlobFilter` applies
    * it at the file listing, so filtered files are never even opened. */
  /** `maxBacklogFiles` is the reference's `max_backlog_size` backpressure
    * knob reshaped for Spark's file source (test_io.py
    * test_backpressure_management*): it bounds how much enters one
    * micro-batch, and the ATOMICITY contract holds by construction — the
    * file source admits whole files only, so a file's rows always share
    * one batch (one commit timestamp); backpressure may interrupt BETWEEN
    * files, never split one. Streaming mode only. */
  def plaintext(spark: SparkSession, path: String, mode: Mode = Static,
      withMetadata: Boolean = false, objectPattern: Option[String] = None,
      maxBacklogFiles: Option[Int] = None): DataFrame = {
    // the matchless-path guard applies in BOTH modes of the pattern arg
    // (a nonexistent dir with a pattern must still yield the empty table,
    // not PATH_NOT_FOUND); a pattern matching no files inside an existing
    // dir already reads empty via pathGlobFilter
    if (mode == Static && !globMatches(spark, path)) {
      // matchless path/glob → EMPTY table, the reference's scanner behavior
      import org.apache.spark.sql.types.{StringType, StructField, StructType}
      return spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        StructType(Seq(StructField("data", StringType))))
    }
    val extra = objectPattern.map(p => Map("pathGlobFilter" -> p)).getOrElse(Map.empty) ++
      (if (mode == Streaming)
         maxBacklogFiles.map(n => Map("maxFilesPerTrigger" -> n.toString)).getOrElse(Map.empty)
       else Map.empty)
    val df = reader(spark, mode, None) match {
      case Left(r)  => r.options(DirScan ++ extra).text(path)
      case Right(r) => r.options(DirScan ++ extra).text(path)
    }
    withMeta(df.withColumnRenamed("value", "data"), withMetadata)
  }

  /** plaintext_by_file / binary: one row per whole file (io/fs format="binary").
    * Static only (binaryFile has no stream source); stream the parent dir with
    * plaintext for the streaming case. */
  def binaryByFile(spark: SparkSession, path: String): DataFrame =
    spark.read.format("binaryFile").load(path)
      .select(col("path").as("_metadata_path"), col("modificationTime").as("_metadata_modified_at"),
        col("length").as("_metadata_size"), col("content").as("data"))

  /** Parquet (the lakehouse default; Delta/Iceberg are the same call with
    * format("delta"/"iceberg") when those jars are on the cluster). */
  def parquet(spark: SparkSession, path: String, mode: Mode = Static,
      schema: Option[StructType] = None, withMetadata: Boolean = false): DataFrame = {
    val df = reader(spark, mode, schema) match {
      case Left(r)  => r.parquet(path)
      case Right(r) => r.parquet(path)
    }
    withMeta(df, withMetadata)
  }

  /** Kafka source (io/kafka/__init__.py:33): native Structured Streaming
    * format("kafka"); value parsing is the caller's format function. Requires
    * the spark-sql-kafka package on the cluster (not in this container —
    * plumbing kept format-compatible). */
  def kafka(spark: SparkSession, bootstrapServers: String, topic: String,
      startingOffsets: String = "earliest"): DataFrame =
    spark.readStream.format("kafka")
      .option("kafka.bootstrap.servers", bootstrapServers)
      .option("subscribe", topic)
      .option("startingOffsets", startingOffsets)
      .load()

  /** Debezium CDC envelope → changelog rows (io/debezium,
    * data_format/debezium.rs): each message's payload.op maps to diffs —
    * c/r → +1 after-image; d → −1 before-image; u → −1 before AND +1 after.
    * Input: a DataFrame with a JSON string column; output: one row per diff
    * with the parsed payload struct, `diff`, and source ts_ms as `time`. */
  def debeziumToChangelog(df: DataFrame, jsonCol: Column, payloadSchema: StructType): DataFrame = {
    val envSchema = new StructType()
      .add("payload", new StructType()
        .add("before", payloadSchema).add("after", payloadSchema)
        .add("op", org.apache.spark.sql.types.StringType)
        .add("ts_ms", org.apache.spark.sql.types.LongType))
    val p = from_json(jsonCol, envSchema).getField("payload")
    val parsed = df.select(p.as("_p"))
    val afterIns = parsed
      .filter(col("_p.op").isin("c", "r", "u"))
      .select(col("_p.after").as("row"), lit(1).as("diff"), col("_p.ts_ms").as("time"))
    val beforeDel = parsed
      .filter(col("_p.op").isin("d", "u"))
      .select(col("_p.before").as("row"), lit(-1).as("diff"), col("_p.ts_ms").as("time"))
    afterIns.unionByName(beforeDel).select(col("row.*"), col("diff"), col("time"))
  }

  /** Airbyte protocol reader, file mode (reference io/airbyte — its
    * connector RUNTIME shells out to Docker images, out of scope here; the
    * wire format those connectors emit is the public Airbyte protocol:
    * JSONL `AirbyteMessage` envelopes). Reads the envelope stream, keeps
    * `type=RECORD` rows of the requested `stream`, and parses `record.data`
    * with the given schema — so a dump produced by ANY Airbyte source
    * (`airbyte-cli read > out.jsonl`, an S3 staging area, a Kafka topic of
    * envelopes) loads as a table. STATE/LOG/CATALOG messages pass through
    * unharmed (filtered), matching the protocol's interleaving. Works on
    * both batch (`spark.read.text`) and streaming (`readStream.text`)
    * inputs — pass either as `lines`. */
  def airbyteRecords(lines: DataFrame, stream: String,
      dataSchema: StructType): DataFrame = {
    val env = new StructType()
      .add("type", org.apache.spark.sql.types.StringType)
      .add("record", new StructType()
        .add("stream", org.apache.spark.sql.types.StringType)
        .add("namespace", org.apache.spark.sql.types.StringType)
        .add("emitted_at", org.apache.spark.sql.types.LongType)
        .add("data", dataSchema))
    val p = from_json(col("value"), env)
    lines.select(p.as("_m"))
      .filter(col("_m.type") === "RECORD" && col("_m.record.stream") === stream)
      .select(col("_m.record.data.*"), col("_m.record.emitted_at").as("_emitted_at"))
  }

  /** Airbyte incremental-dedup CDC shape → changelog: sources running CDC
    * emit `_ab_cdc_deleted_at` (non-null = deletion) inside `data`; map to
    * diff ±1 rows like [[debeziumToChangelog]], `time` = emitted_at. */
  def airbyteCdcToChangelog(lines: DataFrame, stream: String,
      dataSchema: StructType): DataFrame = {
    // CDC catalogs usually already declare _ab_cdc_deleted_at - don't add a
    // duplicate field (ambiguous-column AnalysisException downstream)
    val withDel =
      if (dataSchema.fieldNames.contains("_ab_cdc_deleted_at")) dataSchema
      else dataSchema.add("_ab_cdc_deleted_at",
        org.apache.spark.sql.types.StringType)
    val recs = airbyteRecords(lines, stream, withDel)
    recs.select(
      (dataSchema.fieldNames.filterNot(_ == "_ab_cdc_deleted_at").map(col).toSeq :+
        when(col("_ab_cdc_deleted_at").isNotNull, lit(-1)).otherwise(lit(1)).as("diff") :+
        col("_emitted_at").as("time")): _*)
  }

  /** JDBC snapshot read (reference io/postgres & friends, read side): plain
    * `spark.read.jdbc` — predicate pushdown and column pruning reach the
    * database. `partitionColumn`/bounds split the scan across executors for
    * big tables (pass None for a single-partition read of small dims).
    * Integration-tested against embedded Derby in JdbcSinkSpec. */
  def jdbc(spark: SparkSession, url: String, table: String,
      partitionColumn: Option[(String, Long, Long, Int)] = None): DataFrame = {
    val base = spark.read.format("jdbc")
      .option("url", url).option("dbtable", table)
    partitionColumn match {
      case Some((c, lo, hi, n)) => base
        .option("partitionColumn", c)
        .option("lowerBound", lo).option("upperBound", hi)
        .option("numPartitions", n).load()
      case None => base.load()
    }
  }

  // ── writers ────────────────────────────────────────────────────────────────

  /** Output `sort_by` (io fs.write/subscribe sort_by, test_io.py:3652):
    * rows write in sorted order. Spark-first: `orderBy` range-partitions
    * and sorts — part files concatenate to the global order (readers
    * consuming part-00000, part-00001, … see exactly the reference's
    * ordering) without funnelling the write through one task. */
  private def sorted(df: DataFrame, sortBy: Seq[Column]): DataFrame =
    if (sortBy.isEmpty) df else df.orderBy(sortBy: _*)

  /** Render columns CSV can't carry natively, the reference's way
    * (test_io.py test_json_csv_serialization / the serialization variety
    * suite): a pw.Json (variant) column writes its SERIALIZED JSON text —
    * a csv read with a Json-typed schema parses it back to the same value
    * (TypedCells' VariantType arm) — and bytes write as base64 (the same
    * encoding TypedCells' Binary cell reads). */
  private def csvRenderable(df: DataFrame): DataFrame =
    df.schema.fields.foldLeft(df) { (d, f) =>
      f.dataType match {
        case org.apache.spark.sql.types.VariantType =>
          d.withColumn(f.name, to_json(col(f.name)))
        case org.apache.spark.sql.types.BinaryType =>
          d.withColumn(f.name, base64(col(f.name)))
        case _: org.apache.spark.sql.types.ArrayType |
             _: org.apache.spark.sql.types.StructType |
             _: org.apache.spark.sql.types.MapType =>
          // Array/List/Tuple cells travel JSON-encoded through CSV — the
          // same encoding the typed reader's from_json arm parses
          // (data_format mod.rs:575)
          d.withColumn(f.name, to_json(col(f.name)))
        case _ => d
      }
    }

  def writeCsv(df: DataFrame, path: String, header: Boolean = true,
      sortBy: Seq[Column] = Nil): Unit =
    sorted(csvRenderable(df), sortBy).write.mode("overwrite")
      .option("header", header.toString)
      .options(Rfc4180).csv(path)

  def writeJsonlines(df: DataFrame, path: String, sortBy: Seq[Column] = Nil): Unit =
    sorted(df, sortBy).write.mode("overwrite").json(path)

  def writeParquet(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").parquet(path)

  /** Changelog CSV sink (concepts.md:240-243): appends rows with time/diff
    * columns rather than applying diffs. */
  def writeChangelogCsv(changelog: DataFrame, path: String): Unit =
    csvRenderable(changelog).write.mode("append").option("header", "true")
      .options(Rfc4180).csv(path)
}

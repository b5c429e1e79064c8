package graft.sources

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.functions.Exprs._

/** Connector cell-parsing contract (reference
  * src/connectors/data_format/mod.rs:490-660 `parse_bool_advanced` /
  * `parse_str_with_type` / `parse_with_type`, and mod.rs:731/855
  * `parse_value_from_json` / `values_by_names_from_json`) — the typed layer
  * between raw CSV tokens / JSON payloads and schema-typed columns.
  *
  * Everything lowers to codegen'd built-ins (conditionals, rlike, casts,
  * variant functions); the only non-builtin is the repo's native
  * ChronoStrptime expression for the reference's fixed connector datetime
  * formats.
  *
  * Decoded rules (each pinned in ConnectorsTypedSpec):
  *   - CSV booleans use the extended Postgres vocabulary
  *     true/yes/on/1/t/y // false/no/off/0/f/n, trimmed, case-insensitive
  *     (mod.rs:506).
  *   - An optional column parses trimmed-lowercase "null" / "none" / "" as
  *     None for every non-string scalar type (mod.rs:514 `can_represent_null_value`);
  *     String/Any keep the literal token.
  *   - An EMPTY cell on a column with a declared default takes the default —
  *     but only for non-String/Any types (mod.rs:586 `parse_with_type`).
  *   - Ints parse with Rust `str::parse::<i64>` strictness: optional sign +
  *     digits only — "5.5" and "1e3" are parse errors, not truncations.
  *   - Datetimes use the reference's fixed connector formats
  *     `%Y-%m-%dT%H:%M:%S%.f` (naive) / `%Y-%m-%dT%H:%M:%S%.f%z` (utc)
  *     (mod.rs:556-563); durations are ns integers; bytes are base64.
  *   - JSON: a MISSING field takes the declared default (else None);
  *     an explicit JSON `null` does NOT take the default — it is None when
  *     the type is optional and a parse error otherwise (mod.rs:855
  *     `values_by_names_from_json` — the `payload.get` arm runs
  *     `parse_value_from_json` even on nulls).
  *   - JSON ints require an exact i64 JSON number (serde `as_i64`):
  *     `5` parses, `"5"`, `5.0` and `1e3` do not; floats accept any JSON
  *     number; bools/strings accept only their own JSON kind (mod.rs:731).
  *   - `json_field_paths` are JSON pointers resolved with
  *     `serde_json::Value::pointer` — translated here to variant paths.
  */
object TypedCells {

  /** A parsed cell: the typed value plus a failure predicate (true ⇒ the
    * reference would produce a ParseError for this field). */
  final case class Cell(value: Column, failed: Column)

  private val TrueVocab = Seq("true", "yes", "on", "1", "t", "y")
  private val FalseVocab = Seq("false", "no", "off", "0", "f", "n")

  /** base64 (mod.rs:570) — validate the standard alphabet + padding so
    * garbage errors instead of silently decoding. */
  private def base64Valid(c: Column): Column =
    c.rlike("^[A-Za-z0-9+/]*={0,2}$") && (length(c) % 4 === 0)

  // ── CSV tokens ─────────────────────────────────────────────────────────────

  /** Parse one raw CSV token per `parse_with_type` (mod.rs:586).
    *
    * @param raw      the token column (null ⇒ empty token — Spark's CSV
    *                 reader surfaces unquoted-empty as null)
    * @param dtype    declared Spark type (Long = reference Int/Duration-ns,
    *                 TimestampNTZ = DateTimeNaive, Timestamp = DateTimeUtc,
    *                 Binary = base64 bytes, Array/Json-string via from_json)
    * @param optional whether the reference type is Optional[...]
    * @param default  declared default_value (schema.py column_definition)
    */
  def csvCell(raw: Column, dtype: DataType, optional: Boolean,
      default: Option[Any]): Cell = {
    val tok = coalesce(raw, lit(""))
    val lowered = lower(trim(tok))
    val isStringLike = dtype == StringType

    val parsed = parseToken(tok, dtype)

    // parse_with_type: default beats everything on an EMPTY cell (non-string
    // types only — a string column keeps "").
    val useDefault = default.isDefined && !isStringLike
    // "null" is ambiguous for a Json column (it is also valid serialized
    // JSON) — only "none"/"" mean None there (mod.rs:535)
    val isNullToken =
      if (dtype == VariantType) lowered.isin("none", "")
      else lowered.isin("null", "none", "")

    val base: Cell =
      if (isStringLike) Cell(tok, lit(false))
      else if (optional)
        Cell(when(isNullToken, lit(null).cast(dtype)).otherwise(parsed.value),
          !isNullToken && parsed.failed)
      else parsed

    if (useDefault)
      Cell(when(tok === "", lit(default.get).cast(dtype)).otherwise(base.value),
        tok =!= "" && base.failed)
    else base
  }

  /** `parse_str_with_type` type dispatch (mod.rs:539-580), strict. */
  private def parseToken(tok: Column, dtype: DataType): Cell = dtype match {
    case StringType => Cell(tok, lit(false))
    case BooleanType =>
      val l = lower(trim(tok))
      Cell(when(l.isin(TrueVocab.map(lit): _*), lit(true))
          .when(l.isin(FalseVocab.map(lit): _*), lit(false)),
        !l.isin((TrueVocab ++ FalseVocab).map(lit): _*))
    case LongType | IntegerType | ShortType | ByteType =>
      // Rust str::parse::<i64>: sign + digits, no whitespace/decimal/exponent;
      // out-of-range (regex-ok but cast-null) is also a parse error
      val v = when(tok.rlike("^[+-]?[0-9]+$"), tok.cast(dtype))
      Cell(v, v.isNull)
    case DoubleType | FloatType =>
      // Rust str::parse::<f64> accepts decimals/exponents/inf/nan (trimmed
      // forms only — Spark's cast is a superset; gate with a shape check)
      val ok = tok.rlike("^[+-]?(inf|infinity|nan|[0-9]*\\.?[0-9]+([eE][+-]?[0-9]+)?|[0-9]+\\.)$") ||
        lower(tok).rlike("^[+-]?(inf|infinity|nan)$")
      Cell(when(ok, tok.cast(dtype)), !ok)
    case TimestampNTZType =>
      val v = tok.dt.strptime("%Y-%m-%dT%H:%M:%S%.f")
      Cell(v, v.isNull)
    case TimestampType =>
      val v = tok.dt.strptimeUtc("%Y-%m-%dT%H:%M:%S%.f%z")
      Cell(v, v.isNull)
    case BinaryType =>
      val ok = base64Valid(tok)
      Cell(when(ok, unbase64(tok)), !ok)
    case VariantType =>
      // Type::Json: the token is serialized JSON (mod.rs:545)
      val v = try_parse_json(tok)
      Cell(v, v.isNull)
    case t @ (_: ArrayType | _: StructType | _: MapType) =>
      // Array/List/Tuple come JSON-encoded (mod.rs:575)
      val v = from_json(tok, t)
      Cell(v, v.isNull)
    case other =>
      val v = tok.cast(other)
      Cell(v, v.isNull)
  }

  // ── JSON payloads ──────────────────────────────────────────────────────────

  /** JSON pointer (RFC 6901, `serde_json::Value::pointer`) → Spark variant
    * path: `/q/w/0/e` → `$.q.w[0].e` (bare digits address array elements —
    * matching serde's pointer, which tries both map key and array index;
    * variant paths must choose, so digit-only segments become indices). */
  def pointerToVariantPath(pointer: String): String = {
    Predef.require(pointer.startsWith("/"),
      s"JSON pointer must start with '/': $pointer")
    pointer.split("/").drop(1).map { seg =>
      val unescaped = seg.replace("~1", "/").replace("~0", "~")
      if (unescaped.forall(_.isDigit) && unescaped.nonEmpty) s"[$unescaped]"
      else if (unescaped.nonEmpty && unescaped.head.isUnicodeIdentifierStart &&
          unescaped.forall(ch => ch.isUnicodeIdentifierPart))
        s".$unescaped"
      else // keys containing '.', quotes, etc. — bracket-quote (serde's
           // pointer resolves the literal key; `$.a.b` would NEST instead)
        s"['${unescaped.replace("'", "\\'")}']"
    }.mkString("$", "", "")
  }

  /** Extract + type one field from a variant payload per
    * `values_by_names_from_json` (mod.rs:855) + `parse_value_from_json`
    * (mod.rs:731).
    *
    * @param payload a VariantType column (parse_json of the line)
    * @param path    variant path (`$.field` or a pointer translation)
    */
  def jsonField(payload: Column, path: String, dtype: DataType,
      optional: Boolean, default: Option[Any]): Cell = {
    val node = variant_get(payload, path, "variant")
    val absent = node.isNull
    val explicitNull = !absent && is_variant_null(node)

    val typed = jsonTyped(node, dtype)

    // absent → default (else None); explicit null → None iff optional, else
    // error; present non-null → strict typed parse
    val onAbsent: Column = default match {
      case Some(v) => lit(v).cast(dtype)
      case None => lit(null).cast(dtype)
    }
    val value =
      when(absent, onAbsent)
        .when(explicitNull, lit(null).cast(dtype))
        .otherwise(typed.value)
    val failed =
      (explicitNull && lit(!optional)) || (!absent && !explicitNull && typed.failed)
    Cell(value, failed)
  }

  /** `parse_value_from_json` kind-strict dispatch. `schema_of_variant` names
    * the JSON value's own kind: BIGINT = exact-i64 number (serde `as_i64`
    * succeeds), DECIMAL/DOUBLE = non-i64 number, STRING/BOOLEAN literal
    * kinds, OBJECT/ARRAY composites. */
  private def jsonTyped(node: Column, dtype: DataType): Cell = {
    val kind = schema_of_variant(node)
    dtype match {
      case LongType | IntegerType =>
        val ok = kind === "BIGINT"
        Cell(when(ok, try_variant_get(node, "$", "bigint").cast(dtype)), !ok)
      case DoubleType | FloatType =>
        val ok = kind === "BIGINT" || kind === "DOUBLE" || kind.startsWith("DECIMAL")
        Cell(when(ok, try_variant_get(node, "$", "double").cast(dtype)), !ok)
      case BooleanType =>
        val ok = kind === "BOOLEAN"
        Cell(when(ok, try_variant_get(node, "$", "boolean")), !ok)
      case StringType =>
        val ok = kind === "STRING"
        Cell(when(ok, try_variant_get(node, "$", "string")), !ok)
      case TimestampNTZType =>
        val s = try_variant_get(node, "$", "string")
        val v = s.dt.strptime("%Y-%m-%dT%H:%M:%S%.f")
        Cell(v, kind =!= "STRING" || v.isNull)
      case TimestampType =>
        val s = try_variant_get(node, "$", "string")
        val v = s.dt.strptimeUtc("%Y-%m-%dT%H:%M:%S%.f%z")
        Cell(v, kind =!= "STRING" || v.isNull)
      case BinaryType =>
        val s = try_variant_get(node, "$", "string")
        val ok = kind === "STRING" && base64Valid(s)
        Cell(when(ok, unbase64(s)), !ok)
      case t @ (_: ArrayType | _: StructType | _: MapType) =>
        val ok = kind.startsWith("ARRAY") || kind.startsWith("OBJECT")
        val v = from_json(to_json(node), t)
        Cell(when(ok, v), !ok || (ok && v.isNull))
      case VariantType =>
        // pw.Json columns: any JSON value verbatim (mod.rs:790 Type::Json arm)
        Cell(node, lit(false))
      case other =>
        Cell(to_json(node).cast(other), lit(false))
    }
  }
}

package graft.functions

/** The reference's per-query index metadata-filter language — a JMESPath
  * subset (r16 decode of tests/external_index/test_tantivy.py and
  * tests/ml/test_index.py against the engine's jmespath+globmatch filter
  * evaluation):
  *
  *   - `globmatch(`"<glob>"`, <field>)` — GLOBSTAR path matching
  *     (`**&#47;` spans directories, `*` stays inside a segment); the glob
  *     literal may also be 'single-quoted' (the form
  *     document_store.py:35 `_get_jmespath_filter` emits);
  *   - `<field> <op> <literal>` with op ∈ {==, !=, <, <=, >, >=} and the
  *     literal a backtick number (`` `4` ``), a `'single-quoted'` string,
  *     or a backtick-quoted string (`` `"s"` ``);
  *   - `contains(<field>, <literal>)` — jmespath substring containment
  *     (r16 decode of test_vs_filtering_metadata);
  *   - `&&` / `||` conjunctions and parentheses — the shapes the document
  *     store's filter merger generates (`(<metadata_filter>) &&
  *     globmatch('<glob>', path)`).
  *
  * A NULL filter accepts every candidate (test_optional_filter); an
  * UNPARSEABLE filter matches NOTHING — the reference returns empty
  * replies for `contains(foo)`, not an error
  * (test_incorrect_metadata_filter). Filters compile once per distinct
  * string per executor (filters are per-QUERY, candidates per-pair — the
  * compile must not sit on the pair path). */
object IndexFilter extends Serializable {

  private sealed trait Pred { def eval(md: Map[String, String]): Boolean }
  private case object MatchNone extends Pred {
    def eval(md: Map[String, String]): Boolean = false
  }
  private final case class Glob(re: java.util.regex.Pattern, field: String) extends Pred {
    def eval(md: Map[String, String]): Boolean =
      md.get(field).exists(v => re.matcher(v).matches())
  }
  private final case class Cmp(field: String, op: String, lit: Either[Double, String])
      extends Pred {
    def eval(md: Map[String, String]): Boolean = md.get(field).exists { raw =>
      val c: Option[Int] = lit match {
        case Left(n) => raw.toDoubleOption.map(java.lang.Double.compare(_, n))
        case Right(s) => Some(raw.compareTo(s))
      }
      c.exists { cmp =>
        op match {
          case "==" => cmp == 0
          case "!=" => cmp != 0
          case "<" => cmp < 0
          case "<=" => cmp <= 0
          case ">" => cmp > 0
          case ">=" => cmp >= 0
        }
      }
    }
  }

  /** wcmatch-style GLOBSTAR glob → anchored regex. */
  private[graft] def globToRegex(glob: String): String = {
    val sb = new StringBuilder
    var i = 0
    while (i < glob.length) {
      if (glob.startsWith("**/", i)) { sb.append("(?:.*/)?"); i += 3 }
      else if (glob.startsWith("/**", i) && i + 3 == glob.length) {
        sb.append("(?:/.*)?"); i += 3
      }
      else if (glob.startsWith("**", i)) { sb.append(".*"); i += 2 }
      else glob.charAt(i) match {
        case '*' => sb.append("[^/]*"); i += 1
        case '?' => sb.append("[^/]"); i += 1
        case c => sb.append(java.util.regex.Pattern.quote(c.toString)); i += 1
      }
    }
    sb.toString
  }

  private final case class Contains(field: String, lit: String) extends Pred {
    def eval(md: Map[String, String]): Boolean = md.get(field).exists(_.contains(lit))
  }
  private final case class AndP(ps: Seq[Pred]) extends Pred {
    def eval(md: Map[String, String]): Boolean = ps.forall(_.eval(md))
  }
  private final case class OrP(ps: Seq[Pred]) extends Pred {
    def eval(md: Map[String, String]): Boolean = ps.exists(_.eval(md))
  }

  private val GlobRe =
    """^\s*globmatch\(\s*(`"(?:.*)"`|'(?:[^']*)')\s*,\s*([A-Za-z_]\w*)\s*\)\s*$""".r
  private val ContainsRe =
    """^\s*contains\(\s*([A-Za-z_]\w*)\s*,\s*(.+?)\s*\)\s*$""".r
  private val CmpRe =
    """^\s*([A-Za-z_]\w*)\s*(==|!=|<=|>=|<|>)\s*(.+?)\s*$""".r

  /** Split on a top-level connective (outside parens/quotes/backticks). */
  private def splitTop(s: String, sep: String): Seq[String] = {
    val parts = scala.collection.mutable.ArrayBuffer.empty[String]
    var depth = 0; var inSq = false; var inBt = false; var last = 0; var i = 0
    while (i < s.length - 1) {
      val c = s.charAt(i)
      if (c == '\\' && inSq) i += 1 // escaped char inside a quoted literal
      else if (c == '\'' && !inBt) inSq = !inSq
      else if (c == '`' && !inSq) inBt = !inBt
      else if (!inSq && !inBt) {
        if (c == '(') depth += 1
        else if (c == ')') depth -= 1
        else if (depth == 0 && s.startsWith(sep, i)) {
          parts += s.substring(last, i); last = i + sep.length; i += 1
        }
      }
      i += 1
    }
    parts += s.substring(last)
    parts.toSeq
  }

  private def compile(filter: String): Pred = parseExpr(filter).getOrElse(MatchNone)

  private def parseExpr(s: String): Option[Pred] = {
    val ors = splitTop(s, "||")
    if (ors.length > 1) sequence(ors.map(parseAnd)).map(OrP) else parseAnd(s)
  }
  private def parseAnd(s: String): Option[Pred] = {
    val ands = splitTop(s, "&&")
    if (ands.length > 1) sequence(ands.map(parseTerm)).map(AndP) else parseTerm(s)
  }
  private def parseTerm(s: String): Option[Pred] = {
    val t = s.trim
    if (t.startsWith("(") && t.endsWith(")") && balanced(t.substring(1, t.length - 1)))
      parseExpr(t.substring(1, t.length - 1))
    else parseAtom(t)
  }
  private def balanced(s: String): Boolean = {
    var depth = 0
    s.foreach { c =>
      if (c == '(') depth += 1 else if (c == ')') { depth -= 1; if (depth < 0) return false }
    }
    depth == 0
  }
  private def sequence[A](xs: Seq[Option[A]]): Option[Seq[A]] =
    if (xs.forall(_.isDefined)) Some(xs.map(_.get)) else None

  private def parseAtom(s: String): Option[Pred] = s match {
    case GlobRe(globLit, field) =>
      val glob =
        if (globLit.startsWith("`\"")) globLit.substring(2, globLit.length - 2)
        else globLit.substring(1, globLit.length - 1)
      Some(Glob(java.util.regex.Pattern.compile(globToRegex(glob)), field))
    case ContainsRe(field, litRaw) =>
      parseLiteral(litRaw).map {
        case Right(str) => Contains(field, str)
        case Left(num) => Contains(field,
          if (num == num.floor && !num.isInfinite) num.toLong.toString else num.toString)
      }
    case CmpRe(field, op, litRaw) =>
      parseLiteral(litRaw).map(Cmp(field, op, _))
    case _ => None
  }

  private def parseLiteral(raw: String): Option[Either[Double, String]] = {
    val t = raw.trim
    if (t.startsWith("`\"") && t.endsWith("\"`") && t.length >= 4)
      Some(Right(t.substring(2, t.length - 2)))
    else if (t.startsWith("`") && t.endsWith("`") && t.length >= 2)
      t.substring(1, t.length - 1).trim.toDoubleOption.map(Left(_))
    else if (t.startsWith("'") && t.endsWith("'") && t.length >= 2)
      // the merger escapes user apostrophes as \' — unescape them back
      Some(Right(t.substring(1, t.length - 1).replace("\\'", "'")))
    else None
  }

  /** document_store.py:35 `_get_jmespath_filter` — merge a user
    * metadata_filter with a filepath glob into ONE filter string: the
    * metadata part has `'`→`\'`, backticks→`'`, `"` stripped, then is
    * parenthesized; the glob becomes `globmatch('<glob>', path)`; parts
    * join with `&&`; both empty → None (accept all). */
  def mergeFilters(metadataFilter: Option[String],
      globPattern: Option[String]): Option[String] = {
    val parts = Seq(
      metadataFilter.filter(_.nonEmpty).map { f =>
        "(" + f.replace("'", "\\'").replace("`", "'").replace("\"", "") + ")"
      },
      globPattern.filter(_.nonEmpty).map(g => s"globmatch('$g', path)")).flatten
    if (parts.isEmpty) None else Some(parts.mkString(" && "))
  }

  private val cache = new java.util.concurrent.ConcurrentHashMap[String, Pred]()

  /** Per-pair evaluation entry point (UDF body): null filter → accept. */
  def matches(filter: String, metadata: Map[String, String]): Boolean =
    if (filter == null) true
    else cache.computeIfAbsent(filter, compile).eval(
      if (metadata == null) Map.empty else metadata)
}

package graft.functions

/** The reference's per-query index metadata-filter language — a JMESPath
  * subset (r16 decode of tests/external_index/test_tantivy.py and
  * tests/ml/test_index.py against the engine's jmespath+globmatch filter
  * evaluation):
  *
  *   - `globmatch(`"<glob>"`, <field>)` — GLOBSTAR path matching
  *     (`**&#47;` spans directories, `*` stays inside a segment);
  *   - `<field> <op> <literal>` with op ∈ {==, !=, <, <=, >, >=} and the
  *     literal a backtick number (`` `4` ``), a `'single-quoted'` string,
  *     or a backtick-quoted string (`` `"s"` ``).
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

  private val GlobRe =
    """^\s*globmatch\(\s*`"(.*)"`\s*,\s*([A-Za-z_]\w*)\s*\)\s*$""".r
  private val CmpRe =
    """^\s*([A-Za-z_]\w*)\s*(==|!=|<=|>=|<|>)\s*(.+?)\s*$""".r

  private def compile(filter: String): Pred = filter match {
    case GlobRe(glob, field) =>
      Glob(java.util.regex.Pattern.compile(globToRegex(glob)), field)
    case CmpRe(field, op, litRaw) =>
      parseLiteral(litRaw).map(Cmp(field, op, _)).getOrElse(MatchNone)
    case _ => MatchNone
  }

  private def parseLiteral(raw: String): Option[Either[Double, String]] = {
    val t = raw.trim
    if (t.startsWith("`\"") && t.endsWith("\"`") && t.length >= 4)
      Some(Right(t.substring(2, t.length - 2)))
    else if (t.startsWith("`") && t.endsWith("`") && t.length >= 2)
      t.substring(1, t.length - 1).trim.toDoubleOption.map(Left(_))
    else if (t.startsWith("'") && t.endsWith("'") && t.length >= 2)
      Some(Right(t.substring(1, t.length - 1)))
    else None
  }

  private val cache = new java.util.concurrent.ConcurrentHashMap[String, Pred]()

  /** Per-pair evaluation entry point (UDF body): null filter → accept. */
  def matches(filter: String, metadata: Map[String, String]): Boolean =
    if (filter == null) true
    else cache.computeIfAbsent(filter, compile).eval(
      if (metadata == null) Map.empty else metadata)
}

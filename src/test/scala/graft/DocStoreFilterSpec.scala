package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.functions.IndexFilter

/** Replays the DocumentStore retrieval-filter fixtures
  * (xpacks/llm/tests/test_document_store.py — glob filtering, metadata
  * filtering, negatives, accented-path edge cases) against the merged
  * `_get_jmespath_filter` string evaluated by [[IndexFilter]]. */
class DocStoreFilterSpec extends AnyFunSuite {

  private val path = "pathway/xpacks/llm/tests/test_vector_store.py"
  private val md = Map("path" -> path)

  private def matches(metadataFilter: Option[String], glob: Option[String],
      metadata: Map[String, String] = md): Boolean =
    IndexFilter.matches(
      IndexFilter.mergeFilters(metadataFilter, glob).orNull, metadata)

  test("test_vectorstore_glob_filtering: positive glob patterns match the stored path") {
    for (glob <- Seq("**/*.py", path))
      assert(matches(None, Some(glob)), glob)
    // empty filter = accept (merges to None)
    assert(matches(None, Some("")) && matches(Some(""), None) && matches(None, None))
  }

  test("test_vs_filtering_negatives + tantivy negative glob: non-matching patterns reject") {
    for (glob <- Seq("**/abc.py", "somefile.pdf", "**/*.txt",
        "pathway/test_vector_store.py", "src.py", s"`$path`"))
      assert(!matches(None, Some(glob)), glob)
  }

  test("test_vs_filtering_metadata: every reference metadata filter form matches") {
    val filters = Seq(
      "contains(path, `test_vector_store`)",
      "contains(path, `\"test_vector_store\"`)",
      s"contains(path, `$path`)",
      s"path == `$path`",
      s"globmatch(`$path`, path)")
    for (f <- filters) assert(matches(Some(f), None), f)
    // and a non-matching one rejects
    assert(!matches(Some("contains(path, `not_there`)"), None))
    assert(!matches(Some("path == `other.py`"), None))
  }

  test("test_vs_filtering_edge_cases: accented/spaced path, every filter combination") {
    val accented =
      "Document Enregistrement Universel 2023 publié à l'XYZ le 28 février 2024.pdf"
    val amd = Map("path" -> accented)
    val metadataFilters = Seq(None, Some(s"contains(path, `Document Enregistrement`)"))
    val globFilters = Seq(None, Some("**/*.pdf"), Some("*.pdf"))
    for (mf <- metadataFilters; gf <- globFilters)
      assert(matches(mf, gf, amd), s"$mf / $gf")
  }

  test("merged filters conjoin: both parts must hold") {
    assert(matches(Some("contains(path, `test_vector_store`)"), Some("**/*.py")))
    assert(!matches(Some("contains(path, `test_vector_store`)"), Some("**/*.txt")))
    assert(!matches(Some("contains(path, `nope`)"), Some("**/*.py")))
  }

  test("mergeFilters escaping: backticks → quotes, double quotes stripped, glob single-quoted") {
    assert(IndexFilter.mergeFilters(Some("path == `a.py`"), Some("**/*.py"))
      .contains("(path == 'a.py') && globmatch('**/*.py', path)"))
    assert(IndexFilter.mergeFilters(Some("""contains(path, `"x"`)"""), None)
      .contains("(contains(path, 'x'))"))
    assert(IndexFilter.mergeFilters(None, None).isEmpty)
  }

  test("apostrophes in literals survive the merger's escaping (accented-path metadata filters)") {
    val accented = "Document publie a l'XYZ le 28.pdf"
    val amd = Map("path" -> accented)
    // the merger escapes ' as \' inside the single-quoted literal; the
    // parser unescapes it back - the filter must MATCH, not MatchNone
    assert(matches(Some("contains(path, `a l'XYZ`)"), None, amd))
    assert(!matches(Some("contains(path, `a l'ABC`)"), None, amd))
    assert(matches(Some("contains(path, `a l'XYZ`)"), Some("*.pdf"), amd))
  }

  test("boolean grammar: || alternatives and parenthesized groups") {
    assert(IndexFilter.matches("path == 'a.py' || contains(path, 'test_vector')", md))
    assert(!IndexFilter.matches("path == 'a.py' || contains(path, 'nope')", md))
    assert(IndexFilter.matches("(contains(path, 'pathway') && contains(path, '.py'))", md))
    // an unparseable part poisons the WHOLE filter: matches nothing
    assert(!IndexFilter.matches("contains(path) && path == 'a'", md))
    assert(!IndexFilter.matches("contains(foo)", md))
  }
}

package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.core.{Props, TableProps}

/** Replays EVERY parametrized vector of the reference's
  * tests/test_column_properties.py against the [[graft.core.Props]]
  * append-only calculus — all 2^k boolean combinations per operator, exactly
  * the pytest parametrization grid. */
class PropsFixtureSpec extends AnyFunSuite {

  private val bools = Seq(true, false)

  test("preserve_dependency_properties: expression columns AND their deps (incl. other universes)") {
    val in1 = Props.source(Map("a" -> true))
    val out = Props.select(in1,
      deps = Map("a" -> Set("a"), "b" -> Set("a", "b2"), "c" -> Set("a", "c3")),
      extra = Map("b2" -> true, "c3" -> false))
    assert(out.col("a") && out.col("b") && !out.col("c"))
  }

  test("preserve_context_dependency_properties: a filter's condition deps gate the output") {
    val in1 = Props.source(Map("a" -> true))
    val res1 = Props.filter(in1, Set("a", "b2"), extra = Map("b2" -> true))
    val res2 = Props.filter(in1, Set("a", "c3"), extra = Map("c3" -> false))
    assert(res1.col("a") && !res2.col("a"))
  }

  test("test_buffer / test_buffer_2 / test_freeze: the gate deps AND the id into every column") {
    for (ao <- bools) {
      val out = Props.buffer(Props.source(Map("a" -> ao)), Set("a"))
      assert(out.id == ao && out.col("a") == ao)
    }
    for (ao1 <- bools; ao2 <- bools) {
      val out = Props.buffer(Props.source(Map("a" -> ao1, "b" -> ao2)), Set("a"))
      assert(out.id == ao1)
      assert(out.col("a") == ao1)
      assert(out.col("b") == (ao1 && ao2))
    }
  }

  test("test_reindex / test_reindex_2: with_id_from keys the universe on the expression deps") {
    for (ao <- bools) {
      val out = Props.reindex(Props.source(Map("a" -> ao)), Set("a"))
      assert(out.id == ao && out.col("a") == ao)
    }
    for (ao1 <- bools; ao2 <- bools) {
      val out = Props.reindex(Props.source(Map("a" -> ao1, "b" -> ao2)), Set("a"))
      assert(out.id == ao1 && out.col("a") == ao1 && out.col("b") == (ao1 && ao2))
    }
  }

  test("test_ix: fetched column needs both universes, the pointer, and STRICT mode") {
    for (ao1 <- bools; ao2 <- bools; allowMisses <- bools) {
      val out = Props.ix(Props.source(Map("a" -> ao1)), Set("a"),
        Props.source(Map("b" -> ao2)), allowMisses)
      assert(out.id == ao1)
      assert(out.col("b") == (ao1 && ao2 && !allowMisses))
    }
  }

  test("test_intersect(_2) / test_restrict(_2) / test_having(_2): the other universe ANDs in") {
    for (ao1 <- bools; ao2 <- bools) {
      val out = Props.intersect(Props.source(Map("a" -> ao1)), ao2)
      assert(out.id == (ao1 && ao2) && out.col("a") == (ao1 && ao2))
    }
    for (ao1 <- bools; ao2 <- bools; ao3 <- bools) {
      val out = Props.intersect(Props.source(Map("a" -> ao1, "b" -> ao2)), ao3)
      assert(out.id == ((ao1 || ao2) && ao3))
      assert(out.col("a") == (ao1 && ao3) && out.col("b") == (ao2 && ao3))
    }
  }

  test("test_difference(_2): never append-only") {
    for (ao1 <- bools; ao2 <- bools; ao3 <- bools) {
      val out = Props.difference(Props.source(Map("a" -> ao1, "b" -> ao2)))
      assert(!out.id && !out.col("a") && !out.col("b"))
    }
  }

  test("test_update_rows(_2): id = AND of universes, value columns cleared") {
    for (ao1 <- bools; ao2 <- bools) {
      val out = Props.updateRows(Props.source(Map("a" -> ao1)), Props.source(Map("a" -> ao2)))
      assert(out.id == (ao1 && ao2) && !out.col("a"))
    }
    for (ao1 <- bools; ao2 <- bools; ao3 <- bools; ao4 <- bools) {
      val out = Props.updateRows(
        Props.source(Map("a" -> ao1, "b" -> ao2)),
        Props.source(Map("a" -> ao3, "b" -> ao4)))
      assert(out.id == ((ao1 || ao2) && (ao3 || ao4)))
      assert(!out.col("a") && !out.col("b"))
    }
  }

  test("test_update_cells(_2): id = LEFT universe, value columns cleared") {
    for (ao1 <- bools; ao2 <- bools) {
      val out = Props.updateCells(Props.source(Map("a" -> ao1)))
      assert(out.id == ao1 && !out.col("a"))
    }
    for (ao1 <- bools; ao2 <- bools; ao3 <- bools; ao4 <- bools) {
      val out = Props.updateCells(Props.source(Map("a" -> ao1, "b" -> ao2)))
      assert(out.id == (ao1 || ao2) && !out.col("a") && !out.col("b"))
    }
  }

  test("test_concat(_2): per-column AND across sides, id = AND of universes (reindex same)") {
    for (ao1 <- bools; ao2 <- bools) {
      val out = Props.concat(Props.source(Map("a" -> ao1)), Props.source(Map("a" -> ao2)))
      assert(out.id == (ao1 && ao2) && out.col("a") == (ao1 && ao2))
    }
    for (ao1 <- bools; ao2 <- bools; ao3 <- bools; ao4 <- bools) {
      val out = Props.concat(
        Props.source(Map("a" -> ao1, "b" -> ao2)),
        Props.source(Map("a" -> ao3, "b" -> ao4)))
      assert(out.id == ((ao1 || ao2) && (ao3 || ao4)))
      assert(out.col("a") == (ao1 && ao3) && out.col("b") == (ao2 && ao4))
    }
  }

  test("test_with_universe_of: id = OR of universes, columns keep their own flags") {
    for (ao1 <- bools; ao2 <- bools; ao3 <- bools) {
      val t1 = Props.source(Map("k" -> ao3, "a" -> ao1))
      val t2 = Props.source(Map("k" -> ao3, "a" -> ao2))
      val out = Props.withUniverseOf(t1, t2)
      assert(out.id == (ao1 || ao2 || ao3))
      assert(out.col("a") == ao1)
    }
  }

  test("test_join(_2): inner join ANDs the key deps into the id, columns AND the id") {
    for (ao1 <- bools; ao2 <- bools) {
      val out = Props.joinInner(
        Props.source(Map("a" -> ao1)), Set.empty,
        Props.source(Map("b" -> ao2)), Set.empty)
      assert(out.id == (ao1 && ao2))
      assert(out.col("a") == (ao1 && ao2) && out.col("b") == (ao1 && ao2))
    }
    for (aoA <- bools; aoB <- bools; aoC <- bools; aoD <- bools) {
      val out = Props.joinInner(
        Props.source(Map("a" -> aoA, "b" -> aoB)), Set("a"),
        Props.source(Map("c" -> aoC, "d" -> aoD)), Set("c"))
      assert(out.id == (aoA && aoC))
      assert(out.col("b") == (aoA && aoB && aoC))
      assert(out.col("d") == (aoA && aoC && aoD))
    }
  }

  test("test_outer_join: LEFT/RIGHT/OUTER modes are never append-only") {
    for (ao1 <- bools; ao2 <- bools) {
      val out = Props.joinOuter(Props.source(Map("a" -> ao1)), Props.source(Map("b" -> ao2)))
      assert(!out.id && !out.col("a") && !out.col("b"))
    }
  }

  test("test_flatten(_2): the flattened column keys the new universe") {
    for (ao <- bools) {
      val out = Props.flatten(Props.source(Map("a" -> ao)), "a")
      assert(out.id == ao && out.col("a") == ao)
    }
    for (ao1 <- bools; ao2 <- bools) {
      val out = Props.flatten(Props.source(Map("a" -> ao1, "b" -> ao2)), "a")
      assert(out.id == ao1 && out.col("a") == ao1 && out.col("b") == (ao1 && ao2))
    }
  }

  test("test_sorting: prev/next never append-only, own columns keep flags") {
    for (ao <- bools) {
      val out = Props.sort(Props.source(Map("a" -> ao)))
      assert(out.id == ao && out.col("a") == ao)
      assert(!out.col("prev") && !out.col("next"))
    }
  }

  test("test_remove_errors(_2): pass-through") {
    for (ao1 <- bools; ao2 <- bools) {
      val out = Props.removeErrors(Props.source(Map("a" -> ao1, "b" -> ao2)))
      assert(out.id == (ao1 || ao2) && out.col("a") == ao1 && out.col("b") == ao2)
    }
  }

  test("test_remove_retractions(_2): everything append-only by construction") {
    for (ao1 <- bools; ao2 <- bools) {
      val out = Props.removeRetractions(Props.source(Map("a" -> ao1, "b" -> ao2)))
      assert(out.id && out.col("a") && out.col("b"))
    }
  }

  test("universe flag of a source is the OR of its column flags") {
    assert(Props.source(Map("a" -> false, "b" -> true)).id)
    assert(!Props.source(Map("a" -> false, "b" -> false)).id)
    assert(Props.reduce(Set("s")) == TableProps(false, Map("s" -> false)))
  }
}

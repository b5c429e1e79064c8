package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.core.{Keys, PwTable}

/** Bit-exact replays of the reference's core-table fixtures from
  * tests/test_common.py — flatten (empty lists, strings, type error), ix
  * (optional vs the strict KeyError), and concat universe-intersection
  * (r15 decode: strict ix silently dropped dangling pointers, flatten
  * rejected strings, concat never checked disjointness). */
class CoreFixtureSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark
  import spark.implicits._

  private def pw(df: org.apache.spark.sql.DataFrame, idFrom: String): PwTable =
    PwTable.fromPrimaryKey(df, idFrom)

  test("flatten: empty lists vanish, payload duplicates per element (test_flatten)") {
    val t = Seq((1, Seq(1, 2), -1), (2, Seq.empty[Int], -2), (3, Seq(3, 4), -3),
      (4, Seq(10, 11, 12), -4), (5, Seq(4, 5, 6, 1, 2), -5))
      .toDF("k", "array", "other")
    val out = pw(t, "k").flatten("array").toDf
      .select("array", "other").collect()
      .map(r => (r.getInt(0), r.getInt(1))).toSeq.sorted
    assert(out == Seq((1, -1), (1, -5), (2, -1), (2, -5), (3, -3), (4, -3),
      (4, -5), (5, -5), (6, -5), (10, -4), (11, -4), (12, -4)).sorted)
  }

  test("cross join: no-condition join of different universes is cartesian (test_cross_join)") {
    val t1 = Seq((1L, 1L, "Alice", 10L), (2L, 1L, "Bob", 9L), (3L, 2L, "Alice", 8L))
      .toDF("id0", "pet", "owner", "age")
    val t2 = Seq((11L, 3L, "Alice", 10L, "M"), (12L, 1L, "Bob", 9L, "L"),
      (13L, 1L, "Tom", 8L, "XL")).toDF("id0", "pet", "owner", "age", "size")
    val res = pw(t1, "id0").crossJoin(pw(t2, "id0"))
      .select("owner_name" -> col("r.owner"), "L" -> col("l.id0"),
        "R" -> col("r.id0"), "age" -> col("l.age")).toDf
    val got = res.collect().map(r =>
      (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(got == Set(
      ("Alice", 1L, 11L, 10L), ("Bob", 1L, 12L, 10L), ("Tom", 1L, 13L, 10L),
      ("Alice", 2L, 11L, 9L), ("Bob", 2L, 12L, 9L), ("Tom", 2L, 13L, 9L),
      ("Alice", 3L, 11L, 8L), ("Bob", 3L, 12L, 8L), ("Tom", 3L, 13L, 8L)))
    // pair ids are distinct (id = hash(left_id, right_id))
    val ids = pw(t1, "id0").crossJoin(pw(t2, "id0"))
      .select("x" -> col("l.age")).df.select(graft.core.Keys.IdCol)
    assert(ids.distinct().count() == 9)
  }

  test("join id override keys by one side; duplicates raise (test_join_left/right_assign_id)") {
    val left = Seq((1L, "a", 11L), (2L, "b", 12L), (3L, "c", 13L), (4L, "d", 13L))
      .toDF("id0", "col", "on")
    val right = Seq((11L, "d", 12L), (12L, "e", 13L), (13L, "f", 14L))
      .toDF("id0", "col", "on")
    // id=left.id: each left matches <=1 right -> result keyed by LEFT ids 2,3,4
    val joined = pw(left, "id0").join(pw(right, "id0"), col("l.on") === col("r.on"))
      .selectWithId("left", "lid" -> col("l.id0"),
        "lcol" -> col("l.col"), "rcol" -> col("r.col"))
    val got = joined.toDf.collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSet
    assert(got == Set((2L, "b", "d"), (3L, "c", "e"), (4L, "d", "e")))
    assert(joined.df.select(graft.core.Keys.IdCol).distinct().count() == 3)
    // id=right.id: right row 12 ('e') matches TWO lefts -> the reference's
    // runtime KeyError
    val err = intercept[Exception] {
      pw(left, "id0").join(pw(right, "id0"), col("l.on") === col("r.on"))
        .selectWithId("right", "lcol" -> col("l.col")).toDf.collect()
    }
    assert(err.getMessage != null && err.getMessage.contains("duplicate key"))
  }

  test("groupby(id=pointer) keeps the pointer as the result id (test_groupby_setid)") {
    val left = Seq((1L, 1L, "Alice", 10L), (2L, 1L, "Bob", 9L),
      (3L, 2L, "Alice", 8L), (4L, 1L, "Bob", 7L)).toDF("id0", "pet", "owner", "age")
      .withColumn("pet", Keys.pointerFrom(col("pet")))
    val res = pw(left, "id0").groupby("pet" -> col("pet"))
      .reduceWithId("pet", "agesum" -> sum(col("age")))
    val rows = res.df.select(col(graft.core.Keys.IdCol), col("pet"), col("agesum"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // the id IS the pet pointer (no re-hash): id == pet for every row
    assert(rows.forall { case (id, pet, _) => id == pet })
    assert(rows.map(_._3).toSet == Set(26L, 8L))
  }

  test("flatten on a 2-D ndarray explodes along the FIRST axis (test_flatten_multidimensional)") {
    val t = Seq((1, Seq(Seq(1, 2), Seq(3, 4))), (2, Seq(Seq(1, 2, 5, 6))))
      .toDF("k", "array")
    val out = pw(t, "k").flatten("array").toDf
      .select("array").collect().map(_.getSeq[Int](0).toList).toList
      .sortBy(r => (r.length, r.headOption.getOrElse(0)))
    assert(out == List(List(1, 2), List(3, 4), List(1, 2, 5, 6))
      .sortBy(r => (r.length, r.headOption.getOrElse(0))))
  }

  test("flatten: strings explode into characters; non-iterables are rejected (test_flatten_string)") {
    val t = Seq((1, "abc"), (2, "defoimkm"), (3, "xyz")).toDF("k", "string")
    val out = pw(t, "k").flatten("string").toDf
      .select("string").as[String].collect().toSeq.sorted
    assert(out == "abcdefoimkmxyz".toSeq.map(_.toString).sorted)
    val bad = Seq((1, -1)).toDF("a", "other")
    val err = intercept[IllegalArgumentException] {
      pw(bad, "a").flatten("a")
    }
    assert(err.getMessage.contains("Cannot flatten column of type"))
  }

  test("flatten resolves case-insensitively as one canonical name; nested paths error cleanly") {
    // r15 review: resolving the type through the analyzer but exploding by
    // the literal spelling kept the unexploded array inside _rest.*
    val t = Seq((1, Seq(1, 2))).toDF("k", "array")
    val out = pw(t, "k").flatten("ARRAY").toDf
    assert(out.columns.count(_.equalsIgnoreCase("array")) == 1)
    assert(out.select(col("ARRAY")).as[Int].collect().sorted.toSeq == Seq(1, 2))
    val nested = Seq((1, (Seq(1), "x"))).toDF("k", "rec")
    val err = intercept[IllegalArgumentException] {
      pw(nested, "k").flatten("rec._1")
    }
    assert(err.getMessage.contains("no such top-level column"))
  }

  test("ix: optional=true yields nulls for null/missing pointers (test_ix_none)") {
    val animals = pw(Seq((1, "upupa"), (2, "acherontia"), (3, "bubo"),
      (4, "dynastes")).toDF("k", "genus"), "k")
    val birds = Seq((1, "hoopoe", Some(2)), (2, "owl", Some(4)), (3, "brbrb", None))
      .toDF("bk", "desc", "ptr")
      .withColumn("ptr", when(col("ptr").isNotNull, Keys.pointerFrom(col("ptr"))))
    val out = pw(birds, "bk").ix(animals, col("ptr"), optional = true).toDf
      .select(col("desc"), col("genus")).collect()
      .map(r => (r.getString(0), if (r.isNullAt(1)) null else r.getString(1))).toSet
    assert(out == Set(("hoopoe", "acherontia"), ("owl", "dynastes"), ("brbrb", null)))
  }

  test("ix: a dangling pointer under strict mode fails loudly (test_ix_missing_key)") {
    val animals = pw(Seq((1, "upupa"), (2, "acherontia")).toDF("k", "genus"), "k")
    val birds = Seq((1, "hoopoe", 1), (2, "owl", 3)).toDF("bk", "desc", "ptr")
      .withColumn("ptr", Keys.pointerFrom(col("ptr")))
    val err = intercept[Exception] {
      pw(birds, "bk").ix(animals, col("ptr")).toDf.collect()
    }
    assert(SparkTestBase.causeMessages(err).exists(_.contains("ix: missing key")))
    // and a RESOLVABLE strict lookup passes rows through untouched
    val ok = Seq((1, "hoopoe", 1), (2, "owl", 2)).toDF("bk", "desc", "ptr")
      .withColumn("ptr", Keys.pointerFrom(col("ptr")))
    assert(pw(ok, "bk").ix(animals, col("ptr")).toDf.count() == 2)
  }

  test("concatStrict: intersecting universes fail loudly (test_concat_errors_on_intersecting_universes)") {
    val a = pw(Seq((1, "a"), (2, "b")).toDF("k", "v"), "k")
    val b = pw(Seq((2, "c"), (3, "d")).toDF("k", "v"), "k") // id 2 collides
    val err = intercept[Exception] { a.concatStrict(b).toDf.collect() }
    assert(SparkTestBase.causeMessages(err).exists(_.contains("intersecting universes")))
    // disjoint ids pass with every row kept
    val c = pw(Seq((3, "c"), (4, "d")).toDF("k", "v"), "k")
    assert(a.concatStrict(c).toDf.count() == 4)
  }

  test("iterate limit semantics: exactly `limit` step applications; non-positive limits error (test_iterate_with_limit)") {
    import graft.operators.Iterate
    for (limit <- Seq(1, 2, 10)) {
      val out = Iterate.fixpoint(Seq(0L).toDF("foo"),
        df => df.select((col("foo") + 1).as("foo")), maxIterations = limit)
        .head.getLong(0)
      assert(out == limit.toLong, s"limit=$limit")
    }
    for (bad <- Seq(0, -1)) {
      intercept[IllegalArgumentException] {
        Iterate.fixpoint(Seq(0L).toDF("foo"),
          df => df.select((col("foo") + 1).as("foo")), maxIterations = bad)
      }
      intercept[IllegalArgumentException] {
        Iterate.nTimes(Seq(0L).toDF("foo"),
          df => df.select((col("foo") + 1).as("foo")), n = bad)
      }
    }
  }

  // ───────── tests/test_sorting.py + tests/ordered/test_diff.py (r16 decode) ─────────

  test("sort → prev/next replays test_prevnext_single_instance / _many_instance") {
    def check(rows: Seq[(Int, Int, Int)],
        expected: Map[Int, (Option[Int], Option[Int])]): Unit = {
      val df = rows.toDF("rid", "key", "instance")
      val idToRid = df.select(Keys.pointerFrom(col("rid")).as("id"), col("rid"))
        .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
      val out = PwTable.fromPrimaryKey(df, "rid")
        .sortWithPrevNext(Seq(col("key")), col("instance")).toDf
        .select(col("rid"), col("prev"), col("next")).collect()
      val got = out.map { r =>
        r.getInt(0) -> ((
          if (r.isNullAt(1)) None else Some(idToRid(r.getLong(1))),
          if (r.isNullAt(2)) None else Some(idToRid(r.getLong(2)))))
      }.toMap
      assert(got == expected)
    }
    check(Seq((1, 1, 42), (2, 5, 42), (3, 3, 42), (4, 8, 42), (5, 2, 42)), Map(
      1 -> ((None, Some(5))), 2 -> ((Some(3), Some(4))), 3 -> ((Some(5), Some(2))),
      4 -> ((Some(2), None)), 5 -> ((Some(1), Some(3)))))
    check(Seq((1, 1, 42), (2, 1, 28), (3, 5, 42), (4, 5, 28), (5, 3, 42),
      (6, 3, 28), (7, 8, 42), (8, 8, 28), (9, 2, 42), (10, 2, 28)), Map(
      1 -> ((None, Some(9))), 2 -> ((None, Some(10))), 3 -> ((Some(5), Some(7))),
      4 -> ((Some(6), Some(8))), 5 -> ((Some(9), Some(3))), 6 -> ((Some(10), Some(4))),
      7 -> ((Some(3), None)), 8 -> ((Some(4), None)), 9 -> ((Some(1), Some(5))),
      10 -> ((Some(2), Some(6)))))
  }

  test("ordered diff replays test_diff_single_column / _multiple_columns / _instance") {
    def opts(rows: Array[org.apache.spark.sql.Row], i: Int): Seq[Option[Int]] =
      rows.map(r => if (r.isNullAt(i)) None else Some(r.getInt(i))).toSeq
    val t1 = Seq((1, 1), (2, 2), (3, 4), (4, 7), (5, 11), (6, 16), (7, 22),
      (8, 29), (9, 37)).toDF("t", "v")
    val d1 = PwTable.fromPrimaryKey(t1, "t")
      .diff(Seq(col("t")), col("v"), 1, lit(0)).toDf.orderBy("t").select("diff").collect()
    assert(opts(d1, 0) == Seq(None) ++ (1 to 8).map(Some(_)))

    val t2 = Seq((1, 1, 0), (2, 2, 10), (3, 4, 54), (4, 7, 64), (5, 11, 12),
      (6, 16, 24), (7, 22, 18), (8, 29, -45), (9, 37, 100)).toDF("t", "v1", "v2")
    val d2 = PwTable.fromPrimaryKey(t2, "t")
      .diffAll(Seq(col("t")), Seq("v1" -> col("v1"), "v2" -> col("v2")), lit(0)).toDf
      .orderBy("t").select("diff_v1", "diff_v2").collect()
    assert(opts(d2, 0) == Seq(None) ++ (1 to 8).map(Some(_)))
    assert(opts(d2, 1) == Seq(None, Some(10), Some(44), Some(10), Some(-52),
      Some(12), Some(-6), Some(-63), Some(145)))

    val t3 = Seq((1, 0, 1), (2, 1, 2), (3, 1, 4), (3, 0, 7), (5, 1, 11),
      (5, 0, 16), (7, 0, 22), (8, 1, 29), (9, 0, 37)).toDF("t", "i", "v")
    val d3 = PwTable.fromAllColumns(t3)
      .diff(Seq(col("t")), col("v"), 1, col("i")).toDf
      .orderBy("t", "v").select("diff").collect()
    assert(opts(d3, 0) == Seq(None, None, Some(2), Some(6), Some(7), Some(9),
      Some(6), Some(18), Some(15)))
  }

  test("sequence get: 0-based, one negative wrap, OOB errors (test_sequence_get_unchecked_*)") {
    import graft.functions.Exprs
    // fixed length: tup[0], tup[1] round-trip (py:5241)
    val t1 = Seq((4L, "xyz"), (3L, "abc"), (7L, "d")).toDF("i", "s")
    val t2 = t1.select(array(col("i").cast("string"), col("s")).as("tup"))
    val back = t2.select(Exprs.seqGet(col("tup"), lit(0)).cast("long").as("i"),
      Exprs.seqGet(col("tup"), lit(1)).as("s"))
    assert(back.collect().map(r => (r.getLong(0), r.getString(1))).toSet ==
      Set((4L, "xyz"), (3L, "abc"), (7L, "d")))

    // dynamic index (py:5272): tup[c] picks per-row
    val d = Seq((4L, 1L, 0L), (3L, 2L, 1L), (7L, 3L, 1L)).toDF("a", "b", "c")
    val r = d.select(Exprs.seqGet(array(col("a"), col("b")), col("c")).as("r"))
    assert(r.as[Long].collect().sorted.toSeq == Seq(2L, 3L, 4L))

    // variable length with NEGATIVE indices (py:5325): tuple(n,..,1),
    // x = tup[2], y = tup[-3]
    val v = Seq(3L, 4L, 5L).toDF("a")
      .select(col("a"), sequence(col("a"), lit(1L), lit(-1L)).as("tup"))
    val xy = v.select(Exprs.seqGet(col("tup"), lit(2)).as("x"),
      Exprs.seqGet(col("tup"), lit(-3)).as("y"))
    assert(xy.collect().map(r => (r.getLong(0), r.getLong(1))).toSet ==
      Set((1L, 3L), (2L, 3L), (3L, 3L)))

    // a NULL sequence errors with the engine's ValueError, checked or not
    // (expression.rs:385 — review pin; it is NOT the checked default)
    val nullSeq = Seq((1L, Seq(1L, 2L)), (2L, null)).toDF("k", "tup")
    val e0 = intercept[Exception] {
      nullSeq.select(graft.functions.Exprs.seqGetChecked(col("tup"), lit(0), lit(-1L))).collect()
    }
    assert(SparkTestBase.causeMessages(e0).exists(_.contains("out of None")))

    // out of range raises the engine's "index out of bounds" (py:5397)
    val oob = Seq(1L).toDF("a")
      .select(sequence(col("a"), lit(1L), lit(-1L)).as("tup"))
    val e = intercept[Exception] {
      oob.select(Exprs.seqGet(col("tup"), lit(1)).as("x")).collect()
    }
    assert(SparkTestBase.causeMessages(e).exists(_.contains("index out of bounds")))
  }

  test("sequence get checked: default on overflow, negative wrap (test_sequence_get_checked_*)") {
    import graft.functions.Exprs
    // py:5373 — tuple(n..1): x = get(1) (null when len==1), y = get(-1) (=1)
    val v = Seq(1L, 2L, 3L).toDF("a")
      .select(col("a"), sequence(col("a"), lit(1L), lit(-1L)).as("tup"))
    val xy = v.select(col("a"),
      Exprs.seqGetChecked(col("tup"), lit(1), lit(null)).as("x"),
      Exprs.seqGetChecked(col("tup"), lit(-1), lit(null)).as("y"))
    val got = xy.collect().map(r =>
      (r.getLong(0), if (r.isNullAt(1)) None else Some(r.getLong(1)), r.getLong(2))).toSet
    assert(got == Set((1L, None, 1L), (2L, Some(1L), 1L), (3L, Some(2L), 1L)))

    // py:5433 — statically-overflowing checked get takes the default column
    val t = Seq((4L, 10L, "abc"), (3L, 9L, "def"), (7L, 8L, "xx")).toDF("a", "b", "c")
    val out = t.select(Exprs.seqGetChecked(
      array(col("a").cast("string"), col("b").cast("string")), lit(2), col("c")).as("c"))
    assert(out.as[String].collect().toSet == Set("abc", "def", "xx"))
  }

  test("make_tuple keeps nulls; tuple comparison is lexicographic (test_python_tuple_comparison)") {
    import graft.functions.Exprs
    // py:5215 — make_tuple carries optional fields through
    val t = Seq((1L, 10L, Some("a")), (2L, 20L, None), (3L, 30L, Some("c")))
      .toDF("a", "b", "c")
    val z = t.select(Exprs.makeTuple((col("a") * 2).as("x"), col("b"), col("c")).as("zip"))
    val rows = z.select(col("zip").getField("x"), col("zip").getField("b"),
      col("zip").getField("c")).collect()
      .map(r => (r.getLong(0), r.getLong(1), Option(r.getString(2)))).toSet
    assert(rows == Set((2L, 10L, Some("a")), (4L, 20L, None), (6L, 30L, Some("c"))))

    // py:6603 — (a,b) < (b,a) etc. resolve lexicographically, like python
    val c = Seq((1L, 2L), (4L, 3L), (5L, 5L)).toDF("a", "b")
    val cmp = c.select(
      (struct(col("a"), col("b")) < struct(col("b").as("a"), col("a").as("b"))).as("x"),
      (struct(col("a"), col("b")) > struct(col("b").as("a"), col("a").as("b"))).as("z"),
      (struct(col("a"), col("b")) === struct(col("b").as("a"), col("a").as("b"))).as("e"),
      (struct(col("a"), col("b")) =!= struct(col("b").as("a"), col("a").as("b"))).as("n"))
    assert(cmp.collect().map(r => (r.getBoolean(0), r.getBoolean(1), r.getBoolean(2),
      r.getBoolean(3))).toSet == Set(
      (true, false, false, true), (false, true, false, true), (false, false, true, false)))
  }

  test("sort by a tuple key chains prev/next like the reference (test_python_tuple_sorting)") {
    val t = Seq((1L, 3L, 2L), (2L, 4L, 1L), (3L, 3L, 6L), (4L, 2L, 8L),
      (5L, 5L, 6L), (6L, 1L, 4L), (7L, 2L, 2L), (8L, 3L, 3L)).toDF("a", "b", "c")
    val sorted = pw(t, "a")
      .sortWithPrevNext(Seq(struct(col("b"), col("c"))), lit(0))
    val prevA = sorted.df.select(col("a"), col("prev")).as("s")
      .join(t.as("o"), col("s.prev") === graft.core.Keys.pointerFrom(col("o.a")), "left_outer")
      .select(col("s.a").as("a"), col("o.a").as("prev_a"))
    val got = prevA.collect()
      .map(r => (r.getLong(0), if (r.isNullAt(1)) None else Some(r.getLong(1)))).toSet
    assert(got == Set((1L, Some(4L)), (2L, Some(3L)), (3L, Some(8L)), (4L, Some(7L)),
      (5L, Some(2L)), (6L, None), (7L, Some(6L)), (8L, Some(1L))))
  }

  test("unwrap: errors on null, passes non-null (test_unwrap / test_unwrap_with_nones)") {
    import graft.functions.Exprs
    val a = Seq(Some(1L), Some(2L), Some(3L), None).toDF("foo")
    val ok = a.filter(col("foo").isNotNull)
      .select(Exprs.unwrap(col("foo")).as("ret"))
    assert(ok.as[Long].collect().sorted.toSeq == Seq(1L, 2L, 3L))
    val e = intercept[Exception] {
      a.select(Exprs.unwrap(col("foo")).as("ret")).collect()
    }
    assert(SparkTestBase.causeMessages(e).exists(_.contains("unwrap")))
  }

  test("gradual_broadcast apportions lower/upper by hash fraction (test_gradual_broadcast)") {
    import graft.operators.Utils
    // 500 rows, threshold triplet (20.5, 29.5, 30.5) — the reference's
    // static vector shape: ~90% of rows should sit on the upper bound,
    // value==lower pins ALL rows to lower, value==upper pins all to upper,
    // a collapsed band (upper==lower) yields lower
    val rows = (1L to 500L).toDF("k")
    def thr(lo: Double, v: Double, up: Double) =
      Seq((lo, v, up)).toDF("lower", "value", "upper")

    val mid = Utils.gradualBroadcast(rows, col("k"), thr(20.5, 29.5, 30.5))
    val midVals = mid.select("apx_value").as[Double].collect()
    assert(midVals.toSet == Set(20.5, 30.5))
    val upShare = midVals.count(_ == 30.5).toDouble / midVals.length
    assert(math.abs(upShare - 0.9) < 0.08, s"upper share $upShare not ~0.9")

    val atLower = Utils.gradualBroadcast(rows, col("k"), thr(20.5, 20.5, 30.5))
    assert(atLower.select("apx_value").as[Double].collect().toSet == Set(20.5))

    val atUpper = Utils.gradualBroadcast(rows, col("k"), thr(20.5, 30.5, 30.5))
    assert(atUpper.select("apx_value").as[Double].collect().forall(_ == 30.5))

    val collapsed = Utils.gradualBroadcast(rows, col("k"), thr(7.0, 7.0, 7.0))
    assert(collapsed.select("apx_value").as[Double].collect().toSet == Set(7.0))

    // review pin: keys beyond 2^32 stay inside i64 in BOTH engines (the
    // reduced-modulus hash) — no wrap divergence at large scale factors
    val huge = Seq(Long.MaxValue - 1, 6000000000L, 4294967297L).toDF("k")
    val hv = Utils.gradualBroadcast(huge, col("k"), thr(20.5, 29.5, 30.5))
    assert(hv.select("apx_value").as[Double].collect().forall(v => v == 20.5 || v == 30.5))
  }
}

package graft

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.core.{Keys, PwTable}
import graft.streaming.Persistence

/** Replay of the reference's persisted-static-rerun vectors —
  * `python/pathway/tests/test_persistence.py` (1,302 LoC, every static-mode
  * test). The decoded contract: each rerun against the same persistence
  * store emits EXACTLY the unit-diff delta between the previous run's
  * output state and the new one. Every expected set below is the
  * reference's own literal vector.
  *
  * Graft shape: `Persistence.runStatic` (generation-numbered parquet
  * snapshots + distributed unit-diff; streaming/Persistence.scala). Input
  * accumulation across runs is modeled by the per-test `Dir` state, exactly
  * like the reference's input directories accumulate csv files.
  */
class PersistenceFixtureSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark
  import spark.implicits._

  private def tmp(): String =
    java.nio.file.Files.createTempDirectory("graft-pers").toString

  private def fmt(v: Any): String = v match {
    case null => "None"
    case true => "True"
    case false => "False"
    case other => other.toString
  }

  private def diffSet(df: DataFrame): Set[String] =
    df.collect().map(r => (0 until r.length).map(i => fmt(r.get(i))).mkString(",")).toSet

  /** Accumulating input directory (reference: one csv file per run, removals
    * by name — test_persistence.py:303-321). */
  final class Dir[T] {
    private val files = scala.collection.mutable.LinkedHashMap[String, Seq[T]]()
    private var n = 0
    def add(rows: Seq[T]): String = { n += 1; files(n.toString) = rows; n.toString }
    def put(name: String, rows: Seq[T]): Unit = files(name) = rows
    def remove(name: String): Unit = files.remove(name)
    def all: Seq[T] = files.values.flatten.toSeq
  }

  // ── test_persistence_modifications (13 scenarios, identity program) ──────

  test("persistence: upsert/delete file scenarios replay the reference's 13 " +
      "modification vectors (test_persistence.py:173-287)") {
    val scenarios: Seq[Seq[Seq[String]]] = Seq(
      Seq(Seq("U1", "U2"), Seq("D1", "D2")),
      Seq(Seq("U1"), Seq("U1"), Seq("U1")),
      Seq(Seq("U1"), Seq("U1"), Seq("D1")),
      Seq(Seq("U1"), Seq("D1"), Seq("U1")),
      Seq(Seq("U1"), Seq("D1"), Seq("U2")),
      Seq(Seq("U1", "U2", "U3"), Seq("D3"), Seq("U4"), Seq("U3")),
      Seq(Seq("U1", "U2", "U3"), Seq("D2"), Seq("D3"), Seq("D1")),
      Seq(Seq("U1", "U2", "U3", "U4"), Seq("U2", "U3")),
      Seq(Seq("U1", "U2", "U3", "U4"), Seq("D2"), Seq("U3")),
      Seq(Seq("U1", "U2", "U3", "U4"), Seq("D1")),
      Seq(Seq("U1", "U2", "U3", "U4"), Seq("U4", "U3", "U2", "U1")),
      Seq(Seq("U1", "U2", "U3", "U4"), Seq("D3", "D2", "U1"), Seq("D1"),
        Seq("U5", "U1", "U3")),
      Seq(Seq("U1", "U2"), Seq("D2", "U1", "U3")))
    for (scenario <- scenarios) {
      val state = tmp()
      val contents = scala.collection.mutable.LinkedHashMap[String, String]()
      var next = 0
      for (sequence <- scenario) {
        val expected = scala.collection.mutable.Set[String]()
        for (cmd <- sequence) {
          val id = cmd.drop(1)
          if (cmd.startsWith("U")) {
            contents.get(id).foreach(old => expected += s"$old,-1")
            next += 1
            val nv = "a" * next
            contents(id) = nv
            expected += s"$nv,1"
          } else {
            expected += s"${contents.remove(id).get},-1"
          }
        }
        val cur = contents.values.toSeq.toDF("data")
        assert(diffSet(Persistence.runStatic(state, cur)) == expected.toSet,
          s"scenario $scenario sequence $sequence")
      }
    }
  }

  // ── two-table set operators (test_persistence.py:371-461) ────────────────

  test("persistence: restrict across runs (test_persistence.py:371)") {
    val state = tmp(); val d1 = new Dir[Int]; val d2 = new Dir[Int]
    def run(in1: Seq[Int], in2: Seq[Int], expected: Set[String]): String = {
      d1.add(in1); val f2 = d2.add(in2)
      val t1 = PwTable.fromPrimaryKey(d1.all.toDF("a"), "a")
      val t2 = PwTable.fromPrimaryKey(d2.all.toDF("a"), "a")
      val out = t1.restrict(t2).toDf
      assert(diffSet(Persistence.runStatic(state, out)) == expected)
      f2
    }
    run(Seq(1, 2, 3), Seq(1), Set("1,1"))
    run(Nil, Seq(3), Set("3,1"))
    val f3 = run(Seq(4, 5), Seq(5), Set("5,1"))
    run(Seq(6), Seq(4, 6), Set("4,1", "6,1"))
    d2.remove(f3)
    run(Nil, Nil, Set("5,-1"))
  }

  test("persistence: with_universe_of across runs (test_persistence.py:395)") {
    val state = tmp(); val d1 = new Dir[(Int, Int)]; val d2 = new Dir[(Int, Int)]
    def run(in1: Seq[(Int, Int)], in2: Seq[(Int, Int)], expected: Set[String]): Unit = {
      d1.add(in1); d2.add(in2)
      val t1 = d1.all.toDF("a", "b")
      val t2 = d2.all.toDF("a", "b").withColumnRenamed("b", "c")
      val out = t1.join(t2, Seq("a")).select("a", "b", "c")
      assert(diffSet(Persistence.runStatic(state, out)) == expected)
    }
    run(Seq((1, 2), (2, 3)), Seq((1, 3), (2, 4)), Set("1,2,3,1", "2,3,4,1"))
    run(Seq((3, 3), (5, 1)), Seq((3, 4), (5, 0)), Set("3,3,4,1", "5,1,0,1"))
    d1.remove("2"); d2.remove("2")
    run(Seq((3, 4)), Seq((3, 5)), Set("3,3,4,-1", "5,1,0,-1", "3,4,5,1"))
  }

  test("persistence: intersect across runs (test_persistence.py:426)") {
    val state = tmp(); val d1 = new Dir[Int]; val d2 = new Dir[Int]
    def run(in1: Seq[Int], in2: Seq[Int], expected: Set[String]): Unit = {
      d1.add(in1); d2.add(in2)
      val t1 = PwTable.fromPrimaryKey(d1.all.toDF("a"), "a")
      val t2 = PwTable.fromPrimaryKey(d2.all.toDF("a"), "a")
      assert(diffSet(Persistence.runStatic(state, t1.intersect(t2).toDf)) == expected)
    }
    run(Seq(1, 2, 3), Seq(1), Set("1,1"))
    run(Nil, Seq(3), Set("3,1"))
    run(Seq(4, 5), Seq(5, 6), Set("5,1"))
    run(Seq(6), Seq(4), Set("4,1", "6,1"))
    d2.remove("3")
    run(Nil, Nil, Set("5,-1", "6,-1"))
  }

  test("persistence: difference across runs (test_persistence.py:447)") {
    val state = tmp(); val d1 = new Dir[Int]; val d2 = new Dir[Int]
    def run(in1: Seq[Int], in2: Seq[Int], expected: Set[String]): Unit = {
      d1.add(in1); d2.add(in2)
      val t1 = PwTable.fromPrimaryKey(d1.all.toDF("a"), "a")
      val t2 = PwTable.fromPrimaryKey(d2.all.toDF("a"), "a")
      assert(diffSet(Persistence.runStatic(state, t1.difference(t2).toDf)) == expected)
    }
    run(Seq(1, 2, 3), Seq(1), Set("2,1", "3,1"))
    run(Nil, Seq(3), Set("3,-1"))
    run(Seq(4, 5), Seq(5, 6), Set("4,1"))
    run(Seq(6), Seq(4), Set("4,-1"))
    d2.remove("3")
    run(Nil, Nil, Set("5,1", "6,1"))
  }

  // ── sort + ix under persistence (test_persistence.py:468) ────────────────

  test("persistence: sort prev/next + ix across runs (test_persistence.py:468)") {
    val state = tmp(); val d = new Dir[Int]
    def run(in: Seq[Int], expected: Set[String]): Unit = {
      d.add(in)
      val t = PwTable.fromPrimaryKey(d.all.toDF("a"), "a")
      val s = t.sortWithPrevNext(Seq(col("a")), lit(0)).df
      val prevA = s.select(col(Keys.IdCol).as("_pid"), col("a").as("b"))
      val out = s.filter(col("prev").isNotNull)
        .join(prevA, col("prev") === col("_pid"))
        .select("b", "a")
      assert(diffSet(Persistence.runStatic(state, out)) == expected)
    }
    run(Seq(1, 6), Set("1,6,1"))
    run(Seq(3), Set("1,6,-1", "1,3,1", "3,6,1"))
    run(Seq(4, 5), Set("3,6,-1", "3,4,1", "4,5,1", "5,6,1"))
    d.remove("2")
    run(Nil, Set("1,3,-1", "3,4,-1", "1,4,1"))
    run(Seq(2), Set("1,4,-1", "1,2,1", "2,4,1"))
  }

  // ── update_rows / update_cells / join / groupby (test_persistence.py:491-631) ──

  test("persistence: update_rows across runs (test_persistence.py:491)") {
    val state = tmp(); val d1 = new Dir[(Int, Int)]; val d2 = new Dir[(Int, Int)]
    def run(in1: Seq[(Int, Int)], in2: Seq[(Int, Int)], expected: Set[String]): Unit = {
      d1.add(in1); d2.add(in2)
      val t1 = PwTable.fromPrimaryKey(d1.all.toDF("a", "b"), "a")
      val t2 = PwTable.fromPrimaryKey(d2.all.toDF("a", "b"), "a")
      assert(diffSet(Persistence.runStatic(state, t1.updateRows(t2).toDf)) == expected)
    }
    run(Seq((1, 2), (2, 4)), Seq((1, 3), (3, 5)), Set("1,3,1", "2,4,1", "3,5,1"))
    run(Seq((3, 3)), Seq((2, 6), (5, 1)), Set("2,4,-1", "2,6,1", "5,1,1"))
    d2.remove("1")
    run(Nil, Nil, Set("3,5,-1", "3,3,1", "1,3,-1", "1,2,1"))
    run(Seq((7, 10)), Seq((3, 8)), Set("3,3,-1", "3,8,1", "7,10,1"))
  }

  test("persistence: update_cells across runs (test_persistence.py:512)") {
    val state = tmp(); val d1 = new Dir[(Int, Int)]; val d2 = new Dir[(Int, Int)]
    def run(in1: Seq[(Int, Int)], in2: Seq[(Int, Int)], expected: Set[String]): Unit = {
      d1.add(in1); d2.add(in2)
      val t1 = PwTable.fromPrimaryKey(d1.all.toDF("a", "b"), "a")
      val t2 = PwTable.fromPrimaryKey(d2.all.toDF("a", "b"), "a")
      assert(diffSet(Persistence.runStatic(state, t1.updateCells(t2).toDf)) == expected)
    }
    run(Seq((1, 2), (2, 4)), Seq((1, 3)), Set("1,3,1", "2,4,1"))
    run(Seq((3, 3)), Seq((2, 6)), Set("2,4,-1", "2,6,1", "3,3,1"))
    d2.remove("1")
    run(Nil, Nil, Set("1,3,-1", "1,2,1"))
    run(Seq((7, 10)), Seq((3, 8)), Set("3,3,-1", "3,8,1", "7,10,1"))
  }

  test("persistence: join across runs (test_persistence.py:536)") {
    val state = tmp(); val d1 = new Dir[(Int, Int)]; val d2 = new Dir[(Int, Int)]
    def run(in1: Seq[(Int, Int)], in2: Seq[(Int, Int)], expected: Set[String]): Unit = {
      d1.add(in1); d2.add(in2)
      val t1 = d1.all.toDF("a", "b")
      val t2 = d2.all.toDF("a", "b").withColumnRenamed("b", "c")
      val out = t1.join(t2, Seq("a")).select("a", "b", "c")
      assert(diffSet(Persistence.runStatic(state, out)) == expected)
    }
    run(Seq((1, 2), (2, 4)), Seq((1, 3)), Set("1,2,3,1"))
    run(Seq((3, 3)), Seq((2, 6), (1, 4)), Set("2,4,6,1", "1,2,4,1"))
    d2.remove("1")
    run(Nil, Nil, Set("1,2,3,-1"))
    run(Seq((1, 4)), Seq((1, 8)), Set("1,2,8,1", "1,4,8,1", "1,4,4,1"))
  }

  test("persistence: groupby reducers across runs (test_persistence.py:559)") {
    val state = tmp(); val d = new Dir[(Int, Int, Int)]
    def run(in: Seq[(Int, Int, Int)], expected: Set[String]): Unit = {
      d.add(in)
      val out = d.all.toDF("a", "b", "c")
        .groupBy("a")
        .agg(count(lit(1)).as("c"), sum("b").as("s"), max("b").as("m"),
          countDistinct(col("c")).as("cd"))
      assert(diffSet(Persistence.runStatic(state, out)) == expected)
    }
    run(Seq((1, 3, 3), (2, 4, 2)), Set("1,1,3,3,1,1", "2,1,4,4,1,1"))
    run(Seq((1, 1, 2)), Set("1,1,3,3,1,-1", "1,2,4,3,2,1"))
    run(Seq((2, 5, 2)), Set("2,1,4,4,1,-1", "2,2,9,5,1,1"))
    d.remove("2")
    run(Nil, Set("1,1,3,3,1,1", "1,2,4,3,2,-1"))
    run(Seq((2, 0, 3)), Set("2,2,9,5,1,-1", "2,3,9,5,2,1"))
  }

  test("persistence: groupby count across restarts accumulates " +
      "(test_persistence.py:49 — state compare)") {
    val state = tmp(); val d = new Dir[String]
    val acc = scala.collection.mutable.Map[String, Long]().withDefaultValue(0L)
    def run(in: Seq[String], expectedState: Map[String, Long]): Unit = {
      d.add(in)
      val out = d.all.toDF("w").groupBy("w").agg(count(lit(1)).as("c"))
      for (r <- Persistence.runStatic(state, out).collect()) {
        val (w, c, dd) = (r.getString(0), r.getLong(1), r.getInt(2))
        if (dd > 0) acc(w) = c else if (acc(w) == c) acc.remove(w)
      }
      assert(acc.toMap == expectedState)
    }
    run(Seq("abc", "def", "foo"), Map("abc" -> 1, "def" -> 1, "foo" -> 1))
    run(Seq("foo", "xyz"), Map("abc" -> 1, "def" -> 1, "foo" -> 2, "xyz" -> 1))
    run(Seq("abc", "xxx"),
      Map("abc" -> 2, "def" -> 1, "foo" -> 2, "xyz" -> 1, "xxx" -> 1))
    run(Seq("foo"), Map("abc" -> 2, "def" -> 1, "foo" -> 3, "xyz" -> 1, "xxx" -> 1))
    run(Seq("abc", "def"),
      Map("abc" -> 3, "def" -> 2, "foo" -> 3, "xyz" -> 1, "xxx" -> 1))
    run(Seq("xyz"), Map("abc" -> 3, "def" -> 2, "foo" -> 3, "xyz" -> 2, "xxx" -> 1))
  }

  // ── deduplicate with acceptor (test_persistence.py:639) ──────────────────

  test("persistence: deduplicate acceptor state across runs (test_persistence.py:639)") {
    val state = tmp()
    val events = scala.collection.mutable.ArrayBuffer[(Int, Int)]() // (seq, a)
    var seq = 0
    def run(in: Seq[Int], expected: Set[String]): Unit = {
      in.foreach { v => seq += 1; events += ((seq, v)) }
      val df = events.toSeq.toDF("seq", "a")
      val out = graft.streaming.StreamOps.deduplicateBatch(
        df, Seq(lit(0).as("_g")), col("seq"),
        (nv, old) => nv > old + 2, col("a"),
        org.apache.spark.sql.types.IntegerType).select(col("accepted").as("a"))
      assert(diffSet(Persistence.runStatic(state, out)) == expected)
    }
    run(Seq(1), Set("1,1"))
    run(Seq(2), Set())
    run(Seq(4), Set("1,-1", "4,1"))
    run(Seq(6), Set())
    run(Seq(3), Set())
    run(Seq(7), Set("4,-1", "7,1"))
  }

  // ── upsert streams (test_persistence.py:859-1119) ────────────────────────

  /** Latest event per key wins (by arrival seq); deletions drop the key. */
  private def upsertState(events: Seq[(Int, Int, Int, Boolean)]): DataFrame = {
    // (seq, a, b, alive)
    val df = events.toDF("seq", "a", "b", "alive")
    df.groupBy("a")
      .agg(max_by(struct(col("b"), col("alive")), col("seq")).as("_s"))
      .filter(col("_s.alive"))
      .select(col("a"), col("_s.b").as("b"))
  }

  test("persistence: upsert session with python connector (test_persistence.py:859)") {
    val state = tmp()
    val events = scala.collection.mutable.ArrayBuffer[(Int, Int, Int, Boolean)]()
    var seq = 0
    def run(in: Seq[(Int, Int)], expected: Set[String]): Unit = {
      in.foreach { case (a, b) => seq += 1; events += ((seq, a, b, true)) }
      assert(diffSet(Persistence.runStatic(state, upsertState(events.toSeq))) == expected)
    }
    run(Seq((1, 2), (2, 3)), Set("1,2,1", "2,3,1"))
    run(Seq((1, 4), (3, 10)), Set("1,2,-1", "1,4,1", "3,10,1"))
    run(Seq((3, 9)), Set("3,10,-1", "3,9,1"))
    run(Seq((4, 6)), Set("4,6,1"))
    run(Seq((1, 0)), Set("1,4,-1", "1,0,1"))
  }

  test("persistence: stream_to_table across runs (test_persistence.py:1080)") {
    val state = tmp()
    val events = scala.collection.mutable.ArrayBuffer[(Int, Int, Int, Boolean)]()
    var seq = 0
    def run(in: Seq[(Int, Int, Boolean)], expected: Set[String]): Unit = {
      in.foreach { case (a, b, c) => seq += 1; events += ((seq, a, b, c)) }
      assert(diffSet(Persistence.runStatic(state, upsertState(events.toSeq))) == expected)
    }
    run(Seq((1, 1, true), (2, 3, true)), Set("1,1,1", "2,3,1"))
    run(Seq((2, 4, true), (3, 5, true)), Set("2,3,-1", "2,4,1", "3,5,1"))
    run(Seq((1, 3, false)), Set("1,1,-1"))
    run(Seq((4, 7, true)), Set("4,7,1"))
    run(Seq((3, 6, true), (4, 7, false)), Set("3,5,-1", "3,6,1", "4,7,-1"))
    run(Seq((3, 6, false)), Set("3,6,-1"))
  }

  test("persistence: from_streams (upsert + deletion stream) across runs " +
      "(test_persistence.py:1104)") {
    val state = tmp()
    val events = scala.collection.mutable.ArrayBuffer[(Int, Int, Int, Boolean)]()
    var seq = 0
    def run(ups: Seq[(Int, Int)], dels: Seq[(Int, Int)], expected: Set[String]): Unit = {
      ups.foreach { case (a, b) => seq += 1; events += ((seq, a, b, true)) }
      dels.foreach { case (a, b) => seq += 1; events += ((seq, a, b, false)) }
      assert(diffSet(Persistence.runStatic(state, upsertState(events.toSeq))) == expected)
    }
    run(Seq((1, 1), (2, 3)), Nil, Set("1,1,1", "2,3,1"))
    run(Seq((2, 4), (3, 5)), Nil, Set("2,3,-1", "2,4,1", "3,5,1"))
    run(Nil, Seq((1, 3)), Set("1,1,-1"))
    run(Seq((4, 7)), Nil, Set("4,7,1"))
    run(Seq((3, 6)), Seq((4, 7)), Set("3,5,-1", "3,6,1", "4,7,-1"))
    run(Nil, Seq((3, 6)), Set("3,6,-1"))
  }

  // ── two-source joins + ix (test_persistence.py:1127-1302) ────────────────

  test("persistence: join with id across two persisted sources (test_persistence.py:1127)") {
    val state = tmp(); val vals = new Dir[(String, Int)]; val bonus = new Dir[(String, Int)]
    def run(expected: Set[String]): Unit = {
      val t = vals.all.toDF("label", "val")
      val b = bonus.all.toDF("label", "add")
      val out = t.join(b, Seq("label")).select(col("label"),
        (col("val") + col("add")).as("s"))
      assert(diffSet(Persistence.runStatic(state, out)) == expected)
    }
    vals.put("a", Seq(("a", 10))); bonus.put("a", Seq(("a", 30)))
    run(Set("a,40,1"))
    vals.put("b", Seq(("b", 5))); bonus.put("b", Seq(("b", 50)))
    run(Set("b,55,1"))
    bonus.put("a", Seq(("a", 95)))
    run(Set("a,40,-1", "a,105,1"))
  }

  test("persistence: left join with id across two persisted sources " +
      "(test_persistence.py:1188)") {
    val state = tmp(); val vals = new Dir[(String, Int)]; val bonus = new Dir[(String, Int)]
    def run(expected: Set[String]): Unit = {
      val t = vals.all.toDF("label", "val")
      val b = bonus.all.toDF("label", "add")
      val out = t.join(b, Seq("label"), "left")
        .select(col("label"), (coalesce(col("add"), lit(0)) + col("val")).as("s"))
      assert(diffSet(Persistence.runStatic(state, out)) == expected)
    }
    vals.put("a", Seq(("a", 10)))
    run(Set("a,10,1"))
    bonus.put("a", Seq(("a", 30))); vals.put("b", Seq(("b", 5)))
    run(Set("a,10,-1", "a,40,1", "b,5,1"))
    bonus.put("a", Seq(("a", 95)))
    run(Set("a,40,-1", "a,105,1"))
  }

  test("persistence: ix across two persisted sources (test_persistence.py:1249)") {
    val state = tmp(); val vals = new Dir[(String, Int)]; val bonus = new Dir[(String, Int)]
    def run(expected: Set[String]): Unit = {
      val t = vals.all.toDF("label", "val")
      val b = PwTable.fromPrimaryKey(bonus.all.toDF("label", "add"), "label")
      val t2 = PwTable.fromPrimaryKey(t, "label")
      // pointer_from(label) into bonus's universe = equi-join by label
      val out = t2.ix(b.rename("label" -> "_blabel"), Keys.pointerFrom(col("label")))
        .toDf.select(col("label"), (col("val") + col("add")).as("s"))
      assert(diffSet(Persistence.runStatic(state, out)) == expected)
    }
    vals.put("1", Seq(("a", 10), ("b", 5))); bonus.put("1", Seq(("a", 30), ("b", 50)))
    run(Set("a,40,1", "b,55,1"))
    vals.put("2", Seq(("c", 7))); bonus.put("2", Seq(("c", 100)))
    run(Set("c,107,1"))
    bonus.put("1", Seq(("a", 90), ("b", 50)))
    run(Set("a,40,-1", "a,100,1"))
  }

  // ── non-deterministic UDF memoization (test_persistence.py:665) ──────────

  test("persistence: non-deterministic UDF results are memoized; replays " +
      "retract the original values (test_persistence.py:665)") {
    val state = tmp(); val memoDir = tmp()
    val d = new Dir[(Int, Int)]
    // the counter lives in the companion object: tasks reference the JVM
    // singleton instead of a per-task deserialized closure copy
    PersistenceFixtureSpec.udfCounter.set(0)
    val nextUdf = udf(() => PersistenceFixtureSpec.udfCounter.incrementAndGet())
    def run(in: Seq[(Int, Int)], expected: Set[String]): Unit = {
      d.add(in)
      val input = d.all.toDF("a", "b")
      val withX = Persistence.memoize(memoDir, input, Seq("a", "b"),
        misses => misses.coalesce(1).sortWithinPartitions("a", "b")
          .withColumn("x", nextUdf()))
      val out = withX.select("a", "x")
      assert(diffSet(Persistence.runStatic(state, out)) == expected)
    }
    run(Seq((1, 2)), Set("1,1,1"))
    d.remove("1")
    run(Seq((1, 3)), Set("1,1,-1", "1,2,1"))
    run(Seq((2, 4)), Set("2,3,1"))
    d.remove("3")
    run(Nil, Set("2,3,-1"))
  }

  // ── forget / buffer across runs (test_persistence.py:758-852) ────────────

  test("persistence: _forget across runs (test_persistence.py:797 + :817 — " +
      "static and streaming vectors coincide)") {
    val state = tmp()
    def run(in: Seq[Int], expected: Set[String]): Unit = {
      val out = Persistence.forgetRun(state, in.toDF("t"), c => c + 10, "t")
      assert(diffSet(out) == expected)
    }
    run(Seq(1, 3, 11), Set("1,1", "3,1", "11,1"))
    run(Seq(15, 16), Set("1,-1", "15,1", "16,1"))
    run(Seq(6, 21), Set("3,-1", "21,1"))
    run(Seq(9, 10), Set("11,-1"))
    run(Seq(26), Set("26,1"))
    run(Seq(22), Set("15,-1", "16,-1", "22,1"))
  }

  test("persistence: _buffer across runs (test_persistence.py:758)") {
    val state = tmp()
    def run(in: Seq[Int], expected: Set[String]): Unit = {
      val out = Persistence.bufferRun(state, in.toDF("t"), c => c + 10, "t")
      assert(diffSet(out) == expected)
    }
    run(Seq(1, 3, 11), Set("1,1"))
    run(Seq(15, 16), Set("3,1"))
    run(Seq(6, 21), Set("6,1", "11,1"))
    run(Seq(9, 10), Set("9,1", "10,1"))
    run(Seq(26), Set("15,1", "16,1"))
  }

  test("memoize with keyCols a PROPER SUBSET of the input columns reuses " +
      "results without duplicate-column failures (r17 review pin)") {
    val memoDir = tmp()
    PersistenceFixtureSpec.udfCounter.set(0)
    val nextUdf = udf(() => PersistenceFixtureSpec.udfCounter.incrementAndGet())
    def run(rows: Seq[(Int, String)]): Map[Int, (String, Int)] = {
      val input = rows.toDF("a", "note") // memo key = a only; note rides along
      Persistence.memoize(memoDir, input, Seq("a"),
        misses => misses.coalesce(1).sortWithinPartitions("a")
          .withColumn("x", nextUdf()))
        .collect().map(r => r.getInt(0) -> (r.getString(1), r.getInt(2))).toMap
    }
    assert(run(Seq((1, "p"), (2, "q"))) == Map(1 -> ("p", 1), 2 -> ("q", 2)))
    // key 1 hits the memo (x stays 1) even though its non-key column changed
    assert(run(Seq((1, "P2"), (3, "r"))) == Map(1 -> ("P2", 1), 3 -> ("r", 3)))
  }
}

object PersistenceFixtureSpec {
  val udfCounter = new java.util.concurrent.atomic.AtomicInteger(0)
}

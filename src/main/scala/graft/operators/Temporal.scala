package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Pathway's temporal operator suite (SURVEY §2.2; reference
  * python/pathway/stdlib/temporal/) re-expressed on Spark.
  *
  * Batch forms live here; the streaming forms (watermarks, stateful kernels) in
  * graft.streaming. Timestamps are TIMESTAMP_NTZ columns; durations are Long
  * nanoseconds (µs-resolution effective — Spark's precision), matching the
  * reference's ns durations (src/engine/time.rs) as closely as Spark allows.
  *
  * Scale notes: every join here is an equi-join on (key [, bucket/window]) so the
  * planner gets a shuffle key — no broadcast-less cross products. The asof kernel
  * is the classic union+sort formulation: one shuffle + one sort per side, no
  * per-row lookups, skew-safe under AQE.
  */
object Temporal {

  /** ns-epoch Long → TIMESTAMP_NTZ, precision-safe (decimal division, not double —
    * post-2001 ns epochs exceed 2^53). For parquet TIMESTAMP(NANOS) columns read
    * with spark.sql.legacy.parquet.nanosAsLong=true. */
  def nsToTs(ns: Column): Column =
    timestamp_micros(floor(ns.cast("decimal(25,0)") / 1000).cast("long")).cast("timestamp_ntz")

  private def usOf(t: Column): Column = unix_micros(t.cast("timestamp_ltz"))
  private def usToTs(us: Column): Column = timestamp_micros(us).cast("timestamp_ntz")
  private def interval(durNs: Long): String = s"${durNs / 1000L} microseconds"

  // ───────────────────────── windowby (reference _window.py) ─────────────────────────

  /** Tumbling windows (_window.py:768): adds `w_start`/`w_end`. Native `window()`
    * — codegen'd assignment, no shuffle until the downstream groupBy.
    *
    * `origin` both ALIGNS windows (starts at origin + k·duration) and
    * TRUNCATES on the left: the reference drops windows starting before
    * the origin (_window.py:836 `filter(_pw_window_start >= origin)` —
    * pinned by test_tumbling_origin, where t=3 with origin=7 joins no
    * window); None (the default) aligns to epoch with no truncation. */
  def tumble(df: DataFrame, t: Column, durNs: Long, originNs: Option[Long] = None): DataFrame = {
    val dUs = durNs / 1000L
    val offUs = originNs.map(o => ((o / 1000L % dUs) + dUs) % dUs).getOrElse(0L)
    val w = window(t, interval(durNs), interval(durNs), s"$offUs microseconds")
    val base = df.withColumn("_w", w)
      .withColumn("w_start", col("_w.start").cast("timestamp_ntz"))
      .withColumn("w_end", col("_w.end").cast("timestamp_ntz"))
      .drop("_w")
    originNs.fold(base)(o => base.filter(usOf(col("w_start")) >= lit(o / 1000L)))
  }

  /** Start times of every sliding window [s, s+dur) containing `t`, for
    * arbitrary hop/duration/origin — including hop > duration, where a row
    * can fall in ZERO windows (the reference's sliding(hop=2, duration=1)
    * drops off-window rows entirely, even from outer window_joins —
    * test_window_joins.py sliding(2,1) vector). Microsecond longs. */
  private def windowStartsUs(t: Column, durNs: Long, hopNs: Long,
      originNs: Option[Long]): Column = {
    val all = windowStartsLong(usOf(t), durNs / 1000L, hopNs / 1000L,
      originNs.getOrElse(0L) / 1000L)
    // reference origin semantics: windows starting before it do not exist
    originNs.fold(all)(o => filter(all, s => s >= lit(o / 1000L)))
  }

  /** Start of every sliding window [s, s+dur) containing `t`, on an abstract
    * long grid (the reference accepts int or datetime times — _window.py's
    * get_windows enumerates starts s ≡ origin (mod hop) with t−dur < s ≤ t). */
  private def windowStartsLong(t: Column, dur: Long, hop: Long,
      origin: Long): Column = {
    val sMax = t - pmod(t - lit(origin), lit(hop)) // largest start ≤ t (pmod ≥ 0)
    val n = (dur + hop - 1) / hop // candidate windows per row
    filter(sequence(sMax - lit((n - 1) * hop), sMax, lit(hop)),
      s => t < s + lit(dur))
  }

  /** Sliding windows (_window.py:565): one row per (row, window) pair.
    * Native `window()` for overlapping windows (the codegen'd,
    * streaming-compatible path); the explicit start-enumeration when
    * hop > duration — Spark's native function rejects it, while the
    * reference allows it (rows between windows belong to NO window).
    * `origin` aligns and left-truncates exactly like [[tumble]]. */
  def slide(df: DataFrame, t: Column, durNs: Long, hopNs: Long,
      originNs: Option[Long] = None): DataFrame =
    if (hopNs <= durNs) {
      val hUs = hopNs / 1000L
      val offUs = originNs.map(o => ((o / 1000L % hUs) + hUs) % hUs).getOrElse(0L)
      val w = window(t, interval(durNs), interval(hopNs), s"$offUs microseconds")
      val base = df.withColumn("_w", w)
        .withColumn("w_start", col("_w.start").cast("timestamp_ntz"))
        .withColumn("w_end", col("_w.end").cast("timestamp_ntz"))
        .drop("_w")
      originNs.fold(base)(o => base.filter(usOf(col("w_start")) >= lit(o / 1000L)))
    } else { // explicit enumeration truncates at the origin itself
      df.withColumn("_ws",
          explode(windowStartsUs(t, durNs, hopNs, originNs)))
        .withColumn("w_start", usToTs(col("_ws")))
        .withColumn("w_end", usToTs(col("_ws") + lit(durNs / 1000L)))
        .drop("_ws")
    }

  /** Session windows (_window.py:501, gap-based): adds `s_start`/`s_end` per
    * instance. Batch formulation: boundary flag + running sum = session id —
    * two window passes over one (instance, t) sort; no native session_window
    * dependency so the same code path works for the custom-predicate variant.
    *
    * Gap boundary is STRICT: adjacent entries merge iff `next − cur <
    * max_gap` (_window.py:77), so a gap exactly equal to `max_gap` SPLITS —
    * the same rule as Spark's own streaming `session_window` (a session
    * spans [t, t + gap)). r15 decode: this code previously merged at
    * `gap == max_gap` and its spec pinned the divergence. */
  def sessionize(df: DataFrame, t: Column, gapNs: Long, instance: Seq[Column],
      predicate: Option[(Column, Column) => Column] = None): DataFrame = {
    val sortW = Window.partitionBy(instance: _*).orderBy(t)
    val prevT = lag(t, 1).over(sortW)
    val isBreak = predicate match {
      case Some(p) => !p(prevT, t) // custom merge predicate (reference predicate sessions)
      case None => (usOf(t) - usOf(prevT)) >= lit(gapNs / 1000L)
    }
    val flagged = df.withColumn("_brk",
      when(prevT.isNull, lit(1)).otherwise(isBreak.cast("int")))
    val sid = sum(col("_brk")).over(sortW.rowsBetween(Window.unboundedPreceding, 0))
    flagged.withColumn("_sid", sid).drop("_brk")
  }

  /** Batch analog of `common_behavior(delay, cutoff, keep_results)` over
    * sliding windows — the admission/cleanup rules decoded from the
    * reference's own streaming simulator
    * (tests/temporal/test_windows_stream.py generate_buffer_output):
    *
    *  - rows arrive in `arrival` order; the frontier `now` is the running
    *    max of event time INCLUDING the current row;
    *  - a (row, window) pair is FROZEN — dropped from the aggregate — iff
    *    `w_end + cutoff <= now` at its arrival (strict: `now` one below the
    *    threshold still admits). A pair late for one window still counts
    *    toward every not-yet-frozen window containing it;
    *  - `delay` buffers emission but never membership (the buffer flushes
    *    at end of stream), so it does not change the final aggregate —
    *    EXCEPT through the cleanup frontier below;
    *  - `keep_results=false` drops finished windows from the FINAL output:
    *    those with `w_end + cutoff <= max_global`, where the frontier
    *    max_global advances over both admitted event times and the
    *    buffer-flush thresholds `w_start + delay` of admitted pairs.
    *
    * `time`/`arrival` are Long grid columns (the fixtures use raw ints; µs
    * for timestamps). Output: one row per surviving window with `w_start`,
    * `w_end` and `aggs`. The running max is a single ordered pass — the
    * batch replay of the stream's total arrival order (the reference's
    * single-worker frontier); the production streaming path is
    * [[graft.streaming.StreamOps.withCutoff]], where Spark's global
    * watermark applies the same per-window freeze rule distributedly. */
  def windowBehaviorFinal(df: DataFrame, time: Column, arrival: Column,
      dur: Long, hop: Long, delay: Long, cutoff: Long,
      keepResults: Boolean)(aggs: Column*): DataFrame = {
    val flagged = windowBehaviorSurvival(df, time, arrival, dur, hop, delay,
      cutoff)(aggs: _*)
    if (keepResults) flagged.drop("kept_after_cleanup")
    else flagged.filter(col("kept_after_cleanup")).drop("kept_after_cleanup")
  }

  /** [[windowBehaviorFinal]]'s keep=true table plus a boolean
    * `kept_after_cleanup` marking which windows `keep_results=false` would
    * retain — one result that discriminates both the admission (freeze) and
    * the cleanup (flush-threshold frontier) rules. */
  def windowBehaviorSurvival(df: DataFrame, time: Column, arrival: Column,
      dur: Long, hop: Long, delay: Long, cutoff: Long)(aggs: Column*): DataFrame = {
    // The frontier excludes the current BATCH (equal-arrival rows): the
    // reference updates operator time only after a whole input batch
    // (temporal_behavior.py docstring; pinned by the asof same-batch
    // admission vector). A row's own time can never freeze its own windows
    // (w_end > t), so this matches the per-entry simulator exactly too.
    val ord = Window.orderBy(arrival).rangeBetween(Window.unboundedPreceding, -1)
    val admitted = df
      .withColumn("_now", coalesce(max(time).over(ord), lit(Long.MinValue)))
      .withColumn("w_start", explode(windowStartsLong(time, dur, hop, 0L)))
      .withColumn("w_end", col("w_start") + lit(dur))
      .filter(col("w_end") + lit(cutoff) > col("_now"))
    val out = admitted.groupBy("w_start", "w_end").agg(aggs.head, aggs.tail: _*)
    val frontier = admitted.agg(
      max(greatest(time, col("w_start") + lit(delay))).as("_mg"))
    out.join(broadcast(frontier), lit(true), "inner") // one-row scalar broadcast
      .withColumn("kept_after_cleanup", col("w_end") + lit(cutoff) > col("_mg"))
      .drop("_mg")
  }

  /** Per-side prev-batch frontier F(a) = max `t` over this side's rows with
    * arrival strictly before batch `a`, evaluated at every batch of the
    * union timeline `batches` (one `_a` column). Returns (_a, out). */
  private def frontierAt(side: DataFrame, t: Column, arrival: Column,
      batches: DataFrame, out: String): DataFrame = {
    val probes = batches.select(col("_a"), lit(null).cast("long").as("_t"),
      lit(1).as("_probe"))
    val events = side.select(arrival.as("_a"), t.cast("long").as("_t"),
      lit(0).as("_probe"))
    val w = Window.orderBy("_a").rangeBetween(Window.unboundedPreceding, -1)
    probes.unionByName(events)
      .withColumn(out, coalesce(max("_t").over(w), lit(Long.MinValue)))
      .filter(col("_probe") === 1).select(col("_a"), col(out))
  }

  /** Behavior'd interval join, batch analog — the co-aliveness rule decoded
    * from tests/temporal/test_interval_joins_stream.py against
    * temporal_behavior.py's apply_temporal_behavior (freeze + forget applied
    * per input side on its own time column):
    *
    *  - a pair (l, r) with r.t ∈ [l.t+lo, l.t+hi] (and `cond`) forms iff BOTH
    *    rows are alive at the LATER arrival: `t + cutoff > F_side(pairArr)`
    *    where F_side is that side's max input time over strictly earlier
    *    batches (this one rule subsumes each row's own admission — frontiers
    *    only grow);
    *  - `keep_results=true` SHIELDS formed pairs from later input forgetting
    *    (the reference marks forgetting records and filters their effects
    *    out of the join output, _interval_join.py:451);
    *  - `keep_results=false` lets the retraction through: only pairs whose
    *    BOTH rows outlive the final inclusive frontier survive;
    *  - `delay` buffers emission, never membership (flushed at end).
    *
    * `lt`/`rt` are Long grid columns; arrivals are the batch clock (the
    * fixture's __time__). Inner pairs only (the fixture's select shape).
    * Replay analog — the production streaming path is watermarked
    * [[graft.streaming.StreamOps]] kernels; this pins the reference's exact
    * accept/forget boundaries for specs and oracles. */
  def intervalJoinBehavior(left: DataFrame, right: DataFrame,
      lt: Column, rt: Column, lArr: Column, rArr: Column,
      lo: Long, hi: Long, cutoff: Long, keepResults: Boolean,
      keys: Seq[(String, String)] = Nil): DataFrame = {
    val l = left.select(struct(left.columns.map(col): _*).as("_lrow"),
      lt.cast("long").as("_lt"), lArr.cast("long").as("_la"))
    val r = right.select(struct(right.columns.map(col): _*).as("_rrow"),
      rt.cast("long").as("_rt"), rArr.cast("long").as("_ra"))
    val batches = l.select(col("_la").as("_a"))
      .unionByName(r.select(col("_ra").as("_a"))).distinct()
    val fL = frontierAt(left, lt, lArr, batches, "_fl")
    val fR = frontierAt(right, rt, rArr, batches, "_fr")
    val joinCond = keys.map { case (a, b) =>
      col(s"_lrow.$a") === col(s"_rrow.$b") }
      .foldLeft(col("_rt").between(col("_lt") + lit(lo), col("_lt") + lit(hi)))(_ && _)
    val pairs = l.join(r, joinCond)
      .withColumn("_pa", greatest(col("_la"), col("_ra")))
      .join(fL, col("_pa") === fL("_a")).drop("_a")
      .join(fR, col("_pa") === fR("_a")).drop("_a")
      .filter(col("_lt") + lit(cutoff) > col("_fl") &&
        col("_rt") + lit(cutoff) > col("_fr"))
    val alive = if (keepResults) pairs else {
      val fin = l.agg(max("_lt").as("_flEnd"))
        .join(broadcast(r.agg(max("_rt").as("_frEnd"))), lit(true), "inner")
      pairs.join(broadcast(fin), lit(true), "inner") // one-row scalar broadcast
        .filter(col("_lt") + lit(cutoff) > col("_flEnd") &&
          col("_rt") + lit(cutoff) > col("_frEnd"))
    }
    alive.select(col("_lrow").as("left"), col("_rrow").as("right"))
  }

  /** Behavior'd asof_join_left, batch analog (tests/temporal/
    * test_asof_joins_stream.py): admitted lefts (alive at own arrival under
    * the per-side freeze rule — a frozen QUERY row disappears entirely, it
    * does not even emit unmatched) match the best right `rt ≤ lt` among
    * rights CO-ALIVE with them at the later arrival; `keep_results=false`
    * refilters both sides by the final inclusive frontier (forgetting a
    * matched right under keep=true is shielded and never re-matches).
    * Unmatched admitted lefts keep a null right. Tie on rt: smallest right
    * arrival, then input order (the fixtures use distinct rts). */
  def asofJoinBehaviorLeft(left: DataFrame, right: DataFrame,
      lt: Column, rt: Column, lArr: Column, rArr: Column,
      cutoff: Long, keepResults: Boolean): DataFrame = {
    // unique per-row id (batch, in-batch rank) — identical payloads may
    // repeat across batches (the fixtures replay the same values late)
    val idw = Window.partitionBy("_la").orderBy("_lrow")
    val l0 = left.select(struct(left.columns.map(col): _*).as("_lrow"),
      lt.cast("long").as("_lt"), lArr.cast("long").as("_la"))
      .withColumn("_lid", struct(col("_la"), row_number().over(idw)))
    val r0 = right.select(struct(right.columns.map(col): _*).as("_rrow"),
      rt.cast("long").as("_rt"), rArr.cast("long").as("_ra"))
    val ordL = Window.orderBy("_la").rangeBetween(Window.unboundedPreceding, -1)
    val ordR = Window.orderBy("_ra").rangeBetween(Window.unboundedPreceding, -1)
    val finL = l0.agg(max("_lt").as("_flEnd"))
    val finR = r0.agg(max("_rt").as("_frEnd"))
    def endFilter(adm: DataFrame, t: String, fin: DataFrame, f: String): DataFrame =
      if (keepResults) adm
      else adm.join(broadcast(fin), lit(true), "inner") // one-row scalar broadcast
        .filter(col(t) + lit(cutoff) > col(f)).drop(f)
    val lAdm = endFilter(
      l0.withColumn("_f", coalesce(max("_lt").over(ordL), lit(Long.MinValue)))
        .filter(col("_lt") + lit(cutoff) > col("_f")).drop("_f"),
      "_lt", finL, "_flEnd")
    val rAdm = endFilter(
      r0.withColumn("_f", coalesce(max("_rt").over(ordR), lit(Long.MinValue)))
        .filter(col("_rt") + lit(cutoff) > col("_f")).drop("_f"),
      "_rt", finR, "_frEnd")
    val batches = l0.select(col("_la").as("_a"))
      .unionByName(r0.select(col("_ra").as("_a"))).distinct()
    val fL = frontierAt(left, lt, lArr, batches, "_fl")
    val fR = frontierAt(right, rt, rArr, batches, "_fr")
    val cand = lAdm.join(rAdm, col("_rt") <= col("_lt"))
      .withColumn("_pa", greatest(col("_la"), col("_ra")))
      .join(fL, col("_pa") === fL("_a")).drop("_a")
      .join(fR, col("_pa") === fR("_a")).drop("_a")
      .filter(col("_lt") + lit(cutoff) > col("_fl") &&
        col("_rt") + lit(cutoff) > col("_fr"))
      .withColumn("_rk", row_number().over(
        Window.partitionBy("_lid").orderBy(col("_rt").desc, col("_ra").asc)))
      .filter(col("_rk") === 1)
      .select(col("_lid").as("_k"), col("_rrow").as("right"))
    lAdm.select(col("_lrow").as("left"), col("_lid"))
      .join(cand, col("_lid") === col("_k"), "left").drop("_k", "_lid")
  }

  // ── behavior primitives _freeze/_forget/_buffer — changelog replay analogs
  //    (tests/temporal/test_operators.py; engine forget/buffer operators).
  //    These reproduce the reference's exact DiffEntry streams batch-side:
  //    (payload…, time, diff) out, with `arrival` as the batch clock. The
  //    production streaming forms are StreamOps.withCutoff / ignoreLate /
  //    delayKernel (watermark-driven); these pin the reference's timing. ──────

  /** Global-batch timeline × per-instance frontiers of `_t`: for every
    * (instance `_i`, batch `_a`) pair, `_fx` = max time over the instance's
    * strictly earlier batches, `_fi` = the same including the batch itself.
    * Replay-scale helper (instances × batches grid). */
  private def instanceFrontierGrid(events: DataFrame): DataFrame = {
    val probes = events.select(col("_i")).distinct()
      .join(events.select(col("_a")).distinct(), lit(true), "inner")
      .select(col("_i"), col("_a"), lit(null).cast("long").as("_t"),
        lit(1).as("_p"))
    val evs = events.select(col("_i"), col("_a"), col("_t"), lit(0).as("_p"))
    val wx = Window.partitionBy("_i").orderBy("_a")
      .rangeBetween(Window.unboundedPreceding, -1)
    val wi = Window.partitionBy("_i").orderBy("_a")
      .rangeBetween(Window.unboundedPreceding, 0)
    probes.unionByName(evs)
      .withColumn("_fx", coalesce(max("_t").over(wx), lit(Long.MinValue)))
      .withColumn("_fi", coalesce(max("_t").over(wi), lit(Long.MinValue)))
      .filter(col("_p") === 1).select("_i", "_a", "_fx", "_fi")
  }

  /** Rows → (_row payload struct, _t, _th, _a, _d, _i) normal form. The
    * payload EXCLUDES the arrival/diff metadata columns — retraction pairing
    * and the output schema are payload-only, like the reference's DiffEntry
    * (values, time, diff). */
  private def behaviorBase(df: DataFrame, time: Column, threshold: Column,
      arrivalCol: String, diffCol: Option[String], instance: Seq[Column]): DataFrame = {
    val payload = df.columns.filterNot(c => c == arrivalCol || diffCol.contains(c))
    df.select(struct(payload.map(col): _*).as("_row"),
      time.cast("long").as("_t"), threshold.cast("long").as("_th"),
      col(arrivalCol).cast("long").as("_a"),
      diffCol.map(col).getOrElse(lit(1)).cast("int").as("_d"),
      struct(instance: _*).as("_i"))
  }

  /** Pair upstream retractions (_d<0) to inserts (_d>0) by (instance,
    * payload, arrival rank) — the reference pairs by row id; equal-payload
    * rows are interchangeable in the multiset view the fixtures assert. */
  private def pairRetractions(base: DataFrame): (DataFrame, DataFrame) = {
    val rw = Window.partitionBy(col("_i"), col("_row"),
      signum(col("_d"))).orderBy("_a")
    val ranked = base.withColumn("_rn", row_number().over(rw))
    (ranked.filter(col("_d") > 0),
      ranked.filter(col("_d") < 0)
        .select(col("_i").as("_ri"), col("_row").as("_rrow"),
          col("_a").as("_ua"), col("_rn").as("_rrn")))
  }

  /** `_freeze(threshold, time [, instance])` (test_freeze_*, public
    * `ignore_late`): drop rows whose threshold trails the per-instance
    * EXCLUSIVE (prev-batch) frontier at arrival; survivors pass unchanged. */
  def freezeReplay(df: DataFrame, time: Column, threshold: Column,
      arrival: Column, instance: Seq[Column] = Nil): DataFrame = {
    val w = Window.partitionBy(instance: _*).orderBy(arrival)
      .rangeBetween(Window.unboundedPreceding, -1)
    df.withColumn("_fx", coalesce(max(time.cast("long")).over(w), lit(Long.MinValue)))
      .filter(threshold.cast("long") > col("_fx")).drop("_fx")
  }

  /** `_forget(threshold, time [, instance])` (test_forget_*): emits the kept
    * inserts at their arrival plus a retraction at the FIRST global batch
    * whose per-instance EXCLUSIVE frontier reaches the threshold (the engine
    * forgets on the next operator step after the frontier passes — possibly
    * a batch where the instance itself has no rows). Late inserts (threshold
    * ≤ frontier at arrival) are dropped silently — so are upstream
    * retractions of dropped or already-forgotten rows; an upstream
    * retraction of a still-alive row passes through and cancels the
    * scheduled forget. Output: payload columns + `time` + `diff`. */
  def forgetReplay(df: DataFrame, time: Column, threshold: Column,
      arrivalCol: String, diffCol: Option[String] = None,
      instance: Seq[Column] = Nil): DataFrame = {
    val base = behaviorBase(df, time, threshold, arrivalCol, diffCol, instance)
    val grid = instanceFrontierGrid(base)
    val (ins, rets) = pairRetractions(base)
    val kept = ins.join(grid.select(col("_i").as("_gi"), col("_a").as("_ga"),
        col("_fx")), col("_i") === col("_gi") && col("_a") === col("_ga"))
      .filter(col("_th") > col("_fx")).drop("_gi", "_ga", "_fx")
    val forgetB = kept.join(grid.select(col("_i").as("_gi"), col("_a").as("_ga"),
        col("_fx")), col("_i") === col("_gi") && col("_fx") >= col("_th"), "left")
      .groupBy(col("_i"), col("_row"), col("_a"), col("_rn"))
      .agg(min(col("_ga")).as("_fb"))
    val withRet = forgetB.join(rets, col("_i") === col("_ri") &&
        col("_row") === col("_rrow") && col("_rn") === col("_rrn"), "left")
      .withColumn("_rt", least(col("_fb"), col("_ua")))
    val inserts = withRet.select(col("_row"), col("_a").as("time"), lit(1).as("diff"))
    val retracts = withRet.filter(col("_rt").isNotNull)
      .select(col("_row"), col("_rt").as("time"), lit(-1).as("diff"))
    inserts.unionByName(retracts).select(col("_row.*"), col("time"), col("diff"))
  }

  /** `_buffer(threshold, time [, instance])` (test_buffer_*, public
    * `buffer`/delay): holds each insert until the FIRST batch ≥ its arrival
    * whose per-instance INCLUSIVE (post-batch) frontier reaches the
    * threshold — note the asymmetry with forget/freeze, which use the
    * exclusive frontier; never-released rows flush at end of stream
    * (Long.MaxValue stands in for the reference's u64::MAX−2 stamp). An
    * upstream retraction arriving at or before the release cancels the row
    * silently; after it, both sides pass through. */
  def bufferReplay(df: DataFrame, time: Column, threshold: Column,
      arrivalCol: String, diffCol: Option[String] = None,
      instance: Seq[Column] = Nil): DataFrame = {
    val base = behaviorBase(df, time, threshold, arrivalCol, diffCol, instance)
    val grid = instanceFrontierGrid(base)
    val (ins, rets) = pairRetractions(base)
    val release = ins.join(grid.select(col("_i").as("_gi"), col("_a").as("_ga"),
        col("_fi")), col("_i") === col("_gi") && col("_fi") >= col("_th") &&
        col("_ga") >= col("_a"), "left")
      .groupBy(col("_i"), col("_row"), col("_a"), col("_rn"))
      .agg(coalesce(min(col("_ga")), lit(Long.MaxValue)).as("_rel"))
    val withRet = release.join(rets, col("_i") === col("_ri") &&
      col("_row") === col("_rrow") && col("_rn") === col("_rrn"), "left")
    val live = withRet.filter(col("_ua").isNull || col("_ua") > col("_rel"))
    val inserts = live.select(col("_row"), col("_rel").as("time"), lit(1).as("diff"))
    val retracts = live.filter(col("_ua").isNotNull)
      .select(col("_row"), col("_ua").as("time"), lit(-1).as("diff"))
    inserts.unionByName(retracts).select(col("_row.*"), col("time"), col("diff"))
  }

  /** intervals_over (_window.py:699): for each row of `at`, aggregate `data` rows
    * with data.t ∈ [at.t + loNs, at.t + hiNs] (and equal instance keys). Plain
    * range join — with the instance equi-key the planner shuffles on it.
    * `isOuter` (reference default true) keeps probes with an empty window
    * (null data side); false omits them (test_intervals_over vector drops
    * the probe at t=6 entirely). */
  def intervalsOver(at: DataFrame, data: DataFrame, atT: Column, dataT: Column,
      loNs: Long, hiNs: Long, cond: Column, isOuter: Boolean = true): DataFrame = {
    val lo = usOf(atT) + lit(loNs / 1000L)
    val hi = usOf(atT) + lit(hiNs / 1000L)
    at.join(data, cond && usOf(dataT).between(lo, hi),
      if (isOuter) "left_outer" else "inner")
  }

  // ───────────────────── interval_join (_interval_join.py:577) ─────────────────────

  /** interval_join: pairs (l, r) with r.t − l.t ∈ [loNs, hiNs] and matching keys.
    * `how`: inner|left|right|full (outer variants keep unmatched rows). The key
    * equi-condition makes this a shuffled equi-join with a range residual; for
    * key-less use at scale, bucket both sides first (bucketizeForIntervalJoin). */
  def intervalJoin(l: DataFrame, r: DataFrame, lt: Column, rt: Column,
      loNs: Long, hiNs: Long, keys: Column, how: String = "inner"): DataFrame = {
    // the reference rejects an empty interval at construction (ValueError
    // for interval(1, 0) — test_interval_join_negative_time_errors)
    require(loNs <= hiNs,
      s"interval lower bound ($loNs ns) must not exceed upper bound ($hiNs ns)")
    val cond = keys &&
      (usOf(rt) >= usOf(lt) + lit(loNs / 1000L)) &&
      (usOf(rt) <= usOf(lt) + lit(hiNs / 1000L))
    l.join(r, cond, how match {
      case "left" => "left_outer"; case "right" => "right_outer"
      case "full" | "outer" => "full_outer"; case h => h
    })
  }

  /** Key-less interval joins at scale: equi-join on time buckets of width
    * (hi−lo), neighbor buckets unioned — the same bucketing idea the reference
    * uses (_interval_join.py:287 _NonZeroDifferenceIntervalJoinResult). */
  def bucketCol(t: Column, widthNs: Long): Column = {
    val us = usOf(t)
    (us - pmod(us, lit(widthNs / 1000L))).cast("long")
  }

  /** Key-less interval join via time-bucket equi-join: each left row is
    * replicated into the buckets its window [lt+lo, lt+hi] can touch
    * (⌈(hi−lo)/width⌉+1 of width hi−lo), the right side is bucketed once, and
    * the pair condition is re-checked exactly. Shuffles on the bucket instead
    * of cross-joining — the reference's bucketing scheme
    * (_interval_join.py:287) expressed as explode + equi-join. */
  def intervalJoinKeyless(l: DataFrame, r: DataFrame, lt: Column, rt: Column,
      loNs: Long, hiNs: Long): DataFrame = {
    val widthNs = math.max(hiNs - loNs, 1000L)
    val widthUs = widthNs / 1000L
    val lLoUs = usOf(lt) + lit(loNs / 1000L)
    val lB = l.withColumn("_bucket",
      explode(sequence(
        (lLoUs - pmod(lLoUs, lit(widthUs))).cast("long"),
        usOf(lt) + lit(hiNs / 1000L), lit(widthUs))))
    val rB = r.withColumn("_bucket", bucketCol(rt, widthNs))
    lB.join(rB, Seq("_bucket"))
      .filter(usOf(rt) >= usOf(lt) + lit(loNs / 1000L) &&
        usOf(rt) <= usOf(lt) + lit(hiNs / 1000L))
      .drop("_bucket")
  }

  // ─────────────────────── asof_join (_asof_join.py:481) ───────────────────────

  /** Distributed as-of join: for each left row, the latest (direction=backward) /
    * earliest (forward) / closest (nearest) right row per key, ties inclusive.
    *
    * Kernel: union both sides tagged, one sort per key by (t, side), then a
    * running `last(_, ignoreNulls)` window carries the current right row to each
    * left row — O(n log n) per partition, single shuffle, no point lookups.
    * (The reference builds the same sorted prev/next structure via
    * _asof_join.py:40 _build_groups.)
    *
    * @param rPayload right columns to carry (renamed as given)
    * @param how inner = drop unmatched left rows; left = keep (nulls)
    */
  def asofJoin(l: DataFrame, r: DataFrame, lt: Column, rt: Column,
      lKey: Column, rKey: Column, rPayload: Seq[(String, Column)],
      direction: String = "backward", how: String = "left"): DataFrame = {
    val lStruct = struct(l.columns.map(l(_)): _*)
    val lType = l.select(lStruct.as("s")).schema("s").dataType
    val rStruct = struct(rPayload.map { case (n, c) => c.as(n) }: _*)
    val rType = r.select(rStruct.as("s")).schema("s").dataType

    val lSide = l.select(lKey.as("_k"), usOf(lt).as("_t"), lit(1).as("_isL"),
      lStruct.as("_lrow"), lit(null).cast(rType).as("_rrow"))
    val rSide = r.select(rKey.as("_k"), usOf(rt).as("_t"), lit(0).as("_isL"),
      lit(null).cast(lType).as("_lrow"), rStruct.as("_rrow"))

    // ties inclusive: rights sort before lefts at equal t (the reference's
    // make_sort_key right_first for how=LEFT; FULL-mode asymmetric ties
    // live in [[asofJoinFull]]'s own merged pass);
    // forward: mirror time so the same running-last kernel applies
    val unioned = lSide.unionByName(rSide)
    val tOrd = direction match {
      case "backward" => col("_t")
      case "forward" => col("_t") * -1
      case d => throw new IllegalArgumentException(s"direction $d (nearest: asofNearest)")
    }
    val w = Window.partitionBy(col("_k")).orderBy(tOrd, col("_isL"))
      .rowsBetween(Window.unboundedPreceding, 0)
    val matched = unioned
      .withColumn("_rmatch", last(col("_rrow"), ignoreNulls = true).over(w))
      .filter(col("_isL") === 1)
    val kept = if (how == "inner") matched.filter(col("_rmatch").isNotNull) else matched
    val flat = kept.select(col("_lrow.*"), col("_rmatch"))
    rPayload.foldLeft(flat)((d, nc) => d.withColumn(nc._1, col(s"_rmatch.${nc._1}")))
      .drop("_rmatch")
  }

  /** asof_join how=RIGHT (reference JoinMode.RIGHT, pinned by its
    * test_more_asof_right vector): one row per RIGHT row, paired with the
    * latest (backward) / earliest (forward) LEFT at its sync time, ties
    * inclusive; unmatched rights kept with null left payload. A pure
    * mirror of [[asofJoin]] with the roles swapped. */
  def asofJoinRight(l: DataFrame, r: DataFrame, lt: Column, rt: Column,
      lKey: Column, rKey: Column, lPayload: Seq[(String, Column)],
      direction: String = "backward"): DataFrame =
    asofJoin(r, l, rt, lt, rKey, lKey, lPayload, direction, "left")

  /** asof_join how=FULL/OUTER (reference JoinMode.OUTER, pinned by its
    * test_asof_full vector): every row from BOTH sides, each paired with
    * the nearest other-side row in its direction within the merged
    * (t, side, id) order — lefts precede rights at an exact tie
    * (make_sort_key right_first=False), so a backward LEFT-driven match is
    * strictly earlier while the RIGHT-driven row sees the equal-time left
    * (and mirrored for forward). Output: `side` (false = left-driven row,
    * true = right-driven), `_k` (instance), `_t` (the driving row's sync
    * value, original type), and lPayload ∪ rPayload with nulls where the
    * driving side had no match.
    *
    * ONE union + ONE per-key sort, like the reference's single merged
    * table: in the (t, lefts-before-rights) order a running
    * last-non-null of each side's payload simultaneously yields the
    * left-driven match (equal-time rights sort after the left — strictly
    * earlier for backward) and the right-driven match (equal-time lefts
    * sort before the right — inclusive); every input row emits exactly
    * one output row. Forward mirrors both the time and the tie order. */
  def asofJoinFull(l: DataFrame, r: DataFrame, lt: Column, rt: Column,
      lKey: Column, rKey: Column, lPayload: Seq[(String, Column)],
      rPayload: Seq[(String, Column)],
      direction: String = "backward"): DataFrame = {
    val lNames = lPayload.map(_._1); val rNames = rPayload.map(_._1)
    val reserved = Set("_k", "_t", "side", "_lv", "_rv")
    require((lNames ++ rNames).distinct.size == lNames.size + rNames.size &&
      (lNames ++ rNames).forall(!reserved(_)),
      s"asofJoinFull payload names must be distinct and not $reserved: " +
        s"left=$lNames right=$rNames")
    val lStruct = struct(lPayload.map { case (n, c) => c.as(n) }: _*)
    val rStruct = struct(rPayload.map { case (n, c) => c.as(n) }: _*)
    val lType = l.select(lStruct.as("s")).schema("s").dataType
    val rType = r.select(rStruct.as("s")).schema("s").dataType
    val lSide = l.select(lKey.as("_k"), lt.as("_traw"), usOf(lt).as("_t"),
      lit(1).as("_isL"), lStruct.as("_lrow"), lit(null).cast(rType).as("_rrow"))
    val rSide = r.select(rKey.as("_k"), rt.as("_traw"), usOf(rt).as("_t"),
      lit(0).as("_isL"), lit(null).cast(lType).as("_lrow"), rStruct.as("_rrow"))
    val (tOrd, tieOrd) = direction match {
      case "backward" => (col("_t"), col("_isL") * -1) // lefts first at ties
      case "forward" => (col("_t") * -1, col("_isL")) // mirrored: rights first
      case d => throw new IllegalArgumentException(s"direction $d")
    }
    // deterministic final key among SAME-side rows sharing a timestamp:
    // without it, last(..., ignoreNulls) picks a partition-order-dependent
    // payload for the matched peer (the reference's make_sort_key ends in
    // the row id). A value hash is stable across runs/partitionings; rows
    // it still ties on carry identical payloads, where the pick is moot.
    val dupOrd = xxhash64(col("_lrow"), col("_rrow"))
    val w = Window.partitionBy(col("_k")).orderBy(tOrd, tieOrd, dupOrd)
      .rowsBetween(Window.unboundedPreceding, 0)
    // the frame includes the current row and own-side structs are never
    // null, so at an own-side row the running last IS the row's own
    // payload — no conditional needed
    val matched = lSide.unionByName(rSide)
      .select(col("_k"), col("_traw").as("_t"), (col("_isL") === 0).as("side"),
        last(col("_lrow"), ignoreNulls = true).over(w).as("_lv"),
        last(col("_rrow"), ignoreNulls = true).over(w).as("_rv"))
    val withL = lPayload.foldLeft(matched)((d, nc) =>
      d.withColumn(nc._1, col("_lv").getField(nc._1)))
    rPayload.foldLeft(withL)((d, nc) =>
      d.withColumn(nc._1, col("_rv").getField(nc._1)))
      .drop("_lv", "_rv")
  }

  /** direction=NEAREST: backward + forward pass, keep the closer match. An
    * exact-distance tie goes FORWARD: the reference picks prev only on
    * strict `cur_t - prev_t < next_t - cur_t` (_asof_join.py:312, pinned by
    * its test_asof_left_nearest vector — left 80 with rights {70, 90} at
    * distance 10 each resolves to 90).
    * Name-based args: the second pass runs on the first pass's output, so
    * resolved attributes from `l` would not survive. */
  def asofNearest(l: DataFrame, r: DataFrame, ltName: String, rtName: String,
      lKeyName: String, rKeyName: String, rPayload: Seq[(String, Column)]): DataFrame = {
    val payloadB = (rPayload :+ (rtName -> col(rtName))).map { case (n, c) => s"_b_$n" -> c }
    val payloadF = (rPayload :+ (rtName -> col(rtName))).map { case (n, c) => s"_f_$n" -> c }
    val back = asofJoin(l, r, col(ltName), col(rtName), col(lKeyName), r(rKeyName),
      payloadB, "backward", "left")
    val both = asofJoin(back, r, col(ltName), col(rtName), col(lKeyName), r(rKeyName),
      payloadF, "forward", "left")
    val lt = col(ltName); val bt = col(s"_b_$rtName"); val ft = col(s"_f_$rtName")
    val useBack = bt.isNotNull && (ft.isNull || (usOf(lt) - usOf(bt)) < (usOf(ft) - usOf(lt)))
    val out = rPayload.foldLeft(both)((d, nc) =>
      d.withColumn(nc._1, when(useBack, col(s"_b_${nc._1}")).otherwise(col(s"_f_${nc._1}"))))
    out.drop((payloadB.map(_._1) ++ payloadF.map(_._1)): _*)
  }

  // ───────────────────── window_join (_window_join.py:156) ─────────────────────

  /** window_join: both sides assigned tumbling windows; join on (window, keys).
    * `w_start`/`w_end` survive for BOTH sides' rows — an unmatched right in
    * right/outer modes carries its own window, not nulls (r15 review). */
  def windowJoin(l: DataFrame, r: DataFrame, lt: Column, rt: Column,
      durNs: Long, keys: Column, how: String = "inner"): DataFrame = {
    val lw = tumble(l, lt, durNs)
    val rw = tumble(r, rt, durNs)
      .withColumnRenamed("w_start", "w_start_r").withColumnRenamed("w_end", "w_end_r")
    lw.join(rw, keys && col("w_start") === col("w_start_r"), joinMode(how))
      .withColumn("w_start", coalesce(col("w_start"), col("w_start_r")))
      .withColumn("w_end", coalesce(col("w_end"), col("w_end_r")))
      .drop("w_start_r", "w_end_r")
  }

  private def joinMode(how: String): String = how match {
    case "left" => "left_outer"; case "right" => "right_outer"
    case "full" | "outer" => "full_outer"; case h => h
  }

  /** window_join over SLIDING windows (reference window_join with
    * pw.temporal.sliding, _window.py:256 _SlidingWindow._join): each row
    * expands to one row per containing window, and the sides equi-join on
    * (window start, keys) — so a pair matching in k overlapping windows
    * yields k output rows, unmatched (row, window) pairs survive outer
    * modes per WINDOW, and with hop > duration a row between windows is
    * dropped even from outer joins (all pinned by the reference's
    * test_window_join_time_only vectors). Shuffles on (window, keys) —
    * the window replication factor is ⌈duration/hop⌉, a constant. */
  def slidingWindowJoin(l: DataFrame, r: DataFrame, lt: Column, rt: Column,
      durNs: Long, hopNs: Long, keys: Column, how: String = "inner",
      originNs: Option[Long] = None): DataFrame = {
    val lw = l.withColumn("_ws", explode(windowStartsUs(lt, durNs, hopNs, originNs)))
    val rw = r.withColumn("_ws_r", explode(windowStartsUs(rt, durNs, hopNs, originNs)))
    lw.join(rw, keys && col("_ws") === col("_ws_r"), joinMode(how))
      .withColumn("w_start", usToTs(coalesce(col("_ws"), col("_ws_r"))))
      .withColumn("w_end", usToTs(coalesce(col("_ws"), col("_ws_r")) + lit(durNs / 1000L)))
      .drop("_ws", "_ws_r")
  }

  /** window_join over SESSION windows (reference _window.py:186
    * _SessionWindow._join, pinned by test_session_window_join_time_only):
    * session groups are computed over the UNION of both sides' times per
    * join key (strict `next − cur < max_gap` merge, or a custom
    * predicate), each row is assigned its merged session, and the sides
    * equi-join on (key, session) with the requested mode. Output: `_k`,
    * `s_start`/`s_end` (the merged session's min/max time), and the
    * payloads (nulls on the unmatched side in outer modes).
    *
    * Scale shape: one (key, t) sort for the union sessionization, then a
    * shuffled equi-join on (key, session) — session windows are
    * inherently sequential per key (the reference sorts per instance the
    * same way); keyless use puts everything in one sort partition, same
    * as the reference's instance-less sessions. */
  def sessionWindowJoin(l: DataFrame, r: DataFrame, lt: Column, rt: Column,
      gapNs: Long, lKey: Column, rKey: Column,
      lPayload: Seq[(String, Column)], rPayload: Seq[(String, Column)],
      how: String = "inner",
      predicate: Option[(Column, Column) => Column] = None): DataFrame = {
    val lNames = lPayload.map(_._1); val rNames = rPayload.map(_._1)
    val reserved = Set("_k", "_sid", "s_start", "s_end", "_lrow", "_rrow")
    require((lNames ++ rNames).distinct.size == lNames.size + rNames.size &&
      (lNames ++ rNames).forall(!reserved(_)),
      s"sessionWindowJoin payload names must be distinct and not $reserved: " +
        s"left=$lNames right=$rNames")
    val lStruct = struct(lPayload.map { case (n, c) => c.as(n) }: _*)
    val rStruct = struct(rPayload.map { case (n, c) => c.as(n) }: _*)
    val lType = l.select(lStruct.as("s")).schema("s").dataType
    val rType = r.select(rStruct.as("s")).schema("s").dataType
    val lSide = l.select(lKey.as("_k"), lt.as("_t"), lit(1).as("_isL"),
      lStruct.as("_lrow"), lit(null).cast(rType).as("_rrow"))
    val rSide = r.select(rKey.as("_k"), rt.as("_t"), lit(0).as("_isL"),
      lit(null).cast(lType).as("_lrow"), rStruct.as("_rrow"))
    val sess = sessionize(lSide.unionByName(rSide), col("_t"), gapNs,
      Seq(col("_k")), predicate)
    val bounds = Window.partitionBy(col("_k"), col("_sid"))
    val withB = sess
      .withColumn("s_start", min(col("_t")).over(bounds))
      .withColumn("s_end", max(col("_t")).over(bounds))
    val ls = withB.filter(col("_isL") === 1)
      .select(col("_k"), col("_sid"), col("s_start"), col("s_end"), col("_lrow"))
    val rs = withB.filter(col("_isL") === 0)
      .select(col("_k").as("_kr"), col("_sid").as("_sidr"),
        col("s_start").as("_ss_r"), col("s_end").as("_se_r"), col("_rrow"))
    // Null-safe on the key: sessionize groups null-key rows from BOTH sides
    // into one merged session (Window.partitionBy puts nulls in one
    // partition), and the reference's engine joins None instances by value
    // equality — a plain `===` would sessionize them together yet never
    // match them, leaving outer-mode rows carrying session bounds merged
    // with counterparts they could not join. `<=>` keys still plan as a
    // shuffled equi-join (EqualNullSafe is a supported hash-join key).
    val joined = ls.join(rs,
      col("_k") <=> col("_kr") && col("_sid") === col("_sidr"), joinMode(how))
    val withL = lPayload.foldLeft(joined)((d, nc) =>
      d.withColumn(nc._1, col("_lrow").getField(nc._1)))
    rPayload.foldLeft(withL)((d, nc) =>
      d.withColumn(nc._1, col("_rrow").getField(nc._1)))
      .withColumn("_k", coalesce(col("_k"), col("_kr")))
      .withColumn("s_start", coalesce(col("s_start"), col("_ss_r")))
      .withColumn("s_end", coalesce(col("s_end"), col("_se_r")))
      .drop("_kr", "_sidr", "_sid", "_lrow", "_rrow", "_ss_r", "_se_r")
  }

  // ───────────── interpolate (stdlib/statistical/_interpolate.py:56) ─────────────

  /** Linear interpolation of nulls in `v` along `t` per instance. Endpoints clamp
    * to the nearest known value (reference mode=LINEAR). */
  def interpolate(t: Column, v: Column, instance: Seq[Column]): Column = {
    val wPrev = Window.partitionBy(instance: _*).orderBy(t)
      .rowsBetween(Window.unboundedPreceding, -1)
    // "next non-null" as a RUNNING frame over the REVERSED order: identical
    // value to first(ignoreNulls) over [+1, unboundedFollowing) on the
    // ascending order (the last frame row in t-descending order before the
    // current row IS the nearest later timestamp), but Spark evaluates an
    // UnboundedFollowing frame by rebuilding the aggregate from scratch per
    // row — O(rows²) per instance, a scale hazard on long per-instance
    // histories — while the unboundedPreceding form is the O(rows) running
    // frame (r20, guide §1.2 first-principles). Costs one extra in-partition
    // sort (same single exchange: identical partition keys).
    val wNext = Window.partitionBy(instance: _*).orderBy(t.desc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val pv = last(v, ignoreNulls = true).over(wPrev)
    val pt = last(when(v.isNotNull, usOf(t)), ignoreNulls = true).over(wPrev)
    val nv = last(v, ignoreNulls = true).over(wNext)
    val nt = last(when(v.isNotNull, usOf(t)), ignoreNulls = true).over(wNext)
    when(v.isNotNull, v)
      .when(pv.isNull, nv)
      .when(nv.isNull, pv)
      .otherwise(pv + (nv - pv) * (usOf(t) - pt).cast("double") / (nt - pt).cast("double"))
  }
}

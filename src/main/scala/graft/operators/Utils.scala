package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** stdlib utils (reference python/pathway/stdlib/utils/):
  * unpack_col (col.py:14), argmax_rows/argmin_rows (filtering.py:8/20),
  * groupby_reduce_majority (col.py:309), plus gradual_broadcast
  * (engine dataflow.rs:2512) in its batch form. */
object Utils {

  /** xpacks combine_metadata (xpacks/llm/utils.py:5; r16 decode of
    * tests/test_metadata.py): when `fromColumn` holds a (text, metadata)
    * pair, move the pair's metadata into `toColumn` — the PAIR's keys WIN on
    * conflicts (`{**metadata, **pair_meta}`); `toColumn` is created as an
    * empty map when absent; `cleanFromColumn=true` strips the pair down to
    * its text. A plain-string `fromColumn` leaves metadata untouched (but
    * still creates the empty `toColumn`). Pairs are struct(text, meta) with
    * meta a map<string,string> of JSON fragments. */
  def combineMetadata(df: DataFrame, fromColumn: String = "text",
      toColumn: String = "metadata", cleanFromColumn: Boolean = true): DataFrame = {
    import org.apache.spark.sql.types.{MapType, StringType, StructType}
    val emptyMeta = map().cast(MapType(StringType, StringType))
    val base =
      if (df.columns.contains(toColumn)) df
      else df.withColumn(toColumn, emptyMeta)
    df.schema(fromColumn).dataType match {
      case s: StructType if s.length == 2 =>
        val textF = s(0).name
        val metaF = s(1).name
        val pairMeta = coalesce(col(fromColumn).getField(metaF), emptyMeta)
        val merged = map_concat(
          map_filter(coalesce(col(toColumn), emptyMeta),
            (k, _) => !map_contains_key(pairMeta, k)),
          pairMeta)
        val out = base.withColumn(toColumn, merged)
        if (cleanFromColumn) out.withColumn(fromColumn, col(fromColumn).getField(textF))
        else out
      case _ => base // not a (text, metadata) pair: metadata unchanged
    }
  }

  /** unpack_col: explode a struct column into top-level columns. */
  def unpackCol(df: DataFrame, structCol: Column, names: String*): DataFrame =
    df.select((df.columns.map(col) ++
      names.map(n => structCol.getField(n).as(n))): _*)

  /** argmax_rows: keep the row with max `value` per group (ties → smallest
    * tie-break, pinned so results are deterministic). One shuffle via max_by
    * on the full row struct — no join-back. */
  def argmaxRows(df: DataFrame, groupCols: Seq[Column], value: Column, tieBreak: Column): DataFrame = {
    val payload = struct(df.columns.map(col): _*)
    df.groupBy(groupCols: _*)
      .agg(max_by(payload, struct(value, -tieBreak)).as("_row"))
      .select(col("_row.*"))
  }

  def argminRows(df: DataFrame, groupCols: Seq[Column], value: Column, tieBreak: Column): DataFrame = {
    val payload = struct(df.columns.map(col): _*)
    df.groupBy(groupCols: _*)
      .agg(min_by(payload, struct(value, tieBreak)).as("_row"))
      .select(col("_row.*"))
  }

  /** Exact per-group top-k frequent values (heavy hitters) — [[majority]]
    * generalized to a ranked list. One keyed count aggregation (map-side
    * combined; the shuffle is (group, value)-wide, the rank runs over the
    * much smaller distinct-value counts), ties broken by value ascending.
    * Returns (group…, value, cnt, rank ≤ k).
    *
    * When distinct-value cardinality per group is itself too large to
    * shuffle, use [[graft.functions.Reducers.misraGries]] — the mergeable
    * bounded-state sketch whose candidate set provably covers every value
    * with frequency > n/(capacity+1). */
  def topKFrequent(df: DataFrame, groupCols: Seq[Column], value: Column,
      k: Int): DataFrame = {
    // group columns aliased to stable _gN names so computed expressions
    // (e.g. col("a") % 7) partition/resolve cleanly; output keeps the
    // original names via the final re-alias
    val gA = groupCols.zipWithIndex.map { case (c, i) => c.as(s"_g$i") }
    val counted = df.groupBy(gA :+ value.as("_v"): _*).agg(count(lit(1)).as("cnt"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(groupCols.indices.map(i => col(s"_g$i")): _*)
      .orderBy(col("cnt").desc, col("_v").asc)
    counted.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
      .select(groupCols.zipWithIndex.map { case (c, i) => col(s"_g$i").as(c.toString) } :+
        col("_v").as("value") :+ col("cnt") :+ col("rank").cast("long").as("rank"): _*)
  }

  /** groupby_reduce_majority: most frequent `value` per group (ties → smallest
    * value, any orderable type). Count per (group, value) first — the heavy
    * shuffle aggregates map-side — then a rank over the (small) distinct-value
    * counts picks the winner. */
  def majority(df: DataFrame, groupCols: Seq[Column], value: Column): DataFrame = {
    val gA = groupCols.zipWithIndex.map { case (c, i) => c.as(s"_g$i") }
    val counted = df.groupBy(gA :+ value.as("_v"): _*).agg(count(lit(1)).as("_n"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(groupCols.indices.map(i => col(s"_g$i")): _*)
      .orderBy(col("_n").desc, col("_v").asc)
    counted.withColumn("_rn", row_number().over(w)).filter(col("_rn") === 1)
      .select(groupCols.zipWithIndex.map { case (c, i) => col(s"_g$i").as(c.toString) } :+
        col("_v").as("majority_value") :+ col("_n").as("majority_count"): _*)
  }

  /** classifier_accuracy (reference stdlib/ml/utils.py:13): join predictions
    * to ground truth on id and count rows per match/mismatch — the
    * reference's exact output shape (`match`, `cnt`, one row per boolean
    * present). Null predictions (knnClassify's candidate-less queries) count
    * as mismatches. One broadcast-able equi-join + map-side-combined count. */
  def classifierAccuracy(predicted: DataFrame, pId: Column, predLabel: Column,
      exact: DataFrame, eId: Column, exactLabel: Column): DataFrame =
    predicted.select(pId.as("_id"), predLabel.as("_pred"))
      .join(exact.select(eId.as("_id"), exactLabel.as("_label")), Seq("_id"))
      .groupBy((col("_pred") <=> col("_label")).as("match"))
      .agg(count(lit(1)).as("cnt"))

  /** Skew-salted aggregation: two-phase groupBy for hot keys. Phase 1 groups on
    * (key, salt) — the hot key's rows spread over `salts` partitions and
    * partially aggregate; phase 2 merges the per-salt partials. Use for any
    * algebraic aggregate (sum/count/min/max) when one key dominates; AQE's
    * skew handling covers joins, but aggregation skew needs the salt. */
  def saltedAgg(df: DataFrame, key: Column, salts: Int,
      partial: Column => Column, merge: Column => Column, valueCol: Column,
      outName: String): DataFrame = {
    // monotonically_increasing_id is NOT stable across retries/replans — fine
    // here because the salt only shards rows between partial aggregates and
    // `merge` must be algebraic (sum-of-sums etc.), so ANY row→salt split
    // yields the same final value; do not use this salting with
    // order-sensitive merges
    val salted = df.groupBy(key.as("_k"), (monotonically_increasing_id() % salts).as("_salt"))
      .agg(partial(valueCol).as("_partial"))
    salted.groupBy(col("_k")).agg(merge(col("_partial")).as(outName))
      .withColumnRenamed("_k", key.toString)
  }

  /** Skew-salted join: replicate the small side `salts`× with an explicit salt
    * column, scatter the big side's hot keys across salts. Equivalent results
    * to a plain equi-join, but the hot key's rows land on `salts` reducers
    * instead of one. (AQE skew-join splitting usually suffices — this is the
    * explicit fallback for engines/configs without it, and for deterministic
    * partition sizing at very large scale.) */
  def saltedJoin(big: DataFrame, small: DataFrame, bigKey: Column, smallKey: Column,
      salts: Int): DataFrame = {
    val saltedBig = big.withColumn("_salt", pmod(xxhash64(monotonically_increasing_id()), lit(salts)))
    val saltedSmall = small.withColumn("_salt", explode(sequence(lit(0), lit(salts - 1))))
    saltedBig.join(saltedSmall,
        bigKey === smallKey && saltedBig("_salt") === saltedSmall("_salt"))
      .drop("_salt")
  }

  /** gradual_broadcast (batch form): attach a small aggregated scalar table to
    * every row via broadcast join — the reference's tolerance-band machinery
    * exists to avoid recomputation churn in streaming; in micro-batch the
    * broadcast is already amortized per batch. */
  def broadcastScalar(df: DataFrame, scalar: DataFrame): DataFrame =
    df.crossJoin(broadcast(scalar))

  /** `_gradual_broadcast` with the reference's REAL apportioning rule (r16
    * decode of gradual_broadcast.rs:128-186 + test_gradual_broadcast.py):
    * each row's `apx_value` is `upper` when the row key's hash fraction is
    * below (value−lower)/(upper−lower), else `lower` — never the raw value.
    * The share of rows on the upper bound thus tracks the threshold's
    * progress through the band, and a threshold move only re-touches the
    * keys inside the moved fragment (the reference's streaming-churn
    * trick; its own test asserts PROPORTIONALITY, not row identity, since
    * the split depends on the engine's key hash). Hash here = Knuth
    * multiplicative on the key (engine-portable: the DuckDB oracle
    * replays it with plain arithmetic). `thr` is one aggregated row
    * (lower, value, upper), broadcast. */
  def gradualBroadcast(df: DataFrame, key: Column, thr: DataFrame): DataFrame = {
    val joined = df.crossJoin(broadcast(thr))
    val frac = (col("value") - col("lower")) / (col("upper") - col("lower"))
    // modulus 2^31 with the Knuth constant reduced mod 2^31: keeps the
    // multiply inside i64 for ANY bigint key (key % 2^31 < 2^31 times
    // 506952113 < 2^29 stays < 2^60), so Spark and the DuckDB oracle agree
    // at every scale factor instead of wrapping differently past ~3.4e9
    val rowFrac =
      pmod(pmod(key.cast("long"), lit(2147483648L)) * lit(506952113L),
        lit(2147483648L)).cast("double") / lit(2147483648.0)
    joined.withColumn("apx_value",
        when(col("upper") === col("lower"), col("lower"))
          .when(rowFrac < frac, col("upper"))
          .otherwise(col("lower")))
      .drop("lower", "value", "upper")
  }

  /** Elementwise sum of equal-length numeric arrays per group (the reference's
    * ndarray `sum` reducer, reducers.py:350 ndarray case). Explode + (group,
    * index) partial aggregation — never materializes per-group matrices, so a
    * group with billions of rows still aggregates map-side. Cast to decimal
    * for exact float sums (engine-portable). */
  def ndarraySum(df: DataFrame, groupCols: Seq[Column], arr: Column,
      scale: Int = 6): DataFrame = {
    val exploded = df.select(groupCols :+ posexplode(arr).as(Seq("_i", "_x")): _*)
    val g = exploded.groupBy(groupCols.map(c => exploded(c.toString)) :+ col("_i"): _*)
      .agg(sum(col("_x").cast("double").cast(s"decimal(28,$scale)")).as("_s"))
    g.groupBy(groupCols.map(c => g(c.toString)): _*)
      .agg(transform(sort_array(collect_list(struct(col("_i"), col("_s")))),
        x => x.getField("_s")).as("array_sum"))
  }
}

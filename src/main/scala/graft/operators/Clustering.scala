package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Clustering via LSH pre-bucketing (reference
  * stdlib/ml/classifiers/_clustering_via_lsh.py: LSH-bucket the points,
  * cluster the per-bucket representatives, then each point takes the majority
  * vote over its buckets' cluster labels).
  *
  * The reference clusters bucket representatives with sklearn KMeans on the
  * driver; here the Lloyd iterations are DataFrame joins — representatives are
  * usually small enough to broadcast, but nothing collects, so the same plan
  * holds when the bucket table itself is huge.
  *
  * Determinism device (same family as pagerank's fixed-point ranks): vectors
  * are quantized to exact BIGINTs (floor(x·2^40) — float→double is exact and a
  * ×2^40 only shifts the exponent, so the floor sees exact input). Cosine is
  * scale-invariant, so bucket representatives and centroids are represented by
  * component SUMS (never divided): all state stays exact integer arithmetic,
  * and the only floating point is the final left-to-right cosine fold —
  * bit-reproducible in any IEEE engine, which is what makes the DuckDB oracle
  * (OracleSqlGen.clusteringLsh) exact.
  */
object Clustering {

  private val Q = 1099511627776L // 2^40

  /** floor-quantize a float/double array column to exact BIGINTs. */
  def quantize(vec: Column): Column =
    transform(vec, x => floor(x.cast("double") * Q).cast("long"))

  /** LSH pre-clustering: returns (id, label) with label ∈ [0, k).
    *
    * Pipeline: SRP-bucket each point into `nTables` (table, bucket) groups →
    * representative per bucket = component-sum + member count → spherical
    * k-means over representatives (init = the k lexicographically-smallest
    * buckets, `lloydIters` synchronous passes, cosine argmax with
    * (score DESC, cluster ASC) tie-break; empty clusters keep their previous
    * centroid) → each point votes with all its buckets, majority label wins
    * (ties → smaller label).
    */
  def viaLsh(points: DataFrame, id: Column, vec: Column, dim: Int, k: Int,
      nPlanes: Int = 4, nTables: Int = 4, lloydIters: Int = 2): DataFrame = {
    val p = points.select(id.cast("long").as("pid"), quantize(vec).as("_qv"))
    val buckets = (0 until nTables).map(t => Similarity.srpBucket(col("_qv"), t, nPlanes, dim))
    val b = p.select(col("pid"), col("_qv"),
        posexplode(array(buckets: _*)).as(Seq("_table", "_bucket")))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)

    // representative per (table, bucket): component sums — exact, and they
    // already encode the member count (the reference's sample_weight: the
    // weighted mean's direction Σ w_b·mean_b IS the sum). explode → sum →
    // reassemble is the shuffle-shaped elementwise vector sum (map-side
    // combine on (_table,_bucket,idx)).
    val comp = b.select(col("_table"), col("_bucket"), posexplode(col("_qv")).as(Seq("_i", "_x")))
      .groupBy("_table", "_bucket", "_i").agg(sum("_x").as("_s"))
    val reps = comp.groupBy("_table", "_bucket").agg(
        transform(array_sort(collect_list(struct(col("_i"), col("_s")))), e => e("_s")).as("_rv"))
    // global row_number is a single-partition window, but it runs on the
    // REPRESENTATIVE table, whose size is bounded by nTables·2^nPlanes buckets
    // regardless of corpus size — the whole point of LSH pre-clustering
    val rid = row_number().over(
      org.apache.spark.sql.expressions.Window.orderBy(col("_table"), col("_bucket")))
    val repT = reps.withColumn("_rid", rid.cast("long"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    repT.count() // materialize once: assignment + every Lloyd pass re-reads it

    // init: deterministic farthest-point traversal (greedy k-center, the
    // k-means++ max variant): c1 = lexicographically-smallest bucket, then
    // c_j = the rep minimizing its max cosine to the already-chosen set
    // (ties → smaller rep id). Spreads the seeds across the sphere so
    // well-separated cones never share all k seeds (naive first-k does).
    var chosen = repT.filter(col("_rid") === 1)
      .select(lit(1L).as("_c"), col("_rid").as("_crid"), col("_rv").as("_cv"))
    for (j <- 2 to k) {
      val next = repT.join(broadcast(chosen), lit(true))
        .withColumn("_sim", Similarity.cosine(col("_rv"), col("_cv")))
        .groupBy("_rid").agg(max("_sim").as("_ms"), first("_rv").as("_rv"))
        .join(chosen.select(col("_crid").as("_rid")), Seq("_rid"), "left_anti")
        .orderBy(col("_ms").asc, col("_rid").asc).limit(1)
        .select(lit(j.toLong).as("_c"), col("_rid").as("_crid"), col("_rv").as("_cv"))
      chosen = chosen.unionByName(next).localCheckpoint(true) // k rows
    }
    var centroids = chosen.select(col("_c"), col("_cv"))

    // Lloyd passes: assign reps to nearest centroid by cosine, then new
    // centroid = Σ (rep sums) over members — the weighted mean's direction
    // (Σ w_b·mean_b = Σ sums_b), so no division ever happens.
    for (_ <- 1 to lloydIters) {
      val assigned = assign(repT, centroids)
      val newComp = assigned.join(repT, "_rid")
        .select(col("_c"), posexplode(col("_rv")).as(Seq("_i", "_x")))
        .groupBy("_c", "_i").agg(sum("_x").as("_s"))
      val newCent = newComp.groupBy("_c").agg(
        transform(array_sort(collect_list(struct(col("_i"), col("_s")))), e => e("_s")).as("_nv"))
      centroids = centroids.join(newCent, Seq("_c"), "left_outer")
        .select(col("_c"), coalesce(col("_nv"), col("_cv")).as("_cv"))
        .localCheckpoint(true) // tiny (k rows); flattens the per-pass lineage
    }

    // final rep labels → per-point majority vote over its nTables buckets
    val labels = assign(repT, centroids)
      .join(repT.select(col("_rid"), col("_table"), col("_bucket")), "_rid")
      .select(col("_table"), col("_bucket"), (col("_c") - 1).as("_label"))
    val votes = b.select(col("pid"), col("_table"), col("_bucket"))
      .join(labels, Seq("_table", "_bucket"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("pid")).orderBy(col("_cnt").desc, col("_label").asc)
    votes.groupBy("pid", "_label").agg(count(lit(1)).as("_cnt"))
      .withColumn("_rn", row_number().over(w)).filter(col("_rn") === 1)
      .select(col("pid").as("id"), col("_label").as("label"))
  }

  /** Nearest-centroid assignment by cosine over the integer sums
    * (score DESC, cluster ASC tie-break). Centroids broadcast — k rows. */
  private def assign(repT: DataFrame, centroids: DataFrame): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("_rid")).orderBy(col("_sim").desc, col("_c").asc)
    repT.join(broadcast(centroids), lit(true))
      .withColumn("_sim", Similarity.cosine(col("_rv"), col("_cv")))
      .withColumn("_rn", row_number().over(w)).filter(col("_rn") === 1)
      .select(col("_rid"), col("_c"))
  }
}

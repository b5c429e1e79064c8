package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Graph algorithms built on Iterate.fixpoint, mirroring the reference's
  * stdlib (pagerank stdlib/graphs/pagerank/impl.py:18, bellman_ford
  * stdlib/graphs/bellman_ford/impl.py:42, both ~40-line compositions over
  * `pw.iterate`).
  *
  * Edges are a DataFrame (src, dst[, weight]). All joins are key-partitioned
  * shuffle joins — the same sharding the reference's dataflow uses — and each
  * iteration's state is checkpointed by Iterate so lineage stays flat.
  */
object Graphs {

  /** Connected components: label = min reachable vertex id (label propagation).
    * Converges in O(diameter) passes. */
  def connectedComponents(edges: DataFrame, src: String = "src", dst: String = "dst",
      maxIterations: Int = 50, unroll: Int = 1): DataFrame = {
    val sym = edges.select(col(src).as("u"), col(dst).as("v"))
      .unionByName(edges.select(col(dst).as("u"), col(src).as("v")))
      .distinct()
    val vertices = sym.select(col("u").as("vertex")).distinct()
    val initial = vertices.select(col("vertex"), col("vertex").as("component"))
    // labels only ever decrease and the vertex set is fixed, so Σ component is
    // strictly decreasing until the fixpoint — a one-row fingerprint per pass
    // (evaluated once, in the pass's materialization job) replaces the
    // exceptAll multiset compare (2 extra shuffles per pass)
    Iterate.fixpointByFingerprint(initial, labels => {
      val viaNeighbor = sym.join(labels, sym("v") === labels("vertex"))
        .select(col("u").as("vertex"), col("component"))
      labels.unionByName(viaNeighbor)
        .groupBy("vertex").agg(min("component").as("component"))
    }, df => df.agg(sum("component")).head.getLong(0), maxIterations, unroll = unroll)
  }

  /** Single-source shortest paths (Bellman-Ford). Integer or decimal weights
    * recommended for exact convergence checks. Unreachable vertices omitted. */
  def bellmanFord(edges: DataFrame, sourceId: Long,
      src: String = "src", dst: String = "dst", weight: String = "weight",
      maxIterations: Int = 50, unroll: Int = 1): DataFrame = {
    val e = edges.select(col(src).as("u"), col(dst).as("v"), col(weight).as("w"))
    val initial = e.sparkSession.range(1).select(lit(sourceId).as("vertex"), lit(0L).as("dist"))
    // reached-count never decreases and per-vertex dist never increases, so the
    // (count, Σdist) pair is a monotone fingerprint: unchanged ⇔ fixpoint.
    // Evaluated once per pass in the materialization job (fixpointByFingerprint
    // carries the previous pass's value — never recomputed on prev).
    Iterate.fixpointByFingerprint(initial, dist => {
      val relaxed = e.join(dist, e("u") === dist("vertex"))
        .select(col("v").as("vertex"), (col("dist") + col("w")).as("dist"))
      dist.unionByName(relaxed)
        .groupBy("vertex").agg(min("dist").as("dist"))
    }, df => {
      val r = df.agg(count(lit(1)), sum("dist")).head
      (r.getLong(0), r.getLong(1))
    }, maxIterations, unroll = unroll)
  }

  /** Community detection via synchronous label propagation — the scalable
    * stand-in for the reference's Louvain (stdlib/graphs/louvain_communities;
    * true Louvain's sequential modularity sweeps don't parallelize cleanly).
    * Each pass every vertex adopts the most frequent label among its
    * neighbors (ties → smallest label, deterministic); `iters` fixed passes. */
  def labelPropagation(edges: DataFrame, iters: Int = 5,
      src: String = "src", dst: String = "dst", unroll: Int = 1): DataFrame = {
    val sym = edges.select(col(src).as("u"), col(dst).as("v"))
      .unionByName(edges.select(col(dst).as("u"), col(src).as("v")))
      .distinct()
    val vertices = sym.select(col("u").as("vertex")).distinct()
    val initial = vertices.select(col("vertex"), col("vertex").as("label"))
    Iterate.nTimes(initial, labels => {
      val neighborLabels = sym.join(labels, sym("v") === labels("vertex"))
        .select(col("u").as("vertex"), col("label"))
      val counted = neighborLabels.groupBy("vertex", "label").agg(count(lit(1)).as("_n"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("vertex")).orderBy(col("_n").desc, col("label").asc)
      counted.withColumn("_rn", row_number().over(w)).filter(col("_rn") === 1)
        .select(col("vertex"), col("label"))
    }, iters, unroll = unroll)
  }

  /** Louvain-style community detection: synchronous modularity-gain moves
    * (reference stdlib/graphs/louvain_communities/impl.py:282 — its sequential
    * sweep is replaced by a per-pass parallel argmax move, the standard
    * distributed Louvain adaptation; one level, no coarsening).
    *
    * Per pass, every vertex u evaluates, for each neighboring community c,
    * score(c) = w(u,c) − k_u·vol(c \ u)/2m  (∝ the modularity gain of joining
    * c) and moves to the best strictly-improving community (ties → smaller
    * community id — deterministic). All steps are equi-joins + aggregations on
    * (vertex | community) keys; 2m is the only driver scalar. */
  def louvain(edges: DataFrame, iters: Int = 10,
      src: String = "src", dst: String = "dst", unroll: Int = 1): DataFrame = {
    val sym = symWeighted(edges, src, dst)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val deg = sym.groupBy(col("u").as("vertex")).agg(sum("w").as("k"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val m2 = sym.count().toDouble // = 2m
    louvainMoves(sym, deg, m2, iters, unroll)
  }

  /** Symmetric unit-weight edge list (u, v, w=1), self-loops dropped. */
  private def symWeighted(edges: DataFrame, src: String, dst: String): DataFrame =
    edges.select(col(src).as("u"), col(dst).as("v"))
      .unionByName(edges.select(col(dst).as("u"), col(src).as("v")))
      .filter(col("u") =!= col("v")).distinct()
      .withColumn("w", lit(1L))

  /** The synchronous weighted move passes shared by one-level [[louvain]] and
    * [[louvainMultilevel]]: `sym` is a symmetric weighted edge list (u,v,w)
    * with u ≠ v; `deg` carries each vertex's weighted degree INCLUDING any
    * self-loop mass (a contracted community's internal edges travel with the
    * super-vertex under any move, so they appear in `deg` but never in
    * `sym`). `m2` (= 2m, conserved across levels) is the only driver scalar. */
  private def louvainMoves(sym: DataFrame, deg: DataFrame, m2: Double,
      iters: Int, unroll: Int): DataFrame = {
    val initial = deg.select(col("vertex"), col("vertex").as("community"))
    Iterate.nTimes(initial, labels => {
      val comVol = labels.join(deg, "vertex")
        .groupBy("community").agg(sum("k").as("vol"))
      // w(u, c): edge mass from u into community c
      val neigh = sym
        .join(labels.select(col("vertex").as("v"), col("community").as("c")), "v")
        .groupBy(col("u").as("vertex"), col("c")).agg(sum("w").as("w"))
      val own = labels.select(col("vertex"), col("community").as("own"))
      // stay value: score of keeping the current community (own volume
      // excludes u's own degree)
      val wOwn = neigh.join(own, "vertex").filter(col("c") === col("own"))
        .select(col("vertex"), col("w").as("_wOwn"))
      val stay = own.join(deg, "vertex")
        .join(comVol.select(col("community").as("own"), col("vol").as("_ovol")), "own")
        .join(wOwn, Seq("vertex"), "left_outer")
        .select(col("vertex"), col("own"), col("k"),
          (coalesce(col("_wOwn"), lit(0L)) - col("k") * (col("_ovol") - col("k")) / m2).as("_stay"))
      val cand = neigh.join(stay, "vertex").filter(col("c") =!= col("own"))
        .join(comVol.select(col("community").as("c"), col("vol")), "c")
        .withColumn("_score", col("w") - col("k") * col("vol") / m2)
      val bestMove = cand.groupBy("vertex").agg(
        max_by(struct(col("c"), col("_score")), struct(col("_score"), -col("c"))).as("_b"),
        first(col("own")).as("_own"), first(col("_stay")).as("_stay"))
        .select(col("vertex"),
          when(col("_b._score") > col("_stay"), col("_b.c")).otherwise(col("_own")).as("_new"))
      // vertices with no external neighbor communities keep their label
      own.join(bestMove, Seq("vertex"), "left_outer")
        .select(col("vertex"), coalesce(col("_new"), col("own")).as("community"))
    }, iters, unroll = unroll)
  }

  /** Multi-level Louvain (reference louvain_communities/impl.py:282: move
    * passes, then contract communities into super-vertices and recurse):
    * level-1 moves on the unit-weight graph, then communities collapse into a
    * weighted super-graph — cross-community mass becomes weighted edges,
    * intra-community mass becomes self-loop degree — level-2 moves run on
    * that, and the final label composes vertex → c₁ → c₂. The contracted
    * graph is |communities| vertices, so level 2 costs a fraction of level 1;
    * 2m is conserved so modularity comparisons stay on the original scale. */
  def louvainMultilevel(edges: DataFrame, iters1: Int = 4, iters2: Int = 4,
      src: String = "src", dst: String = "dst", unroll: Int = 1): DataFrame = {
    val mem = org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
    val sym = symWeighted(edges, src, dst).persist(mem)
    val deg = sym.groupBy(col("u").as("vertex")).agg(sum("w").as("k")).persist(mem)
    val m2 = sym.count().toDouble
    val l1 = louvainMoves(sym, deg, m2, iters1, unroll).persist(mem)
    val mapped = sym
      .join(l1.select(col("vertex").as("u"), col("community").as("cu")), "u")
      .join(l1.select(col("vertex").as("v"), col("community").as("cv")), "v")
      .persist(mem)
    val superSym = mapped.filter(col("cu") =!= col("cv"))
      .groupBy(col("cu").as("u"), col("cv").as("v")).agg(sum("w").as("w"))
    val loops = mapped.filter(col("cu") === col("cv"))
      .groupBy(col("cu").as("vertex")).agg(sum("w").as("_loop"))
    val superDeg = l1.select(col("community").as("vertex")).distinct()
      .join(superSym.groupBy(col("u").as("vertex")).agg(sum("w").as("_kx")),
        Seq("vertex"), "left_outer")
      .join(loops, Seq("vertex"), "left_outer")
      .select(col("vertex"),
        (coalesce(col("_kx"), lit(0L)) + coalesce(col("_loop"), lit(0L))).as("k"))
    val l2 = louvainMoves(superSym, superDeg, m2, iters2, unroll)
    l1.select(col("vertex"), col("community").as("_c1"))
      .join(l2.select(col("vertex").as("_c1"), col("community")), "_c1")
      .select(col("vertex"), col("community"))
  }

  /** Modularity Q of an assignment (vertex, community) over `edges` —
    * Σ_c [ in_c/2m − (vol_c/2m)² ], unweighted. */
  def modularity(edges: DataFrame, assignment: DataFrame): DataFrame = {
    val sym = edges.select(col("src").as("u"), col("dst").as("v"))
      .unionByName(edges.select(col("dst").as("u"), col("src").as("v")))
      .filter(col("u") =!= col("v")).distinct()
    val lab = assignment.select(col("vertex"), col("community"))
    val m2 = sym.count().toDouble
    val withC = sym
      .join(lab.select(col("vertex").as("u"), col("community").as("cu")), "u")
      .join(lab.select(col("vertex").as("v"), col("community").as("cv")), "v")
    val inC = withC.filter(col("cu") === col("cv"))
      .groupBy(col("cu").as("community")).agg(count(lit(1)).as("in2"))
    val vol = withC.groupBy(col("cu").as("community")).agg(count(lit(1)).as("vol"))
    vol.join(inC, Seq("community"), "left_outer")
      .select(sum(coalesce(col("in2"), lit(0L)) / m2 - pow(col("vol") / m2, 2)).as("q"))
  }

  /** PageRank with `iters` fixed passes, damping dampNum/dampDen. Ranks are
    * 64-bit FIXED-POINT integers (units of 1/scale): every operation is exact
    * integer arithmetic (floor div), so results are bit-identical across
    * engines, shuffle orders, and partition counts — float or decimal division
    * would make the result depend on rounding modes. Dangling nodes keep the
    * base (1-d)/n mass (contributions only flow along edges; matches the
    * reference's simple formulation, stdlib/graphs/pagerank/impl.py:18). */
  def pagerank(edges: DataFrame, iters: Int = 3, dampNum: Long = 85, dampDen: Long = 100,
      scale: Long = 1000000000000L, unroll: Int = 1): DataFrame = {
    val e = edges.select(col("src").as("u"), col("dst").as("v")).distinct()
    val vertices = e.select(col("u").as("vertex"))
      .unionByName(e.select(col("v").as("vertex"))).distinct()
    val outDeg = e.groupBy(col("u").as("vertex")).agg(count(lit(1)).as("out_deg"))
    val nV = vertices.count()
    val initRank = scale / nV
    val baseFp = (scale - scale * dampNum / dampDen) / nV
    val initial = vertices.withColumn("rank", lit(initRank))
    Iterate.nTimes(initial, ranks => {
      val contrib = e
        .join(ranks, e("u") === ranks("vertex"))
        .join(outDeg, "vertex")
        .select(col("v").as("vertex"), expr("rank div out_deg").as("c"))
      val summed = contrib.groupBy("vertex").agg(sum("c").as("mass"))
      vertices.join(summed, Seq("vertex"), "left_outer")
        .select(col("vertex"),
          (lit(baseFp) + expr(s"($dampNum * coalesce(mass, CAST(0 AS BIGINT))) div $dampDen"))
            .as("rank"))
    }, iters, unroll = unroll)
  }
}

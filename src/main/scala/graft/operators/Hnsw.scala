package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import scala.collection.mutable

/** HNSW approximate nearest neighbors (reference USearchKnn,
  * stdlib/indexing/nearest_neighbors.py:65, backed by the usearch native
  * index in src/external_integration/ — here a from-scratch JVM
  * implementation of the hierarchical navigable-small-world graph,
  * Malkov & Yashunin 2016).
  *
  * Spark shape — the honest external-index architecture: each corpus
  * PARTITION builds its own in-memory index inside `mapPartitions` (exactly
  * where the reference hands its partition of keys to usearch), the (small)
  * query set is broadcast, every partition answers top-k from its index, and
  * a global per-query window merges partial results. No shuffle of the
  * corpus; index memory is per-executor and proportional to its slice.
  *
  * Distances are cosine (compared as similarity, higher = better), matching
  * Similarity.bruteForceKnn's scoring so recall is measured apples-to-apples.
  */
object Hnsw {

  /** One per-partition index. M = max neighbors per node per layer,
    * efConstruction/efSearch = beam widths.
    *
    * DETERMINISTIC construction: a node's level is a pure function of its id
    * (golden-ratio hash → uniform → geometric), not a draw from a sequential
    * RNG — so the graph depends only on the SET and ORDER of inserted ids,
    * never on how many draws preceded an insert. [[knn]] pins the order
    * (sorted by id within hash-fixed partitions), making the whole operator's
    * output a pure function of (corpus, queries, params). */
  final class Index(dim: Int, m: Int, efConstruction: Int) extends Serializable {
    private val vecs = mutable.ArrayBuffer.empty[Array[Float]]
    private val ids = mutable.ArrayBuffer.empty[Long]
    // neighbors(layer)(node) = node ids (indices into vecs)
    private val neighbors = mutable.ArrayBuffer.empty[mutable.ArrayBuffer[mutable.ArrayBuffer[Int]]]
    private var entryPoint = -1
    private var topLayer = -1
    private val levelNorm = 1.0 / math.log(m.toDouble)

    /** Deterministic level: finalize-mixed id hash → u ∈ (0,1] → geometric. */
    private def levelOf(id: Long): Int = {
      var h = id * 0x9E3779B97F4A7C15L
      h ^= (h >>> 32); h *= 0xD6E8FEB86659FD93L; h ^= (h >>> 32)
      val u = ((h >>> 11) + 1).toDouble / (1L << 53).toDouble
      math.min((-math.log(u) * levelNorm).toInt, 16)
    }

    private def sim(a: Array[Float], b: Array[Float]): Double = {
      var dot = 0.0; var na = 0.0; var nb = 0.0
      var i = 0
      while (i < dim) {
        dot += a(i).toDouble * b(i); na += a(i).toDouble * a(i); nb += b(i).toDouble * b(i)
        i += 1
      }
      if (na == 0 || nb == 0) -1.0 else dot / (math.sqrt(na) * math.sqrt(nb))
    }

    /** Greedy beam search on one layer; returns up to `ef` best nodes. */
    private def searchLayer(q: Array[Float], entry: Int, ef: Int, layer: Int): Seq[Int] = {
      val visited = mutable.HashSet(entry)
      // candidates: max-heap by sim; results: min-heap by sim (bounded by ef)
      val cand = mutable.PriorityQueue((sim(q, vecs(entry)), entry))(Ordering.by(_._1))
      val res = mutable.PriorityQueue((sim(q, vecs(entry)), entry))(Ordering.by(-_._1))
      while (cand.nonEmpty) {
        val (cs, c) = cand.dequeue()
        if (res.size >= ef && cs < res.head._1) { cand.clear() }
        else {
          neighbors(layer)(c).foreach { n =>
            if (!visited.contains(n)) {
              visited += n
              val s = sim(q, vecs(n))
              if (res.size < ef || s > res.head._1) {
                cand.enqueue((s, n)); res.enqueue((s, n))
                if (res.size > ef) res.dequeue()
              }
            }
          }
        }
      }
      res.toSeq.sortBy(-_._1).map(_._2)
    }

    def add(id: Long, v: Array[Float]): Unit = {
      val node = vecs.length
      vecs += v; ids += id
      val level = levelOf(id)
      while (topLayer < level) {
        topLayer += 1
        neighbors += mutable.ArrayBuffer.empty
      }
      (0 to topLayer).foreach { l =>
        while (neighbors(l).length <= node) neighbors(l) += mutable.ArrayBuffer.empty[Int]
      }
      if (entryPoint < 0) { entryPoint = node; return }
      var ep = entryPoint
      var l = topLayer
      while (l > level) { // descend greedily above the insertion level
        ep = searchLayer(v, ep, 1, l).head
        l -= 1
      }
      while (l >= 0) {
        val found = searchLayer(v, ep, efConstruction, l)
        val links = found.take(m)
        links.foreach { n =>
          neighbors(l)(node) += n
          neighbors(l)(n) += node
          // prune over-full neighbor lists, keep the closest
          if (neighbors(l)(n).length > m * 2) {
            val pruned = neighbors(l)(n).distinct
              .sortBy(x => -sim(vecs(n), vecs(x))).take(m)
            neighbors(l)(n) = pruned
          }
        }
        ep = found.head
        l -= 1
      }
      if (level >= topLayer) entryPoint = node
    }

    def search(q: Array[Float], k: Int, efSearch: Int): Seq[(Long, Double)] = {
      if (entryPoint < 0) return Nil
      var ep = entryPoint
      var l = topLayer
      while (l > 0) { ep = searchLayer(q, ep, 1, l).head; l -= 1 }
      searchLayer(q, ep, math.max(efSearch, k), 0)
        .take(k).map(n => (ids(n), sim(q, vecs(n))))
    }
  }

  /** ANN top-k: per-partition HNSW indexes, queries broadcast, global merge.
    * Output matches bruteForceKnn: (query_id, nn_id, score, rank).
    *
    * DETERMINISM: the corpus is hash-repartitioned by id into a FIXED
    * `indexPartitions` count (Murmur3 on the value — a pure function of the
    * id, unlike range partitioning whose sampled bounds vary per run) and
    * sorted by id within each partition, so each per-partition graph is a
    * pure function of the data regardless of how the input arrived — the
    * same rows come back at 2, 8, or 32 input partitions (pinned by
    * IterateSpec's invariance test). At cluster scale `indexPartitions`
    * is the index-shard count: raise it so a shard's vectors fit an
    * executor; build cost stays O(n log n) per shard and queries fan out
    * to every shard exactly like the reference's sharded usearch index. */
  def knn(queries: DataFrame, qId: Column, qVec: Column,
      corpus: DataFrame, cId: Column, cVec: Column, k: Int, dim: Int,
      m: Int = 8, efConstruction: Int = 64, efSearch: Int = 64,
      indexPartitions: Int = 16): DataFrame = {
    val spark = corpus.sparkSession
    import spark.implicits._
    val qRows = queries.select(qId.cast("long"), qVec).as[(Long, Array[Float])]
      .collect() // query set is small by contract (same as bruteForceKnn's broadcast)
    val qB = spark.sparkContext.broadcast(qRows)
    val partials = corpus.select(cId.cast("long").as("_id"), cVec.as("_v"))
      .repartition(indexPartitions, col("_id"))
      .sortWithinPartitions("_id")
      .as[(Long, Array[Float])]
      .mapPartitions { it =>
        val idx = new Index(dim, m, efConstruction)
        it.foreach { case (id, v) => idx.add(id, v) }
        qB.value.iterator.flatMap { case (qid, qv) =>
          idx.search(qv, k, efSearch)
            .filter(_._1 != qid)
            .map { case (nid, s) => (qid, nid, s) }
        }
      }.toDF("query_id", "nn_id", "score")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("query_id")).orderBy(col("score").desc, col("nn_id"))
    partials.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("nn_id"), col("score"), col("rank").cast("long"))
  }
}

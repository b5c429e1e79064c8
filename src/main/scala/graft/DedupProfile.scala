package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev-only stage breakdown of the minhash dedup family (r20 VERDICT #5:
  * "profile the dedup family's fixed stage overhead"). Replays minhashCore's
  * stages one materialization at a time so the bench rows' cost decomposes
  * into signature kernel / band join+guard / prefilter / verify / CC.
  * Args: sfDir. Uses the same session config as Bench. */
object DedupProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.optimizer.canChangeCachedPlanOutputPartitioning", "true")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "true")
      .config("spark.sql.timestampType", "TIMESTAMP_NTZ")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.operators.{Dedup, Graphs, Materialize}
    import graft.functions.CrossHash

    def timed[T](label: String)(f: => T): T = {
      spark.sparkContext.setJobDescription(label)
      val t0 = System.nanoTime()
      val r = f
      println(f"[dedup-profile] $label%-36s ${(System.nanoTime() - t0) / 1e9}%7.2f s")
      r
    }

    // same corpus as the board rows
    val d = spark.read.parquet(s"$sfDir/documents.parquet").select("doc_id", "text")
    def tail(parts: String*) =
      concat(parts.map(p => md5(concat(col("doc_id").cast("string"), lit(p)))): _*)
    val gen1 = d.filter(col("doc_id") < 50)
      .select((col("doc_id") + 20000).as("doc_id"),
        concat(col("text"), lit(" "), tail("a1", "a2", "a3")).as("text"))
    val gen2 = d.filter(col("doc_id") < 50)
      .select((col("doc_id") + 40000).as("doc_id"),
        concat(col("text"), lit(" "), tail("a1", "a2", "a3", "b1", "b2", "b3")).as("text"))
    val corpus = d.unionByName(gen1).unionByName(gen2)

    val reps = sys.env.getOrElse("GRAFT_PROFILE_REPS", "2").toInt
    (1 to reps).foreach { rep =>
      println(s"--- rep $rep ---")
      val numHashes = 32; val bands = 8; val k = 5; val threshold = 0.7
      val rowsPerBand = numHashes / bands

      // stage 1: signature kernel alone
      val sigRows = Dedup.minhashSignatures(corpus, col("doc_id"), col("text"), k, numHashes)
      timed("1 signature kernel (noop)") {
        sigRows.write.mode("overwrite").format("noop").save()
      }

      // stage 2: persist + count (as minhashCore does)
      val sig = sigRows.select(col("id") +:
          (0 until numHashes).map(s => col("_mins")(s).as(s"_h$s")): _*)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      timed("2 sig persist+count")(sig.count())

      val bandCols = (0 until bands).map { b =>
        val slots = (b * rowsPerBand until (b + 1) * rowsPerBand).map(s => col(s"_h$s"))
        xxhash64(lit(b) +: slots: _*)
      }
      val bucketed = sig.select(col("id"),
        xxhash64((0 until numHashes).map(s => col(s"_h$s")): _*).as("_subKey"),
        posexplode(array(bandCols: _*)).as(Seq("_band", "_bucket")))

      // stage 3a: guarded band self-join
      val candG = Dedup.guardedSelfJoin(bucketed, Seq("_band", "_bucket"), Nil, Dedup.DefaultBucketCap)
      timed("3a guarded band join (noop)") {
        candG.write.mode("overwrite").format("noop").save()
      }
      // stage 3b: unguarded control
      val candU = Dedup.guardedSelfJoin(bucketed, Seq("_band", "_bucket"), Nil, Int.MaxValue)
      timed("3b unguarded band join (noop)") {
        candU.write.mode("overwrite").format("noop").save()
      }

      // stage 4: dedupe + prefilter + persist + count
      val uniquePairs = candG.dropDuplicates("id1", "id2")
      val sigL = sig.select(col("id").as("id1") +:
        (0 until numHashes).map(s => col(s"_h$s").as(s"_l$s")): _*)
      val sigR = sig.select(col("id").as("id2") +:
        (0 until numHashes).map(s => col(s"_h$s").as(s"_r$s")): _*)
      val estJaccard = (0 until numHashes)
        .map(s => when(col(s"_l$s") === col(s"_r$s"), 1).otherwise(0))
        .reduce(_ + _).cast("double") / numHashes
      val prefiltered = uniquePairs.join(sigL, "id1").join(sigR, "id2")
        .filter(estJaccard >= math.max(0.0, threshold - 0.15))
        .select("id1", "id2")
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      timed("4 prefilter persist+count")(prefiltered.count())

      // stage 5: candidate shingle sets
      val norm = corpus.select(col("doc_id").cast("long").as("id"),
        regexp_replace(trim(lower(col("text"))), "\\s+", " ").as("_n"))
      val candIds = prefiltered.select(col("id1").as("id"))
        .unionByName(prefiltered.select(col("id2").as("id"))).distinct()
      import spark.implicits._
      val kk = k
      val candSets = norm.join(candIds, Seq("id"), "left_semi")
        .as[(Long, String)].mapPartitions { it =>
          val md = java.security.MessageDigest.getInstance("MD5")
          it.map { case (docId, n) =>
            if (n == null) (docId, Array.empty[Long])
            else {
              val L = math.max(n.length - (kk - 1), 1)
              val seen = new java.util.HashSet[String](math.min(L, 1 << 16))
              val set = scala.collection.mutable.HashSet.empty[Long]
              var i = 0
              while (i < L) {
                val g = n.substring(i, math.min(i + kk, n.length))
                if (seen.add(g)) {
                  md.reset()
                  val dg = md.digest(g.getBytes(java.nio.charset.StandardCharsets.UTF_8))
                  set += java.nio.ByteBuffer.wrap(dg, 0, 8).getLong
                }
                i += 1
              }
              (docId, set.toArray)
            }
          }
        }.toDF("id", "_sh")
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      timed("5 candSets persist+count")(candSets.count())

      // stage 6: verify + checkpoint
      val dupPairs = timed("6 verify + localCheckpoint") {
        Materialize.eager(prefiltered
          .join(candSets.select(col("id").as("id1"), col("_sh").as("_sh1")), Seq("id1"))
          .join(candSets.select(col("id").as("id2"), col("_sh").as("_sh2")), Seq("id2"))
          .filter(Dedup.jaccard(col("_sh1"), col("_sh2")) >= threshold)
          .select("id1", "id2"))
      }

      // stage 7: CC over the pair graph
      val comp = timed("7 dupGroups CC + checkpoint") {
        Materialize.eager(Dedup.dupGroups(dupPairs))
      }

      // stage 8: corpus labeling joins
      timed("8 groups labeling (noop)") {
        val sizes = comp.groupBy("rep_id").agg(count(lit(1)).as("group_size"))
        norm.select(col("id"))
          .join(comp, Seq("id"), "left_outer")
          .withColumn("rep_id", coalesce(col("rep_id"), col("id")))
          .join(sizes, Seq("rep_id"), "left_outer")
          .select(col("id"), col("rep_id"),
            (col("rep_id") =!= col("id")).as("is_dup"),
            coalesce(col("group_size"), lit(1L)).as("group_size"))
          .write.mode("overwrite").format("noop").save()
      }

      sig.unpersist(false); prefiltered.unpersist(false); candSets.unpersist(false)
      spark.catalog.clearCache()
    }
    spark.stop()
    sys.exit(0)
  }
}

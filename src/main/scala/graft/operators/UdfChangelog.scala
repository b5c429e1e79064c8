package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.catalyst.encoders.{ExpressionEncoder, RowEncoder}
import org.apache.spark.sql.types.{DataType, StructField, StructType}

/** Non-deterministic UDF result storage over a CHANGELOG — the reference's
  * differential-dataflow UDF store semantics, decoded from
  * `python/pathway/tests/test_udf.py` (r18 residue close-out):
  *
  *   - `StoredTemporarily` (the default — nothing append-only,
  *     test_udf.py:1023/1813): an INSERTION invokes the UDF fresh and stores
  *     the result under the row key; a RETRACTION replays the stored value
  *     (never recomputes — a counter UDF would lie) and removes it; a
  *     re-insertion computes fresh. A second insertion of a LIVE key is the
  *     reference's EngineError "Expected deletion of a row with key"
  *     (test_udf.py:2014) — raised verbatim.
  *   - `StoredForever` (the UDF's argument column is append-only,
  *     test_udf.py:976/1869): the first computation per key is stored
  *     forever — every later change of the row (retraction, re-insert with
  *     other columns changed) serves the original value; the UDF runs
  *     exactly once per key.
  *   - `NotStored` (the input table itself is append-only,
  *     test_udf.py:943): nothing is stored; every changelog row — including
  *     retractions — invokes the UDF fresh, so a retraction may carry a
  *     DIFFERENT value than its insertion (the reference's "lie that a
  *     table is append only" contract: declaring append-only trades replay
  *     fidelity for zero storage).
  *
  * Spark shape: the reference guarantee "each key is processed by a single
  * worker in time order" (test_udf.py:1820) IS `groupByKey(key)` +
  * per-group time-ordered fold — one shuffle on the key, per-key state only
  * ever one stored value, no driver involvement. At 100 TB the state is
  * bounded by live keys (Temporarily), distinct keys (Forever), or zero
  * (NotStored).
  */
object UdfChangelog {

  sealed trait StorePolicy
  /** Input table declared append-only: nothing stored, every row recomputes. */
  case object NotStored extends StorePolicy
  /** Argument column append-only: first result per key served forever. */
  case object StoredForever extends StorePolicy
  /** Default: stored while the row is live; retraction replays and evicts. */
  case object StoredTemporarily extends StorePolicy

  /** Apply `f(args...)` over a changelog `(keyCol, ..., timeCol, diffCol)`
    * under `policy`, appending `resultCol`. Rows keep their (time, diff)
    * changelog shape; within a timestamp the group first CONSOLIDATES
    * (identical rows with cancelling +1/−1 diffs are a differential no-op
    * and never run the UDF — a same-timestamp transient insert of a dead
    * key is legal, not an error), then retractions process before
    * insertions (the reference's upsert decomposition order). `f` receives
    * the values of `argCols` in order.
    *
    * Spark shape: shuffle once on the key, then a SORT-WITHIN-PARTITIONS
    * streaming fold — per-key state is one stored value and the only
    * buffering is one (key, timestamp) group at a time (the reference's
    * own atomic unit), so a key with millions of changelog rows never
    * materializes in memory (the r18 review's toArray fix). */
  def apply(changelog: DataFrame, keyCol: String, argCols: Seq[String],
      timeCol: String, diffCol: String, policy: StorePolicy,
      resultCol: String, resultType: DataType)(f: Seq[Any] => Any): DataFrame = {
    import org.apache.spark.sql.functions.col
    val inSchema = changelog.schema
    val outSchema = StructType(inSchema.fields :+ StructField(resultCol, resultType))
    val keyIdx = inSchema.fieldIndex(keyCol)
    val timeIdx = inSchema.fieldIndex(timeCol)
    val diffIdx = inSchema.fieldIndex(diffCol)
    val argIdx = argCols.map(inSchema.fieldIndex)
    implicit val rowEnc: ExpressionEncoder[Row] =
      ExpressionEncoder(RowEncoder.encoderFor(outSchema))
    val keyed = changelog
      .repartition(col(keyCol))
      .sortWithinPartitions(col(keyCol), col(timeCol), col(diffCol))
    keyed.mapPartitions { it =>
      // numeric-width tolerant: int/long time and diff columns both work
      def timeOf(r: Row): Long = r.get(timeIdx).asInstanceOf[Number].longValue()
      def diffOf(r: Row): Int = r.get(diffIdx).asInstanceOf[Number].intValue()

      var curKey: String = null
      var stored: Option[Any] = None
      var live = false

      def processGroup(key: String, group: Seq[Row]): Iterator[Row] = {
        // differential consolidation: cancel +/− pairs with identical
        // content (everything except the diff column) inside the timestamp
        def content(r: Row): Seq[Any] =
          r.toSeq.zipWithIndex.collect { case (v, i) if i != diffIdx => v }
        val net = scala.collection.mutable.LinkedHashMap[Seq[Any], Int]()
        group.foreach { r =>
          val c = content(r)
          net(c) = net.getOrElse(c, 0) + diffOf(r)
        }
        val survivors = group.filter { r =>
          val c = content(r)
          val n = net(c)
          if (n == 0) false // fully cancelled (or already used up)
          else if (diffOf(r) > 0 == n > 0) {
            // keep |net| rows of the winning sign; the counter hitting 0
            // drops any same-content same-sign rows beyond |net|
            net(c) = if (n > 0) n - 1 else n + 1
            true
          } else false // losing-sign row: cancelled by the consolidation
        }
        // retractions before insertions (already diff-ascending from the
        // partition sort, but consolidation may have reordered survivors)
        survivors.sortBy(diffOf).iterator.map { r =>
          val diff = diffOf(r)
          val args = argIdx.map(r.get)
          val value = policy match {
            case NotStored => f(args)
            case StoredForever =>
              if (stored.isEmpty) stored = Some(f(args))
              stored.get
            case StoredTemporarily =>
              if (diff > 0) {
                if (live) throw new IllegalStateException(
                  s"Expected deletion of a row with key $key")
                live = true
                stored = Some(f(args))
                stored.get
              } else {
                val v = stored.getOrElse(throw new IllegalStateException(
                  s"Got deletion of a row with key $key that was not inserted"))
                live = false
                stored = None
                v
              }
          }
          Row.fromSeq(r.toSeq :+ value)
        }
      }

      val buf = scala.collection.mutable.ArrayBuffer.empty[Row]
      var bufTime = 0L
      new Iterator[Row] {
        private var pending: Iterator[Row] = Iterator.empty
        private def refill(): Unit = {
          while (!pending.hasNext && (it.hasNext || buf.nonEmpty)) {
            if (!it.hasNext) {
              // STRICT evaluation: the fold mutates stored/live, and the
              // key-change branch below resets them — a lazy iterator would
              // evaluate after the reset
              pending = processGroup(curKey, buf.toSeq).toVector.iterator
              buf.clear()
            } else {
              val r = it.next()
              val k = String.valueOf(r.get(keyIdx)); val t = timeOf(r)
              if (buf.isEmpty) { curKey = k; bufTime = t; buf += r }
              else if (k == curKey && t == bufTime) buf += r
              else {
                pending = processGroup(curKey, buf.toSeq).toVector.iterator
                buf.clear()
                if (k != curKey) { stored = None; live = false }
                curKey = k; bufTime = t; buf += r
              }
            }
          }
        }
        def hasNext: Boolean = { refill(); pending.hasNext }
        def next(): Row = { refill(); pending.next() }
      }
    }(rowEnc).toDF()
  }
}

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
    * changelog shape; within a timestamp, retractions process first (the
    * reference's upsert decomposition order). `f` receives the values of
    * `argCols` in order. */
  def apply(changelog: DataFrame, keyCol: String, argCols: Seq[String],
      timeCol: String, diffCol: String, policy: StorePolicy,
      resultCol: String, resultType: DataType)(f: Seq[Any] => Any): DataFrame = {
    val inSchema = changelog.schema
    val outSchema = StructType(inSchema.fields :+ StructField(resultCol, resultType))
    val keyIdx = inSchema.fieldIndex(keyCol)
    val timeIdx = inSchema.fieldIndex(timeCol)
    val diffIdx = inSchema.fieldIndex(diffCol)
    val argIdx = argCols.map(inSchema.fieldIndex)
    implicit val rowEnc: ExpressionEncoder[Row] =
      ExpressionEncoder(RowEncoder.encoderFor(outSchema))
    implicit val keyEnc: ExpressionEncoder[String] = ExpressionEncoder[String]()
    changelog.groupByKey(r => String.valueOf(r.get(keyIdx)))
      .flatMapGroups { (key: String, it: Iterator[Row]) =>
        // per-key fold in time order, retractions first within a timestamp
        // (numeric-width tolerant: int/long time and diff columns both work)
        val rows = it.toArray.sortBy(r =>
          (r.get(timeIdx).asInstanceOf[Number].longValue(),
            r.get(diffIdx).asInstanceOf[Number].intValue()))
        var stored: Option[Any] = None
        var live = false
        rows.iterator.map { r =>
          val diff = r.get(diffIdx).asInstanceOf[Number].intValue()
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
      }.toDF()
  }
}

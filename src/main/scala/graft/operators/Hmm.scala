package graft.operators

import org.apache.spark.sql.{DataFrame, Encoder, Encoders}
import org.apache.spark.sql.functions._

/** Hidden-Markov-Model decoding (reference
  * python/pathway/stdlib/ml/hmm.py:create_hmm_reducer — a udf_reducer that
  * Viterbi-decodes an ordered observation stream per group, with optional
  * beam pruning).
  *
  * Spark shape: decoding is inherently sequential in the observation order,
  * so the distributed axis is the NUMBER of sequences, not their length —
  * `decode` groups by key and runs the per-sequence dynamic program inside
  * `mapGroups` (the same custom-stateful-kernel tier as acceptor-dedup). The
  * model is a plain serializable value broadcast with the closure.
  */
final case class HmmModel(
    states: Seq[String],
    startLogProb: Map[String, Double],
    transLogProb: Map[(String, String), Double],
    emitLogProb: Map[(String, String), Double]) extends Serializable {
  def trans(a: String, b: String): Double =
    transLogProb.getOrElse((a, b), Double.NegativeInfinity)
  def emit(s: String, obs: String): Double =
    emitLogProb.getOrElse((s, obs), Double.NegativeInfinity)
  def start(s: String): Double =
    startLogProb.getOrElse(s, Double.NegativeInfinity)
}

object Hmm {

  /** Most-likely state path for one observation sequence (classic Viterbi;
    * `beamSize` keeps only the best states per step — the reference's
    * beam_size pruning). Ties break toward the lexicographically smaller
    * state so the path is deterministic. */
  def viterbi(model: HmmModel, obs: Seq[String], beamSize: Option[Int] = None): Seq[String] = {
    if (obs.isEmpty) return Seq.empty
    val ordered = model.states.sorted
    var scores: Map[String, (Double, List[String])] = ordered.map { s =>
      s -> (model.start(s) + model.emit(s, obs.head), List(s))
    }.toMap
    def prune(m: Map[String, (Double, List[String])]) = beamSize match {
      case Some(b) => m.toSeq.sortBy { case (s, (p, _)) => (-p, s) }.take(b).toMap
      case None => m
    }
    scores = prune(scores)
    obs.tail.foreach { o =>
      val alive = ordered.filter(scores.contains)
      scores = prune(ordered.map { s =>
        val e = model.emit(s, o)
        // predecessors scanned in sorted-state order, first kept on ties —
        // the path is deterministic and oracle-reproducible
        val best = alive
          .map { p => val (sc, path) = scores(p); (sc + model.trans(p, s) + e, path) }
          .reduceLeft((a, b) => if (b._1 > a._1) b else a)
        s -> (best._1, s :: best._2)
      }.toMap)
    }
    scores.toSeq.sortBy { case (s, (p, _)) => (-p, s) }.head._2._2.reverse
  }

  /** Decode per key: rows (keyCols, orderCol, obsCol) → one row per key with
    * the decoded `path: array<string>` in `orderCol` order. */
  def decode(df: DataFrame, model: HmmModel, keyCol: String, orderCol: String,
      obsCol: String, beamSize: Option[Int] = None): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    implicit val enc: Encoder[(String, Long, String)] =
      Encoders.tuple(Encoders.STRING, Encoders.scalaLong, Encoders.STRING)
    df.select(col(keyCol).cast("string"), col(orderCol).cast("long"), col(obsCol).cast("string"))
      .as[(String, Long, String)]
      .groupByKey(_._1)
      .mapGroups { (k, it) =>
        val obs = it.toSeq.sortBy(r => (r._2, r._3)).map(_._3)
        (k, viterbi(model, obs, beamSize))
      }
      .toDF(keyCol, "path")
  }
}

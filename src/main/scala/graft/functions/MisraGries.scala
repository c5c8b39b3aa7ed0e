package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Misra-Gries heavy-hitter summary as a typed, MERGEABLE
  * [[Aggregator]] — the deterministic-guarantee counterpart of the
  * relational count-min sketch (q86): constant footprint (at most `k`
  * counters at ANY corpus size), one-sided error, and a coverage
  * guarantee instead of a probabilistic bound.
  *
  * Invariants (n = total summarized weight, after any merge order):
  *  - est(t) <= true(t)                      (never overcounts)
  *  - est(t) >= true(t) - n/(k+1)            (bounded undercount)
  *  - every t with true(t) > n/(k+1) is present in the summary
  *
  * The proof-shape is the classic charging argument: each decrement
  * round subtracts the same `m` from >= k+1 counters' worth of mass, so
  * the total subtracted per item is <= n/(k+1); merging two summaries
  * adds counts pointwise then re-runs one decrement round, which
  * preserves the bound (Agarwal et al., "Mergeable Summaries").
  *
  * Input is WEIGHTED (token, count) pairs, so it composes with a
  * map-side-combined `groupBy(tok).count()` pre-aggregation: Spark runs
  * this Aggregator's `reduce` on partial per-partition streams and
  * `merge` across partitions — the summary content can depend on the
  * partitioning, but the three invariants above hold for every merge
  * order, and THEY are the query contract (q124 gates them, q43-style).
  */
final case class MisraGries(k: Int)
    extends Aggregator[(String, Long), Map[String, Long], Map[String, Long]] {

  override def zero: Map[String, Long] = Map.empty

  private def shrink(m: Map[String, Long]): Map[String, Long] =
    if (m.size <= k) m
    else {
      // subtract the (k+1)-th largest count from everything, drop <= 0:
      // at most k strictly-larger entries can survive
      val cut = m.values.toSeq.sorted(Ordering[Long].reverse)(k)
      m.collect { case (t, c) if c > cut => t -> (c - cut) }
    }

  override def reduce(b: Map[String, Long], a: (String, Long)): Map[String, Long] = {
    val (tok, w) = a
    if (w <= 0L) b else shrink(b.updated(tok, b.getOrElse(tok, 0L) + w))
  }

  override def merge(b1: Map[String, Long], b2: Map[String, Long]): Map[String, Long] =
    shrink(b2.foldLeft(b1) { case (acc, (t, c)) =>
      acc.updated(t, acc.getOrElse(t, 0L) + c)
    })

  override def finish(r: Map[String, Long]): Map[String, Long] = r

  override def bufferEncoder: Encoder[Map[String, Long]] =
    Encoders.kryo[Map[String, Long]]
  override def outputEncoder: Encoder[Map[String, Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Map[String, Long]]()
}

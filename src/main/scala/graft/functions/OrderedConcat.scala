package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** A2 fidelity variant (SURVEY.md §2.11): MySQL `GROUP_CONCAT` with
  * explicit ORDER BY / DISTINCT / separator semantics as a typed
  * [[Aggregator]]. The engine default is
  * `array_join(sort_array(collect_list(x)), sep)` (canonicalized); this
  * exists for callers needing DISTINCT or a custom separator in a single
  * typed aggregation.
  */
final case class OrderedConcat(sep: String = ",", distinct: Boolean = false)
    extends Aggregator[String, List[String], String] {

  override def zero: List[String] = Nil
  override def reduce(b: List[String], a: String): List[String] =
    if (a == null) b else a :: b
  override def merge(b1: List[String], b2: List[String]): List[String] =
    b1 ::: b2
  override def finish(r: List[String]): String = {
    val xs = if (distinct) r.distinct else r
    xs.sorted.mkString(sep)
  }
  override def bufferEncoder: Encoder[List[String]] = Encoders.kryo[List[String]]
  override def outputEncoder: Encoder[String] = Encoders.STRING
}

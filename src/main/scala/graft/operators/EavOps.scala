package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** EAV (entity-attribute-value) widening — SURVEY.md J1.
  *
  * The reference widens `wp_usermeta` with three self-joins under aliases
  * (reference: libs/export/authors.js:22-24), dropping entities missing any
  * key (INNER). At scale, N self-joins are N shuffles of the same table; a
  * single groupBy+pivot is one shuffle with map-side partial aggregation.
  */
object EavOps {

  /** Pivot an EAV table to wide columns: one row per entity, one column per
    * key in `keys` (explicit key list keeps the plan static — no extra
    * distinct-scan job, and a stable schema at any scale).
    * Missing keys become NULL (left-outer semantics, unlike the reference's
    * silent inner-join drop; callers wanting drop semantics filter after).
    */
  def pivot(eav: DataFrame, entityCol: String, keyCol: String,
            valueCol: String, keys: Seq[String]): DataFrame =
    eav.groupBy(col(entityCol))
      .pivot(keyCol, keys)
      .agg(first(col(valueCol), ignoreNulls = true))

  /** EAV to a MapType column (`map_from_entries(collect_list(...))`) for
    * dynamic key sets where a fixed wide schema is impossible. */
  def toMap(eav: DataFrame, entityCol: String, keyCol: String,
            valueCol: String, asCol: String = "meta"): DataFrame =
    eav.groupBy(col(entityCol))
      .agg(map_from_entries(collect_list(struct(col(keyCol), col(valueCol))))
        .as(asCol))

  /** The naive N-arm self-join chain exactly as a user ports the
    * reference's SQL (authors.js:22-24): one filtered arm per key,
    * inner-joined on the entity id. Output: (entityCol, keys...), with
    * each key's column holding that arm's value. Entities missing any
    * key are dropped (inner semantics). This is the shape
    * [[graft.plans.EavPivotRule]] rewrites to a one-scan pivot when
    * `spark.graft.eav.pivotJoinChains` + `spark.graft.eav.entityColumn`
    * opt in — kept here so catalog queries and specs exercise the REAL
    * user-written plan, not a hand-tuned one. */
  def selfJoinChain(eav: DataFrame, entityCol: String, keyCol: String,
                    valueCol: String, keys: Seq[String]): DataFrame = {
    require(keys.nonEmpty)
    val head = eav.filter(col(keyCol) === keys.head)
      .select(col(entityCol), col(valueCol).as(keys.head))
    val joined = keys.zipWithIndex.drop(1).foldLeft(head) {
      case (acc, (k, i)) =>
        val arm = eav.filter(col(keyCol) === k)
          .select(col(entityCol).as(s"__e$i"), col(valueCol).as(k))
        acc.join(arm, col(entityCol) === col(s"__e$i"))
    }
    joined.select(col(entityCol) +: keys.map(col): _*)
  }

  /** Unpivot wide columns into EAV rows (inverse of [[pivot]]); values are
    * cast to string. Generates rows via a map literal + explode (narrow,
    * no shuffle). */
  def unpivot(df: DataFrame, entityCol: String, keys: Seq[String],
              keyCol: String = "meta_key", valueCol: String = "meta_value"): DataFrame = {
    val kvs = keys.flatMap(k => Seq(lit(k), col(k).cast("string")))
    df.select(col(entityCol), explode(map(kvs: _*)).as(Seq(keyCol, valueCol)))
  }
}

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

  /** Unpivot wide columns into EAV rows (inverse of [[pivot]]); values are
    * cast to string. Generates rows via a map literal + explode (narrow,
    * no shuffle). */
  def unpivot(df: DataFrame, entityCol: String, keys: Seq[String],
              keyCol: String = "meta_key", valueCol: String = "meta_value"): DataFrame = {
    val kvs = keys.flatMap(k => Seq(lit(k), col(k).cast("string")))
    df.select(col(entityCol), explode(map(kvs: _*)).as(Seq(keyCol, valueCol)))
  }
}

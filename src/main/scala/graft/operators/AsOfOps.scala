package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Backward as-of join — an operator Spark lacks natively (engine
  * extension; DuckDB's native ASOF JOIN serves as the oracle).
  *
  * For each left row, attach the id of the latest right row with
  * `rightTs <= leftTs` in the same key group. Implemented by composition
  * per the preference ladder (SURVEY.md §7.3 option (a)): tag and union
  * both sides, then carry the most recent right id with a running
  * `last(ignoreNulls)` window. One shuffle on the key; ordering
  * (ts, tag, id) makes right rows at equal ts visible to left rows
  * (inclusive bound) and resolves ties deterministically by max id.
  *
  * Callers should make the right side unique per (key, ts) (e.g.
  * groupBy + max(id)) — as-of semantics are ambiguous otherwise.
  */
object AsOfOps {

  def asofJoinLastBefore(left: DataFrame, right: DataFrame, keys: Seq[String],
                         leftTs: String, rightTs: String,
                         rightId: String): DataFrame = {
    val lTagged = left
      .withColumn("__ts", col(leftTs))
      .withColumn("__tag", lit(1))
      .withColumn("__rid", lit(null).cast("long"))
    val rTagged = right
      .select((keys.map(col) :+ col(rightTs).as("__ts") :+
        col(rightId).cast("long").as("__rid")): _*)
      .withColumn("__tag", lit(0))
    val unioned = lTagged.unionByName(rTagged, allowMissingColumns = true)
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("__ts").asc, col("__tag").asc, col("__rid").asc_nulls_last)
    unioned
      .withColumn(rightId,
        last(col("__rid"), ignoreNulls = true)
          .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .filter(col("__tag") === 1)
      .drop("__ts", "__tag", "__rid")
  }
}

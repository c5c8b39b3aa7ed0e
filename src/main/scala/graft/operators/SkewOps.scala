package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-handling aggregation: two-stage salted aggregate.
  *
  * A plain `groupBy(key).agg(sum)` on a low-cardinality/skewed key sends
  * every row for a hot key to one reducer. Salting splits each key into
  * `salts` subkeys (stage 1, map-side + shuffled on (key, salt)), then
  * combines the partials (stage 2, tiny shuffle on key). The result is
  * bit-identical to the unsalted aggregate for decomposable aggregates
  * (sum/count/min/max) — the DuckDB oracle runs the plain GROUP BY.
  *
  * AQE's skew-join handling covers joins; this covers aggregations, where
  * AQE does not split hot groups.
  */
object SkewOps {

  /** Salted equi-join for a skewed join key: the big (skewed) side gets a
    * content-hash salt in [0, salts), the small side is replicated once
    * per salt value, and the join runs on (key, salt) — so a hot key's
    * rows spread over `salts` reducers instead of stalling one. Result is
    * row-identical to the plain equi-join (each big row matches exactly
    * the replica carrying its salt).
    *
    * This is the manual form of what AQE's skew-join split does for
    * sort-merge joins at runtime; it exists for the cases AQE doesn't
    * cover (first execution before stats, skew landing in a
    * non-splittable stage, deterministic plan requirements). Same
    * retry-safety rationale as [[saltedAgg]]: the salt is a pure function
    * of row content, so shuffle-fetch-failure recomputation lands every
    * row back on the reducer its partials already reached.
    *
    * The small side grows `salts`×: size it so replicated-small still
    * beats hot-key-on-one-reducer (salts 8-32 covers most skew; past
    * that, isolate the hot keys and broadcast just them). */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String,
                 salts: Int): DataFrame = {
    val bs = big.withColumn("__salt",
      pmod(hash(big.columns.toIndexedSeq.map(col): _*), lit(salts)))
    val ss = small.withColumn("__salt",
      explode(sequence(lit(0), lit(salts - 1))))
    bs.join(ss, Seq(key, "__salt")).drop("__salt")
  }

  /** Salted sum/count per key. `sumExprs` map output name -> column to
    * sum (pre-cast as needed, e.g. to DecimalType for exactness).
    *
    * The salt derives from the ROW CONTENT (hash of every input column),
    * never from a nondeterministic expression like
    * monotonically_increasing_id(): when a map task is recomputed after
    * a shuffle-fetch failure (routine at 100 TB), every re-executed row
    * must land on the same (key, salt) reducer as the partials already
    * fetched, or stage-1 sums double-count/drop rows. Identical rows
    * sharing a salt skews the split slightly; correctness under retry
    * wins. */
  def saltedAgg(df: DataFrame, keyCols: Seq[String], salts: Int,
                sumExprs: Map[String, Column],
                countName: Option[String] = Some("n")): DataFrame = {
    val salted = df.withColumn("__salt",
      pmod(hash(df.columns.toIndexedSeq.map(col): _*), lit(salts)))
    val stage1Aggs =
      sumExprs.map { case (name, c) => sum(c).as(s"__s_$name") }.toSeq ++
        countName.map(_ => count(lit(1)).as("__s_cnt")).toSeq
    val stage1 = salted
      .groupBy((keyCols.map(col) :+ col("__salt")): _*)
      .agg(stage1Aggs.head, stage1Aggs.tail: _*)
    val stage2Aggs =
      sumExprs.keys.map(name => sum(col(s"__s_$name")).as(name)).toSeq ++
        countName.map(n => sum(col("__s_cnt")).as(n)).toSeq
    stage1.groupBy(keyCols.map(col): _*)
      .agg(stage2Aggs.head, stage2Aggs.tail: _*)
  }
}

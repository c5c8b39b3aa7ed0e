package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Bucketized range (interval) join — engine extension. A pure range
  * predicate (`rightTs ∈ (leftTs - window, leftTs]`, no equi key) plans
  * as an O(n·m) nested loop in Spark. Bucketizing both sides by
  * `window`-sized time buckets turns it into a hash equi-join: a right
  * row inside the window can only be in the left row's bucket or the one
  * before it, so each left row probes exactly 2 buckets. Exact — the
  * range predicate re-filters candidates.
  */
object RangeOps {

  /** Count right rows with ts in (leftTs - windowUs, leftTs] for each
    * left row. `leftId` must be unique. */
  def bucketedRangeCount(left: DataFrame, right: DataFrame, leftId: String,
                         leftTs: String, rightTs: String, windowUs: Long,
                         outCol: String = "n_in_range"): DataFrame = {
    // cast-to-ltz first: the testdata parquet carries un-annotated
    // timestamps (Spark reads TIMESTAMP_NTZ, which unix_micros rejects);
    // under the pinned UTC session timezone the cast is the identity for
    // both NTZ and LTZ inputs, so epoch arithmetic is generation-proof
    val l = left
      .withColumn("__lus", unix_micros(col(leftTs).cast("timestamp")))
      .withColumn("__bucket",
        explode(array(expr(s"__lus div ${windowUs}L"),
          expr(s"__lus div ${windowUs}L - 1L"))))
    val r = right
      .withColumn("__rus", unix_micros(col(rightTs).cast("timestamp")))
      .withColumn("__bucket", expr(s"__rus div ${windowUs}L"))
      .select(col("__bucket"), col("__rus"))
    val counts = l.join(r, "__bucket")
      .filter(col("__rus") > col("__lus") - windowUs &&
              col("__rus") <= col("__lus"))
      .groupBy(col(leftId))
      .agg(count(lit(1)).as(outCol))
    left.join(counts, Seq(leftId), "left_outer")
      .withColumn(outCol, coalesce(col(outCol), lit(0L)))
  }
}

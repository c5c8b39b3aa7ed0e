package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton-curve) clustered file layout for multi-dimensional
  * data skipping.
  *
  * A 100 TB table sorted by ONE key prunes parquet row groups only for
  * predicates on that key; filters on any other column scan everything.
  * Interleaving the bits of two (quantized) key columns and range-
  * partitioning + sorting by that z-value gives every written file a
  * tight min/max envelope in BOTH dimensions — so footer-stats pruning
  * (Spark's parquet filter pushdown, or any lakehouse file-skipping
  * index) cuts scans for predicates on either column. This is the same
  * layout Delta/Iceberg expose as `OPTIMIZE ... ZORDER BY`; here it is
  * plain Spark: an expression + repartitionByRange + sortWithinPartitions
  * — nothing engine-private.
  *
  * The z-value is a pure codegen'd bit-interleave (32 shift/mask terms —
  * the SimHash precedent), so clustering a corpus costs exactly one
  * range shuffle. ZOrderSpec proves the payoff from parquet footers:
  * after a z-ordered write, single-dimension bands on EITHER column
  * overlap a strict subset of files, while the linear layout prunes one
  * dimension and reads everything for the other.
  */
object ZOrderLayout {

  /** Affine quantization of a long column from [lo, hi] onto
    * [0, 2^bits). Callers supply lo/hi from catalog stats (parquet
    * footers — the graft.catalog.Stats pattern), NOT from an extra scan.
    * (v - lo) * 2^bits must stay under 2^63: fine for bits <= 16 and
    * ranges under 2^46; re-scale wider domains before quantizing. */
  def minMaxQuantize(c: Column, lo: Long, hi: Long, bits: Int): Column = {
    require(hi >= lo && bits > 0 && bits <= 16)
    // integral `div`, NOT Column./ (which is double division and loses
    // exactness once the scaled numerator passes 2^53 — the documented
    // 2^46-range envelope would silently misbucket boundary rows).
    // The INPUT is clamped into [lo, hi] BEFORE the multiply: catalog
    // stats can be stale (a file landed after ANALYZE), and an
    // out-of-range value scaled by 2^bits could overflow 2^63 (ANSI
    // abort, or a wrapped mid-range bucket) before any output clamp
    // ran. Clamped input keeps the numerator inside the documented
    // envelope and lands outliers on the edge buckets.
    val cl = greatest(lit(lo), least(lit(hi), c.cast("long")))
    call_function("div", (cl - lo) * (1L << bits), lit(hi - lo + 1L))
  }

  /** Morton interleave of two pre-quantized non-negative columns:
    * x occupies even bit positions, y odd. Codegen'd shift/mask sum —
    * no UDF, stays inside whole-stage codegen. */
  def zvalue(x: Column, y: Column, bits: Int = 16): Column = {
    require(bits > 0 && bits <= 31)
    (0 until bits).map { i =>
      shiftleft(shiftright(x.cast("long"), i).bitwiseAND(lit(1L)), 2 * i) +
        shiftleft(shiftright(y.cast("long"), i).bitwiseAND(lit(1L)), 2 * i + 1)
    }.reduce(_ + _)
  }

  /** Write `df` as `files` parquet files clustered on the z-curve:
    * one range shuffle on the z-value (sampled boundaries — Spark's
    * RangePartitioner), in-partition sort so row groups inside each
    * file are tight too. */
  def writeZOrdered(df: DataFrame, path: String, z: Column,
                    files: Int): Unit =
    df.withColumn("__z", z)
      .repartitionByRange(files, col("__z"))
      .sortWithinPartitions(col("__z"))
      .drop("__z")
      .write.mode("overwrite").parquet(path)

  /** DETERMINISTIC variant of [[writeZOrdered]]: identical byte layout
    * on every run over the same data — AT AUDIT/TEST SCALE. The
    * boundaries come from `approxQuantile`, whose Greenwald-Khanna
    * per-partition summaries merge in task-completion order; while the
    * summaries stay uncompressed (inputs small enough that no GK
    * compression triggers — the audit/golden-file sizes this writer
    * exists for) the merged result is order-insensitive and the layout
    * is a pure function of the data. On inputs large enough to compress
    * the sketch, boundaries can vary by merge order; use
    * [[writeZOrdered]] there — jitter is acceptable on the routine
    * throughput path.
    *
    * `repartitionByRange` draws its boundaries from RangePartitioner's
    * reservoir sketch, whose per-partition seed mixes in `rdd.id` — a
    * GLOBAL SparkContext counter, so the boundaries (and therefore each
    * file's min/max envelope) depend on how many RDDs the context
    * created before this write. Fine for throughput layouts; wrong for
    * a layout AUDIT (ZOrderSpec flaked ~1-in-15 full-suite runs on
    * exactly this: green isolated, boundary jitter under concurrent
    * suites). Here the boundaries come from a deterministic
    * Greenwald-Khanna quantile pass (no sampling seed anywhere), and
    * rows are routed by an EXPLICIT bucket->file partitioner, so the
    * written envelopes are a pure function of the data.
    *
    * Cost/scale: one extra aggregation pass for the quantiles (the
    * boundary list is `files - 1` scalars on the driver — model-sized)
    * plus one RDD round-trip for the exact partitioner. Use the sampled
    * variant for routine 100 TB re-clustering; use this one when the
    * output layout must be reproducible (audits, golden files, tests).
    */
  def writeZOrderedExact(df: DataFrame, path: String, z: Column,
                         files: Int): Unit = {
    require(files > 1)
    val spark = df.sparkSession
    val withZ = df.withColumn("__z", z.cast("long"))
    val probs = (1 until files).map(_.toDouble / files).toArray
    val bounds = withZ.stat.approxQuantile("__z", probs, 1e-4)
      .map(_.toLong)
    val bucket = bounds.foldLeft(lit(0)) { (acc, b) =>
      acc + when(col("__z") > lit(b), 1).otherwise(0)
    }
    val bucketed = withZ.withColumn("__b", bucket)
    val schema = bucketed.schema
    val bIdx = schema.fieldIndex("__b")
    val parted = bucketed.rdd
      .map(r => (r.getInt(bIdx), r))
      .partitionBy(new org.apache.spark.Partitioner {
        def numPartitions: Int = files
        def getPartition(key: Any): Int = key.asInstanceOf[Int]
      })
      .values
    spark.createDataFrame(parted, schema)
      .sortWithinPartitions(col("__z"))
      .drop("__z", "__b")
      .write.mode("overwrite").parquet(path)
  }
}

package graft

import org.apache.hadoop.fs.Path
import org.apache.parquet.hadoop.ParquetFileReader
import org.apache.parquet.hadoop.util.HadoopInputFile
import org.scalatest.funsuite.AnyFunSuite

import graft.catalog.Tables
import graft.sources.ZOrderLayout

/** Evidence that the z-order layout actually skips: parquet footer
  * min/max stats per written file, checked against band predicates on
  * each dimension — the exact mechanism a 100 TB engine's file-pruning
  * index uses, measured without running a query.
  */
class ZOrderSpec extends AnyFunSuite {
  /** Isolated session (own SQLConf over the shared context): suites run
    * concurrently in one JVM and ScaleSpec mutates AQE/broadcast confs on
    * the shared session mid-flight (advisoryPartitionSizeInBytes=32KB,
    * skew-join thresholds) — which can re-plan this suite's range shuffle
    * and flake the file-count assertions (round-10 verdict #2: failed
    * 1-of-2 full-suite runs, green isolated). AQE is pinned off here so
    * the 8-file layout is deterministic regardless of suite ordering. */
  lazy val spark = {
    val s = SparkTestSession.spark.newSession()
    s.conf.set("spark.sql.adaptive.enabled", "false")
    s
  }

  private val sf = "/root/testdata/sf0.001"

  test("zvalue matches a reference bit-interleave") {
    import spark.implicits._
    val ref = (x: Long, y: Long) =>
      (0 until 16).map(i => (((x >> i) & 1L) << (2 * i)) |
        (((y >> i) & 1L) << (2 * i + 1))).sum
    val pairs = Seq((0L, 0L), (1L, 0L), (0L, 1L), (65535L, 65535L),
      (12345L, 54321L), (40000L, 1L))
    val got = pairs.toDF("x", "y")
      .select(ZOrderLayout.zvalue(org.apache.spark.sql.functions.col("x"),
        org.apache.spark.sql.functions.col("y")).as("z"))
      .collect().map(_.getLong(0)).toSeq
    assert(got == pairs.map { case (x, y) => ref(x, y) })
  }

  test("minMaxQuantize is exact past 2^53 and clamps stale-stat outliers") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val lo = 0L
    val hi = (1L << 46) - 1 // documented envelope: scaled numerator ~2^62
    // boundary values whose double-division quantile would be off by ulps
    val vals = Seq(0L, hi, hi / 2, hi / 2 + 1,
      // stale-stats outliers: below lo and FAR above hi (2^48 — scaled
      // by 2^16 this would overflow 2^63 without input clamping) must
      // land on the edge buckets, not abort or wrap
      -5L, hi + 12345L, 1L << 48, Long.MaxValue, Long.MinValue)
    val got = vals.toDF("v")
      .select(ZOrderLayout.minMaxQuantize(col("v"), lo, hi, 16).as("q"))
      .collect().map(_.getLong(0)).toSeq
    def ref(v: Long): Long = {
      val cl = v.max(lo).min(hi)
      (BigInt(cl - lo) * 65536 / BigInt(hi - lo + 1)).toLong
    }
    assert(got == vals.map(ref))
    assert(got.forall(q => q >= 0 && q <= 65535))
  }

  /** Per-file [min,max] of an INT64 column from parquet footers. */
  private def fileRanges(dir: String, column: String): Seq[(Long, Long)] = {
    val conf = spark.sessionState.newHadoopConf()
    val p = new Path(dir)
    val fs = p.getFileSystem(conf)
    val files = fs.listStatus(p).map(_.getPath)
      .filter(_.getName.endsWith(".parquet")).toSeq
    files.map { f =>
      val r = ParquetFileReader.open(HadoopInputFile.fromPath(f, conf))
      try {
        val blocks = r.getFooter.getBlocks
        import scala.jdk.CollectionConverters._
        val stats = blocks.asScala.flatMap { b =>
          b.getColumns.asScala
            .find(_.getPath.toDotString == column).map(_.getStatistics)
        }
        val mins = stats.map(_.genericGetMin.asInstanceOf[Long])
        val maxs = stats.map(_.genericGetMax.asInstanceOf[Long])
        (mins.min, maxs.max)
      } finally r.close()
    }
  }

  private def overlapping(ranges: Seq[(Long, Long)], lo: Long, hi: Long): Int =
    ranges.count { case (mn, mx) => lo <= mx && mn <= hi }

  test("z-ordered layout skips on BOTH dimensions; linear layout only on one") {
    import spark.implicits._
    val li = Tables.t(spark, sf, "lineitem")
      .select($"l_orderkey", $"l_partkey", $"l_quantity")
    val (okLo, okHi, pkLo, pkHi) = {
      val r = li.agg(
        org.apache.spark.sql.functions.min($"l_orderkey"),
        org.apache.spark.sql.functions.max($"l_orderkey"),
        org.apache.spark.sql.functions.min($"l_partkey"),
        org.apache.spark.sql.functions.max($"l_partkey")).head()
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
    }
    val z = ZOrderLayout.zvalue(
      ZOrderLayout.minMaxQuantize($"l_orderkey", okLo, okHi, 16),
      ZOrderLayout.minMaxQuantize($"l_partkey", pkLo, pkHi, 16))
    // unique dirs per run: a fixed path invites cross-run leftovers
    val zDir = java.nio.file.Files.createTempDirectory("zorder_li_").toString
    val linDir = java.nio.file.Files.createTempDirectory("linear_li_").toString
    // EXACT writer on both sides: repartitionByRange's boundaries come
    // from a sketch seeded by rdd.id (global context counter), so file
    // envelopes jitter with suite-execution history — the residual
    // source of this suite's rare full-suite-only flake (r10, recurred
    // once in r12). The GK-quantile + explicit-partitioner variant is a
    // pure function of the data.
    ZOrderLayout.writeZOrderedExact(li, zDir, z, files = 8)
    ZOrderLayout.writeZOrderedExact(li, linDir, $"l_orderkey", files = 8)

    // middle 1/8 band on each dimension
    def band(lo: Long, hi: Long): (Long, Long) = {
      val w = hi - lo + 1
      (lo + w * 3 / 8, lo + w * 4 / 8 - 1)
    }
    val (obLo, obHi) = band(okLo, okHi)
    val (pbLo, pbHi) = band(pkLo, pkHi)

    val zOk = overlapping(fileRanges(zDir, "l_orderkey"), obLo, obHi)
    val zPk = overlapping(fileRanges(zDir, "l_partkey"), pbLo, pbHi)
    val linOk = overlapping(fileRanges(linDir, "l_orderkey"), obLo, obHi)
    val linPk = overlapping(fileRanges(linDir, "l_partkey"), pbLo, pbHi)

    // linear layout: razor-sharp on its sort key, blind on the other
    assert(linOk <= 2, s"linear orderkey band should hit <=2 of 8 files, got $linOk")
    assert(linPk >= 7, s"linear partkey band should hit ~all files, got $linPk")
    // z-order: BOTH dimensions prune (the balanced-skipping claim);
    // theory for a 1/8 band with 8 files is ~4 hits (3 fixed bits split
    // the curve into 4 runs) — assert strictly-better-than-blind with
    // margin for range-sample boundary jitter
    assert(zOk >= 1 && zOk <= 6, s"z-order orderkey band hit $zOk of 8 files")
    assert(zPk >= 1 && zPk <= 6, s"z-order partkey band hit $zPk of 8 files")
    // and the balanced layout beats the linear one on the non-sort dim
    assert(zPk < linPk)
  }

  test("SAMPLED z-order writer (the routine 100 TB path) also skips " +
    "on both dimensions, within documented boundary-jitter tolerance") {
    import spark.implicits._
    val li = Tables.t(spark, sf, "lineitem")
      .select($"l_orderkey", $"l_partkey", $"l_quantity")
    val (okLo, okHi, pkLo, pkHi) = {
      val r = li.agg(
        org.apache.spark.sql.functions.min($"l_orderkey"),
        org.apache.spark.sql.functions.max($"l_orderkey"),
        org.apache.spark.sql.functions.min($"l_partkey"),
        org.apache.spark.sql.functions.max($"l_partkey")).head()
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
    }
    val z = ZOrderLayout.zvalue(
      ZOrderLayout.minMaxQuantize($"l_orderkey", okLo, okHi, 16),
      ZOrderLayout.minMaxQuantize($"l_partkey", pkLo, pkHi, 16))
    val zDir = java.nio.file.Files.createTempDirectory("zorder_smp_").toString
    // writeZOrdered = repartitionByRange: boundaries come from a
    // reservoir sketch seeded by rdd.id, so envelopes JITTER run to run
    // (ZOrderLayout doc; the r10/r12 flake). The exact-writer test above
    // pins the tight envelope; THIS test asserts the production path's
    // skipping PROPERTY with tolerance wide enough for that jitter:
    // a middle-1/8 band on either dimension must never need every file
    // (theory ~4 of 8; jitter has only ever moved boundaries by one
    // file's width, so <= 6 leaves two files of slack on each side).
    ZOrderLayout.writeZOrdered(li, zDir, z, files = 8)
    def band(lo: Long, hi: Long): (Long, Long) = {
      val w = hi - lo + 1
      (lo + w * 3 / 8, lo + w * 4 / 8 - 1)
    }
    val (obLo, obHi) = band(okLo, okHi)
    val (pbLo, pbHi) = band(pkLo, pkHi)
    val zOk = overlapping(fileRanges(zDir, "l_orderkey"), obLo, obHi)
    val zPk = overlapping(fileRanges(zDir, "l_partkey"), pbLo, pbHi)
    assert(zOk >= 1 && zOk <= 6,
      s"sampled z-order orderkey band hit $zOk of 8 files (skip >= 2 expected)")
    assert(zPk >= 1 && zPk <= 6,
      s"sampled z-order partkey band hit $zPk of 8 files (skip >= 2 expected)")
  }
}

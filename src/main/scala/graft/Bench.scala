package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main: runs every bench-flagged query from the catalog on
  * SPARK_GRAFT_SF_DIR, materializing each with a `noop` write (forces the
  * full plan — a bare count() would let Catalyst prune projections and
  * under-measure). Prints ONE JSON line for the driver.
  *
  * Each query runs SPARK_GRAFT_BENCH_REPS times (default 3) and reports
  * its per-query MEDIAN: this microVM shows multi-second host stalls
  * (BASELINE.md documents the same plan measuring 0.2 s and 18 s), and a
  * single-shot bench lets one stall masquerade as a plan regression.
  * The median also absorbs first-run codegen compilation.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val reps = sys.env.getOrElse("SPARK_GRAFT_BENCH_REPS", "3").toInt.max(1)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // one tiny warmup pass to absorb session/codegen cold start
    SparkEntry.queries("q01_pricing_summary")(spark, sfDir)
      .write.format("noop").mode("overwrite").save()

    val names = SparkEntry.benchQueries
    val failed = scala.collection.mutable.ListBuffer.empty[String]
    val results = names.map { name =>
      val times = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        try SparkEntry.queries(name)(spark, sfDir)
          .write.format("noop").mode("overwrite").save()
        catch {
          case e: Throwable =>
            if (!failed.contains(name)) failed += name
            System.err.println(s"[bench] $name failed: ${e.getMessage}")
        }
        (System.nanoTime() - t0) / 1e9
      }.sorted
      name -> times(times.length / 2)
    }
    val qs = results.map { case (k, v) => "\"" + k + "\":" + f"$v%.3f" }
      .mkString("{", ",", "}")
    val total = f"${results.map(_._2).sum}%.3f"
    // a failed query's near-zero elapsed time must not read as a speedup:
    // failures are listed explicitly and the process exits nonzero.
    val failedJson = failed.map("\"" + _ + "\"").mkString("[", ",", "]")
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"failed":$failedJson,"reps":$reps,"sf":"$sfDir"}""")
    spark.stop()
    if (failed.nonEmpty) sys.exit(1)
  }
}

package graft.tools

import org.apache.spark.sql.SparkSession

/** Single-query micro-bench: median-of-3 after a warm-up run, executing
  * the query's own plan via toRdd (no collect, rows stay on executors).
  * Usage: runMain graft.tools.BenchOne <queryName> [sfDir]
  * The A/B workflow behind plan changes (e.g. q77's join-back → window
  * rewrite measured 1.9 s → 1.2 s at sf0.1 with this). */
object BenchOne {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val dir = args.lift(1).getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.SparkEntry.queries(name)(spark, dir).queryExecution.toRdd.count()
    val times = (1 to 3).map { _ =>
      val t0 = System.nanoTime()
      graft.SparkEntry.queries(name)(spark, dir).queryExecution.toRdd.count()
      (System.nanoTime() - t0) / 1e9
    }
    println(f"[benchone] $name median=${times.sorted.apply(1)}%.3f times=$times")
    spark.stop()
  }
}

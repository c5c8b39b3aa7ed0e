package graft.tools

import java.lang.management.ManagementFactory
import java.nio.file.{Files, Path, Paths}
import scala.jdk.CollectionConverters._

import org.apache.spark.sql.SparkSession

/** Diagnoses the in-catalog elevation of the heavy-iterative bench class
  * (round-10 verdict #1: q154 reps RISING 4.5→6.5→8.1 s inside a clean
  * window even after the between-reps cache release, while the same query
  * re-measures ≤ canonical standalone).
  *
  * Mimics Bench.scala's harness exactly — fresh plan per rep, noop write,
  * `spark.catalog.clearCache()` between reps — and reports per-rep:
  * elapsed, GC-time delta, JIT code-cache occupancy, metaspace, loaded
  * classes, and the byte/file count of the Spark local dir (shuffle +
  * block files). An optional warm phase first runs a catalog prefix to
  * rebuild the "late in the run" JVM state. Whichever diagnostic rises
  * with the rep curve is the mechanism.
  *
  * Usage: runMain graft.tools.ProfileAccum <query> [reps] [warmN] [sfDir]
  *   warmN > 0 runs the first warmN bench-catalog queries (1 rep each,
  *   same harness) before profiling <query>.
  */
object ProfileAccum {
  private def pools(prefix: String): Long =
    ManagementFactory.getMemoryPoolMXBeans.asScala
      .filter(_.getName.startsWith(prefix)).map(_.getUsage.getUsed).sum

  private def gcMs(): Long =
    ManagementFactory.getGarbageCollectorMXBeans.asScala
      .map(_.getCollectionTime).sum

  private def dirStats(p: Path): (Long, Long) =
    if (!Files.exists(p)) (0L, 0L)
    else {
      var bytes = 0L; var n = 0L
      val st = Files.walk(p) // stream holds directory handles: must close
      try {
        val it = st.iterator()
        while (it.hasNext) {
          val f = it.next()
          if (Files.isRegularFile(f)) { bytes += Files.size(f); n += 1 }
        }
      } finally st.close()
      (bytes, n)
    }

  def main(args: Array[String]): Unit = {
    val name = args(0)
    val reps = args.lift(1).map(_.toInt).getOrElse(6)
    val warmN = args.lift(2).map(_.toInt).getOrElse(0)
    val sfDir = args.lift(3).getOrElse("/root/testdata/sf0.1")
    val localDir = Files.createTempDirectory("graft-prof-").toString
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.codegen.cache.maxEntries", "5000")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.local.dir", localDir)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val classBean = ManagementFactory.getClassLoadingMXBean

    def runOnce(q: String): Double = {
      val t0 = System.nanoTime()
      graft.SparkEntry.queries(q)(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
      val dt = (System.nanoTime() - t0) / 1e9
      spark.catalog.clearCache()
      dt
    }

    def snap(tag: String, dt: Double, gc0: Long): Unit = {
      val (bytes, files) = dirStats(Paths.get(localDir))
      println(f"[prof] $tag%-28s ${dt}%7.3f s  gc+${gcMs() - gc0}%5d ms  " +
        f"codecache=${pools("CodeHeap") / 1e6}%6.1f MB  " +
        f"meta=${pools("Metaspace") / 1e6}%6.1f MB  " +
        f"classes=${classBean.getLoadedClassCount}%6d  " +
        f"localdir=${bytes / 1e6}%8.1f MB/${files}%d files")
    }

    if (warmN > 0) {
      val prefix = graft.SparkEntry.benchQueries.take(warmN)
      println(s"[prof] warm phase: ${prefix.length} catalog queries, 1 rep each")
      prefix.zipWithIndex.foreach { case (q, i) =>
        val gc0 = gcMs()
        val dt = try runOnce(q) catch { case e: Throwable =>
          System.err.println(s"[prof] warm $q failed: ${e.getMessage}"); 0.0 }
        if ((i + 1) % 20 == 0 || i == prefix.length - 1) snap(s"warm[${i + 1}] $q", dt, gc0)
        System.gc(); Thread.sleep(100)
      }
    }

    println(s"[prof] profiling $name x $reps reps (Bench harness)")
    (1 to reps).foreach { r =>
      val gc0 = gcMs()
      val dt = runOnce(name)
      snap(s"$name rep$r", dt, gc0)
    }
    spark.stop()
  }
}

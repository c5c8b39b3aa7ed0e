package graft.tools

import org.apache.spark.sql.SparkSession

import graft.catalog.{Stats, Tables}
import graft.operators.SimilarityOps

/** Stage-by-stage timing of the ANN queries — isolates the scale paths
  * so plan regressions can be attributed (the bench only reports
  * whole-query times). Historical note: the per-plane/per-centroid
  * `dot_product` form of these queries measured ~9.7 s (LSH) / 4.4 s
  * (IVF) at sf0.1 because the giant expression tree pushed the stage
  * out of whole-stage codegen into interpreted eval; the matrix-form
  * expressions (hp_signatures / nearest_cells) measure ~2.7 s / 1.5 s.
  * Usage: runMain graft.tools.ProfileAnn [sfDir]
  */
object ProfileAnn {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[profile] $label%-24s ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }

    val emb = Tables.t(spark, sfDir, "embeddings")
    val n = Stats.parquetRowCount(spark, s"$sfDir/embeddings.parquet")
    val cfg = SimilarityOps.lshSizing(n)
    val tables = SimilarityOps.lshTables(cfg.planes, cfg.tables, dim = 64)
    val nlistFlat = math.max(16, math.ceil(n / 64.0).toInt)
    val (nlist1, nlist2) = SimilarityOps.ivfHierSizing(n)

    emb.write.format("noop").mode("overwrite").save() // warm the session

    for (round <- 1 to 2) {
      time(s"q39 lshTopK (run $round)")(
        SimilarityOps.lshTopK(emb, "vec_id", "embedding", tables, k = 3,
          probes = cfg.probes)
          .write.format("noop").mode("overwrite").save())
      time(s"lshTopK probes=3 (run $round)")(
        SimilarityOps.lshTopK(emb, "vec_id", "embedding", tables, k = 3,
          probes = 3)
          .write.format("noop").mode("overwrite").save())
      time(s"ivfTopK flat (run $round)")(
        SimilarityOps.ivfTopK(emb, "vec_id", "embedding",
          nlist = nlistFlat, nprobe = 4, k = 3)
          .write.format("noop").mode("overwrite").save())
      time(s"q45 ivfHierTopK (run $round)")(
        SimilarityOps.ivfHierTopK(emb, "vec_id", "embedding",
          nlist1 = nlist1, nlist2 = nlist2, nprobe1 = 2, nprobe2 = 2, k = 3)
          .write.format("noop").mode("overwrite").save())
      time(s"q37 brute    (run $round)")(
        SimilarityOps.bruteForceTopK(emb,
          emb.filter(org.apache.spark.sql.functions.col("vec_id") < 20),
          "vec_id", "embedding", k = 5)
          .write.format("noop").mode("overwrite").save())
    }
    spark.stop()
  }
}

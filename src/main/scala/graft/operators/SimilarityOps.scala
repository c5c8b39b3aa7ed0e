package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import scala.util.Random

/** Approximate-nearest-neighbor similarity search over an embedding column
  * (`Array[Float]`).
  *
  *  - [[bruteForceTopK]]: exact baseline — broadcast the (small) query set
  *    against the full corpus, dot-product via zip_with/aggregate, window
  *    top-k. One pass over the corpus, no corpus shuffle.
  *  - [[hyperplaneSignature]] + [[lshTopK]]: random-hyperplane LSH — the
  *    scale path. Signatures are row-local; the join shuffles only on the
  *    small bucket key. Hyperplanes are generated from a fixed seed at
  *    plan time, so results are deterministic.
  */
object SimilarityOps {

  /** Dot product of two array<double> columns (left fold, deterministic
    * order). For unit-normalized embeddings this IS cosine similarity. */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)

  /** Exact top-k neighbors for each query vector.
    * @param corpus  (id, embedding float array)
    * @param queries subset of corpus rows to use as queries (broadcast)
    */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame, idCol: String,
                     embCol: String, k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val q = broadcast(queries.select(
      col(idCol).as("query_id"), col(embCol).cast("array<double>").as("qe")))
    val c = corpus.select(
      col(idCol).as("neighbor_id"), col(embCol).cast("array<double>").as("ce"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("sim").desc, col("neighbor_id").asc)
    c.join(q, col("neighbor_id") =!= col("query_id"))
      .withColumn("sim", dot(col("qe"), col("ce")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank").cast("long").as("rank"),
        col("neighbor_id"), round(col("sim"), 6).as("sim_r"))
  }

  /** Brute-force cosine near-duplicate pairs: all (a < b) pairs with
    * dot ≥ threshold. Quadratic verification baseline — the scale paths
    * are [[lshTopK]] buckets or [[ivfTopK]] cells with a threshold
    * filter. */
  def cosinePairs(corpus: DataFrame, idCol: String, embCol: String,
                  threshold: Double): DataFrame = {
    val a = corpus.select(col(idCol).as("id_a"),
      col(embCol).cast("array<double>").as("ea"))
    val b = corpus.select(col(idCol).as("id_b"),
      col(embCol).cast("array<double>").as("eb"))
    a.join(b, col("id_a") < col("id_b"))
      .withColumn("sim", dot(col("ea"), col("eb")))
      .filter(col("sim") >= threshold)
      .select(col("id_a"), col("id_b"), round(col("sim"), 6).as("sim_r"))
  }

  /** IVF-style ANN: partition the corpus into `nlist` cells around
    * deterministic "centroids" (the first `nlist` corpus vectors — a
    * stand-in for a k-means fit, keeping results reproducible), assign
    * every vector to its nearest centroid, probe the `nprobe` nearest
    * cells per query, rank candidates exactly. Shuffles on cell id;
    * candidate volume ≈ n·(n/nlist)·nprobe. */
  def ivfTopK(corpus: DataFrame, idCol: String, embCol: String,
              nlist: Int, nprobe: Int, k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val cents = broadcast(
      corpus.orderBy(col(idCol)).limit(nlist)
        .select(col(idCol).as("cell_id"),
          col(embCol).cast("array<double>").as("cvec")))
    val vecs = corpus.select(col(idCol),
      col(embCol).cast("array<double>").as("v"))
    def nearestCells(n: Int, outId: String): DataFrame = {
      val w = Window.partitionBy(col(idCol))
        .orderBy(col("cdist").desc, col("cell_id").asc)
      vecs.crossJoin(cents)
        .withColumn("cdist", dot(col("v"), col("cvec")))
        .withColumn("crank", row_number().over(w))
        .filter(col("crank") <= n)
        .select(col(idCol).as(outId), col("cell_id"))
    }
    val assignment = nearestCells(1, "neighbor_id")
    val probes = nearestCells(nprobe, "query_id")
    val cands = probes.join(assignment, "cell_id")
      .filter(col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id")).distinct()
    val qe = corpus.select(col(idCol).as("query_id"),
      col(embCol).cast("array<double>").as("qe"))
    val ce = corpus.select(col(idCol).as("neighbor_id"),
      col(embCol).cast("array<double>").as("ce"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("sim").desc, col("neighbor_id").asc)
    cands.join(qe, "query_id").join(ce, "neighbor_id")
      .withColumn("sim", dot(col("qe"), col("ce")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank").cast("long").as("rank"),
        col("neighbor_id"), round(col("sim"), 6).as("sim_r"))
  }

  /** Deterministic Gaussian hyperplanes: `planes × dim`, seeded. */
  def hyperplanes(planes: Int, dim: Int, seed: Long = 42L): Array[Array[Double]] = {
    val rnd = new Random(seed)
    Array.fill(planes, dim)(rnd.nextGaussian())
  }

  /** Row-local signature: bit p set iff dot(v, plane_p) > 0. Buckets
    * vectors into 2^planes hash buckets. */
  def hyperplaneSignature(emb: Column, planes: Array[Array[Double]]): Column = {
    val de = emb.cast("array<double>")
    planes.zipWithIndex.map { case (p, i) =>
      val planeCol = array(p.map(lit): _*)
      when(dot(de, planeCol) > 0, lit(1L << i)).otherwise(lit(0L))
    }.reduce(_ + _)
  }

  /** L independent hash tables of `planes` hyperplanes each. More tables →
    * higher recall (collide in ≥1 table); more planes → smaller buckets.
    * For sim≈0.37 neighbors, 8×4 gives ≈0.7 expected recall@1. */
  def lshTables(planes: Int, tables: Int, dim: Int,
                seed: Long = 42L): Seq[Array[Array[Double]]] =
    (0 until tables).map(t => hyperplanes(planes, dim, seed + t))

  /** ANN via multi-table bucket join: vectors sharing a bucket in ANY
    * table are compared exactly; top-k per query over the candidate set.
    * Shuffles on (table_id, bucket) — candidate count ≈ n·avgBucket·L,
    * versus n² for brute force. Recall pinned in SimilaritySpec. */
  def lshTopK(corpus: DataFrame, idCol: String, embCol: String,
              tables: Seq[Array[Array[Double]]], k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val buckets = tables.zipWithIndex.map { case (pl, t) =>
      struct(lit(t).as("table_id"), hyperplaneSignature(col(embCol), pl).as("bucket"))
    }
    val bandTable = corpus
      .select(col(idCol), explode(array(buckets: _*)).as("tb"))
      .select(col(idCol), col("tb.table_id"), col("tb.bucket"))
    val cands = bandTable.select(col(idCol).as("query_id"), col("table_id"), col("bucket"))
      .join(bandTable.select(col(idCol).as("neighbor_id"), col("table_id"), col("bucket")),
        Seq("table_id", "bucket"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"))
      .distinct()
    val qe = corpus.select(col(idCol).as("query_id"),
      col(embCol).cast("array<double>").as("qe"))
    val ce = corpus.select(col(idCol).as("neighbor_id"),
      col(embCol).cast("array<double>").as("ce"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("sim").desc, col("neighbor_id").asc)
    cands.join(qe, "query_id").join(ce, "neighbor_id")
      .withColumn("sim", dot(col("qe"), col("ce")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank").cast("long").as("rank"),
        col("neighbor_id"), round(col("sim"), 6).as("sim_r"))
  }
}

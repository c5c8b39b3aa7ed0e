package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.plans.GraftPlanner

/** Plan-level and result-level coverage of the custom grouped-top-k
  * ladder (logical node + rule + strategy + physical operator). The
  * rule installs into an isolated `newSession()` so assertions about
  * when it fires don't leak into other suites.
  */
class TopKPlanSpec extends AnyFunSuite {
  lazy val base = SparkTestSession.spark

  private def installed = {
    val s = base.newSession()
    GraftPlanner.install(s)
    s
  }

  test("window row_number + rank filter plans as TopKPerKeyExec with exact results") {
    val s = installed
    import s.implicits._
    val df = Seq((1, "a", 3.0), (1, "b", 5.0), (1, "c", 4.0),
      (2, "d", 1.0), (2, "e", 2.0)).toDF("k", "id", "v")
    val w = Window.partitionBy($"k").orderBy($"v".desc, $"id".asc)
    val q = df.withColumn("rank", row_number().over(w)).filter($"rank" <= 2)
    assert(q.queryExecution.executedPlan.toString.contains("TopKPerKey"),
      q.queryExecution.executedPlan.toString)
    val got = q.select($"k", $"id", $"rank").as[(Int, String, Int)]
      .collect().toSet
    assert(got == Set((1, "b", 1), (1, "c", 2), (2, "e", 1), (2, "d", 2)))
  }

  test("k larger than any group emits every row, ranked") {
    val s = installed
    import s.implicits._
    val df = Seq((1, 10.0), (1, 20.0), (2, 5.0)).toDF("k", "v")
    val w = Window.partitionBy($"k").orderBy($"v".asc)
    val q = df.withColumn("rank", row_number().over(w)).filter($"rank" < 100)
    assert(q.queryExecution.executedPlan.toString.contains("TopKPerKey"))
    assert(q.count() == 3)
  }

  test("rank = 1 (dedup shape) fires and keeps one row per key") {
    val s = installed
    import s.implicits._
    val df = Seq((1, "x", 2L), (1, "y", 9L), (2, "z", 1L)).toDF("k", "id", "ver")
    val w = Window.partitionBy($"k").orderBy($"ver".desc)
    val q = df.withColumn("rank", row_number().over(w)).filter($"rank" === 1)
      .select($"k", $"id")
    assert(q.queryExecution.executedPlan.toString.contains("TopKPerKey"))
    assert(q.as[(Int, String)].collect().toSet == Set((1, "y"), (2, "z")))
  }

  test("partial top-k runs below the exchange and bounds map-side output") {
    val s = installed
    import s.implicits._
    // 4000 rows, 4 keys, 8 input partitions: the partial pass must cut
    // the exchange's input to <= k x keys x partitions rows.
    val df = s.range(0, 4000, 1, 8)
      .select(($"id" % 4).as("k"), $"id".as("v"),
        concat(lit("r"), $"id").as("tag"))
    val w = Window.partitionBy($"k").orderBy($"v".desc, $"tag".asc)
    val q = df.withColumn("rank", row_number().over(w)).filter($"rank" <= 3)
    // exact results: global top-3 per key of 0..3999 by value desc
    val got = q.select($"k", $"v", $"rank").as[(Long, Long, Int)]
      .collect().toSet
    val expect = (0L until 4L).flatMap { k =>
      val vs = (0L until 4000L).filter(_ % 4 == k).sortBy(-_).take(3)
      vs.zipWithIndex.map { case (v, i) => (k, v, i + 1) }
    }.toSet
    assert(got == expect)
    // execute THIS dataframe's own plan (the select().collect() above
    // ran a different QueryExecution), then walk the FINAL adaptive
    // plan (exchanges materialize as query stages only after execution)
    q.queryExecution.toRdd.count()
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
    def nodes(p: SparkPlan): Seq[SparkPlan] = p match {
      case a: AdaptiveSparkPlanExec => a +: nodes(a.executedPlan)
      case qs: QueryStageExec => qs +: nodes(qs.plan)
      case _ => p +: p.children.flatMap(nodes)
    }
    val ns = nodes(q.queryExecution.executedPlan)
    assert(ns.exists(_.getClass.getSimpleName.contains("PartialTopKPerKey")),
      q.queryExecution.executedPlan.toString)
    // the shuffle must carry only the partially-filtered rows:
    // <= k(3) x keys(4) x partitions(8) = 96, not 4000. dataSize is
    // bytes; a conservative bound: under 64 bytes/row x 200 rows.
    val shuffleBytes = ns.collectFirst {
      case e: ShuffleExchangeLike => e.metrics("dataSize").value
    }
    assert(shuffleBytes.nonEmpty, "no shuffle exchange found in the final plan")
    assert(shuffleBytes.exists(b => b > 0 && b < 64L * 200),
      s"exchange shipped $shuffleBytes bytes — partial filter not applied?")
  }

  test("partial top-k key-budget overflow degrades to passthrough, results exact") {
    val s = installed
    s.conf.set("spark.graft.topk.maxKeysInMemory", "2")
    try {
      import s.implicits._
      // 64 distinct keys >> budget 2: most of each partition streams
      // through verbatim; the final pass alone computes the ranks.
      val df = s.range(0, 2000, 1, 4)
        .select(($"id" % 64).as("k"), $"id".as("v"))
      val w = Window.partitionBy($"k").orderBy($"v".desc)
      val q = df.withColumn("rank", row_number().over(w)).filter($"rank" <= 2)
      assert(q.queryExecution.executedPlan.toString.contains("PartialTopKPerKey"))
      val got = q.select($"k", $"v", $"rank").as[(Long, Long, Int)]
        .collect().toSet
      val expect = (0L until 64L).flatMap { k =>
        (0L until 2000L).filter(_ % 64 == k).sortBy(-_).take(2)
          .zipWithIndex.map { case (v, i) => (k, v, i + 1) }
      }.toSet
      assert(got == expect)
    } finally s.conf.unset("spark.graft.topk.maxKeysInMemory")
  }

  test("partial top-k byte-budget overflow degrades to passthrough, results exact") {
    val s = installed
    s.conf.set("spark.graft.topk.partialMaxBytes", "2048")
    try {
      import s.implicits._
      // ~200-byte payload rows: the 2 KB byte cap trips after ~10 rows
      // per partition even though only 4 distinct keys exist — the
      // budget that matters for WIDE rows, not key count.
      val df = s.range(0, 2000, 1, 4)
        .select(($"id" % 4).as("k"), $"id".as("v"),
          concat(lit("p"), lpad($"id".cast("string"), 200, "x")).as("pad"))
      val w = Window.partitionBy($"k").orderBy($"v".desc)
      val q = df.withColumn("rank", row_number().over(w)).filter($"rank" <= 3)
      assert(q.queryExecution.executedPlan.toString.contains("PartialTopKPerKey"))
      val got = q.select($"k", $"v", $"rank").as[(Long, Long, Int)]
        .collect().toSet
      val expect = (0L until 4L).flatMap { k =>
        (0L until 2000L).filter(_ % 4 == k).sortBy(-_).take(3)
          .zipWithIndex.map { case (v, i) => (k, v, i + 1) }
      }.toSet
      assert(got == expect)
    } finally s.conf.unset("spark.graft.topk.partialMaxBytes")
  }

  test("non-rank-bounding predicates do not fire the rewrite") {
    val s = installed
    import s.implicits._
    val df = Seq((1, 1.0), (1, 2.0)).toDF("k", "v")
    val w = Window.partitionBy($"k").orderBy($"v".asc)
    val q = df.withColumn("rank", row_number().over(w))
      .filter($"rank" <= 1 || $"v" > 100) // disjunction: not a pure bound
    assert(!q.queryExecution.executedPlan.toString.contains("TopKPerKey"))
    assert(q.count() == 1) // only rank-1 row satisfies the disjunction
  }

  test("high-cardinality keys fall back to spillable sort-based emission") {
    val s = installed
    s.conf.set("spark.graft.topk.maxKeysInMemory", "64")
    try {
      import s.implicits._
      // keys ≈ rows (the dedup shape that would balloon the hash path):
      // 5000 keys × 2 rows, far over the 64-key budget
      val df = s.range(10000).select(
        (col("id") % 5000).as("k"),
        col("id").as("id"),
        (col("id") * 7 % 101).as("v"))
      val w = Window.partitionBy($"k").orderBy($"v".desc, $"id".asc)
      val q = df.withColumn("rank", row_number().over(w)).filter($"rank" === 1)
        .select($"k", $"id")
      assert(q.queryExecution.executedPlan.toString.contains("TopKPerKey"))
      val fallbacksBefore = graft.plans.TopKPerKeyExec.fallbackCount.sum()
      val got = q.as[(Long, Long)].collect().toMap
      // reference: same query through plain WindowExec on the base session
      val refDf = base.range(10000).select(
        (col("id") % 5000).as("k"), col("id").as("id"),
        (col("id") * 7 % 101).as("v"))
      val refW = Window.partitionBy(col("k")).orderBy(col("v").desc, col("id").asc)
      val expected = refDf.withColumn("rank", row_number().over(refW))
        .filter(col("rank") === 1).select(col("k"), col("id"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got == expected && got.size == 5000)
      // the sort fallback actually fired (JVM-local counter: the
      // SQLMetric instance a test can collect is detached by AQE's
      // plan cloning, so it can't be asserted on directly)
      assert(graft.plans.TopKPerKeyExec.fallbackCount.sum() > fallbacksBefore,
        "expected at least one partition to take the sort fallback")
    } finally s.conf.unset("spark.graft.topk.maxKeysInMemory")
  }

  test("fallback sorter spills to disk and still produces exact results") {
    val s = installed
    s.conf.set("spark.graft.topk.maxKeysInMemory", "16")
    s.conf.set("spark.graft.topk.forceSpillThreshold", "500") // rows/batch
    try {
      import s.implicits._
      val df = s.range(40000).select(
        (col("id") % 8000).as("k"), col("id").as("id"),
        (col("id") * 13 % 997).as("v"))
      val w = Window.partitionBy($"k").orderBy($"v".desc, $"id".asc)
      val q = df.withColumn("rank", row_number().over(w)).filter($"rank" <= 2)
        .select($"k", $"id", $"rank")
      val spillBefore = graft.plans.TopKPerKeyExec.spillBytes.sum()
      val got = q.as[(Long, Long, Int)].collect().toSet
      assert(graft.plans.TopKPerKeyExec.spillBytes.sum() > spillBefore,
        "expected the fallback sorter to spill to disk")
      val refW = Window.partitionBy(col("k")).orderBy(col("v").desc, col("id").asc)
      val expected = base.range(40000).select(
          (col("id") % 8000).as("k"), col("id").as("id"),
          (col("id") * 13 % 997).as("v"))
        .withColumn("rank", row_number().over(refW)).filter(col("rank") <= 2)
        .select(col("k"), col("id"), col("rank"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
      assert(got == expected && got.size == 16000)
    } finally {
      s.conf.unset("spark.graft.topk.maxKeysInMemory")
      s.conf.unset("spark.graft.topk.forceSpillThreshold")
    }
  }

  test("matches the WindowExec plan bit-for-bit on real embeddings top-k") {
    val s = installed
    def knn(sess: org.apache.spark.sql.SparkSession) = {
      val emb = graft.catalog.Tables.t(sess, "/root/testdata/sf0.001", "embeddings")
      graft.operators.SimilarityOps
        .bruteForceTopK(emb, emb.filter(col("vec_id") < 10), "vec_id", "embedding", k = 4)
    }
    val withRule = knn(s)
    assert(withRule.queryExecution.executedPlan.toString.contains("TopKPerKey"))
    val got = withRule.collect().map(_.toSeq).toSet
    val expected = knn(base).collect().map(_.toSeq).toSet
    assert(got == expected && got.size == 40)
  }

  test("q105 per-source cap executes via TopKPerKeyExec and caps every source at K") {
    val q = SparkEntry.queries("q105_source_cap")(base, "/root/testdata/sf0.001")
    assert(q.queryExecution.executedPlan.toString.contains("TopKPerKey"),
      q.queryExecution.executedPlan.toString)
    val perSource = q.groupBy("source").count().collect()
    assert(perSource.nonEmpty && perSource.forall(_.getLong(1) <= 10))
    // ranks within a source are dense 1..n
    val ranks = q.select("source", "cap_rank").collect()
      .groupBy(_.getString(0)).values
    assert(ranks.forall(rs =>
      rs.map(_.getLong(1)).sorted.sameElements(1L to rs.length)))
  }
}

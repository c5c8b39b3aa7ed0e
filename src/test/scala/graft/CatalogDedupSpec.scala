package graft

import org.scalatest.funsuite.AnyFunSuite

/** Mechanized catalog near-duplicate screen (round-12 VERDICT #2):
  * q354 v1 substantially overlapped q160 and was caught only by hand —
  * at 356 queries, silent padding-by-duplication is a real hazard and
  * manual review doesn't scale. Every catalog entry is fingerprinted
  * two ways:
  *
  *  - ORACLE-SQL SHINGLES: the oracle SQL, lowercased, with string and
  *    numeric literals collapsed to placeholders (a near-copy that only
  *    retunes constants must still trip), tokenized and 3-gram-shingled;
  *    pairwise Jaccard over the shingle sets.
  *  - OUTPUT SCHEMA: the Spark plan's sorted output column names — the
  *    result SHAPE. Same scaffolding + same result shape is the actual
  *    duplicate signal; the ANN/LSH family legitimately shares large
  *    GENERATED oracle scaffolding (one hyperplane-signature builder
  *    feeds nine queries) while producing different readouts, so SQL
  *    similarity alone over-fires on generated CTE prefixes.
  *
  * A pair is FLAGGED when jaccard >= 0.80 with identical output columns,
  * or jaccard >= 0.93 regardless of columns (near-verbatim SQL needs
  * review even with renamed outputs). Flagged pairs must appear in the
  * reviewed-exception map below with a justification; PlanAuditSpec's
  * stale-waiver rule applies — an exception that stops matching FAILS
  * the audit, so the list can't rot into a blanket waiver.
  */
class CatalogDedupSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private val sf = "/root/testdata/sf0.001"

  /** Reviewed near-miss pairs: names in lexicographic order. */
  private val reviewedOk: Map[(String, String), String] = Map(
    ("q253_hubness", "q39_knn_lsh") ->
      ("shared hyperplane-LSH signature scaffolding; q39 returns top-k " +
        "neighbor pairs, q253 aggregates reverse-kNN in-degree skew — " +
        "different grain (pair vs corpus rollup) and different readout"),
    ("q290_capture_recapture", "q69_neardup_ensemble") ->
      ("q290 deliberately REUSES q69's two detector CTEs as its capture " +
        "samples but its output is the Chapman estimator of UNDETECTED " +
        "duplicates (1-row estimate) vs q69's per-pair ensemble verdicts"),
    ("q50_neardup_lsh", "q52_neardup_multiprobe") ->
      ("q52 is q50's multi-probe variant — same banded signature " +
        "scaffolding BY DESIGN, differing in the probe-expansion CTE; " +
        "outputs differ (probe-hit provenance columns) and the pair " +
        "documents the single- vs multi-probe recall trade"))

  /** Lowercase, collapse literals, tokenize, 3-gram shingle. */
  private def shingleSet(sql: String): Set[Seq[String]] = {
    val s0 = sql.toLowerCase
      .replaceAll("'[^']*'", " S ")
      .replaceAll("\\b[0-9]+(\\.[0-9]+)?\\b", " N ")
    val toks = "[a-z_]+|[^\\sa-z_]".r.findAllIn(s0).toVector
    if (toks.length < 3) Set(toks)
    else toks.sliding(3).map(_.toSeq).toSet
  }

  private def jaccard(a: Set[Seq[String]], b: Set[Seq[String]]): Double = {
    if (a.isEmpty || b.isEmpty) 0.0
    else a.intersect(b).size.toDouble / a.union(b).size
  }

  test("no unreviewed near-duplicate catalog entries") {
    val qs = SparkEntry.modules
    val fps = qs.flatMap(q => q.oracle.map(o => q.name -> shingleSet(o)))
    // schemas built lazily, only for pairs the SQL signal shortlists —
    // building all 356 plans eagerly would double PlanAuditSpec's cost
    val schemaCache = scala.collection.mutable.HashMap.empty[String, Seq[String]]
    def cols(name: String): Seq[String] = schemaCache.getOrElseUpdate(name,
      SparkEntry.queries(name)(spark, sf).schema.fieldNames.sorted.toSeq)
    val flagged = for {
      i <- fps.indices
      j <- (i + 1) until fps.length
      (na, sa) = fps(i)
      (nb, sb) = fps(j)
      jac = jaccard(sa, sb)
      if jac >= 0.80
      if jac >= 0.93 || cols(na) == cols(nb)
    } yield (if (na < nb) (na, nb) else (nb, na), jac)
    val flaggedKeys = flagged.map(_._1).toSet
    val unreviewed = flagged.filterNot { case (k, _) => reviewedOk.contains(k) }
    assert(unreviewed.isEmpty,
      "unreviewed near-duplicate pairs (fix or review into the map):\n" +
        unreviewed.map { case ((a, b), j) => f"  $j%.3f $a ~ $b" }
          .mkString("\n"))
    val stale = reviewedOk.keySet.diff(flaggedKeys)
    assert(stale.isEmpty,
      s"stale reviewed-exception entries (no longer flagged — remove): " +
        stale.mkString(", "))
  }
}

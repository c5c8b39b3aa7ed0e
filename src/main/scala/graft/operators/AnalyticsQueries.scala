package graft.operators

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.catalog.{Q, QueryModule, Tables}

/** Round-10 corpus-analytics operators (SURVEY.md §2.12 X108-X110):
  * iterative link-graph centrality (the crawl-prioritization /
  * source-authority signal), robust per-source outlier statistics
  * (median + MAD — the clipping pass that a mean/stddev gate gets
  * wrong on heavy-tailed length distributions), and per-source
  * Kolmogorov-Smirnov distribution drift vs the corpus (the monitoring
  * gate that catches a source whose length profile silently shifts
  * between crawls).
  *
  * Exactness scheme: every statistic is integer arithmetic (micro /
  * ppm floor-quantized) over non-negative values, so Spark `div` and
  * DuckDB `//` agree term-for-term at any scale; no float mean or
  * stddev appears anywhere.
  */
object AnalyticsQueries extends QueryModule {

  private def t(s: org.apache.spark.sql.SparkSession, d: String, n: String) =
    Tables.t(s, d, n)

  /** Whole-partition frame per source (q133 convention). */
  private def bySource = Window.partitionBy(col("source"))

  def qs: Seq[Q] = Seq(

    // link-graph PageRank (3 unrolled iterations, damping 0.85, integer
    // micro-units): the source-authority signal a crawler uses to rank
    // frontier hosts. The host graph derives deterministically from the
    // corpus (src = doc_id % 32, dst = (7*doc_id + 3) % 32 — 7 is a
    // unit mod 32, so every host both emits and receives and no
    // dangling-mass correction is needed; 6k+3 is odd, so no self-loops
    // exist by construction). Scale shape: edges/out-weights/ranks are
    // DISTRIBUTED tables keyed on the node id — each iteration is one
    // edge⋈rank equi-join + one map-side-combined sum per destination,
    // the classic O(iters) BSP shape; nothing is collected or
    // broadcast, so the same plan runs when the host registry is 10^9.
    // Exactness: rank in integer micro-units; each edge contributes
    // (rank*w) div out_w (floor BEFORE the sum — order-independent),
    // and rank' = 150000 + (85*in) div 100. All values non-negative,
    // so div and // agree.
    Q("q139_link_pagerank", (s, d) => {
      import s.implicits._
      val edges = t(s, d, "documents")
        .select(($"doc_id" % 32).as("src"), (($"doc_id" * 7 + 3) % 32).as("dst"))
        .filter($"src" =!= $"dst")
        .groupBy($"src", $"dst").agg(count(lit(1)).as("w"))
      val outw = edges.groupBy($"src").agg(sum($"w").as("ow"))
      val e = edges.join(outw, "src")
      val nodes = outw.select($"src".as("node"), $"ow")
      val r0 = nodes.select($"node", lit(1000000L).as("r"))
      val r3 = (1 to 3).foldLeft(r0) { (r, _) =>
        val in = e.join(r.withColumnRenamed("node", "src"), "src")
          .select($"dst", expr("(r * w) div ow").as("c"))
          .groupBy($"dst").agg(sum($"c").as("cin"))
        nodes.join(in.withColumnRenamed("dst", "node"), Seq("node"), "left_outer")
          .select($"node",
            (lit(150000L) + expr("(85 * coalesce(cin, 0L)) div 100")).as("r"))
      }
      r3.join(nodes, "node")
        .select($"node", $"ow".as("out_weight"), $"r".as("rank_micro"))
    }, Some("""
      WITH ed AS (SELECT doc_id % 32 AS src, (doc_id * 7 + 3) % 32 AS dst
                  FROM documents),
      e AS (SELECT src, dst, count(*) AS w FROM ed WHERE src <> dst
            GROUP BY 1, 2),
      o AS (SELECT src, CAST(sum(w) AS BIGINT) AS ow FROM e GROUP BY 1),
      r0 AS (SELECT src AS node, CAST(1000000 AS BIGINT) AS r FROM o),
      i1 AS (SELECT e.dst, CAST(sum((r.r * e.w) // o.ow) AS BIGINT) AS cin
             FROM e JOIN o USING (src) JOIN r0 r ON r.node = e.src GROUP BY 1),
      r1 AS (SELECT o.src AS node,
               CAST(150000 + (85 * coalesce(i1.cin, 0)) // 100 AS BIGINT) AS r
             FROM o LEFT JOIN i1 ON i1.dst = o.src),
      i2 AS (SELECT e.dst, CAST(sum((r.r * e.w) // o.ow) AS BIGINT) AS cin
             FROM e JOIN o USING (src) JOIN r1 r ON r.node = e.src GROUP BY 1),
      r2 AS (SELECT o.src AS node,
               CAST(150000 + (85 * coalesce(i2.cin, 0)) // 100 AS BIGINT) AS r
             FROM o LEFT JOIN i2 ON i2.dst = o.src),
      i3 AS (SELECT e.dst, CAST(sum((r.r * e.w) // o.ow) AS BIGINT) AS cin
             FROM e JOIN o USING (src) JOIN r2 r ON r.node = e.src GROUP BY 1),
      r3 AS (SELECT o.src AS node,
               CAST(150000 + (85 * coalesce(i3.cin, 0)) // 100 AS BIGINT) AS r
             FROM o LEFT JOIN i3 ON i3.dst = o.src)
      SELECT r3.node, o.ow AS out_weight, r3.r AS rank_micro
      FROM r3 JOIN o ON o.src = r3.node""")),

    // robust per-source outlier statistics: exact discrete median + MAD
    // (median absolute deviation) of the token count, and the number of
    // docs beyond 5 MADs — the heavy-tail-safe clipping gate (a
    // mean/stddev gate is itself dragged by the outliers it should
    // catch). Discrete definitions (lower median: min v with
    // 2*cum(v) >= n) keep everything integer — no engine float paths.
    // Scale shape: both cumulative windows run over DISTINCT
    // (source, value) rows — bounded by the token-count DOMAIN (q110
    // argument), not the corpus; the med/MAD frames are registry-sized
    // equi-joins; the final agg is map-side combined.
    Q("q142_robust_outliers", (s, d) => {
      import s.implicits._
      val lens = t(s, d, "documents").select($"source",
        TextOps.tokenCount($"text").cast("long").as("v"))
      def lowerMedian(df: org.apache.spark.sql.DataFrame, vc: String) = {
        val wCum = Window.partitionBy($"source").orderBy(col(vc).asc)
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        df.groupBy($"source", col(vc)).agg(count(lit(1)).as("k"))
          .withColumn("cum", sum($"k").over(wCum))
          .withColumn("n", sum($"k").over(bySource))
          .filter($"cum" * 2 >= $"n")
          .groupBy($"source")
          .agg(min(col(vc)).as("med"), max($"n").as("n_docs"))
      }
      val med = lowerMedian(lens, "v")
      val dev = lens.join(med, "source")
        .select($"source", $"n_docs", $"med", abs($"v" - $"med").as("dev"))
      val mad = lowerMedian(dev.select($"source", $"dev"), "dev")
        .select($"source", $"med".as("mad"))
      dev.join(mad, "source")
        .groupBy($"source")
        .agg(max($"n_docs").as("n_docs"), max($"med").as("med_toks"),
          max($"mad").as("mad_toks"),
          sum(when($"dev" > greatest($"mad", lit(1L)) * 5, 1L).otherwise(0L))
            .as("n_outliers"))
    }, Some("""
      WITH l AS (SELECT source,
                   CAST(len(string_split_regex(trim(text), '\s+')) AS BIGINT) AS v
                 FROM documents),
      c AS (SELECT source, v, count(*) AS k FROM l GROUP BY 1, 2),
      m AS (SELECT source, min(v) AS med, max(n) AS n_docs FROM (
              SELECT source, v,
                sum(k) OVER (PARTITION BY source ORDER BY v ASC
                             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                  AS cum,
                sum(k) OVER (PARTITION BY source) AS n
              FROM c) WHERE cum * 2 >= n GROUP BY 1),
      dv AS (SELECT l.source, m.n_docs, m.med, abs(l.v - m.med) AS dev
             FROM l JOIN m USING (source)),
      dc AS (SELECT source, dev, count(*) AS k FROM dv GROUP BY 1, 2),
      md AS (SELECT source, min(dev) AS mad FROM (
              SELECT source, dev,
                sum(k) OVER (PARTITION BY source ORDER BY dev ASC
                             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                  AS cum,
                sum(k) OVER (PARTITION BY source) AS n
              FROM dc) WHERE cum * 2 >= n GROUP BY 1)
      SELECT dv.source, CAST(max(dv.n_docs) AS BIGINT) AS n_docs,
        CAST(max(dv.med) AS BIGINT) AS med_toks,
        CAST(max(md.mad) AS BIGINT) AS mad_toks,
        CAST(sum(CASE WHEN dv.dev > greatest(md.mad, 1) * 5 THEN 1 ELSE 0 END)
               AS BIGINT) AS n_outliers
      FROM dv JOIN md USING (source) GROUP BY 1""")),

    // per-source Kolmogorov-Smirnov drift vs the corpus: the max
    // CDF gap (in integer ppm) between each source's token-count
    // distribution and the corpus-wide one — the distribution-shift
    // monitor run between crawls (a source whose KS jumps changed its
    // template, truncation, or boilerplate profile even if its mean
    // moved nowhere). Both CDFs are evaluated on the corpus-wide
    // DISTINCT value grid — the sup of |F_s - F_g| over the reals is
    // attained at a jump point of either CDF, and the global grid
    // contains them all. Exactness: each CDF value is floor-quantized
    // to ppm BEFORE the difference (cum*10^6 div n stays < 2^63 at ANY
    // corpus size — the cross-multiplied form cum_s*n_g would overflow
    // at ~10^12 docs). Scale shape: the grid is DISTINCT token counts
    // (domain-bounded, q110 argument); sources × grid is a
    // registry-sized broadcast fan-out; the only unpartitioned window
    // is the global cum over that bounded grid.
    Q("q143_ks_drift", (s, d) => {
      import s.implicits._
      val lens = t(s, d, "documents").select($"source",
        TextOps.tokenCount($"text").cast("long").as("v"))
      val wG = Window.orderBy($"v".asc)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val grid = lens.groupBy($"v").agg(count(lit(1)).as("k"))
        .withColumn("cum_g", sum($"k").over(wG)).drop("k")
      val srcTot = lens.groupBy($"source").agg(count(lit(1)).as("n_s"))
      val tot = lens.agg(count(lit(1)).as("n_g"))
      val sc = lens.groupBy($"source", $"v").agg(count(lit(1)).as("ks"))
      val wS = Window.partitionBy($"source").orderBy($"v".asc)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      grid.crossJoin(broadcast(srcTot)).crossJoin(broadcast(tot))
        .join(sc, Seq("source", "v"), "left_outer")
        .withColumn("cum_s", sum(coalesce($"ks", lit(0L))).over(wS))
        .withColumn("d_ppm",
          abs(expr("(cum_s * 1000000) div n_s - (cum_g * 1000000) div n_g")))
        .groupBy($"source")
        .agg(max($"n_s").as("n_docs"), max($"d_ppm").as("ks_ppm"))
    }, Some("""
      WITH l AS (SELECT source,
                   CAST(len(string_split_regex(trim(text), '\s+')) AS BIGINT) AS v
                 FROM documents),
      g AS (SELECT v, count(*) AS k FROM l GROUP BY 1),
      gg AS (SELECT v, sum(k) OVER (ORDER BY v ASC
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_g
             FROM g),
      st AS (SELECT source, count(*) AS n_s FROM l GROUP BY 1),
      tt AS (SELECT count(*) AS n_g FROM l),
      sc AS (SELECT source, v, count(*) AS ks FROM l GROUP BY 1, 2),
      cm AS (SELECT st.source, gg.v,
               sum(coalesce(sc.ks, 0)) OVER (PARTITION BY st.source
                 ORDER BY gg.v ASC
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_s,
               gg.cum_g, st.n_s, tt.n_g
             FROM gg CROSS JOIN st CROSS JOIN tt
             LEFT JOIN sc ON sc.source = st.source AND sc.v = gg.v)
      SELECT source, CAST(max(n_s) AS BIGINT) AS n_docs,
        CAST(max(abs((cum_s * 1000000) // n_s - (cum_g * 1000000) // n_g))
               AS BIGINT) AS ks_ppm
      FROM cm GROUP BY 1""")),
  )
}

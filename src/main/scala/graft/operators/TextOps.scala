package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis operators for large-scale training-data pipelines:
  * tokenization, shingling, quality scoring, dictionary language-ID,
  * canonical fingerprinting. All row-local `Column` compositions — zero
  * shuffles, fully codegen'd, so they scale linearly with input splits.
  */
object TextOps {

  /** Whitespace tokenizer (the baseline for token counting; a BPE-ish
    * regex variant is [[bpeTokens]]). */
  def tokens(text: Column): Column = split(trim(text), "\\s+")

  def tokenCount(text: Column): Column = size(tokens(text))

  /** BPE-ish subword splitter: words, numbers, and single punctuation
    * marks as separate tokens (GPT-2-style pre-tokenization regex,
    * simplified to ASCII). */
  def bpeTokens(text: Column): Column =
    regexp_extract_all(text, lit("[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\\s]"), lit(0))

  /** Word n-gram shingles (1-based `element_at`); empty array when the
    * document has fewer than `n` tokens. */
  def shingles(toks: Column, n: Int = 3): Column = {
    val grams = transform(
      sequence(lit(1), size(toks) - (n - 1)),
      i => concat_ws(" ", (0 until n).map(o => element_at(toks, i + o)): _*))
    when(size(toks) < n, array().cast("array<string>")).otherwise(grams)
  }

  /** Distinct-shingle set — the unit for Jaccard/MinHash dedup. */
  def shingleSet(text: Column, n: Int = 3): Column =
    array_distinct(shingles(tokens(text), n))

  /** Canonical document fingerprint: md5 of lowercased,
    * whitespace-collapsed text. Equal fingerprints ⇔ exact duplicates
    * modulo case/whitespace. */
  def fingerprint(text: Column): Column =
    md5(regexp_replace(lower(trim(text)), "\\s+", " "))

  /** Un-rounded composite quality in [0,1]: length credit (tokens/50
    * capped), alphabetic ratio, stopword-presence credit. Callers that
    * compare or bucket this value should quantize with floor (portable
    * across engines), not round (see BASELINE.md's round(double,N)
    * note). */
  def qualityRaw(text: Column,
                 stopwords: Seq[String] = Seq("the", "a", "of", "and", "to")): Column = {
    val ntok = tokenCount(text).cast("double")
    val len = length(text).cast("double")
    val alpha = length(regexp_replace(text, "[^a-z]", "")).cast("double")
    val stopHits = size(regexp_extract_all(text,
      lit("\\b(" + stopwords.mkString("|") + ")\\b"), lit(0))).cast("double")
    least(lit(1.0), ntok / 50.0) * 0.5 +
      (alpha / len) * 0.3 +
      least(lit(1.0), stopHits / 10.0) * 0.2
  }

  /** [[qualityRaw]] rounded to 6 dp — the reporting form (q28). */
  def qualityScore(text: Column,
                   stopwords: Seq[String] = Seq("the", "a", "of", "and", "to")): Column =
    round(qualityRaw(text, stopwords), 6)

  /** Relational shingle stream: one row per (id, pos, shingle), built with
    * posexplode + window lead. This is the scale/bench path for
    * shingle-heavy operators: higher-order array functions are interpreted
    * per element, while this plan stays in whole-stage codegen (the window
    * shuffles on the id, with ordered pos within each doc). */
  def shingleRows(df: org.apache.spark.sql.DataFrame, idCol: String,
                  textCol: String, n: Int = 3): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col(idCol)).orderBy(col("__pos"))
    val toks = df.select(col(idCol),
      posexplode(tokens(col(textCol))).as(Seq("__pos", "__tok")))
    val withLeads = (1 until n).foldLeft(toks) { (acc, o) =>
      acc.withColumn(s"__t$o", lead(col("__tok"), o).over(w))
    }
    val parts = col("__tok") +: (1 until n).map(o => col(s"__t$o"))
    withLeads.filter(parts.last.isNotNull)
      .select(col(idCol), col("__pos"),
        concat_ws(" ", parts: _*).as("shingle"))
  }

  /** Distinct rolling n-token windows per document — the shared frame
    * behind the substring-dedup family (q77 profile, q100's gate,
    * q103 excerpt pairs). One definition so the window shape cannot
    * drift between the three. */
  def distinctWindows(df: org.apache.spark.sql.DataFrame, idCol: String,
                      textCol: String, n: Int = 8): org.apache.spark.sql.DataFrame =
    shingleRows(df, idCol, textCol, n)
      .select(col(idCol), col("shingle")).distinct()

  /** Corpus frequency of each window, attached to the window rows via
    * count() over a window-key partition: ONE shuffle yields the
    * frequency AND keeps the doc rows (measured 1.6× the groupBy +
    * join-back form). */
  def withWindowFreq(wins: org.apache.spark.sql.DataFrame,
                     out: String = "wdf"): org.apache.spark.sql.DataFrame = {
    val w = org.apache.spark.sql.expressions.Window.partitionBy(col("shingle"))
    wins.withColumn(out, count(lit(1)).over(w))
  }

  /** Dictionary-hit language/topic ID: count word-boundary hits per
    * dictionary, pick the argmax with first-listed-wins tie-breaking
    * (a deterministic CASE chain — no UDF, same plan at any scale). */
  def langId(text: Column, dicts: Seq[(String, Seq[String])]): Column = {
    require(dicts.nonEmpty)
    val hits = dicts.map { case (name, words) =>
      name -> size(regexp_extract_all(text,
        lit("\\b(" + words.mkString("|") + ")\\b"), lit(0)))
    }
    hits.zipWithIndex.init.foldRight(lit(hits.last._1): Column) {
      case (((name, h), i), elseCol) =>
        val rest = hits.drop(i + 1).map(_._2)
        when(rest.map(h >= _).reduce(_ && _), lit(name)).otherwise(elseCol)
    }
  }
}

package graft.sinks

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.functions._

import graft.operators.MergeOps

/** S7/S8 — keyed-JSON entry sink: a single JSON object keyed by uid, not
  * an array (reference: authordata[login]={...} then JSON.stringify(x,
  * null, 4) — libs/export/authors.js:51-56). Merge semantics are
  * read-modify-write with last-write-wins per key (SURVEY.md §1.4).
  *
  * Two modes:
  *  - [[writeSingle]]: the reference-compatible single pretty-printed
  *    file. Bounded driver-side materialization — correct for entry
  *    counts that fit one import file (the reference's contract), wrong
  *    for 100 TB.
  *  - [[writeSharded]]: the scale path — entries stay distributed, hashed
  *    into N shard files of JSON-lines (uid TAB json), mergeable by
  *    re-sharding on uid. Compaction = groupBy shard with last-wins.
  */
object KeyedJsonSink {

  /** Render rows to (uid, json) pairs; all non-uid columns become the
    * entry object. */
  private def keyed(df: DataFrame, uidCol: String): DataFrame = {
    val valueCols = df.columns.filterNot(_ == uidCol).map(col)
    df.select(col(uidCol).cast("string").as("uid"),
      to_json(struct(valueCols: _*)).as("json"))
  }

  /** Pretty-print a JSON object string with 4-space indent, matching the
    * reference's JSON.stringify(x, null, 4). Minimal, deterministic. */
  private[sinks] def pretty(json: String): String = {
    val sb = new StringBuilder
    var depth = 0
    var inStr = false
    var esc = false
    json.foreach { c =>
      if (esc) { sb.append(c); esc = false }
      else c match {
        case '\\' if inStr => sb.append(c); esc = true
        case '"' => sb.append(c); inStr = !inStr
        case '{' | '[' if !inStr =>
          depth += 1; sb.append(c).append('\n').append("    " * depth)
        case '}' | ']' if !inStr =>
          depth -= 1; sb.append('\n').append("    " * depth).append(c)
        case ',' if !inStr => sb.append(c).append('\n').append("    " * depth)
        case ':' if !inStr => sb.append(": ")
        case _ => sb.append(c)
      }
    }
    sb.toString
  }

  /** Merge `entries` into the keyed-JSON file at `path` (new rows win),
    * write pretty-printed, return the merged row count. Driver-side by
    * design — see class doc. */
  def writeSingle(entries: DataFrame, uidCol: String, path: String,
                  prettyPrint: Boolean = true): Long = {
    val spark = entries.sparkSession
    val fresh = keyed(entries, uidCol)
    val merged =
      if (Files.exists(Paths.get(path)) && Files.size(Paths.get(path)) > 2) {
        // existing file is one JSON object keyed by uid; melt its fields
        // back to (uid, json) rows before the last-wins merge
        val df = spark.read.option("multiLine", true).json(path)
        val fields = df.schema.fieldNames.toSeq
        if (fields.isEmpty) fresh
        else {
          val kvs = fields.map(f =>
            struct(lit(f).as("uid"), to_json(col(s"`$f`")).as("json")))
          val existing = df
            .select(explode(array(kvs: _*)).as("kv"))
            .select(col("kv.uid"), col("kv.json"))
          MergeOps.mergeLastWins(existing, fresh, Seq("uid"))
        }
      } else fresh
    val rows = merged.orderBy("uid").collect()
    val body = rows.map { r =>
      "\"" + r.getString(0).replace("\\", "\\\\").replace("\"", "\\\"") +
        "\": " + r.getString(1)
    }.mkString("{", ", ", "}")
    val out = if (prettyPrint) pretty(body) else body
    Files.createDirectories(Paths.get(path).getParent)
    Files.write(Paths.get(path), out.getBytes(StandardCharsets.UTF_8))
    rows.length.toLong
  }

  /** Scale path: distributed JSON-lines shards keyed by uid hash. Merging
    * a delta = union previous shards + delta, last-wins on uid, rewrite
    * (one shuffle, no driver materialization). */
  def writeSharded(entries: DataFrame, uidCol: String, dir: String,
                   shards: Int = 64): Unit =
    keyed(entries, uidCol)
      .repartition(shards, col("uid"))
      .select(concat_ws("\t", col("uid"), col("json")).as("value"))
      .write.mode(SaveMode.Overwrite).text(dir)

  /** Master-manifest sink (S8): {"en-us": {uid: ""}} locale map
    * (reference: authors.js:34,52). */
  def writeMasterManifest(entries: DataFrame, uidCol: String, path: String,
                          locale: String = "en-us"): Long = {
    val uids = entries.select(col(uidCol).cast("string").as("uid"))
      .orderBy("uid").collect().map(_.getString(0))
    val inner = uids.map(u =>
      "\"" + u.replace("\\", "\\\\").replace("\"", "\\\"") + "\": \"\"")
      .mkString("{", ", ", "}")
    val out = pretty(s"""{"$locale": $inner}""")
    Files.createDirectories(Paths.get(path).getParent)
    Files.write(Paths.get(path), out.getBytes(StandardCharsets.UTF_8))
    uids.length.toLong
  }
}

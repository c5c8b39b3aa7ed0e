package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Typed metadata extracted from an opaque binary payload. */
final case class MediaMeta(doc_id: Long, n_bytes: Long, digest: String,
                           caption: String)

/** Multimodal-column plumbing: treat image/audio/video as opaque `binary`
  * columns with typed metadata, processed per-partition in batches.
  *
  * The decode step is a clearly-marked STUB (no image/audio libraries in
  * this environment — see builder prompt): [[StubDecoder.decode]] computes
  * deterministic metadata (byte length, md5 digest, a fake caption) in
  * place of a real decoder. Everything around it — binary schema, batch
  * iteration shape, partition-level processing, typed output — is the real
  * Spark plumbing a production decoder would slot into.
  */
object MultimodalOps {

  /** STUB decoder: stands in for image decode / feature extraction.
    * Deterministic so the DuckDB oracle can recompute the outputs. */
  object StubDecoder {
    def decode(id: Long, payload: Array[Byte]): MediaMeta = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val digest = md.digest(payload).map("%02x".format(_)).mkString
      val firstByte = if (payload.nonEmpty) payload(0) & 0xff else 0
      MediaMeta(id, payload.length.toLong, digest, s"asset-${firstByte % 10}")
    }
  }

  /** Attach a binary payload column (here synthesized from text; in
    * production this is the raw media column of the lakehouse table). */
  def withPayload(df: DataFrame, textCol: String): DataFrame =
    df.withColumn("payload", col(textCol).cast("binary"))

  /** Decode per partition: one decoder instance per partition (the batch
    * shape a real native decoder needs), typed Dataset out. Narrow — no
    * shuffle; scales with input splits. */
  def decodeMeta(spark: SparkSession, df: DataFrame, idCol: String): Dataset[MediaMeta] = {
    import spark.implicits._
    df.select(col(idCol).cast("long"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        // per-partition init point (real decoders allocate contexts here)
        rows.map { case (id, payload) => StubDecoder.decode(id, payload) }
      }
  }

  /** Frame sampling over an opaque video/audio payload: every `stride`-th
    * fixed-`frameLen` byte window becomes a row (doc, frame_idx,
    * byte_offset, digest, n_bytes). The byte-slice digest stands in for
    * the per-frame decode (same stub contract as [[StubDecoder]]); the
    * explode/slice plumbing — one generated row per SAMPLED frame, never
    * per frame — is what a real frame extractor rides. Row-local and
    * codegen'd: work ∝ sampled frames, no shuffle, long payloads shard
    * into independent output rows rather than skewing a group. */
  def sampleFrames(df: DataFrame, idCol: String,
                   frameLen: Int, stride: Int): DataFrame = {
    val slice = expr(s"substring(payload, frame_idx * $frameLen + 1, $frameLen)")
    df.select(col(idCol), col("payload"))
      .withColumn("frame_idx", explode(sequence(
        lit(0), expr(s"(length(payload) - 1) div $frameLen"), lit(stride))))
      .select(col(idCol), col("frame_idx").cast("long").as("frame_idx"),
        (col("frame_idx") * frameLen).cast("long").as("byte_offset"),
        md5(slice).as("frame_digest"),
        length(slice).cast("long").as("n_bytes"))
  }
}

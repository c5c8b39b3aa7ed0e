package graft.operators

import graft.catalog.{Q, QueryModule, Tables}

/** Multimodal binary-column surface: opaque payload + typed metadata via
  * per-partition decode (STUB decoder — see [[MultimodalOps]]).
  */
object MultimodalQueries extends QueryModule {

  def qs: Seq[Q] = Seq(
    Q("q40_multimodal_meta", (s, d) => {
      val docs = Tables.t(s, d, "documents")
      MultimodalOps.decodeMeta(s,
        MultimodalOps.withPayload(docs, "text"), "doc_id").toDF()
    }, Some("""
      SELECT doc_id,
        CAST(length(text) AS BIGINT) AS n_bytes,
        md5(text) AS digest,
        'asset-' || CAST(ascii(substr(text, 1, 1)) % 10 AS VARCHAR) AS caption
      FROM documents""")),

    // frame sampling: every 4th 64-byte window of the payload becomes a
    // (frame_idx, byte_offset, digest) row — the deterministic stand-in
    // for video frame extraction, with the real explode/slice plumbing
    // (rows ∝ SAMPLED frames only; row-local, no shuffle). The oracle
    // replays the same windows over the text bytes (ASCII corpus, so
    // byte slices == char slices).
    Q("q76_frame_sample", (s, d) => {
      val docs = Tables.t(s, d, "documents")
      MultimodalOps.sampleFrames(
        MultimodalOps.withPayload(docs, "text"), "doc_id",
        frameLen = 64, stride = 4)
    }, Some("""
      WITH f AS (
        SELECT doc_id, text,
          unnest(range(0, (length(text) - 1) // 64 + 1, 4)) AS i
        FROM documents)
      SELECT doc_id, CAST(i AS BIGINT) AS frame_idx,
        CAST(i * 64 AS BIGINT) AS byte_offset,
        md5(substr(text, CAST(i * 64 + 1 AS INT), 64)) AS frame_digest,
        CAST(length(substr(text, CAST(i * 64 + 1 AS INT), 64)) AS BIGINT)
          AS n_bytes
      FROM f"""))
  )
}

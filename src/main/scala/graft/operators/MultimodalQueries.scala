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
      FROM documents"""))
  )
}

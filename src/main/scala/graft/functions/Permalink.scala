package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** F5 — WordPress permalink-structure templating (the reference's largest
  * JS transform, libs/export/posts.js:58-141).
  *
  * The permalink structure is a *config scalar* known before the job runs,
  * so token dispatch happens at plan-build time in Scala and compiles to a
  * single `concat` of built-in date/string expressions — fully codegen'd,
  * no UDF, no per-row branching.
  */
object Permalink {

  private val TokenRe = "%[a-z_]+%".r

  /** Expand `structure` (e.g. "/%year%/%monthnum%/%day%/%postname%/") into
    * a Column. Unknown tokens pass through literally, matching the
    * reference's behavior for unsupported tags. */
  def expand(structure: String, postDate: Column, postId: Column,
             postname: Column): Column = {
    if (structure.isEmpty) return postname
    val parts = scala.collection.mutable.ArrayBuffer.empty[Column]
    var pos = 0
    for (m <- TokenRe.findAllMatchIn(structure)) {
      if (m.start > pos) parts += lit(structure.substring(pos, m.start))
      parts += (m.matched match {
        case "%year%"     => date_format(postDate, "yyyy")
        case "%monthnum%" => date_format(postDate, "MM") // zero-padded, posts.js:95-99
        case "%day%"      => date_format(postDate, "dd") // zero-padded, posts.js:101-105
        case "%hour%"     => date_format(postDate, "HH")
        case "%minute%"   => date_format(postDate, "mm")
        case "%second%"   => date_format(postDate, "ss")
        case "%post_id%"  => postId.cast("string")
        case "%postname%" => postname
        case other        => lit(other) // literal passthrough, posts.js:126-129
      })
      pos = m.end
    }
    if (pos < structure.length) parts += lit(structure.substring(pos))
    concat(parts.toSeq: _*)
  }
}

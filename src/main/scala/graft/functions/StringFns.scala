package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Scalar string/date transforms from SURVEY.md §2.8, as codegen-friendly
  * `Column` compositions (no UDFs — F1-F8/F10-F11 map to built-ins).
  */
object StringFns {

  /** F1 — slugify: lowercase, collapse non [a-z0-9_-] runs to '-'
    * (reference: libs/export/authors.js:45,50). */
  def slugify(c: Column): Column =
    regexp_replace(lower(c), "[^a-z0-9_-]+", "-")

  /** F2 — URL prefixing (reference: authors.js:50, categories.js:66). */
  def urlPrefix(prefix: String, slug: Column): Column =
    concat(lit(prefix), slug)

  /** F3 — HTML entity decode, `&amp;` → `&` (reference:
    * categories.js:50,55). */
  def entityDecode(c: Column): Column =
    regexp_replace(c, "&amp;", "&")

  /** F4 — strip scheme+host from a URL, keep a leading '/' (reference:
    * posts.js:149). */
  def relativize(url: Column): Column =
    concat(lit("/"), regexp_replace(url, "^(?:\\/\\/|[^\\/]+)*\\/", ""))

  /** F8/F10 — last path segment of a URL (reference: assets.js:74-78). */
  def lastSegment(url: Column): Column =
    element_at(split(url, "/"), -1)

  /** F6 — ISO-8601 date rendering, UTC session TZ (reference:
    * posts.js:151 `.toISOString()`; we render whole seconds). */
  def isoDate(ts: Column): Column =
    date_format(ts, "yyyy-MM-dd'T'HH:mm:ss'Z'")
}

package graft.sinks

import java.nio.file.{Files, Paths}
import java.util.concurrent.Semaphore

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._

/** S9/S10 — side-effecting binary-asset sink with bounded concurrency,
  * retry, idempotence and a dead-letter output (reference:
  * libs/export/assets.js:70-148: guard.n(2) download concurrency, 60 s
  * timeout, 1 retry, skip-if-exists, wp_failed.json).
  *
  * Exactly-once is impossible for HTTP side effects; the contract is
  * at-least-once + idempotence-check + dead-letter (SURVEY.md §7.4), which
  * makes Spark task retries safe.
  *
  * The fetcher is injected ([[Fetcher]]) — production wires an HTTP
  * client; this zero-egress environment and the tests wire fakes.
  */
object HttpFetchSink {

  /** url => Right(bytes) | Left(error). Implementations must be
    * serializable (executed on executors). */
  type Fetcher = String => Either[String, Array[Byte]]

  final case class FetchResult(id: Long, url: String, path: String,
                               ok: Boolean, skipped: Boolean, error: String)

  /** Fetch each (id, url) row to `destDir/<id>/<filename>`.
    *
    * Runs as a distributed transform (`mapPartitions`): each partition
    * holds a semaphore bounding in-flight fetches (the reference's
    * guard.n(2), per executor instead of per process), retries once, and
    * skips files that already exist (idempotent re-runs). Returns a
    * result DataFrame; callers split it into success manifest and
    * dead-letter (S10) via [[deadLetter]]. */
  def fetch(assets: DataFrame, idCol: String, urlCol: String, destDir: String,
            fetcher: Fetcher, concurrency: Int = 2,
            retries: Int = 1): DataFrame = {
    val spark = assets.sparkSession
    import spark.implicits._
    assets.select(col(idCol).cast("long"), col(urlCol).cast("string"))
      .as[(Long, String)]
      .mapPartitions { rows =>
        val gate = new Semaphore(concurrency)
        rows.map { case (id, url) =>
          val fileName = url.split("/").lastOption.filter(_.nonEmpty)
            .getOrElse(s"asset-$id")
          val dir = Paths.get(destDir, id.toString)
          val target = dir.resolve(fileName)
          if (Files.exists(target)) // assets.js:78-80 idempotent skip
            FetchResult(id, url, target.toString, ok = true, skipped = true, "")
          else {
            gate.acquire()
            try {
              var result: Either[String, Array[Byte]] = Left("not attempted")
              var attempt = 0
              var done = false
              while (!done) { // first try + `retries` retries (assets.js:88-96)
                result = fetcher(url)
                done = result.isRight || attempt >= retries
                attempt += 1
              }
              result match {
                case Right(bytes) =>
                  Files.createDirectories(dir)
                  Files.write(target, bytes)
                  FetchResult(id, url, target.toString, ok = true,
                    skipped = false, "")
                case Left(err) =>
                  FetchResult(id, url, target.toString, ok = false,
                    skipped = false, err)
              }
            } finally gate.release()
          }
        }
      }.toDF()
  }

  /** S10 — the dead-letter side: failed fetches as a {id: url} manifest,
    * replayable through the by-ids entry point. */
  def deadLetter(results: DataFrame): DataFrame =
    results.filter(!col("ok"))
      .select(col("id"), col("url"), col("error"))
}

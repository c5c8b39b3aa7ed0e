package graft.sinks

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths, StandardOpenOption}
import java.time.Instant

/** S11 — log-sink parity with the reference's winston setup
  * (libs/utils/logger.js:46-100): one JSON-lines file per named logger
  * under a logs directory, each line `{"level":..,"message":..,
  * "timestamp":..}`, levels error/warn/info/debug, and arguments
  * joined by two spaces with non-strings JSON-stringified
  * (logger.js:15-29 returnString). Driver-side by design — these are
  * orchestration logs (module progress, per-asset failures), not a
  * data-plane output; executors keep using log4j2.
  *
  * Rotation parity (logger.js:55-57: winston maxsize/maxFiles): when an
  * append would push the current file past `maxBytes`, it rolls to
  * `name.1.log` (older files shift to `.2`, `.3`, ...; the oldest
  * beyond `maxFiles` total is deleted) and a fresh `name.log` starts —
  * winston's tailable layout: the live file keeps its name. Total disk
  * is bounded by maxFiles x maxBytes on a run of ANY length; defaults
  * match the reference's 20 x 1 GB. A single line larger than maxBytes
  * still writes (one oversized file) rather than being dropped.
  */
final class JsonLogger(logsDir: String, logfileName: String,
                       maxBytes: Long = 1L << 30, maxFiles: Int = 20) {
  private val path = Paths.get(logsDir, logfileName + ".log")
  Files.createDirectories(Paths.get(logsDir))

  private def rolled(i: Int) = Paths.get(logsDir, s"$logfileName.$i.log")

  /** Shift name.log -> name.1.log -> ... under the instance lock. */
  private def rotate(): Unit = {
    if (maxFiles <= 1) { Files.deleteIfExists(path); return }
    Files.deleteIfExists(rolled(maxFiles - 1))
    ((maxFiles - 2) to 1 by -1).foreach { i =>
      if (Files.exists(rolled(i)))
        Files.move(rolled(i), rolled(i + 1),
          java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    }
    Files.move(path, rolled(1),
      java.nio.file.StandardCopyOption.REPLACE_EXISTING)
  }

  private def jsonStr(s: String): String =
    "\"" + s.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""

  /** Minimal JSON.stringify analog for the argument types the reference
    * logs (strings pass through un-quoted in the message, like winston's
    * string join; maps/seqs/numbers stringify). */
  private def stringify(v: Any): String = v match {
    case s: String => jsonStr(s)
    case n: Int => n.toString
    case n: Long => n.toString
    case n: Double => n.toString
    case b: Boolean => b.toString
    case null => "null"
    case m: scala.collection.Map[_, _] =>
      m.map { case (k, x) => jsonStr(String.valueOf(k)) + ":" + stringify(x) }
        .mkString("{", ",", "}")
    case xs: Iterable[_] => xs.map(stringify).mkString("[", ",", "]")
    case other => jsonStr(String.valueOf(other))
  }

  private def write(level: String, parts: Seq[Any]): Unit = {
    val message = parts.map {
      case s: String => s
      case other => stringify(other)
    }.mkString("  ").trim
    if (message.nonEmpty) {
      val line = s"""{"level":${jsonStr(level)},"message":${jsonStr(message)},""" +
        s""""timestamp":${jsonStr(Instant.now.toString)}}""" + "\n"
      synchronized {
        val bytes = line.getBytes(StandardCharsets.UTF_8)
        val size = if (Files.exists(path)) Files.size(path) else 0L
        if (size > 0 && size + bytes.length > maxBytes) rotate()
        Files.write(path, bytes,
          StandardOpenOption.CREATE, StandardOpenOption.APPEND)
      }
    }
  }

  def log(parts: Any*): Unit = write("info", parts) // reference log() => info
  def warn(parts: Any*): Unit = write("warn", parts)
  def error(parts: Any*): Unit = write("error", parts)
  def debug(parts: Any*): Unit = write("debug", parts)
}

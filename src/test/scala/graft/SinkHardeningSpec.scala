package graft

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}
import java.util.concurrent.atomic.AtomicInteger

import org.scalatest.funsuite.AnyFunSuite

import graft.sinks.{HttpFetchSink, KeyedJsonSink}

/** Counters shared with executor-side fetcher closures (local mode =
  * same JVM, so statics observe true cross-task concurrency). */
object FetchProbe {
  val inFlight = new AtomicInteger(0)
  val maxInFlight = new AtomicInteger(0)
  def reset(): Unit = { inFlight.set(0); maxInFlight.set(0) }
  def enter(): Unit = {
    val cur = inFlight.incrementAndGet()
    maxInFlight.updateAndGet(m => math.max(m, cur))
    ()
  }
  def exit(): Unit = { inFlight.decrementAndGet(); () }
}

class SinkHardeningSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("fetch concurrency bound holds ACROSS tasks (executor-wide gate)") {
    FetchProbe.reset()
    val fetcher: HttpFetchSink.Fetcher = _ => {
      FetchProbe.enter()
      try { Thread.sleep(25); Right(Array[Byte](1)) }
      finally FetchProbe.exit()
    }
    val dest = Files.createTempDirectory("fetchgate").toString
    val assets = (1L to 64L).map(i => (i, s"http://x/img-$i.jpg"))
      .toDF("uid", "url").repartition(16) // 16 concurrent tasks, bound 2
    val results = HttpFetchSink.fetch(assets, "uid", "url", dest, fetcher,
      concurrency = 2)
    assert(results.filter("ok").count() == 64)
    assert(FetchProbe.maxInFlight.get() <= 2,
      s"observed ${FetchProbe.maxInFlight.get()} concurrent fetches, bound was 2")
  }

  test("filename sanitization: traversal, query strings, empty segments") {
    import HttpFetchSink.{safeFileName => f}
    assert(f("http://x/a/img.jpg", 7) == "img.jpg")
    assert(f("http://x/a/img.jpg?v=2#frag", 7) == "img.jpg")
    assert(f("http://x/a/..", 7) == "asset-7")
    assert(f("http://x/a/.", 7) == "asset-7")
    assert(f("http://x/a/", 7) == "asset-7")
    assert(f("http://x/a/?q=1", 7) == "asset-7")
    // a '..' URL must fetch (not skip via Files.exists("..")) and the
    // written file must stay inside destDir
    val dest = Files.createTempDirectory("fetchsafe")
    val fetcher: HttpFetchSink.Fetcher = _ => Right(Array[Byte](42))
    val assets = Seq((9L, "http://x/a/..")).toDF("uid", "url")
    val r = HttpFetchSink.fetch(assets, "uid", "url", dest.toString, fetcher)
      .collect().head
    assert(r.getAs[Boolean]("ok") && !r.getAs[Boolean]("skipped"))
    val written = Paths.get(r.getAs[String]("path")).toAbsolutePath.normalize
    assert(written.startsWith(dest.toAbsolutePath.normalize))
    assert(Files.readAllBytes(written).sameElements(Array[Byte](42)))
  }

  test("writeSingle preserves untouched entries' raw JSON (nulls, order, types)") {
    val dir = Files.createTempDirectory("keyedjson")
    val path = dir.resolve("state.json").toString
    // hand-written state: null field, unusual field order, string-typed number
    val priorEntry = """{"z_last": 1, "a_first": null, "num_as_str": "007"}"""
    Files.write(Paths.get(path),
      s"""{"keep": $priorEntry}""".getBytes(StandardCharsets.UTF_8))
    val delta = Seq(("new", "v")).toDF("uid", "field")
    val n = KeyedJsonSink.writeSingle(delta, "uid", path)
    assert(n == 2)
    val out = new String(Files.readAllBytes(Paths.get(path)), StandardCharsets.UTF_8)
    val entries = KeyedJsonSink.topLevelEntries(out).toMap
    assert(entries.keySet == Set("keep", "new"))
    // raw text survives: null field present, order and formatting intact
    assert(KeyedJsonSink.minify(entries("keep")) ==
      """{"z_last":1,"a_first":null,"num_as_str":"007"}""")
  }

  test("writeSingle removeKeys drops stale entries (dead-letter contract)") {
    val dir = Files.createTempDirectory("keyedjson2")
    val path = dir.resolve("wp_failed.json").toString
    Files.write(Paths.get(path),
      """{"11": {"url": "http://x/a"}, "22": {"url": "http://x/b"}}"""
        .getBytes(StandardCharsets.UTF_8))
    val delta = Seq(("33", "http://x/c")).toDF("uid", "url")
    val n = KeyedJsonSink.writeSingle(delta, "uid", path,
      removeKeys = Set("11", "33")) // 11 healed; 33 also healed later
    assert(n == 1)
    val entries = KeyedJsonSink.topLevelEntries(
      new String(Files.readAllBytes(Paths.get(path)), StandardCharsets.UTF_8)).toMap
    assert(entries.keySet == Set("22"))
  }

  test("topLevelEntries handles escapes, nesting and empty objects") {
    assert(KeyedJsonSink.topLevelEntries("{}").isEmpty)
    assert(KeyedJsonSink.topLevelEntries("""  { } """).isEmpty)
    val got = KeyedJsonSink.topLevelEntries(
      """{"a\"b": {"x": [1, {"y": "},"}]}, "c": "d,e"}""").toMap
    assert(got.keySet == Set("a\"b", "c"))
    assert(KeyedJsonSink.minify(got("a\"b")) == """{"x":[1,{"y":"},"}]}""")
    assert(got("c") == "\"d,e\"")
  }
}

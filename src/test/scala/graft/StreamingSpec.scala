package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.EventsStreaming
import graft.streaming.EventsStreaming.Event

class StreamingSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private def ts(s: String) = Timestamp.valueOf(s)

  test("watermarked hourly window aggregation over a memory stream") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Event]
    val agg = EventsStreaming.hourlyCounts(input.toDF())
    val q = agg.writeStream.outputMode(OutputMode.Complete)
      .format("memory").queryName("hourly").start()
    try {
      input.addData(
        Event(1, ts("2024-01-01 10:05:00"), 1, "click", 1.0),
        Event(2, ts("2024-01-01 10:55:00"), 2, "click", 2.0),
        Event(3, ts("2024-01-01 11:05:00"), 1, "view", 3.0))
      q.processAllAvailable()
      val got = spark.table("hourly")
        .select($"hour", $"event_type", $"n")
        .as[(Timestamp, String, Long)].collect().toSet
      assert(got == Set(
        (ts("2024-01-01 10:00:00"), "click", 2L),
        (ts("2024-01-01 11:00:00"), "view", 1L)))
    } finally q.stop()
  }

  test("stateful sessionization carries state across micro-batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Event]
    val sessions = EventsStreaming.sessionize(input.toDS())
    val q = sessions.writeStream.outputMode(OutputMode.Update)
      .format("memory").queryName("sessions").start()
    try {
      // batch 1: user 1 -> two events 10 min apart = 1 session
      input.addData(
        Event(1, ts("2024-01-01 10:00:00"), 1, "click", 1.0),
        Event(2, ts("2024-01-01 10:10:00"), 1, "click", 1.0))
      q.processAllAvailable()
      // batch 2: 2 hours later -> second session for user 1
      input.addData(Event(3, ts("2024-01-01 12:30:00"), 1, "click", 1.0))
      q.processAllAvailable()
      val last = spark.table("sessions")
        .as[EventsStreaming.UserSessions].collect()
        .filter(_.user_id == 1).maxBy(_.n_events)
      assert(last.n_events == 3 && last.n_sessions == 2)
    } finally q.stop()
  }

  test("streaming decontamination anti-joins the static benchmark set per batch") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    import graft.streaming.EventsStreaming.Doc
    // static benchmark registry: fingerprints of two known eval texts
    // (same canonicalization the stream side applies)
    val bench = Seq("the eval question one", "the eval QUESTION   two")
      .toDF("text")
      .select(graft.operators.TextOps.fingerprint($"text").as("fp"))
    val input = MemoryStream[Doc]
    val q = EventsStreaming.decontaminate(input.toDF(), bench)
      .writeStream.outputMode(OutputMode.Append)
      .format("memory").queryName("decontam").start()
    try {
      input.addData(
        Doc(1, ts("2024-01-01 10:00:00"), "a clean training document"),
        // contaminated: canonicalizes (case/whitespace) to a benchmark fp
        Doc(2, ts("2024-01-01 10:01:00"), "The Eval Question One"))
      q.processAllAvailable()
      // second micro-batch: membership is re-tested per batch
      input.addData(
        Doc(3, ts("2024-01-01 10:02:00"), "the eval   question two"),
        Doc(4, ts("2024-01-01 10:03:00"), "another clean document"))
      q.processAllAvailable()
      val kept = spark.table("decontam").select($"doc_id").as[Long]
        .collect().toSeq.sorted
      assert(kept == Seq(1L, 4L)) // 2 and 3 dropped as benchmark hits
    } finally q.stop()
  }

  test("watermarked streaming dedup drops duplicate event ids across batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Event]
    val q = EventsStreaming.dedupEvents(input.toDF())
      .writeStream.outputMode(OutputMode.Append)
      .format("memory").queryName("dedup").start()
    try {
      input.addData(
        Event(1, ts("2024-01-01 10:00:00"), 1, "click", 1.0),
        Event(1, ts("2024-01-01 10:00:00"), 1, "click", 1.0)) // in-batch dup
      q.processAllAvailable()
      input.addData(Event(1, ts("2024-01-01 10:01:00"), 1, "click", 1.0)) // cross-batch dup
      input.addData(Event(2, ts("2024-01-01 10:02:00"), 1, "view", 2.0))
      q.processAllAvailable()
      val ids = spark.table("dedup").select($"event_id").as[Long].collect().toSeq
      assert(ids.sorted == Seq(1L, 2L))
    } finally q.stop()
  }

  test("streaming curation: quality filter + watermarked fingerprint dedup") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val good = "the quick brown fox jumps over the lazy dog and runs to the " +
      "river bank where a crowd of small animals gathers to watch the show"
    val junk = "#### %%%% !!!! 1234 @@@@"
    val input = MemoryStream[EventsStreaming.Doc]
    val q = EventsStreaming.curateDocs(input.toDF())
      .writeStream.outputMode(OutputMode.Append)
      .format("memory").queryName("curate").start()
    try {
      input.addData(
        EventsStreaming.Doc(1, ts("2024-01-01 10:00:00"), good),
        EventsStreaming.Doc(2, ts("2024-01-01 10:00:01"), junk),
        EventsStreaming.Doc(3, ts("2024-01-01 10:00:02"), "  " + good + " "))
      q.processAllAvailable()
      // cross-batch duplicate inside the watermark horizon (re-spaced, so
      // it still passes quality but fingerprints identically)
      input.addData(
        EventsStreaming.Doc(4, ts("2024-01-01 10:05:00"), good.replace(" ", "  ")))
      input.addData(
        EventsStreaming.Doc(5, ts("2024-01-01 10:06:00"),
          good + " with a genuinely different ending about the weather today"))
      q.processAllAvailable()
      val ids = spark.table("curate").select($"doc_id").as[Long].collect().toSeq
      // doc 1 admitted; junk 2 fails quality; 3 and 4 are fingerprint
      // duplicates of 1 (whitespace/case-canonicalized); 5 is new content
      assert(ids.sorted == Seq(1L, 5L), s"got $ids")
    } finally q.stop()
  }

  test("streaming NEAR-dedup holds a cross-batch MinHash-band collision " +
    "within the watermark, admits genuinely new content") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val base = "the quick brown fox jumps over the lazy dog and runs to " +
      "the river bank where a crowd of small animals gathers to watch " +
      "the evening show unfold under a warm summer sky"
    // near-dup: ONE word changed mid-text — most 3-shingles survive;
    // with this fixed deterministic hash family this specific edit
    // keeps 3 of the 4 band keys identical (empirically probed — a
    // different edit can flip all 4 bands and legitimately escape LSH)
    val near = base.replace("brown", "brownx")
    val fresh = "completely different content about database engines " +
      "partitioning shuffles and the optimizer choosing a broadcast " +
      "join over a sort merge join for a small dimension table"
    val input = MemoryStream[EventsStreaming.Doc]
    val q = EventsStreaming.nearDedupDocs(input.toDF())
      .writeStream.outputMode(OutputMode.Append)
      .format("memory").queryName("neardedup").start()
    try {
      input.addData(EventsStreaming.Doc(1, ts("2024-01-01 10:00:00"), base))
      q.processAllAvailable()
      // SEPARATE micro-batches: the near-dup and the fresh doc arrive
      // after doc 1's bands are already in state
      input.addData(EventsStreaming.Doc(2, ts("2024-01-01 10:05:00"), near))
      q.processAllAvailable()
      input.addData(EventsStreaming.Doc(3, ts("2024-01-01 10:06:00"), fresh))
      q.processAllAvailable()
      // advance the watermark past the 10:00-11:00 window so the
      // append-mode reassembly aggregation emits it
      input.addData(EventsStreaming.Doc(9, ts("2024-01-01 12:30:00"), fresh))
      q.processAllAvailable()
      val ids = spark.table("neardedup")
        .select($"doc_id").as[Long].collect().toSeq.sorted
      // 1 admitted (first copy); 2 held (shares >=1 band with 1);
      // 3 admitted (no shared bands); 9's window hasn't closed
      assert(ids == Seq(1L, 3L), s"got $ids")
    } finally q.stop()
  }

  test("foreachBatch merges streaming aggregates into the keyed-JSON sink") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val path = java.nio.file.Files.createTempDirectory("stream-sink")
      .resolve("counts.json").toString
    val input = MemoryStream[Event]
    val q = EventsStreaming.userCountsToKeyedJson(input.toDF(), path)
    try {
      input.addData(
        Event(1, ts("2024-01-01 10:00:00"), 7, "click", 1.0),
        Event(2, ts("2024-01-01 10:01:00"), 7, "click", 1.0),
        Event(3, ts("2024-01-01 10:02:00"), 8, "view", 1.0))
      q.processAllAvailable()
      input.addData(Event(4, ts("2024-01-01 10:03:00"), 7, "click", 1.0))
      q.processAllAvailable()
      import org.apache.spark.sql.types._
      val back = graft.sources.JsonStateSource.read(spark, path,
        StructType(Seq(StructField("n", LongType))))
        .as[(String, Long)].collect().toMap
      assert(back == Map("7" -> 3L, "8" -> 1L))
    } finally q.stop()
  }

  test("file-source streaming replays the batch events table") {
    val stream = EventsStreaming.readEventsStream(
      spark, "/root/testdata/sf0.001")
    assert(stream.isStreaming)
    val q = EventsStreaming.hourlyCounts(stream)
      .writeStream.outputMode(OutputMode.Complete)
      .format("memory").queryName("replay").start()
    try {
      q.processAllAvailable()
      assert(spark.table("replay").count() > 0)
    } finally q.stop()
  }

  test("Trigger.AvailableNow drains the backlog in bounded batches and self-terminates") {
    // the operational backfill mode: process everything that exists
    // NOW (in rate-limited micro-batches), then stop — the contract a
    // scheduled catch-up job relies on, vs processAllAvailable (a test
    // util) or a never-ending continuous query
    val stream = EventsStreaming.readEventsStream(
      spark, "/root/testdata/sf0.001")
    val q = EventsStreaming.hourlyCounts(stream)
      .writeStream.outputMode(OutputMode.Complete)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .format("memory").queryName("backfill").start()
    assert(q.awaitTermination(120000)) // self-terminates after draining
    assert(!q.isActive)
    val got = spark.table("backfill").count()
    assert(got > 0)
    // the bounded backfill computes exactly the unbounded replay's result
    val replay = EventsStreaming.hourlyCounts(
      EventsStreaming.readEventsStream(spark, "/root/testdata/sf0.001"))
    val q2 = replay.writeStream.outputMode(OutputMode.Complete)
      .format("memory").queryName("backfill_ref").start()
    try {
      q2.processAllAvailable()
      assert(spark.table("backfill_ref").count() == got)
    } finally q2.stop()
  }

  test("checkpointed aggregation recovers state across a query restart") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val ckpt = "/tmp/graft_ckpt_restart"
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(ckpt))
    val input = MemoryStream[Event]
    def start() = EventsStreaming.hourlyCounts(input.toDF())
      .writeStream.outputMode(OutputMode.Complete)
      .option("checkpointLocation", ckpt)
      .format("memory").queryName("ckpt_counts").start()

    val q1 = start()
    try {
      input.addData(Event(1, ts("2024-01-01 10:05:00"), 1, "click", 1.0))
      q1.processAllAvailable()
    } finally q1.stop()

    // restart from the checkpoint: prior state must survive, new data
    // must ACCUMULATE onto it (2 clicks total), not start from zero
    val q2 = start()
    try {
      input.addData(Event(2, ts("2024-01-01 10:25:00"), 2, "click", 2.0))
      q2.processAllAvailable()
      val got = spark.table("ckpt_counts")
        .select($"hour", $"event_type", $"n")
        .as[(Timestamp, String, Long)].collect().toSet
      assert(got == Set((ts("2024-01-01 10:00:00"), "click", 2L)),
        s"state lost or duplicated across restart: $got")
    } finally q2.stop()
  }

  test("stream-stream interval join matches clicks to recent views only") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val views = MemoryStream[Event]
    val clicks = MemoryStream[Event]
    val q = EventsStreaming.clicksAfterViews(views.toDF(), clicks.toDF())
      .writeStream.outputMode(OutputMode.Append)
      .format("memory").queryName("vc_join").start()
    try {
      views.addData(
        Event(1, ts("2024-01-01 10:00:00"), 1, "view", 0.0),
        Event(2, ts("2024-01-01 10:00:00"), 2, "view", 0.0))
      clicks.addData(
        Event(10, ts("2024-01-01 10:10:00"), 1, "click", 0.0), // within 30m
        Event(11, ts("2024-01-01 11:10:00"), 2, "click", 0.0), // too late
        Event(12, ts("2024-01-01 10:05:00"), 3, "click", 0.0)) // no view
      q.processAllAvailable()
      val got = spark.table("vc_join")
        .select($"user_id", $"click_id").as[(Long, Long)].collect().toSet
      assert(got == Set((1L, 10L)),
        s"only the within-window same-user click may join: $got")
    } finally q.stop()
  }

  test("stream-static enrichment joins the dim broadcast per micro-batch") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val dim = Seq(("click", "engagement"), ("view", "impression"))
      .toDF("event_type", "category")
    val input = MemoryStream[Event]
    val q = EventsStreaming.enrich(input.toDF(), dim, "event_type")
      .writeStream.outputMode(OutputMode.Append)
      .format("memory").queryName("enriched").start()
    try {
      input.addData(
        Event(1, ts("2024-01-01 10:05:00"), 1, "click", 1.0),
        Event(2, ts("2024-01-01 10:06:00"), 2, "purchase", 2.0))
      q.processAllAvailable()
      val got = spark.table("enriched")
        .select($"event_id", $"category").as[(Long, Option[String])]
        .collect().toMap
      // matched dim row enriched; unmatched kept with null (left join)
      assert(got == Map(1L -> Some("engagement"), 2L -> None))
    } finally q.stop()
  }

  test("near-dedup gate agrees with its oracled batch twin (q370) on a " +
    "deterministic one-doc-per-microbatch stream") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    import graft.operators.{DedupOps, TextOps}
    import org.apache.spark.sql.functions.{col, min}
    // a planted mix: an original, a near-dup (one-word edit), fresh
    // content, an exact copy, and more fresh content — fed one doc per
    // micro-batch in doc_id order, so the gate's first-seen-wins state
    // evolution is exactly the twin's min-doc_id-claimant model
    val base = "the quick brown fox jumps over the lazy dog and runs to " +
      "the river bank where a crowd of small animals gathers to watch " +
      "the evening show unfold under a warm summer sky"
    val fresh1 = "completely different content about database engines " +
      "partitioning shuffles and the optimizer choosing a broadcast " +
      "join over a sort merge join for a small dimension table"
    val fresh2 = "yet another unrelated passage describing mountains " +
      "rivers forests and the slow change of seasons across a wide " +
      "landscape painted in morning light with quiet persistence"
    val corpus = Seq(1L -> base, 2L -> base.replace("brown", "brownx"),
      3L -> fresh1, 4L -> base, 5L -> fresh2,
      6L -> fresh1.replace("shuffles", "shufflesx"))
    val input = MemoryStream[EventsStreaming.Doc]
    val q = EventsStreaming.nearDedupDocs(input.toDF())
      .writeStream.outputMode(OutputMode.Append)
      .format("memory").queryName("gate_twin").start()
    try {
      corpus.foreach { case (id, text) =>
        input.addData(EventsStreaming.Doc(id,
          ts(f"2024-01-01 10:0$id:00"), text))
        q.processAllAvailable() // one micro-batch per doc
      }
      // close the 10:00-11:00 window so append mode emits it
      input.addData(
        EventsStreaming.Doc(9, ts("2024-01-01 12:30:00"), fresh2))
      q.processAllAvailable()
      val admitted = spark.table("gate_twin")
        .select($"doc_id").as[Long].collect().toSet
      // the batch twin (q370's held model): claimant = min doc_id per
      // band key; held iff some band's claimant precedes the doc
      val docsDf = corpus.toDF("doc_id", "text")
      val sr = TextOps.shingleRows(docsDf, "doc_id", "text")
        .select(col("doc_id"), col("shingle")).distinct()
      val sigs = DedupOps.minhashSignatures(sr, "doc_id", "shingle", 16)
      val bands = DedupOps.lshBands(sigs, "doc_id", "sig", 4, 4)
      val first = bands.groupBy("band_id", "band_hash")
        .agg(min("doc_id").as("first_id"))
      val held = bands.join(first, Seq("band_id", "band_hash"))
        .filter(col("first_id") < col("doc_id"))
        .select($"doc_id").distinct().as[Long].collect().toSet
      val twinAdmitted = corpus.map(_._1).toSet -- held
      assert(admitted == twinAdmitted,
        s"gate admitted $admitted, twin admits $twinAdmitted (held $held)")
      // sanity on the mix itself: originals pass, the exact copy is held
      assert(admitted.contains(1L) && !admitted.contains(4L))
    } finally q.stop()
  }
}

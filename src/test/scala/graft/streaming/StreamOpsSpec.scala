package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.SparkTestSession
import graft.streaming.StreamOps.{Event, Session}

class StreamOpsSpec extends AnyFunSuite with Matchers with SparkTestSession {

  private def ts(s: String) = Timestamp.valueOf(s)

  private def sampleEvents = Seq(
    Event(1, ts("2024-01-01 10:00:00"), 1, "click", 1.0),
    Event(2, ts("2024-01-01 10:02:00"), 1, "click", 2.0),
    Event(3, ts("2024-01-01 10:20:00"), 1, "view", 3.0), // > 10 min gap -> new session
    Event(4, ts("2024-01-01 10:01:00"), 2, "click", 4.0))

  test("windowedEventStats: batch path, tumbling 5-minute windows") {
    import spark.implicits._
    val df = sampleEvents.toDF()
    val out = StreamOps.windowedEventStats(df, "5 minutes", "5 minutes", "10 minutes")
      .orderBy("window_start", "event_type").collect()
    out.length shouldBe 2 // [10:00-10:05 click x3], [10:20-10:25 view x1]
    val clicks = out.filter(_.getAs[String]("event_type") == "click")
    clicks.map(_.getAs[Long]("num_events")).sum shouldBe 3
  }

  test("windowedEventStats: streaming path with watermark (MemoryStream)") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[Event]
    stream.addData(sampleEvents: _*)
    val q = StreamOps.windowedEventStats(stream.toDF(), "5 minutes", "5 minutes", "10 minutes")
      .writeStream.format("memory").queryName("win_out").outputMode("append").start()
    try {
      q.processAllAvailable()
      // append mode emits only watermark-closed windows; advance the clock
      stream.addData(Event(9, ts("2024-01-01 11:00:00"), 9, "late", 0.0))
      q.processAllAvailable()
      val rows = spark.table("win_out").collect()
      rows.length should be >= 2 // the 10:00 and 10:20 windows are closed
    } finally q.stop()
  }

  test("sessionWindows (native session_window) agrees with mapGroupsWithState sessionize") {
    import spark.implicits._
    // deterministic pseudo-random event set: 20 users x 40 events over 3 days
    val rnd = new scala.util.Random(5)
    val base = ts("2024-03-01 00:00:00").getTime
    val evs = (0 until 800).map { i =>
      Event(i, new Timestamp(base + rnd.nextInt(3 * 24 * 3600) * 1000L),
        i % 20, "e", (i % 7).toDouble)
    }
    val gapMs = 2 * 3600 * 1000L
    val native = StreamOps.sessionWindows(evs.toDF(), "2 hours")
      .select(col("user_id"), col("session_start"), col("num_events"), col("total_value"))
      .as[(Long, Timestamp, Long, Double)].collect().toSet
    val custom = StreamOps.sessionize(evs.toDS(), gapMs)
      .map(s => (s.user_id, s.start, s.num_events.toLong, s.total_value))
      .collect().toSet
    native shouldBe custom
  }

  test("sessionWindows runs identically as a streaming query (MemoryStream, complete-by-watermark)") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[Event]
    stream.addData(sampleEvents: _*)
    val q = StreamOps.sessionWindows(
        stream.toDF().withWatermark("ts", "10 minutes"), "10 minutes")
      .writeStream.format("memory").queryName("sess_out").outputMode("append").start()
    try {
      q.processAllAvailable()
      stream.addData(Event(9, ts("2024-01-01 12:00:00"), 9, "late", 0.0))
      q.processAllAvailable()
      val rows = spark.table("sess_out").collect()
      rows.length should be >= 2 // user 1's two sessions closed by the watermark
    } finally q.stop()
  }

  import StreamOpsSpec.Doc

  test("dedupStream: within-watermark duplicate texts are dropped across micro-batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[Doc]
    val q = StreamOps.dedupStream(stream.toDF(), "1 hour")
      .writeStream.format("memory").queryName("dedup_out").outputMode("append").start()
    try {
      stream.addData(
        Doc(1, ts("2024-01-01 10:00:00"), "alpha"),
        Doc(2, ts("2024-01-01 10:00:10"), "alpha"), // in-batch dup
        Doc(3, ts("2024-01-01 10:00:20"), "beta"))
      q.processAllAvailable()
      stream.addData(
        Doc(4, ts("2024-01-01 10:05:00"), "alpha"), // cross-batch dup, in horizon
        Doc(5, ts("2024-01-01 10:05:10"), "gamma"))
      q.processAllAvailable()
      val texts = spark.table("dedup_out").select("text").as[String].collect().sorted
      texts shouldBe Array("alpha", "beta", "gamma")
    } finally q.stop()
  }

  test("intervalJoin: stream-stream attribution matches the batch join; out-of-horizon excluded") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val imps = Seq(
      (ts("2024-01-01 10:00:00"), 1L, "imp_a"),
      (ts("2024-01-01 10:00:00"), 2L, "imp_b"))
    val clicks = Seq(
      (ts("2024-01-01 10:03:00"), 1L, "click_1"), // in horizon (5 min)
      (ts("2024-01-01 10:30:00"), 1L, "click_2"), // out of horizon
      (ts("2024-01-01 10:04:00"), 3L, "click_3")) // no matching impression
    val expected = Seq(("imp_a", "click_1"))

    // batch path
    val bOut = StreamOps.intervalJoin(
      imps.toDF("ts", "user_id", "imp"), clicks.toDF("c_ts", "user_id", "click"),
      "user_id", "ts", "c_ts", "5 minutes", "10 minutes")
    bOut.select("imp", "click").as[(String, String)].collect().toSeq shouldBe expected

    // streaming path: same data through two MemoryStreams
    val impStream = MemoryStream[(Timestamp, Long, String)]
    val clickStream = MemoryStream[(Timestamp, Long, String)]
    impStream.addData(imps: _*)
    clickStream.addData(clicks: _*)
    val q = StreamOps.intervalJoin(
      impStream.toDF().toDF("ts", "user_id", "imp"),
      clickStream.toDF().toDF("c_ts", "user_id", "click"),
      "user_id", "ts", "c_ts", "5 minutes", "10 minutes")
      .writeStream.format("memory").queryName("attr_out").outputMode("append").start()
    try {
      q.processAllAvailable()
      spark.table("attr_out").select("imp", "click")
        .as[(String, String)].collect().toSeq shouldBe expected
    } finally q.stop()
  }

  test("intervalJoin left_outer: unmatched impressions emit nulls after the watermark closes them") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val impStream = MemoryStream[(Timestamp, Long, String)]
    val clickStream = MemoryStream[(Timestamp, Long, String)]
    impStream.addData(
      (ts("2024-01-01 10:00:00"), 1L, "imp_a"),
      (ts("2024-01-01 10:00:00"), 2L, "imp_b"))
    clickStream.addData((ts("2024-01-01 10:03:00"), 1L, "click_1"))
    val q = StreamOps.intervalJoin(
      impStream.toDF().toDF("ts", "user_id", "imp"),
      clickStream.toDF().toDF("c_ts", "user_id", "click"),
      "user_id", "ts", "c_ts", "5 minutes", "10 minutes", "left_outer")
      .writeStream.format("memory").queryName("attr_outer").outputMode("append").start()
    try {
      q.processAllAvailable()
      // push BOTH watermarks far past imp_b's horizon (10:05 + 10 min delay)
      impStream.addData((ts("2024-01-01 12:00:00"), 9L, "imp_z"))
      clickStream.addData((ts("2024-01-01 12:00:00"), 9L, "click_z"))
      q.processAllAvailable()
      val rows = spark.table("attr_outer")
        .select("imp", "click").as[(String, Option[String])].collect().toMap
      rows("imp_a") shouldBe Some("click_1")
      rows("imp_b") shouldBe None // emitted as an outer row, not dropped
    } finally q.stop()
  }

  test("dedupStream: batch path keeps one row per distinct text") {
    import spark.implicits._
    val docs = Seq(
      Doc(1, ts("2024-01-01 10:00:00"), "alpha"),
      Doc(2, ts("2024-01-01 10:00:10"), "alpha"),
      Doc(3, ts("2024-01-01 10:00:20"), "beta")).toDF()
    val out = StreamOps.dedupStream(docs, "1 hour")
    out.count() shouldBe 2
    out.select("text").as[String].collect().sorted shouldBe Array("alpha", "beta")
  }

  test("insertStream: micro-batches run the full insert pipeline; optimize cleans cross-batch dups") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    import graft.schema.{AggregationMethod => Agg, GraftDataType => T, CompactedTableSchema}
    val root = java.nio.file.Files.createTempDirectory("graft_stream_ingest_").toString
    val ckpt = java.nio.file.Files.createTempDirectory("graft_stream_ckpt_").toString
    val store = graft.store.CellStore(spark, root)
    val schema = CompactedTableSchema.builder("stream_ingest")
      .h3BaseResolutions(Seq(9))
      .useCompaction(false)
      .addAggregatedColumn("v", T.Float64, Agg.Max)
      .build()
    val cells = graft.h3.H3.toChildren(
      graft.h3.H3.fromParts(20, 5, Seq(0, 0, 0, 0, 0)), 9).take(50).toSeq
    val stream = MemoryStream[(Long, Double)]
    val q = StreamOps.insertStream(
      stream.toDF().toDF("h3index", "v"), store, "stream_ingest", ckpt, Some(schema))
    try {
      stream.addData(cells.take(30).map(c => (c, 1.0)): _*)
      q.processAllAvailable()
      store.scanForResolution("stream_ingest", 9).count() shouldBe 30
      // overlapping second batch: dedup is PER insert (reference semantics) —
      // cross-batch duplicates persist until the optimize pass
      stream.addData(cells.slice(20, 50).map(c => (c, 1.0)): _*)
      q.processAllAvailable()
      store.scanForResolution("stream_ingest", 9).count() shouldBe 60
    } finally q.stop()
    store.deduplicate("stream_ingest")
    val after = store.scanForResolution("stream_ingest", 9)
    after.count() shouldBe 50
    after.select("h3index").distinct().count() shouldBe 50
  }

  test("s3 gate: AvailableNow file-source streaming run equals the batch plan") {
    val dir = "/root/testdata/sf0.001"
    val streamed = graft.Queries.s3StreamWindowed(spark, dir)
      .collect().map(_.toSeq).toSet
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val ev = graft.Queries.convertEventTs(
      spark.read.parquet(s"$dir/events.parquet"))
    val batch = StreamOps.windowedEventStats(ev, "1 hour", "1 hour", "30 minutes")
      .withColumn("total_value", round(col("total_value"), 2))
      .collect().map(_.toSeq).toSet
    streamed should not be empty
    streamed shouldBe batch
  }

  test("sessionize: gap splits sessions, totals conserved") {
    import spark.implicits._
    val sessions = StreamOps.sessionize(sampleEvents.toDS(), gapMillis = 10 * 60 * 1000)
      .collect().sortBy(s => (s.user_id, s.start.getTime))
    sessions.length shouldBe 3
    val u1 = sessions.filter(_.user_id == 1)
    u1.length shouldBe 2
    u1.head.num_events shouldBe 2
    u1.head.total_value shouldBe 3.0
    u1.last.num_events shouldBe 1
    sessions.map(_.total_value).sum shouldBe 10.0
  }

  test("transformWithState running stats: final per-key emission equals the batch aggregate bit-exactly under in-order micro-batching") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // transformWithState runs only on the RocksDB state store
    val prevProvider = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val stream = MemoryStream[Event]
      val q = StreamOps.runningUserStats(stream.toDS())
        .writeStream.format("memory").queryName("tws_out").outputMode("update").start()
      try {
        // two different micro-batch splits of the same data: state must
        // carry the fold across the batch boundary
        stream.addData(sampleEvents.take(2): _*)
        q.processAllAvailable()
        stream.addData(sampleEvents.drop(2): _*)
        q.processAllAvailable()
        val emitted = spark.table("tws_out").as[StreamOps.UserStats].collect()
        // LAST emission per key (update mode emits one row per key per batch)
        val finalPerKey = emitted.zipWithIndex
          .groupBy(_._1.user_id).view.mapValues(_.maxBy(_._2)._1).toMap
        finalPerKey(1L) shouldBe StreamOps.UserStats(1L, 3L, 6.0, 3.0)
        finalPerKey(2L) shouldBe StreamOps.UserStats(2L, 1L, 4.0, 4.0)
        // mid-stream emissions are monotone prefixes, never regressions
        val u1 = emitted.filter(_.user_id == 1L).map(_.n_events)
        u1.sorted shouldBe u1
      } finally q.stop()
    } finally {
      prevProvider match {
        case Some(p) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", p)
        case None => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
      }
    }
  }

  test("transformWithState running stats: a LATE cross-batch event still converges (counts/max exact, total within float tolerance)") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val prevProvider = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val stream = MemoryStream[Event]
      val q = StreamOps.runningUserStats(stream.toDS())
        .writeStream.format("memory").queryName("tws_late_out").outputMode("update").start()
      try {
        // batch 0: the 10:02 and 10:20 events; batch 1 delivers the 10:00
        // event LATE — it folds out of global ts order, so the double total
        // is only float-close to the batch aggregate, while count and max
        // stay exact (the scaladoc's narrowed claim, pinned)
        stream.addData(sampleEvents(1), sampleEvents(2))
        q.processAllAvailable()
        stream.addData(sampleEvents(0))
        q.processAllAvailable()
        val emitted = spark.table("tws_late_out").as[StreamOps.UserStats].collect()
        val fin = emitted.zipWithIndex.filter(_._1.user_id == 1L).maxBy(_._2)._1
        fin.n_events shouldBe 3L
        fin.max_value shouldBe 3.0
        fin.total_value shouldBe 6.0 +- 1e-9
      } finally q.stop()
    } finally {
      prevProvider match {
        case Some(p) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", p)
        case None => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
      }
    }
  }
}

object StreamOpsSpec {
  case class Doc(doc_id: Long, ts: Timestamp, text: String)
}

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
}

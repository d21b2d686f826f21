package graft.streaming

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.SparkTestSession

/** Pins Spark's watermark-eviction behavior at EXACT equality — before this
  * spec the s11/s12 oracle cutoffs were pinned only empirically by gate
  * data that never lands on the boundary (ADVICE r4); an event exactly at
  * the cutoff would have diverged cross-engine.
  *
  * The two stateful operators have DIFFERENT boundaries (both pinned here,
  * and mirrored by the gate oracles):
  *  - `session_window` append output is INCLUSIVE: a session whose end
  *    equals the final watermark exactly IS emitted -> the s12 oracle's
  *    cutoff is `session_end <= wm`.
  *  - stream-stream left-outer eviction is STRICT: a view whose horizon
  *    ends exactly at the watermark stays open state (its null-extended
  *    row is NOT emitted); one millisecond of watermark progress past the
  *    cutoff closes it -> the s11 oracle's `view_ts + horizon < wm` is
  *    correct.
  * Both tests run the gates' exact lifecycle: file source, watermark
  * "1 hour", AvailableNow (the no-data batch flushes eviction),
  * append-mode memory sink. */
class WatermarkBoundarySpec extends AnyFunSuite with Matchers with SparkTestSession {

  private def ts(s: String) = Timestamp.valueOf(s)

  test("session_window emits a session ending EXACTLY at the watermark (inclusive boundary; oracle uses <=)") {
    import spark.implicits._
    // gap 30 min, delay 1 hour. Anchor at 11:30 -> final wm = 10:30.
    //  user 1: event at 10:00          -> end 10:30        == wm (boundary)
    //  user 2: event at 09:59          -> end 10:29         < wm
    //  user 3: event at 10:00:00.001   -> end 10:30:00.001  > wm
    def run(rows: DataFrame, sink: String): Set[Long] = {
      val dir = Files.createTempDirectory("graft_wmb_s_").toString
      rows.write.mode("overwrite").parquet(s"$dir/events.parquet")
      val src = spark.readStream.schema(rows.schema).parquet(s"$dir/events.*")
      spark.catalog.dropTempView(sink)
      val q = StreamOps.sessionWindows(src.withWatermark("ts", "1 hour"), "30 minutes")
        .writeStream.format("memory").queryName(sink)
        .outputMode("append")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      spark.table(sink).select("user_id").collect().map(_.getLong(0)).toSet
    }
    val rows = Seq(
      (1L, ts("2024-01-01 10:00:00"), 1L, "click", 1.0),
      (2L, ts("2024-01-01 09:59:00"), 2L, "click", 1.0),
      (3L, ts("2024-01-01 10:00:00.001"), 3L, "click", 1.0),
      (99L, ts("2024-01-01 11:30:00"), 99L, "click", 1.0))
      .toDF("event_id", "ts", "user_id", "event_type", "value")
    val users = run(rows, "wmb_sessions")
    users should contain(2L)     // strictly below: emitted
    users should contain(1L)     // exactly AT the watermark: ALSO emitted
    users should not contain 3L  // 1 ms past: still open state
  }

  test("stream-stream left outer closes a view only STRICTLY past its horizon cutoff (oracle uses <)") {
    import spark.implicits._
    // horizon 30 min, delay 1 hour; wm = min(max_view, max_purchase) - 1h.
    //  view A (user 1) at 10:00, no purchase -> cutoff 10:30
    //  view B (user 2) at 09:59, no purchase -> cutoff 10:29
    // anchors on BOTH sides (the global watermark is the min across
    // sources) at `anchor` -> wm = anchor - 1h
    def run(anchor: String, sink: String): Set[Long] = {
      val vs = Seq((10L, ts("2024-01-01 10:00:00"), 1L),
        (20L, ts("2024-01-01 09:59:00"), 2L),
        (90L, ts(anchor), 90L)).toDF("view_id", "view_ts", "user_id")
      val ps = Seq((91L, ts(anchor), 91L))
        .toDF("purchase_id", "purchase_ts", "user_id")
      val dir = Files.createTempDirectory("graft_wmb_j_").toString
      vs.write.mode("overwrite").parquet(s"$dir/v.parquet")
      ps.write.mode("overwrite").parquet(s"$dir/p.parquet")
      val vSrc = spark.readStream.schema(vs.schema).parquet(s"$dir/v.*")
      val pSrc = spark.readStream.schema(ps.schema).parquet(s"$dir/p.*")
      val joined = StreamOps.intervalJoin(vSrc, pSrc, "user_id",
          "view_ts", "purchase_ts", "30 minutes", "1 hour", "left_outer")
        .select(col("view_id"), coalesce(col("purchase_id"), lit(-1L)).as("purchase_id"))
      spark.catalog.dropTempView(sink)
      val q = joined.writeStream.format("memory").queryName(sink)
        .outputMode("append")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      spark.table(sink).where(col("purchase_id") === -1L)
        .select("view_id").collect().map(_.getLong(0)).toSet
    }
    // wm = 10:30 == view A's cutoff: NOT closed (strict), B closed
    val atBoundary = run("2024-01-01 11:30:00", "wmb_outer")
    atBoundary should contain(20L)
    atBoundary should not contain 10L
    // one millisecond past the cutoff: closed
    run("2024-01-01 11:30:00.001", "wmb_outer2") should contain(10L)
  }

  test("full outer closes an unmatched purchase only STRICTLY past its own ts (oracle uses <)") {
    import spark.implicits._
    // the RIGHT side's eviction bound is the purchase's own timestamp (the
    // range condition bounds candidate views from below by pt - horizon,
    // and future views must carry ts past the watermark):
    //  purchase C (user 1) at 10:00, no view -> cutoff 10:00
    //  purchase D (user 2) at 09:59, no view -> cutoff 09:59
    def run(anchor: String, sink: String): Set[Long] = {
      val vs = Seq((90L, ts(anchor), 90L)).toDF("view_id", "view_ts", "user_id")
      val ps = Seq((10L, ts("2024-01-01 10:00:00"), 1L),
        (20L, ts("2024-01-01 09:59:00"), 2L),
        (91L, ts(anchor), 91L)).toDF("purchase_id", "purchase_ts", "user_id")
      val dir = Files.createTempDirectory("graft_wmb_f_").toString
      vs.write.mode("overwrite").parquet(s"$dir/v.parquet")
      ps.write.mode("overwrite").parquet(s"$dir/p.parquet")
      val vSrc = spark.readStream.schema(vs.schema).parquet(s"$dir/v.*")
      val pSrc = spark.readStream.schema(ps.schema).parquet(s"$dir/p.*")
      val joined = StreamOps.intervalJoin(vSrc, pSrc, "user_id",
          "view_ts", "purchase_ts", "30 minutes", "1 hour", "full_outer")
        .select(coalesce(col("view_id"), lit(-1L)).as("view_id"),
          col("purchase_id"))
      spark.catalog.dropTempView(sink)
      val q = joined.writeStream.format("memory").queryName(sink)
        .outputMode("append")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      spark.table(sink).where(col("view_id") === -1L)
        .select("purchase_id").collect().map(_.getLong(0)).toSet
    }
    // wm = 10:00 == purchase C's own ts: NOT closed (strict), D closed
    val atBoundary = run("2024-01-01 11:00:00", "wmb_full")
    atBoundary should contain(20L)
    atBoundary should not contain 10L
    // one millisecond past: closed
    run("2024-01-01 11:00:00.001", "wmb_full2") should contain(10L)
  }
}

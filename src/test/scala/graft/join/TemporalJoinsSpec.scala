package graft.join

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.SparkTestSession

class TemporalJoinsSpec extends AnyFunSuite with Matchers with SparkTestSession {

  private def ts(s: String) = Timestamp.valueOf(s)

  test("asofJoin picks the most recent right row at-or-before each left ts") {
    import spark.implicits._
    val left = Seq(
      (1L, 10L, ts("2024-01-01 10:30:00")),
      (2L, 10L, ts("2024-01-01 12:00:00")),
      (3L, 20L, ts("2024-01-01 09:00:00"))).toDF("id", "k", "t")
    val right = Seq(
      (10L, ts("2024-01-01 10:00:00"), "a"),
      (10L, ts("2024-01-01 11:00:00"), "b"),
      (20L, ts("2024-01-01 09:30:00"), "c")).toDF("k", "rt", "v")
    val out = TemporalJoins.asofJoin(left, right, "k", "t", "rt")
      .select($"id", $"asof_v").as[(Long, Option[String])].collect().sortBy(_._1)
    out shouldBe Array(
      (1L, Some("a")), // 10:30 -> 10:00, not 11:00
      (2L, Some("b")), // 12:00 -> 11:00
      (3L, None)) // 09:00 has no prior right row (09:30 is later)
  }

  test("asofJoin matches an exactly-equal timestamp (inclusive <=)") {
    import spark.implicits._
    val left = Seq((1L, 5L, ts("2024-01-01 10:00:00"))).toDF("id", "k", "t")
    val right = Seq((5L, ts("2024-01-01 10:00:00"), "x")).toDF("k", "rt", "v")
    val out = TemporalJoins.asofJoin(left, right, "k", "t", "rt")
    out.select($"asof_v").as[String].collect() shouldBe Array("x")
    out.select($"asof_ts").as[Timestamp].collect() shouldBe Array(ts("2024-01-01 10:00:00"))
  }

  test("asofJoin preserves every left row and column, never crosses keys") {
    import spark.implicits._
    val left = Seq(
      (1L, 1L, ts("2024-01-01 10:00:00"), "p1"),
      (2L, 2L, ts("2024-01-01 10:00:00"), "p2")).toDF("id", "k", "t", "payload")
    val right = Seq((1L, ts("2024-01-01 09:00:00"), "r1")).toDF("k", "rt", "v")
    val out = TemporalJoins.asofJoin(left, right, "k", "t", "rt")
    out.columns.toSeq shouldBe Seq("id", "k", "t", "payload", "asof_ts", "asof_v")
    out.count() shouldBe 2
    // key 2 has right rows for key 1 only -> NULL, payload intact
    out.where($"id" === 2).select($"payload", $"asof_v")
      .as[(String, Option[String])].collect() shouldBe Array(("p2", None))
  }

  test("asofJoin agrees with a brute-force argmax derivation on random data") {
    import spark.implicits._
    val rnd = new scala.util.Random(42)
    val base = ts("2024-01-01 00:00:00").getTime
    val left = (1 to 300).map(i =>
      (i.toLong, (rnd.nextInt(5) + 1).toLong, new Timestamp(base + rnd.nextInt(100000) * 1000L)))
      .toDF("id", "k", "t")
    val right = (1 to 200).map(i =>
      ((rnd.nextInt(6) + 1).toLong, new Timestamp(base + rnd.nextInt(100000) * 1000L), i.toLong))
      .toDF("k", "rt", "v")
      // contract: unique per (k, ts)
      .groupBy("k", "rt").agg(max($"v").as("v"))
    val got = TemporalJoins.asofJoin(left, right, "k", "t", "rt")
      .select($"id", $"asof_v").as[(Long, Option[Long])].collect().sortBy(_._1)
    // brute force: per left row, the max-ts right row with rt <= t
    val expected = left.as[(Long, Long, Timestamp)].collect().map { case (id, k, t) =>
      val cands = right.as[(Long, Timestamp, Long)].collect()
        .filter(r => r._1 == k && !r._2.after(t))
      (id, if (cands.isEmpty) None else Some(cands.maxBy(_._2.getTime)._3))
    }.sortBy(_._1)
    got shouldBe expected
  }

  test("rangeJoin returns exactly the contained points, once each") {
    import spark.implicits._
    val points = Seq(
      (1L, ts("2024-01-01 10:00:00"), 1.0),
      (1L, ts("2024-01-01 10:05:00"), 2.0),
      (1L, ts("2024-01-01 10:59:00"), 3.0),
      (2L, ts("2024-01-01 10:05:00"), 4.0)).toDF("k", "t", "v")
    val intervals = Seq(
      (100L, 1L, ts("2024-01-01 10:00:00"), ts("2024-01-01 10:30:00")),
      (200L, 1L, ts("2024-01-01 10:04:00"), ts("2024-01-01 10:06:00"))).toDF("iid", "k", "s", "e")
    val out = TemporalJoins.rangeJoin(points, intervals, "k", "t", "s", "e", 60L)
      .select($"iid", $"v").as[(Long, Double)].collect().sorted
    // interval 100 contains points at 10:00 (boundary), 10:05; interval 200 contains 10:05
    out shouldBe Array((100L, 1.0), (100L, 2.0), (200L, 2.0))
  }

  test("rangeJoin agrees with the theta-join formulation for any bucket width") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val base = ts("2024-01-01 00:00:00").getTime
    val points = (1 to 400).map(i =>
      ((rnd.nextInt(4) + 1).toLong, new Timestamp(base + rnd.nextInt(50000) * 1000L), i.toLong))
      .toDF("k", "t", "pid")
    val intervals = (1 to 50).map { i =>
      val s = base + rnd.nextInt(50000) * 1000L
      ((rnd.nextInt(4) + 1).toLong, new Timestamp(s), new Timestamp(s + rnd.nextInt(3000) * 1000L), i.toLong)
    }.toDF("k", "s", "e", "iid")
    val theta = intervals.join(points, Seq("k"))
      .where($"t" >= $"s" && $"t" <= $"e")
      .select($"iid", $"pid").as[(Long, Long)].collect().sorted
    for (width <- Seq(1L, 97L, 600L, 100000L)) {
      val banded = TemporalJoins.rangeJoin(points, intervals, "k", "t", "s", "e", width)
        .select($"iid", $"pid").as[(Long, Long)].collect().sorted
      withClue(s"bucketWidth=$width: ") { banded shouldBe theta }
    }
  }

  test("asofJoin plans a single shuffle and no nested-loop join") {
    import spark.implicits._
    val left = Seq((1L, 1L, ts("2024-01-01 10:00:00"))).toDF("id", "k", "t")
    val right = Seq((1L, ts("2024-01-01 09:00:00"), "r")).toDF("k", "rt", "v")
    val plan = TemporalJoins.asofJoin(left, right, "k", "t", "rt")
      .queryExecution.executedPlan.toString
    plan should not include "BroadcastNestedLoop"
    plan should not include "CartesianProduct"
    // one exchange for the window partitioning (plus nothing else)
    plan.linesIterator.count(_.contains("Exchange hashpartitioning")) shouldBe 1
  }

  test("rangeJoin plans an equi-join, not a nested loop") {
    import spark.implicits._
    val points = Seq((1L, ts("2024-01-01 10:00:00"), 1.0)).toDF("k", "t", "v")
    val intervals = Seq((9L, 1L, ts("2024-01-01 10:00:00"), ts("2024-01-01 11:00:00")))
      .toDF("iid", "k", "s", "e")
    val plan = TemporalJoins.rangeJoin(points, intervals, "k", "t", "s", "e", 600L)
      .queryExecution.executedPlan.toString
    plan should not include "BroadcastNestedLoop"
    plan should not include "CartesianProduct"
  }
}

package graft.util

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.SparkTestSession

/** Interval-union invariants, property-tested against an independent
  * driver-side brute-force merge over seeded random inputs. */
class IntervalsSpec extends AnyFunSuite with Matchers with SparkTestSession {

  private def df(rows: Seq[(Long, Long, Long)]) =
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows.map(r => Row(r._1, r._2, r._3)), 4),
      StructType(Seq(
        StructField("k", LongType, false),
        StructField("s", LongType, false),
        StructField("e", LongType, false))))

  /** Reference merge: sort, sweep, closed-interval semantics (touching
    * merges, adjacent-disjoint does not). */
  private def brute(iv: Seq[(Long, Long)]): Seq[(Long, Long)] =
    iv.sorted.foldLeft(List.empty[(Long, Long)]) {
      case (acc, (s, e)) => acc match {
        case (ps, pe) :: tail if s <= pe => (ps, math.max(pe, e)) :: tail
        case _ => (s, e) :: acc
      }
    }.reverse

  test("random interval mixes: merged islands equal the brute-force sweep per key") {
    val rnd = new scala.util.Random(4242)
    val rows = for {
      k <- 0L until 40L
      _ <- 0 until rnd.nextInt(30)
    } yield {
      val s = rnd.nextInt(200).toLong
      (k, s, s + rnd.nextInt(20))
    }
    val got = Intervals.mergeIntervals(df(rows), "k", "s", "e")
      .collect().map(r => (r.getLong(0), (r.getLong(1), r.getLong(2))))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSeq.sorted).toMap
    val expected = rows.groupBy(_._1).view
      .mapValues(g => brute(g.map(t => (t._2, t._3)))).toMap
    got.keySet shouldBe expected.keySet
    expected.foreach { case (k, ex) =>
      withClue(s"key $k") { got(k) shouldBe ex }
    }
    // coveredLength agrees with the merged islands it derives from
    val cov = Intervals.coveredLength(df(rows), "k", "s", "e")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    expected.foreach { case (k, ex) =>
      cov(k) shouldBe ((ex.size.toLong, ex.map { case (s, e) => e - s + 1 }.sum))
    }
  }

  test("touching intervals merge; adjacent-but-disjoint stay separate") {
    val out = Intervals.mergeIntervals(
      df(Seq((1L, 0L, 5L), (1L, 5L, 9L), (1L, 11L, 12L))), "k", "s", "e")
      .orderBy("island_s").collect().map(r => (r.getLong(1), r.getLong(2)))
    out shouldBe Array((0L, 9L), (11L, 12L))
  }

  test("inverted intervals fail loudly, not silently") {
    val ex = intercept[Exception] {
      Intervals.mergeIntervals(df(Seq((1L, 9L, 3L))), "k", "s", "e").collect()
    }
    ex.getMessage should include("interval")
  }
}

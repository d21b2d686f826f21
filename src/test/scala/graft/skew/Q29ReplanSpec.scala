package graft.skew

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.{Queries, SparkTestSession}

/** The q29 AQE-replan gate's two load-bearing claims:
  *
  *  1. Under the gate's threshold the INITIAL plan is the shuffle join
  *     (static filter estimate = the full dim file) and the FINAL plan is
  *     a broadcast hash join (the materialized slice proved tiny) — the
  *     runtime strategy switch actually happened, in that direction.
  *  2. The replanned result is row-identical to the session-default run
  *     (which broadcasts statically — 10 MB default threshold).
  */
class Q29ReplanSpec extends AnyFunSuite with Matchers with SparkTestSession {

  private val dir = "/root/testdata/sf0.01"

  test("initial plan sort-merges, final plan broadcasts") {
    Queries.withConfs(spark,
      "spark.sql.autoBroadcastJoinThreshold" -> "4096") {
      val frame = Queries.q29Frame(spark, dir)
      frame.collect()
      val plan = frame.queryExecution.executedPlan.toString
      val sections = plan.split("== Initial Plan ==")
      withClue(plan.linesIterator.take(40).mkString("\n")) {
        sections should have length 2
        val (finalPlan, initialPlan) = (sections(0), sections(1))
        initialPlan should include("SortMergeJoin")
        finalPlan should include("BroadcastHashJoin")
        (finalPlan should not).include("SortMergeJoin")
      }
    }
  }

  test("replanned result equals the statically-broadcast default result") {
    val replanned = Queries.withConfs(spark,
      "spark.sql.autoBroadcastJoinThreshold" -> "4096") {
      Queries.q29Frame(spark, dir).orderBy(col("nation")).collect().toSeq
    }
    val default = Queries.q29Frame(spark, dir)
      .orderBy(col("nation")).collect().toSeq
    replanned shouldBe default
    default should not be empty
  }
}

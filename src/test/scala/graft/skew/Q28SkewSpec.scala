package graft.skew

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.{Queries, SparkTestSession}

/** The q28 AQE-skew-join gate's two load-bearing claims:
  *
  *  1. Under gate-shape data and test-scale thresholds, the FINAL adaptive
  *     plan actually carries a skew-split sort-merge join (`skew=true`) —
  *     otherwise the gate is just a plain shuffled join wearing a config.
  *  2. The skew-tuned result is row-identical to the same frame executed
  *     under the session's defaults (AQE's split is a physical remedy; it
  *     must never change the answer).
  *
  * The sentinel partition only reads as skewed RELATIVE to the others
  * (hot ~20% of rows vs ~80%/(P-1)), so both tests raise the shuffle
  * partition count inside the conf scope — at the test session's 4
  * partitions a quarter-share partition is not an outlier at all.
  */
class Q28SkewSpec extends AnyFunSuite with Matchers with SparkTestSession {

  private val dir = "/root/testdata/sf0.01"

  test("final adaptive plan splits the sentinel partition (skew=true)") {
    Queries.withConfs(spark,
      "spark.sql.shuffle.partitions" -> "32",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.files.maxPartitionBytes" -> "65536",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "2048",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2.0",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "1024",
      "spark.sql.adaptive.coalescePartitions.minPartitionSize" -> "1024") {
      val frame = Queries.q28Frame(spark, dir)
      // drive THIS frame's QueryExecution (a write action plans its own
      // command tree; its adaptive plan is not visible here)
      frame.collect()
      val plan = frame.queryExecution.executedPlan.toString
      withClue(plan.linesIterator.take(40).mkString("\n")) {
        plan should include("skew=true")
        plan should include("SortMergeJoin")
      }
    }
  }

  test("skew-tuned result equals the plain-default result exactly") {
    val tuned = Queries.withConfs(spark,
      "spark.sql.shuffle.partitions" -> "32",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.files.maxPartitionBytes" -> "65536",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "2048",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2.0",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "1024",
      "spark.sql.adaptive.coalescePartitions.minPartitionSize" -> "1024") {
      Queries.q28Frame(spark, dir).orderBy(col("nation")).collect().toSeq
    }
    val plain = Queries.q28Frame(spark, dir)
      .orderBy(col("nation")).collect().toSeq
    tuned shouldBe plain
    // the sentinel's nation is the hot group: it carries the ~20% of
    // events that collapsed onto uid 0 on top of its organic share
    val total = plain.map(_.getLong(1)).sum
    val hottest = plain.map(_.getLong(1)).max
    hottest.toDouble / total should be >= 0.2
  }
}

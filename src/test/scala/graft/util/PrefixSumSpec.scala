package graft.util

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.SparkTestSession

class PrefixSumSpec extends AnyFunSuite with Matchers with SparkTestSession {

  test("runningSum equals the naive global window, across partition counts") {
    import spark.implicits._
    // non-contiguous, shuffled keys; values with repeats
    val rows = (1 to 997).map(i => ((i * 7919) % 10007, (i % 13).toLong))
    val df = spark.createDataset(rows).toDF("k", "v").repartition(8)

    val naive = df.withColumn("cum",
      sum(col("v")).over(Window.orderBy(col("k"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .select("k", "cum").as[(Int, Long)].collect().toMap

    for (p <- Seq(1, 3, 32)) {
      val got = PrefixSum.runningSum(df, "k", "v", "cum", numPartitions = p)
        .select("k", "cum").as[(Int, Long)].collect().toMap
      got shouldBe naive
    }
  }

  test("empty and single-row frames") {
    import spark.implicits._
    val empty = Seq.empty[(Int, Long)].toDF("k", "v")
    PrefixSum.runningSum(empty, "k", "v", "cum").count() shouldBe 0
    val one = Seq((5, 42L)).toDF("k", "v")
    val out = PrefixSum.runningSum(one, "k", "v", "cum")
      .select("cum").as[Long].collect()
    out shouldBe Array(42L)
  }

  test("null values count as 0; negative values handled (no max-of-running shortcut)") {
    import spark.implicits._
    val df = Seq[(Int, java.lang.Long)](
      (1, 10L), (2, null), (3, -25L), (4, null), (5, 7L), (6, -1L))
      .toDF("k", "v")
    val got = PrefixSum.runningSum(df, "k", "v", "cum", numPartitions = 3)
      .select("k", "cum").as[(Int, Long)].collect().toMap
    got shouldBe Map(1 -> 10L, 2 -> 10L, 3 -> -15L, 4 -> -15L, 5 -> -8L, 6 -> -9L)
  }

  test("phase 1 never plans a single-partition window; offsets join is broadcast") {
    import spark.implicits._
    val df = Seq.tabulate(100)(i => (i, 1L)).toDF("k", "v")
    // audit phase 1 BEFORE the checkpoint: runningSum's localCheckpoint
    // truncates lineage, so the returned frame's plan can't show the window
    val phase1 = PrefixSum.localPrefix(df, "k", "v", 8)
      .queryExecution.executedPlan.toString
    phase1 should not include "Exchange SinglePartition"
    phase1 should include("Window")
    phase1 should include("Exchange hashpartitioning(__pid")
    val full = PrefixSum.runningSum(df, "k", "v", "cum", numPartitions = 8)
      .queryExecution.executedPlan.toString
    full should include("BroadcastHashJoin")
  }
}

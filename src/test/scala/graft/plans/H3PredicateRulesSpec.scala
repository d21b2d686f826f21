package graft.plans

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.SparkTestSession
import graft.h3.H3
import graft.h3.expr.functions._
import graft.h3.expr.H3ExprUtil

/** The h3_to_parent -> raw-range inference rule: the preimage algebra must
  * be EXACT over all 64-bit inputs (garbage longs included — the rule adds
  * a conjunct, so any input it wrongly excludes silently changes query
  * results), the inferred conjunct must reach the parquet scan as a pushed
  * filter, and the rewrite must be idempotent and guarded. */
class H3PredicateRulesSpec extends AnyFunSuite with Matchers with SparkTestSession {

  private val parentA = H3.fromParts(20, 5, Seq(2, 3, 4, 5, 6))
  private val parentB = H3.fromParts(21, 5, Seq(1, 2, 3, 4, 5))

  test("parentPreimageRanges is the exact preimage of toParentTotal equality") {
    val r = 5
    val ranges = H3.parentPreimageRanges(parentA, r)
    ranges should have size (1 + (15 - r))
    def inRanges(x: Long): Boolean = ranges.exists { case (lo, hi) => x >= lo && x <= hi }

    // valid descendants at several resolutions are all inside
    for (childRes <- Seq(5, 6, 7, 9)) {
      val kids = H3.toChildren(parentA, childRes)
      kids.foreach { k => inRanges(k) shouldBe true }
    }
    // boundary probes: just outside every range edge must NOT map to parentA
    ranges.foreach { case (lo, hi) =>
      for (x <- Seq(lo - 1, hi + 1)) {
        (H3ExprUtil.toParentTotal(x, r) == parentA) shouldBe inRanges(x)
      }
    }
    // randomized longs (garbage included): membership == equality, always
    val rnd = new scala.util.Random(42)
    (1 to 20000).foreach { _ =>
      val x = rnd.nextLong()
      (H3ExprUtil.toParentTotal(x, r) == parentA) shouldBe inRanges(x)
    }
    // adversarial garbage: descendants with corrupted fine digits still map
    // to the parent via bit math and MUST stay inside the ranges
    val d9 = H3.toChildren(parentA, 9).head
    val garbage = d9 & ~(7L << H3.digitShift(15)) // digit 15 = 0, invalid cell
    H3.isValidCell(garbage) shouldBe false
    (H3ExprUtil.toParentTotal(garbage, r) == parentA) shouldBe true
    inRanges(garbage) shouldBe true
  }

  private def writeCells(rows: Seq[Long]): String = {
    val dir = Files.createTempDirectory("graft_rule_").toString
    import spark.implicits._
    rows.toDF("cell").repartitionByRange(2, col("cell"))
      .sortWithinPartitions("cell")
      .write.mode("overwrite").parquet(dir)
    dir
  }

  test("equality filter: range conjunct reaches the parquet scan, results exact") {
    val kidsA = H3.toChildren(parentA, 9).toSeq
    val kidsB = H3.toChildren(parentB, 9).toSeq
    val df = spark.read.parquet(writeCells(kidsA ++ kidsB))
      .where(h3_to_parent(col("cell"), lit(5)) === lit(parentA))
    // plan strings truncate long filter lists; the Or-of-ranges disjunction
    // starting with the exact-parent point match proves the inferred
    // conjunct was accepted by the parquet filter converter
    val plan = df.queryExecution.executedPlan.toString
    val pushed = plan.linesIterator.filter(_.contains("PushedFilters")).mkString
    pushed should include("Or(")
    pushed should include(s"EqualTo(cell,$parentA)")
    df.count() shouldBe kidsA.size.toLong
  }

  test("IN filter: rewrite fires and keeps both parents' subtrees") {
    val kidsA = H3.toChildren(parentA, 8).toSeq
    val kidsB = H3.toChildren(parentB, 8).toSeq
    val df = spark.read.parquet(writeCells(kidsA ++ kidsB))
      .where(h3_to_parent(col("cell"), lit(5)).isin(parentA, parentB))
    val pushed = df.queryExecution.executedPlan.toString
      .linesIterator.filter(_.contains("PushedFilters")).mkString
    pushed should include("Or(")
    pushed should include(s"EqualTo(cell,${math.min(parentA, parentB)})")
    df.count() shouldBe (kidsA.size + kidsB.size).toLong
  }

  test("garbage rows that bit-map to the parent survive the rewrite") {
    val kidsA = H3.toChildren(parentA, 9).toSeq
    // corrupt a beyond-res digit: invalid as a cell, but toParent still = parentA
    val garbage = kidsA.take(10).map(_ & ~(7L << H3.digitShift(15)))
    garbage.foreach { g => H3.isValidCell(g) shouldBe false }
    val df = spark.read.parquet(writeCells(kidsA ++ garbage))
      .where(h3_to_parent(col("cell"), lit(5)) === lit(parentA))
    // the conjunct is exact: ALL rows (valid + garbage) still match
    df.count() shouldBe (kidsA.size + garbage.size).toLong
  }

  test("rewrite is idempotent under re-application") {
    import spark.implicits._
    val df = Seq(parentA).toDF("cell")
      .where(h3_to_parent(col("cell"), lit(5)) === lit(parentA))
    val once = df.queryExecution.optimizedPlan
    val twice = H3ParentPredicateRewrite(once)
    twice.toString shouldBe once.toString
  }

  test("no rewrite for invalid or wrong-resolution parent literals") {
    import spark.implicits._
    val base = Seq(parentA).toDF("cell")
    // garbage parent literal: preimage not range-representable -> left alone
    val p1 = base.where(h3_to_parent(col("cell"), lit(5)) === lit(123456789L))
      .queryExecution.optimizedPlan.toString
    p1 should not include ">="
    // parent literal at res 7 probed at res 5: equality can never hold for
    // valid inputs; rule must not touch it (and results stay empty)
    val wrongRes = H3.toChildren(parentA, 7).head
    val p2 = base.where(h3_to_parent(col("cell"), lit(5)) === lit(wrongRes))
    p2.queryExecution.optimizedPlan.toString should not include ">="
    p2.count() shouldBe 0L
  }
}

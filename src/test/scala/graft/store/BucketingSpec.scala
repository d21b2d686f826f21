package graft.store

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.SparkTestSession

/** The whole point of a bucketed mirror is a JOIN PLAN with no Exchange and
  * no Sort — assert exactly that on the executed plan, with an unbucketed
  * control join proving the assertion has teeth, and a value check proving
  * the layout never changes results. */
class BucketingSpec extends AnyFunSuite with Matchers with SparkTestSession {

  private lazy val root = Files.createTempDirectory("graft_bucket_").toString

  private def sideA: DataFrame = {
    import spark.implicits._
    (0L until 5000L).map(i => (i % 997, i.toDouble)).toDF("h3index", "qty")
      .groupBy("h3index").agg(sum("qty").as("qty"))
  }

  private def sideB: DataFrame = {
    import spark.implicits._
    (0L until 4000L).map(i => (i % 1013, i * 2.0)).toDF("h3index", "v")
      .groupBy("h3index").agg(max("v").as("v"))
  }

  private lazy val mirrors: Unit = {
    Bucketing.writeMirror(spark, sideA, "spec_mirror_a", s"$root/a", numBuckets = 4)
    Bucketing.writeMirror(spark, sideB, "spec_mirror_b", s"$root/b", numBuckets = 4)
  }

  test("colocated join of two mirrors plans with no Exchange and no Sort") {
    mirrors
    val plan = Bucketing.colocatedJoin(spark, "spec_mirror_a", "spec_mirror_b")
      .queryExecution.executedPlan.toString
    plan should include("SortMergeJoin")
    plan should not include "Exchange"
    plan should not include "Sort ["
  }

  test("concurrent planning: two colocated joins in parallel, both no-Exchange") {
    mirrors
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration._
    import scala.concurrent.ExecutionContext.Implicits.global
    val plans = Await.result(Future.sequence((1 to 4).map { _ =>
      Future(Bucketing.colocatedJoin(spark, "spec_mirror_a", "spec_mirror_b")
        .queryExecution.executedPlan.toString)
    }), 2.minutes)
    plans.foreach { plan =>
      plan should include("SortMergeJoin")
      plan should not include "Exchange"
      plan should not include "Sort ["
    }
    // ...and the caller's session never saw the planning flag
    spark.conf.getOption("spark.sql.legacy.bucketedTableScan.outputOrdering")
      .foreach(_ shouldBe "false")
  }

  test("control: the same join without mirrors shuffles both sides") {
    val plan = sideA.hint("merge").join(sideB, "h3index")
      .queryExecution.executedPlan.toString
    plan should include("Exchange hashpartitioning")
  }

  test("one file per bucket (the precondition for reported sort order)") {
    mirrors
    val files = new java.io.File(s"$root/a").listFiles()
      .filter(f => f.getName.endsWith(".parquet") && !f.getName.startsWith("_"))
    files.length shouldBe 4
  }

  test("mirror join matches the direct join's values") {
    mirrors
    val viaMirror = Bucketing.colocatedJoin(spark, "spec_mirror_a", "spec_mirror_b")
      .select("h3index", "qty", "v").orderBy("h3index").collect()
    val direct = sideA.join(sideB, "h3index")
      .select("h3index", "qty", "v").orderBy("h3index").collect()
    viaMirror should contain theSameElementsInOrderAs direct
  }

  test("writeMirror is an idempotent rebuild (overwrite, not append)") {
    mirrors
    Bucketing.writeMirror(spark, sideA, "spec_mirror_a", s"$root/a", numBuckets = 4)
    spark.table("spec_mirror_a").count() shouldBe sideA.count()
  }
}

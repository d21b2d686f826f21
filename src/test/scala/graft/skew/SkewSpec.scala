package graft.skew

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.SparkTestSession

class SkewSpec extends AnyFunSuite with Matchers with SparkTestSession {

  test("saltedJoin equals the plain join on 90%-skewed keys (row multiset)") {
    import spark.implicits._
    // key 7 carries 90% of the left side
    val left = spark.range(2000)
      .select(when(col("id") % 10 =!= 0, lit(7L)).otherwise(col("id") % 50).as("k"),
        col("id").as("payload"))
    val right = spark.range(50).select(col("id").as("k"), (col("id") * 100).as("attr"))
    val plain = left.join(right, Seq("k"))
      .select(col("k"), col("payload"), col("attr"))
      .as[(Long, Long, Long)].collect().sorted
    val salted = Skew.saltedJoin(left, right, "k", buckets = 8)
      .select(col("k"), col("payload"), col("attr"))
      .as[(Long, Long, Long)].collect().sorted
    salted shouldBe plain
  }

  test("saltedJoin with duplicate right-side keys preserves multiplicity") {
    import spark.implicits._
    val left = Seq((1L, "a"), (1L, "b"), (2L, "c")).toDF("k", "v")
    val right = Seq((1L, "x"), (1L, "y"), (3L, "z")).toDF("k", "w")
    val plain = left.join(right, Seq("k")).as[(Long, String, String)].collect().sorted
    val salted = Skew.saltedJoin(left, right, "k", buckets = 4)
      .as[(Long, String, String)].collect().sorted
    salted shouldBe plain
    salted.length shouldBe 4 // (1,a,x) (1,a,y) (1,b,x) (1,b,y)
  }

  test("buckets = 1 degenerates to the plain join") {
    import spark.implicits._
    val left = Seq((1L, "a"), (2L, "b")).toDF("k", "v")
    val right = Seq((1L, "x"), (2L, "y")).toDF("k", "w")
    Skew.saltedJoin(left, right, "k", 1).count() shouldBe 2
  }
}

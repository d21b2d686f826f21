package graft.text

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.SparkTestSession

/** The codegen'd LshBandHash expression must be bit-identical to the
  * declarative minhashSignature + bandHash formulation it replaces in
  * streaming projections — including NULL for shingle-less texts. */
class LshBandHashSpec extends AnyFunSuite with Matchers with SparkTestSession {

  test("expression equals the declarative formulation on the corpus") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val sig = TextOps.minhashSignature(col("text"), 8)
    val both = docs.select(col("doc_id"),
      TextOps.lshBandHash(col("text"), 0).as("e0"),
      TextOps.lshBandHash(col("text"), 1).as("e1"),
      TextOps.bandHash(sig, 0, 4).as("c0"),
      TextOps.bandHash(sig, 1, 4).as("c1"))
    both.where(!(col("e0") <=> col("c0")) || !(col("e1") <=> col("c1")))
      .count() shouldBe 0L
  }

  test("edge cases: short, empty, exactly-one-shingle, and repeated text") {
    import spark.implicits._
    val edge = Seq((1L, ""), (2L, "ab"), (3L, "abc"), (4L, "aaaaaaaa"),
      (5L, "abcabcabc")).toDF("doc_id", "text")
    val sig = TextOps.minhashSignature(col("text"), 8)
    val rows = edge.select(
      TextOps.lshBandHash(col("text"), 0).as("e0"),
      TextOps.bandHash(sig, 0, 4).as("c0")).collect()
    rows.foreach { r =>
      (r.isNullAt(0), r.isNullAt(1)) match {
        case (false, false) => r.getLong(0) shouldBe r.getLong(1)
        case (a, b) => a shouldBe b
      }
    }
  }
}

package graft.h3.expr

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.SparkTestSession
import graft.h3.H3

/** Expressions must agree with the pure-Scala H3 core on random valid cells,
  * through both the DataFrame API (codegen path) and SQL (registry path). */
class H3ExpressionsSpec extends AnyFunSuite with Matchers with SparkTestSession {
  import graft.h3.expr.{functions => hf}

  private val rnd = new scala.util.Random(42)

  private def randomValidCell(): Long = {
    val res = rnd.nextInt(16)
    var bc = rnd.nextInt(H3.NumBaseCells)
    val digits = Seq.fill(res)(rnd.nextInt(7))
    // avoid the deleted K-axis subtree under pentagons
    if (H3.isPentagonBaseCell(bc) && digits.takeWhile(_ == 0).length < digits.length
        && digits.dropWhile(_ == 0).head == 1) bc = (bc + 1) % H3.NumBaseCells
    H3.fromParts(bc, res, digits)
  }

  private lazy val cells: Seq[Long] = Seq.fill(500)(randomValidCell()).distinct

  test("h3_get_resolution / base_cell / is_valid agree with core") {
    import spark.implicits._
    val df = cells.toDF("h3index")
      .select(
        col("h3index"),
        hf.h3_get_resolution(col("h3index")).as("res"),
        hf.h3_get_base_cell(col("h3index")).as("bc"),
        hf.h3_is_valid(col("h3index")).as("valid"))
      .collect()
    df.foreach { r =>
      val h = r.getLong(0)
      r.getInt(1) shouldBe H3.getResolution(h)
      r.getInt(2) shouldBe H3.getBaseCell(h)
      r.getBoolean(3) shouldBe H3.isValidCell(h)
    }
  }

  test("h3_to_parent agrees with core and is total") {
    import spark.implicits._
    val df = cells.toDF("h3index")
      .select(col("h3index"),
        hf.h3_to_parent(col("h3index"), lit(3)).as("p3"),
        hf.h3_to_parent(col("h3index"), lit(15)).as("p15"),
        hf.h3_to_parent(col("h3index"), lit(-1)).as("pneg"))
      .collect()
    df.foreach { r =>
      val h = r.getLong(0)
      r.getLong(1) shouldBe H3.toParentUnsafe(h, 3)
      r.getLong(2) shouldBe h // parentRes >= res -> identity
      r.getLong(3) shouldBe H3.toParentUnsafe(h, 0)
    }
  }

  test("h3_to_children + h3_children_count agree with core; empty below res") {
    import spark.implicits._
    val coarse = cells.filter(h => H3.getResolution(h) <= 4)
    val df = coarse.toDF("h3index")
      .select(col("h3index"),
        hf.h3_children_count(col("h3index"), hf.h3_get_resolution(col("h3index")) + lit(2)).as("cnt"),
        hf.h3_to_children(col("h3index"), hf.h3_get_resolution(col("h3index")) + lit(2)).as("kids"),
        hf.h3_to_children(col("h3index"), lit(-5)).as("empty"))
      .collect()
    df.foreach { r =>
      val h = r.getLong(0)
      val res = H3.getResolution(h)
      r.getLong(1) shouldBe H3.childrenCount(h, res + 2)
      r.getSeq[Long](2) shouldBe H3.toChildren(h, res + 2).toSeq
      r.getSeq[Long](3) shouldBe empty
    }
  }

  test("string round-trip and null on malformed") {
    import spark.implicits._
    val df = cells.take(50).toDF("h3index")
      .select(col("h3index"),
        hf.h3_string_to_cell(hf.h3_cell_to_string(col("h3index"))).as("rt"))
      .collect()
    df.foreach { r => r.getLong(1) shouldBe r.getLong(0) }

    val bad = Seq("zzz", "", "12g").toDF("s")
      .select(hf.h3_string_to_cell(col("s")).as("c")).collect()
    bad.foreach { r => r.isNullAt(0) shouldBe true }
  }

  test("SQL registry path: functions usable from spark.sql") {
    val c = 0x8928308280fffffL
    val row = spark.sql(
      s"SELECT h3_get_resolution(${c}L) AS r, h3_to_parent(${c}L, 8) AS p, " +
        s"size(h3_to_children(h3_to_parent(${c}L, 8), 9)) AS n").collect().head
    row.getInt(0) shouldBe 9
    row.getLong(1) shouldBe 0x8828308281fffffL
    row.getInt(2) shouldBe 7
  }

  test("nulls propagate") {
    val row = spark.sql(
      "SELECT h3_get_resolution(CAST(NULL AS BIGINT)) AS a, " +
        "h3_to_parent(CAST(NULL AS BIGINT), 3) AS b").collect().head
    row.isNullAt(0) shouldBe true
    row.isNullAt(1) shouldBe true
  }
}

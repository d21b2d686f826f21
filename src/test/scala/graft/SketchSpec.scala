package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** Approximate-distinct (HyperLogLog++) coverage: no DuckDB oracle is
  * possible (sketch estimates are engine-specific), so this pins the
  * cross-engine-relevant properties instead — bounded relative error vs the
  * exact count, and insensitivity to partitioning (the sketch must merge
  * associatively across partitions, which is what makes it the scale path
  * for cardinality at 100 TB: fixed-size state per group, no distinct
  * shuffle of the values themselves). */
class SketchSpec extends AnyFunSuite with Matchers with SparkTestSession {

  test("approx_count_distinct within 5% of exact on corpus terms, any partitioning") {
    val terms = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
      .select(explode(filter(split(col("text"), "\\s+"), x => x =!= "")).as("term"))
    val exact = terms.select(countDistinct(col("term"))).first().getLong(0)
    exact should be > 0L
    for (parts <- Seq(1, 7, 32)) {
      val approx = terms.repartition(parts)
        .select(approx_count_distinct(col("term"), rsd = 0.02))
        .first().getLong(0)
      math.abs(approx - exact).toDouble / exact should be < 0.05
    }
  }

  test("d29 oracle-shared HLL: estimate within the 64-register error envelope") {
    val row = PipelineQueries.d29HllDistinct(spark, "/root/testdata/sf0.001").first()
    val est = row.getDouble(0)
    val exact = row.getLong(2)
    exact should be > 0L
    // m=64 -> sigma ~ 1.04/sqrt(64) = 13%; assert 3-sigma headroom (the
    // hash is fixed, so this is deterministic — measured ~4% at sf0.001)
    withClue(s"est=$est exact=$exact") {
      math.abs(est - exact) / exact should be < 0.39
    }
  }

  test("d30 count-min: estimates NEVER undercount and overcount is bounded") {
    val rows = PipelineQueries.d30CountMin(spark, "/root/testdata/sf0.001").collect()
    rows.length shouldBe 10
    rows.foreach { r =>
      val exact = r.getLong(2); val est = r.getLong(3)
      withClue(s"code=${r.getLong(1)}") {
        est should be >= exact // the CMS one-sided guarantee
        // overcount <= collision mass; generous envelope for 4x512 counters
        est - exact should be < (exact / 2 + 1000)
      }
    }
  }
}

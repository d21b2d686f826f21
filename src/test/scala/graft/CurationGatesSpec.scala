package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** Semantic invariants of the q22/c4/d17 gates that the sf-scale oracle
  * equality cannot distinguish from coincidence: keep-latest survivorship,
  * NTILE balance, and the provenance matrix's conservation of the t7 pair
  * set. All run on sf0.001. */
class CurationGatesSpec extends AnyFunSuite with Matchers with SparkTestSession {

  private val dir = "/root/testdata/sf0.001"

  test("q22: exactly one survivor per user, and it carries the user's max timestamp") {
    // no .cache() here: a leftover cache entry would silently reshape the
    // identical query's plan in PlanAuditSpec (InMemoryTableScan reuse)
    val out = Queries.q22KeepLatest(spark, dir).collect()
    val events = Queries.convertEventTs(spark.read.parquet(s"$dir/events.parquet"))
    val users = events.select(col("user_id")).distinct().count()
    out.length.toLong shouldBe users
    out.map(_.getLong(0)).distinct.length shouldBe out.length
    // survivor ts == max ts per user (ordering is ts desc, so the kept row
    // must carry the maximum, whatever the event_id tiebreak did)
    val maxTs = events.groupBy(col("user_id"))
      .agg(max(unix_millis(col("ts"))).as("max_ms"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    out.foreach(r => r.getLong(2) shouldBe maxTs(r.getLong(0)))
  }

  test("c4: only deciles 1-2 survive and NTILE balance holds within each language") {
    val out = Queries.c4QualityNtile(spark, dir).collect()
    out.map(_.getInt(1)).toSet should contain theSameElementsAs Set(1, 2)
    // NTILE(10) sizes differ by at most 1 between any two buckets of the
    // same window; decile 1 is never smaller than decile 2
    out.groupBy(_.getString(0)).foreach { case (_, rows) =>
      val bySize = rows.map(r => r.getInt(1) -> r.getLong(2)).toMap
      (bySize(1) - bySize(2)) should (be >= 0L and be <= 1L)
    }
    // quality ordering: decile 1's minimum is >= decile 2's average
    out.groupBy(_.getString(0)).foreach { case (_, rows) =>
      val minQ1 = rows.find(_.getInt(1) == 1).get.getDouble(4)
      val avgQ2 = rows.find(_.getInt(1) == 2).get.getDouble(3)
      minQ1 should be >= avgQ2
    }
  }

  test("d17: the provenance matrix conserves the t7 pair set exactly") {
    val pairs = PipelineQueries.t7SimhashNearDup(spark, dir).count()
    val matrix = PipelineQueries.d17NearDupProvenance(spark, dir).collect()
    matrix.map(_.getLong(2)).sum shouldBe pairs
    // unordered source pairs: src_a <= src_b always
    matrix.foreach(r => r.getString(0) should be <= r.getString(1))
  }

  test("d34: A-ES sample is a valid without-replacement draw of exactly k docs") {
    // the quality-bias assert runs INSIDE the query; here: exact k, no
    // duplicate members, dense ranks, and keys non-increasing in rank
    val out = Queries.d34WeightedSample(spark, dir).collect()
    out.length shouldBe 100
    out.map(_.getLong(1)).distinct.length shouldBe 100
    out.map(_.getInt(0)).toSeq shouldBe (1 to 100)
    out.map(_.getDouble(3)).toSeq.sliding(2).foreach {
      case Seq(a, b) => a should be >= b
      case _ =>
    }
    out.foreach(r => r.getDouble(2) should (be > 0.0 and be <= 1.0))
  }

  test("s16: streaming filter output == the batch classifier's kept slice exactly") {
    val batch = PipelineQueries.d33QualityClassifier(spark, dir).collect()
      .filter(_.getInt(2) == 1).map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val stream = PipelineQueries.s16StreamQualityFilter(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    stream shouldBe batch // same model, same expressions, different surface
  }

  test("s18: streamed kept set == corpus minus c2's flagged docs minus self-matching benchmark docs") {
    // batch/stream parity from the gates' own outputs: a doc is dropped at
    // ingest iff it shares a gram with the benchmark — that is exactly
    // c2's flagged set (non-benchmark docs with n_shared >= 1) plus the
    // benchmark docs that have at least one gram (they match themselves)
    val kept = PipelineQueries.s18StreamDecontam(spark, dir)
      .collect().map(_.getLong(0)).toSet
    val flagged = PipelineQueries.c2Contamination(spark, dir)
      .collect().map(_.getLong(0)).toSet
    val docsDf = spark.read.parquet(s"$dir/documents.parquet")
    val allIds = docsDf.select(col("doc_id")).collect().map(_.getLong(0)).toSet
    val benchWithGrams = docsDf
      .where(pmod(col("doc_id"), lit(23)) === 0)
      .where(org.apache.spark.sql.functions.size(
        org.apache.spark.sql.functions.filter(split(col("text"), "\\s+"),
          (x: org.apache.spark.sql.Column) => x =!= "")) >= 4)
      .select(col("doc_id")).collect().map(_.getLong(0)).toSet
    kept shouldBe (allIds -- flagged -- benchWithGrams)
    kept should not be empty
    flagged.intersect(kept) shouldBe empty
  }

  test("d33: classifier learns the held-out length class from length-free features") {
    // loss-descent + accuracy-floor asserts run INSIDE the query; here we
    // check the output contract: one row per doc, scores in [0,1] (the
    // score is 4dp-ROUNDED, so a saturated |z| >= ~9.9 legitimately rounds
    // to exactly 0.0 or 1.0 — round-8 advice: inclusive bounds, the keep
    // flag on the next line carries the threshold semantics), and the
    // keep flag is exactly the 0.5 threshold on the rounded score
    val out = PipelineQueries.d33QualityClassifier(spark, dir).collect()
    val docs = spark.read.parquet(s"$dir/documents.parquet").count()
    out.length.toLong shouldBe docs
    out.foreach { r =>
      val (q, keep) = (r.getDouble(1), r.getInt(2))
      q should (be >= 0.0 and be <= 1.0)
      keep shouldBe (if (q >= 0.5) 1 else 0)
    }
    // it actually discriminates: both classes are non-empty
    out.map(_.getInt(2)).distinct.sorted shouldBe Array(0, 1)
  }
}

package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** Semantic invariants of the e9/d26/d27 gates that sf-scale oracle
  * equality alone cannot distinguish from coincidence: SemDeDup's
  * keep-the-outlier policy, DSIR's direction (English docs score high when
  * English is the target), and CDC chunking's locality (a shared span dedups
  * regardless of where it sits in the document). All run on sf0.001. */
class Round4GatesSpec extends AnyFunSuite with Matchers with SparkTestSession {

  private val dir = "/root/testdata/sf0.001"

  test("e9: dropping is pair-driven and keeps the member farther from the centroid") {
    val out = PipelineQueries.e9SemanticDedup(spark, dir).collect()
    // every vector appears exactly once, flagged either way
    val n = spark.read.parquet(s"$dir/embeddings.parquet").count()
    out.length.toLong shouldBe n
    out.map(_.getLong(0)).distinct.length shouldBe out.length
    // at least one vector must survive per cluster (the policy never
    // empties a cluster: the pair loser is always the MORE central one,
    // so each cluster's least-central member is never dropped)
    val byCluster = out.groupBy(_.getInt(1))
    byCluster.foreach { case (_, rows) =>
      rows.exists(!_.getBoolean(3)) shouldBe true
      // the minimum-centroid-cosine member of each cluster survives
      val minCos = rows.map(_.getDouble(2)).min
      rows.filter(r => r.getDouble(2) == minCos)
        .exists(!_.getBoolean(3)) shouldBe true
    }
  }

  test("d26: weights rank English documents above non-English ones on average") {
    val out = PipelineQueries.d26DsirWeights(spark, dir).collect()
    out.length should be <= 20
    // rnk is 1..n dense and ordered by weight desc
    out.map(_.getInt(0)).toSeq shouldBe (1 to out.length)
    val ws = out.map(_.getDouble(3))
    ws.zip(ws.tail).foreach { case (a, b) => a should be >= b }
    // direction check: with lang='en' as the target distribution, the
    // top-20 importance-weighted docs should be predominantly English
    val langs = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"), col("lang")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val enFrac = out.count(r => langs(r.getLong(1)) == "en").toDouble / out.length
    val corpusEnFrac = langs.values.count(_ == "en").toDouble / langs.size
    enFrac should be >= corpusEnFrac
  }

  test("d27: a repeated interior span dedups regardless of its position") {
    // two synthetic docs sharing a long interior span at different offsets
    // must produce at least one common chunk fingerprint — the property
    // that distinguishes content-defined chunking from fixed-stride blocks
    import spark.implicits._
    val span = "the quick brown fox jumps over the lazy dog again and again " * 4
    val docs = Seq(
      (1L, "AAAA prefix one " + span + " tail x"),
      (2L, "BB other lead-in material " + span + " different tail yyyy"))
      .toDF("doc_id", "text")
    val tmp = java.nio.file.Files.createTempDirectory("d27spec").toString
    docs.write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val out = PipelineQueries.d27CdcChunks(spark, tmp).collect()
    out.length should be >= 1
    // the duplicated fingerprints span both documents
    out.exists(_.getLong(3) == 2L) shouldBe true
  }

  test("q27 recursion: multi-hop closure + path multiplicities on a synthetic diamond-chain") {
    import spark.implicits._
    // 1->2->3->4 chain plus a 1->5->3 detour: (1,3) has TWO ascending
    // paths, (1,4) inherits both — real recursion depth and UNION ALL
    // multiplicity semantics, which the sf-scale gate's star edges (depth
    // 1 at sf0.01) cannot exercise
    Seq((1L, 2L), (2L, 3L), (3L, 4L), (1L, 5L), (5L, 3L))
      .toDF("src", "dst").createOrReplaceTempView("q27_edges")
    val out = spark.sql(
      """WITH RECURSIVE reach(src, dst) AS (
        |  SELECT src, dst FROM q27_edges
        |  UNION ALL
        |  SELECT r.src, e.dst FROM reach r JOIN q27_edges e ON e.src = r.dst)
        |SELECT src, dst, count(*) AS n FROM reach GROUP BY src, dst
        |ORDER BY src, dst""".stripMargin)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    out((1L, 3L)) shouldBe 2L // via 2 and via 5
    out((1L, 4L)) shouldBe 2L // both paths extend through 3->4
    out((1L, 2L)) shouldBe 1L
    out((2L, 4L)) shouldBe 1L
    out((5L, 4L)) shouldBe 1L
    // pairs: from 1 -> {2,3,4,5}, from 2 -> {3,4}, from 3 -> {4}, from 5 -> {3,4}
    out.size shouldBe 9
  }
}

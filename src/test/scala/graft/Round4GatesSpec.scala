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

  test("q27 closure: multi-hop reachability on a synthetic diamond-chain") {
    import spark.implicits._
    // 1->2->3->4 chain plus a 1->5->3 detour: real multi-hop depth, which
    // the sf-scale gate's star edges (depth 1 at sf0.01) cannot exercise.
    // (1,3) is reachable by two paths but must appear ONCE — reachability,
    // not path enumeration.
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (1L, 5L), (5L, 3L))
      .toDF("src", "dst")
    val out = graph.TransitiveClosure.closure(edges)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // pairs: from 1 -> {2,3,4,5}, from 2 -> {3,4}, from 3 -> {4}, from 5 -> {3,4}
    out shouldBe Set((1L, 2L), (1L, 3L), (1L, 4L), (1L, 5L), (2L, 3L),
      (2L, 4L), (3L, 4L), (5L, 3L), (5L, 4L))
  }

  test("q27 closure: 200-member dense clique finishes (the UNION ALL killer fixture)") {
    import spark.implicits._
    // An m-member near-dup clique with ALL ascending edges — the shape t2
    // emits for a large boilerplate family. Path-multiplicity recursion has
    // O(2^m) rows here (~2^198 paths between members 0 and 199 — never
    // finishes); reachability closure is exactly the input edge set and one
    // frontier round proves no new pairs exist.
    val m = 200
    val edges = (for (a <- 0 until m; b <- a + 1 until m) yield (a.toLong, b.toLong))
      .toDF("src", "dst")
    val out = graph.TransitiveClosure.closure(edges)
    out.count() shouldBe m.toLong * (m - 1) / 2 // 19,900 — closure == clique
  }

  test("q27 closure: long chain converges in diameter rounds and loud-errors past maxIter") {
    import spark.implicits._
    val chain = (1L until 12L).map(i => (i, i + 1)).toDF("src", "dst")
    // 11-edge chain: closure is all ascending pairs, 12*11/2 = 66
    graph.TransitiveClosure.closure(chain).count() shouldBe 66L
    // maxIter below the needed rounds must fail LOUDLY, not truncate
    val err = intercept[IllegalArgumentException] {
      graph.TransitiveClosure.closure(chain, maxIter = 2)
    }
    err.getMessage should include("did not converge")
  }
}

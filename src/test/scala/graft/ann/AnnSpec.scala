package graft.ann

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.SparkTestSession

/** LSH ANN recall against the brute-force baseline on CLUSTERED synthetic
  * embeddings — the regime LSH actually promises recall in (planted
  * neighbors at cosine >= ~0.8). Near-random vectors (like the sf testdata
  * embeddings, best-neighbor cos ~0.37) are information-theoretically hard
  * for any banding scheme and are not a recall benchmark. */
class AnnSpec extends AnyFunSuite with Matchers with SparkTestSession {

  private val dim = 64
  private val numClusters = 20
  private val perCluster = 15

  /** Deterministic clustered vectors: each cluster has a +-1 sign centroid;
    * members flip `noise` coordinates of it (cos = 1 - 2*noise/dim). */
  private def clustered(noise: Int): org.apache.spark.sql.DataFrame = {
    val rnd = new scala.util.Random(1234)
    val rows = (0 until numClusters).flatMap { c =>
      val centroid = Array.fill(dim)(if (rnd.nextBoolean()) 1.0f else -1.0f)
      (0 until perCluster).map { m =>
        val v = centroid.clone()
        val flips = rnd.shuffle((0 until dim).toList).take(if (m == 0) 0 else noise)
        flips.foreach(i => v(i) = -v(i))
        Row(c.toLong * perCluster + m, v.toSeq)
      }
    }
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 4),
      StructType(Seq(
        StructField("id", LongType, false),
        StructField("vec", ArrayType(FloatType, false), false))))
  }

  private def recallOf(lsh: org.apache.spark.sql.DataFrame,
      exact: org.apache.spark.sql.DataFrame): Double = {
    val hit = lsh.select(col("query_id"), col("neighbor_id"))
      .join(exact.select(col("query_id"), col("neighbor_id")), Seq("query_id", "neighbor_id"))
      .count()
    hit.toDouble / exact.count()
  }

  test("e14/e15 measured-quality gates: runtime floors hold and shapes are full at sf0.001") {
    val dir = "/root/testdata/sf0.001"
    // e14: 10 queries x 3 probe budgets, monotone + floor asserts run inside
    val r14 = graft.PipelineQueries.e14IvfRecallSweep(spark, dir).collect()
    r14.length shouldBe 30
    r14.map(_.getDouble(3)).foreach { r => r should (be >= 0.0 and be <= 1.0) }
    // e15: 2 families x 10 queries, recall floors + distortion ceiling inside
    val r15 = graft.PipelineQueries.e15PqDistortion(spark, dir).collect()
    r15.length shouldBe 20
    r15.map(_.getString(0)).distinct.sorted shouldBe Array("ivfpq", "pq")
    r15.foreach { r => r.getDouble(4) should be >= 0.0 }
    // e16: 10 queries at ONE adaptive budget; floor assert runs inside,
    // and the adaptive budget can never probe fewer cells than exist
    val r16 = graft.PipelineQueries.e16AdaptiveNprobe(spark, dir).collect()
    r16.length shouldBe 10
    r16.map(_.getLong(1)).distinct.length shouldBe 1 // one shared nprobe
    r16.head.getLong(1) should be >= 1L
    // e17: shortlist-then-exact-rerank; the per-query dominance proof
    // (hits(e17) >= hits(e10) for EVERY query) asserts inside
    val r17 = graft.PipelineQueries.e17IvfPqRerank(spark, dir).collect()
    r17.length shouldBe 50 // 10 queries x full top-5
    r17.map(_.getInt(1)).toSeq.distinct.sorted shouldBe (1 to 5)
    r17.map(_.getDouble(3)).foreach { c => c should (be >= -1.0001 and be <= 1.0001) }
  }

  test("clustered data: banded LSH (32 planes, 8 bands) recall >= 0.8 vs brute force") {
    val data = clustered(noise = 6) // members at cos ~0.81 to the centroid
    val queries = data.where(col("id") % perCluster === 0) // the 20 centroids
    val k = 5
    val exact = Ann.knnBruteForce(queries, data, k)
    val lsh = Ann.knnLsh(queries, data, k, 32, dim, 8)
    val r = recallOf(lsh, exact)
    withClue(s"recall=$r") { r should be >= 0.8 }
  }

  test("multiprobe strictly widens the candidate set and never lowers recall") {
    val data = clustered(noise = 10) // harder: cos ~0.69
    val queries = data.where(col("id") % perCluster === 0)
    val k = 5
    val exact = Ann.knnBruteForce(queries, data, k)
    val plain = recallOf(Ann.knnLsh(queries, data, k, 32, dim, 8), exact)
    val probed = recallOf(Ann.knnLsh(queries, data, k, 32, dim, 8, multiprobe = true), exact)
    probed should be >= plain
    withClue(s"multiprobe recall=$probed") { probed should be >= 0.8 }
  }

  test("IVF: assignment maps every vector to its true nearest centroid") {
    val data = clustered(noise = 6)
    val centroids = data.where(col("id") % perCluster === 0)
      .select(col("id").as("cid"), col("vec"))
    val assign = Ann.ivfAssign(data, centroids).collect()
      .map(r => r.getAs[Long]("id") -> r.getAs[Long]("cid")).toMap
    // brute-force argmax via crossJoin for the expected assignment
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("id")).orderBy(col("cos").desc, col("cid"))
    val expected = data.crossJoin(broadcast(
        centroids.select(col("cid"), col("vec").as("cvec"))))
      .withColumn("cos", Ann.cosine(col("vec").cast("array<double>"),
        col("cvec").cast("array<double>")))
      .withColumn("rn", row_number().over(w))
      .where(col("rn") === 1)
      .select(col("id"), col("cid")).collect()
      .map(r => r.getAs[Long]("id") -> r.getAs[Long]("cid")).toMap
    assign shouldBe expected
  }

  test("IVF: full probe (nprobe = all cells) reproduces brute force exactly") {
    val data = clustered(noise = 6)
    val centroids = data.where(col("id") % perCluster === 0)
      .select(col("id").as("cid"), col("vec"))
    val queries = data.where(col("id") % perCluster === 0)
    val exact = Ann.knnBruteForce(queries, data, 5).collect().toSet
    val ivf = Ann.knnIvf(queries, data, centroids, 5, nprobe = numClusters)
      .collect().toSet
    ivf shouldBe exact
  }

  test("IVF: nprobe=2 on clustered data has recall >= 0.9 (members live in the probed cells)") {
    val data = clustered(noise = 6)
    val centroids = data.where(col("id") % perCluster === 0)
      .select(col("id").as("cid"), col("vec"))
    val queries = data.where(col("id") % perCluster === 1) // non-centroid members
    val exact = Ann.knnBruteForce(queries, data, 5)
    val ivf = Ann.knnIvf(queries, data, centroids, 5, nprobe = 2)
    val r = recallOf(ivf, exact)
    withClue(s"recall=$r") { r should be >= 0.9 }
  }

  /** Mean cosine of every vector to its assigned centroid — the spherical
    * k-means objective (all spec vectors share norm 8, so the plain-mean
    * update is the exact maximizer and Lloyd is monotone). */
  private def objective(data: org.apache.spark.sql.DataFrame,
      cent: org.apache.spark.sql.DataFrame): Double = {
    val a = Ann.ivfAssign(data, cent)
    data.join(a, "id")
      .join(cent.select(col("cid"), col("vec").as("cvec")), "cid")
      .select(avg(Ann.cosine(col("vec").cast("array<double>"),
        col("cvec").cast("array<double>"))).as("j"))
      .head().getDouble(0)
  }

  test("k-means: perfect seeds recover the planted clusters exactly") {
    val data = clustered(noise = 6)
    // stride = perCluster seeds each cluster with its uncorrupted centroid
    val cent = Ann.kmeansCentroids(data, numClusters, iters = 2, stride = perCluster)
    cent.count() shouldBe numClusters
    val groups = Ann.ivfAssign(data, cent).collect()
      .map(r => r.getAs[Long]("id") -> r.getAs[Long]("cid"))
      .groupBy { case (id, _) => id / perCluster }
    groups.values.foreach { members =>
      members.map(_._2).distinct.length shouldBe 1 // one cid per planted cluster
    }
  }

  test("k-means: Lloyd objective is non-decreasing from arbitrary seeds") {
    val data = clustered(noise = 8)
    val js = (0 to 3).map(i =>
      objective(data, Ann.kmeansCentroids(data, numClusters, iters = i, stride = 4)))
    js.sliding(2).foreach { case Seq(a, b) => b should be >= a - 1e-12 }
    js.last should be > js.head // bad seeds must actually improve
  }

  test("k-means: clusters that lose all members keep their previous centroid (k stable)") {
    val data = clustered(noise = 6).where(col("id") < 2 * perCluster) // 2 clusters
    val cent = Ann.kmeansCentroids(data, 3, iters = 3, stride = 10) // 3 seeds
    cent.count() shouldBe 3
  }

  test("LSH top-1 matches brute force top-1 for planted exact duplicates") {
    // duplicate of each centroid under a different id: its top-1 must be cos=1
    val data = clustered(noise = 6)
    val dups = data.where(col("id") % perCluster === 0)
      .select((col("id") + 100000L).as("id"), col("vec"))
    val corpus = data.unionByName(dups)
    val queries = data.where(col("id") % perCluster === 0)
    val lsh = Ann.knnLsh(queries, corpus, 1, 32, dim, 8)
    val top1 = lsh.where(col("rnk") === 1).collect()
    top1.length shouldBe numClusters
    top1.foreach { r =>
      r.getAs[Long]("neighbor_id") shouldBe r.getAs[Long]("query_id") + 100000L
      r.getAs[Double]("cos") shouldBe 1.0 +- 1e-9
    }
  }
}

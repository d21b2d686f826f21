package graft.ann

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.SparkTestSession

/** Product-quantization invariants:
  *  - encoding is the exact L2 argmin per subspace (checked against an
  *    independent HOF formulation);
  *  - on data that LIES ON the codebook grid (every subvector is a
  *    codeword) quantization is lossless, so the ADC ranking reproduces
  *    the exact inner-product ranking;
  *  - off-grid, the re-ranked [[Ann.knnPq]] clears a recall floor on
  *    clustered data (the regime PQ promises recall in);
  *  - vectors of the wrong width take no part in encoding or results.
  */
class PqSpec extends AnyFunSuite with Matchers with SparkTestSession {

  private val numSub = 8
  private val subDim = 8
  private val ksub = 16
  private val dim = numSub * subDim

  private def df(rows: Seq[Row]): DataFrame =
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 4),
      StructType(Seq(
        StructField("id", LongType, false),
        StructField("vec", ArrayType(DoubleType, false), true))))

  /** Corpus whose first `ksub` vectors define the codebooks and whose
    * remaining vectors are concatenations of those same subspace codewords
    * — every vector is exactly representable, so PQ is lossless on it. */
  private def gridCorpus(n: Int): DataFrame = {
    val rnd = new scala.util.Random(77)
    // pattern(m)(j): codeword j of subspace m (continuous — ties measure-zero)
    val pattern = Array.fill(numSub, ksub, subDim)(rnd.nextDouble() * 2 - 1)
    val base = (0 until ksub).map { j =>
      Row(j.toLong, (0 until numSub).flatMap(m => pattern(m)(j)).toSeq)
    }
    val rest = (ksub until n).map { i =>
      Row(i.toLong,
        (0 until numSub).flatMap(m => pattern(m)(rnd.nextInt(ksub))).toSeq)
    }
    df(base ++ rest)
  }

  /** Exact top-k by INNER PRODUCT (what ADC approximates), dot desc /
    * neighbor asc — independent of the PQ code path. */
  private def bruteDotTopK(queries: DataFrame, corpus: DataFrame, k: Int): DataFrame = {
    val q = queries.select(col("id").as("query_id"), col("vec").as("qv"))
    val c = corpus.select(col("id").as("neighbor_id"), col("vec").as("nv"))
    val w = Window.partitionBy(col("query_id")).orderBy(col("dot").desc, col("neighbor_id"))
    q.crossJoin(c).where(col("query_id") =!= col("neighbor_id"))
      .withColumn("dot", graft.ann.expr.functions.vec_dot(col("qv"), col("nv")))
      .withColumn("rnk", row_number().over(w)).where(col("rnk") <= k)
      .select(col("query_id"), col("rnk"), col("neighbor_id"))
  }

  test("PQ encoding is the exact per-subspace L2 argmin (ties to lowest code)") {
    val data = gridCorpus(80)
    val cb = Ann.pqCodebooks(data, numSub, subDim, ksub)
    val got = Ann.pqAssign(data, cb, numSub, subDim)
      .collect().map(r => (r.getLong(0), r.getInt(1)) -> r.getLong(2)).toMap
    // independent argmin: true squared L2 via a zip_with/aggregate HOF
    val w = Window.partitionBy(col("id"), col("m")).orderBy(col("d2"), col("code"))
    val expected = data.crossJoin(broadcast(cb))
      .withColumn("sub", slice(col("vec"), col("m") * subDim + 1, lit(subDim)))
      .withColumn("d2", aggregate(
        zip_with(col("sub"), col("cw"), (x, y) => (x - y) * (x - y)),
        lit(0.0), (acc, x) => acc + x))
      .withColumn("rn", row_number().over(w)).where(col("rn") === 1)
      .select(col("id"), col("m"), col("code"))
      .collect().map(r => (r.getLong(0), r.getInt(1)) -> r.getLong(2)).toMap
    got shouldBe expected
    // on-grid vectors must self-encode with zero error: vector j's code in
    // every subspace is j for the codebook-defining rows
    (0 until ksub).foreach { j =>
      (0 until numSub).foreach { m => got((j.toLong, m)) shouldBe j.toLong }
    }
  }

  test("on-grid corpus: ADC ranking == exact inner-product ranking (lossless)") {
    val data = gridCorpus(120)
    val queries = data.where(col("id") % 17 === 3)
    val exact = bruteDotTopK(queries, data, 5).collect().toSet
    val adc = Ann.knnPqAdc(queries, data, 5, numSub, subDim, ksub)
      .select(col("query_id"), col("rnk"), col("neighbor_id")).collect().toSet
    adc shouldBe exact
  }

  test("off-grid clustered data: re-ranked knnPq clears a recall floor") {
    // same planted-cluster generator regime as AnnSpec: +-1 centroids with
    // flipped coordinates, members at cos ~0.81
    val rnd = new scala.util.Random(1234)
    val rows = (0 until 20).flatMap { c =>
      val centroid = Array.fill(dim)(if (rnd.nextBoolean()) 1.0 else -1.0)
      (0 until 15).map { m =>
        val v = centroid.clone()
        rnd.shuffle((0 until dim).toList).take(if (m == 0) 0 else 6)
          .foreach(i => v(i) = -v(i))
        Row(c.toLong * 15 + m, v.toSeq)
      }
    }
    val data = df(rows)
    val queries = data.where(col("id") % 15 === 0)
    val k = 5
    val exact = Ann.knnBruteForce(queries, data, k)
    val pq = Ann.knnPq(queries, data, k, numSub, subDim, ksub, rerankFactor = 8)
    val hit = pq.select(col("query_id"), col("neighbor_id"))
      .join(exact.select(col("query_id"), col("neighbor_id")),
        Seq("query_id", "neighbor_id")).count()
    val recall = hit.toDouble / exact.count()
    withClue(s"recall=$recall") { recall should be >= 0.6 }
  }

  test("wrong-width and null vectors take no part in encoding or results") {
    val good = gridCorpus(40)
    val bad = df(Seq(
      Row(1000L, Seq.fill(10)(0.5)), // short
      Row(1001L, null)))             // null
    val corpus = good.unionByName(bad)
    val cb = Ann.pqCodebooks(corpus, numSub, subDim, ksub)
    val codes = Ann.pqAssign(corpus, cb, numSub, subDim)
    codes.where(col("id") >= 1000L).count() shouldBe 0
    val res = Ann.knnPqAdc(good.where(col("id") < 3), corpus, 5,
      numSub, subDim, ksub)
    res.where(col("neighbor_id") >= 1000L).count() shouldBe 0
    // codes are always in [0, ksub)
    codes.where(col("code") < 0 || col("code") >= ksub).count() shouldBe 0
  }

  test("IVF-PQ: candidate set equals knnIvf's (same probed cells) with k wide open") {
    val data = gridCorpus(120)
    val centroids = data.where(col("id") % 10 === 0)
      .select(col("id").as("cid"), col("vec"))
    val queries = data.where(col("id") % 17 === 3)
    // k >> cell sizes: both return EVERY candidate in the probed cells, so
    // the sets must be identical — the PQ layer changes scores, never the
    // probe/assignment geometry
    val ivf = Ann.knnIvf(queries, data, centroids, 500, 2)
      .select(col("query_id"), col("neighbor_id")).collect().toSet
    val ivfpq = Ann.knnIvfPq(queries, data, centroids, 500, 2, numSub, subDim, ksub)
      .select(col("query_id"), col("neighbor_id")).collect().toSet
    ivfpq shouldBe ivf
  }

  test("IVF-PQ off-grid clustered data: top-k recall clears a floor vs brute force") {
    val rnd = new scala.util.Random(1234)
    val rows = (0 until 20).flatMap { c =>
      val centroid = Array.fill(dim)(if (rnd.nextBoolean()) 1.0 else -1.0)
      (0 until 15).map { m =>
        val v = centroid.clone()
        rnd.shuffle((0 until dim).toList).take(if (m == 0) 0 else 6)
          .foreach(i => v(i) = -v(i))
        Row(c.toLong * 15 + m, v.toSeq)
      }
    }
    val data = df(rows)
    // one centroid per planted cluster (its clean member) — cells ARE the
    // clusters, so the true neighbors live in the probed cells and the
    // only approximation left is the residual quantization
    val centroids = data.where(col("id") % 15 === 0)
      .select((col("id") / 15).as("cid"), col("vec"))
    val queries = data.where(col("id") % 15 === 0)
    val k = 5
    val exact = Ann.knnBruteForce(queries, data, k)
    val got = Ann.knnIvfPq(queries, data, centroids, k, 3, numSub, subDim, ksub)
    val hit = got.select(col("query_id"), col("neighbor_id"))
      .join(exact.select(col("query_id"), col("neighbor_id")),
        Seq("query_id", "neighbor_id")).count()
    val recall = hit.toDouble / exact.count()
    withClue(s"recall=$recall") { recall should be >= 0.5 }
  }
}

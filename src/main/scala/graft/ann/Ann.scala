package graft.ann

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Approximate-nearest-neighbor search over embedding columns
 * (`Array[Float]`), for training-data dedup/retrieval pipelines.
 *
 * Two paths:
 *  - [[cosine]] + brute-force top-k: the exactness baseline (O(n*q)).
 *  - Random-hyperplane LSH ([[rhpSignature]]): each vector gets a small bit
 *    signature; candidate pairs share a signature bucket, then re-rank with
 *    exact cosine. At scale the bucket join replaces the quadratic cross
 *    join with a shuffle on (bucket, id) — recall tunable via planes/bands.
 *
 * Hyperplane weights are a deterministic integer lattice (seeded arithmetic,
 * reproducible in the DuckDB oracles): w[j][k] = ((7*(j+1) + 11*k) mod 5) - 2.
 */
object Ann {

  /** Deterministic hyperplane weights for plane j (0-based) over `dim`. */
  def planeWeights(j: Int, dim: Int): Seq[Int] =
    (0 until dim).map(k => ((7 * (j + 1) + 11 * k) % 5) - 2)

  /** Cosine similarity of two double-array columns (computed in double). */
  def cosine(a: Column, b: Column): Column = {
    val dot = aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0d), (acc, x) => acc + x)
    val na = sqrt(aggregate(a, lit(0.0d), (acc, x) => acc + x * x))
    val nb = sqrt(aggregate(b, lit(0.0d), (acc, x) => acc + x * x))
    dot / (na * nb)
  }

  /** Random-hyperplane signature: bit j = (v . w_j) > 0, packed to a long. */
  def rhpSignature(vec: Column, numPlanes: Int, dim: Int): Column = {
    val bits = (0 until numPlanes).map { j =>
      val w = array(planeWeights(j, dim).map(x => lit(x.toDouble)): _*)
      when(aggregate(zip_with(vec, w, (x, y) => x * y), lit(0.0d), (acc, x) => acc + x) > 0,
        lit(1L << j)).otherwise(lit(0L))
    }
    bits.reduce(_ + _)
  }

  /** Brute-force exact top-k: for each query vector, the k nearest neighbors
    * by cosine. `queries`/`corpus`: (id, vec) with vec castable to
    * array<double>. Output: (query_id, rnk, neighbor_id, cos). */
  def knnBruteForce(queries: DataFrame, corpus: DataFrame, k: Int): DataFrame = {
    val q = queries.select(col("id").as("query_id"), col("vec").cast("array<double>").as("qv"))
    val c = corpus.select(col("id").as("neighbor_id"), col("vec").cast("array<double>").as("nv"))
    val w = Window.partitionBy(col("query_id")).orderBy(col("cos").desc, col("neighbor_id"))
    q.crossJoin(c)
      .where(col("query_id") =!= col("neighbor_id"))
      .withColumn("cos", cosine(col("qv"), col("nv")))
      .withColumn("rnk", row_number().over(w))
      .where(col("rnk") <= k)
      .select(col("query_id"), col("rnk"), col("neighbor_id"), col("cos"))
  }

  /** Banded LSH ANN: the signature is split into `numBands` bands of
    * `numPlanes/numBands` bits; candidates share at least ONE band value
    * (OR-amplification — a single full-signature bucket has poor recall).
    * Candidates are re-ranked by exact cosine. Scale path: the band join
    * shuffles (band, bucket, id) triples; candidate growth is controlled by
    * band width. Output: (query_id, rnk, neighbor_id, cos). */
  def knnLsh(queries: DataFrame, corpus: DataFrame, k: Int,
      numPlanes: Int, dim: Int, numBands: Int = 4): DataFrame = {
    require(numPlanes % numBands == 0, "numPlanes must divide into numBands")
    val bandBits = numPlanes / numBands
    val mask = (1L << bandBits) - 1

    def withBands(df: DataFrame, idAs: String, vecAs: String): DataFrame = {
      val sigd = df.select(col("id").as(idAs),
        col("vec").cast("array<double>").as(vecAs))
        .withColumn("sig", rhpSignature(col(vecAs), numPlanes, dim))
      val bands = (0 until numBands).map { b =>
        struct(lit(b).as("band"),
          shiftright(col("sig"), b * bandBits).bitwiseAND(lit(mask)).as("bucket"))
      }
      sigd.withColumn("b", explode(array(bands: _*)))
        .select(col(idAs), col(vecAs), col("b.band").as("band"), col("b.bucket").as("bucket"))
    }

    val q = withBands(queries, "query_id", "qv")
    val c = withBands(corpus, "neighbor_id", "nv")
    val w = Window.partitionBy(col("query_id")).orderBy(col("cos").desc, col("neighbor_id"))
    q.join(c, Seq("band", "bucket"))
      .where(col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("qv"), col("neighbor_id"), col("nv"))
      .distinct() // a pair may collide in several bands
      .withColumn("cos", cosine(col("qv"), col("nv")))
      .withColumn("rnk", row_number().over(w))
      .where(col("rnk") <= k)
      .select(col("query_id"), col("rnk"), col("neighbor_id"), col("cos"))
  }
}

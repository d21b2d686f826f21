package graft.ann

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession
import graft.ann.expr.functions.{vec_cosine, vec_dot}

/** Contract tests for the codegen'd vector expressions: bit-identity with the
  * interpreted aggregate/zip_with formulation they replaced (the cross-engine
  * determinism anchor — the DuckDB oracles were verified against THAT shape),
  * plus the null/empty/length-mismatch edge cases. */
class VectorExprSpec extends AnyFunSuite with SparkTestSession {

  private def interpDot = (a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =>
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0d), (acc, x) => acc + x)

  test("vec_dot is bit-identical to the interpreted fold on random vectors") {
    val df = spark.range(500).select(
      col("id"),
      transform(sequence(lit(0), lit(63)),
        i => (pmod(col("id") * 37 + i * 101, lit(997)) - 498).cast("double") / 100.0).as("a"),
      transform(sequence(lit(0), lit(63)),
        i => (pmod(col("id") * 53 + i * 211, lit(997)) - 498).cast("double") / 100.0).as("b"))
    val bad = df.where(
      vec_dot(col("a"), col("b")) =!= interpDot(col("a"), col("b")) ||
      vec_dot(col("a"), col("b")).isNull)
    assert(bad.count() === 0)
  }

  test("vec_cosine equals dot/(|a||b|) with sequential norms, bitwise") {
    val df = spark.range(200).select(
      col("id"),
      transform(sequence(lit(0), lit(31)),
        i => (pmod(col("id") * 13 + i * 17, lit(101)) - 50).cast("double")).as("a"),
      transform(sequence(lit(0), lit(31)),
        i => (pmod(col("id") * 29 + i * 7, lit(101)) - 50).cast("double")).as("b"))
    val expected = interpDot(col("a"), col("b")) /
      (sqrt(interpDot(col("a"), col("a"))) * sqrt(interpDot(col("b"), col("b"))))
    val bad = df.where(vec_cosine(col("a"), col("b")) =!= expected)
    assert(bad.count() === 0)
  }

  test("null / empty / length-mismatch semantics match zip_with padding") {
    import spark.implicits._
    val df = Seq(
      (1, Seq(1.0, 2.0), Seq(3.0, 4.0)),   // plain: 11.0
      (2, Seq.empty[Double], Seq.empty[Double]), // empty: fold init 0.0
      (3, Seq(1.0), Seq(1.0, 2.0))          // mismatch: zip_with pads -> null
    ).toDF("id", "a", "b")
    val r = df.select(col("id"), vec_dot(col("a"), col("b")).as("d"))
      .collect().map(r => r.getInt(0) -> (if (r.isNullAt(1)) None else Some(r.getDouble(1)))).toMap
    assert(r(1) === Some(11.0))
    assert(r(2) === Some(0.0))
    assert(r(3) === None)
    // null input array -> null (nullIntolerant)
    val n = df.select(vec_dot(lit(null).cast("array<double>"), col("b")).as("d"))
      .collect().forall(_.isNullAt(0))
    assert(n)
  }

  test("expressions are SQL-visible after Graft.register, with literal coercion") {
    graft.Graft.register(spark)
    // plain SQL decimals (not 1.0d doubles): the registration path must
    // coerce to array<double> like the Column facade does
    val r = spark.sql(
      "SELECT vec_dot(array(1.0, 2.0), array(3.0, 4.0)) AS d, " +
        "vec_cosine(array(1.0, 0.0), array(1.0, 0.0)) AS c").head()
    assert(r.getDouble(0) === 11.0)
    assert(r.getDouble(1) === 1.0)
  }

  test("Column facade coerces float arrays (the embeddings column type)") {
    import spark.implicits._
    val df = Seq((1, Seq(1.0f, 2.0f), Seq(3.0f, 4.0f))).toDF("id", "a", "b")
    val r = df.select(vec_dot(col("a"), col("b")).as("d"),
      vec_cosine(col("a"), col("a")).as("c")).head()
    assert(r.getDouble(0) === 11.0)
    assert(math.abs(r.getDouble(1) - 1.0) < 1e-12) // fp: dot/(|v||v|) != exactly 1
  }

  test("rhp_signature: bit-identical to the unfused per-plane when(vec_dot > 0) sum") {
    // the fused expression replaced 32 inlined cast+dot loops (JIT
    // huge-method cliff); the signature bits and degenerate-input outcomes
    // must not move by a single bit
    val numPlanes = 32
    val dim = 16
    val unfused = {
      val bits = (0 until numPlanes).map { j =>
        val w = array(Ann.planeWeights(j, dim).map(x => lit(x.toDouble)): _*)
        when(vec_dot(col("vec"), w) > 0, lit(1L << j)).otherwise(lit(0L))
      }
      bits.reduce(_ + _)
    }
    val df = spark.range(300).select(col("id"),
      transform(sequence(lit(1), lit(dim)),
        i => sin(i * (col("id") + 1L)).cast("double")).as("vec"))
    val out = df.select(
        Ann.rhpSignature(col("vec"), numPlanes, dim).as("fused"),
        unfused.as("ref"))
      .where(col("fused") =!= col("ref"))
    assert(out.isEmpty)
    // degenerate inputs follow the otherwise(0) fall-through, never null:
    // null vector, wrong length, null element -> signature 0
    import spark.implicits._
    val weird = Seq(
      (1, null.asInstanceOf[Seq[Double]]),
      (2, Seq(1.0, 2.0)), // wrong length
      (3, Seq.empty[Double])
    ).toDF("id", "vec")
    val sigs = weird.select(col("id"),
        Ann.rhpSignature(col("vec"), numPlanes, dim).as("s"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(sigs === Map(1 -> 0L, 2 -> 0L, 3 -> 0L))
    // a null ELEMENT likewise zeroes the signature (predicate null per plane)
    val nullElem = spark.sql(
      s"SELECT array(${Seq.fill(dim - 1)("1.0d").mkString(",")}, NULL) AS vec")
    assert(nullElem.select(Ann.rhpSignature(col("vec"), numPlanes, dim))
      .head().getLong(0) === 0L)
  }
}

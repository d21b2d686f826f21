package graft.store

import java.nio.file.Files

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.SparkTestSession
import graft.h3.H3
import graft.schema.{GraftDataType => T, _}

/** F10 row-level semantics, shaped after the reference's templated-rand
  * test (`test_schema.py:69-73`): sampling in a template returns strictly
  * fewer rows with identical columns, and a SEEDED sample is reproducible.
  * (The exact-count/bounds invariants run through the ts27 oracle gate.) */
class RandTemplateSpec extends AnyFunSuite with Matchers with SparkTestSession {

  private val name = "rand_ts"

  private lazy val (store, cells) = {
    val dir = Files.createTempDirectory("graft_rand_").toString
    val s = CellStore(spark, dir)
    val cs = H3.toChildren(H3.fromParts(20, 5, Seq(0, 0, 0, 0, 0)), 9).toSeq
    cs.size shouldBe 2401
    val rows = cs.zipWithIndex.map { case (c, i) => Row(c, i.toLong) }
    s.insert(name, spark.createDataFrame(
      spark.sparkContext.parallelize(rows.toIndexedSeq, 4),
      StructType(Seq(
        StructField("h3index", LongType, false),
        StructField("v", LongType, false)))),
      createSchema = Some(CompactedTableSchema.builder(name)
        .h3BaseResolutions(Seq(9))
        .useCompaction(false)
        .addSimpleColumn("v", T.Int64)
        .build()))
    (s, cs)
  }

  private def sample(seed: Long): Seq[Long] =
    store.queryCells(name, cells, 9, doUncompact = true,
      template = Some(
        s"SELECT * FROM <[table]> WHERE rand($seed) < 0.5 AND h3index IN <[h3indexes]>"))
      .select("h3index").collect().map(_.getLong(0)).sorted.toSeq

  test("templated rand() samples: fewer rows, same columns (reference shape)") {
    val full = store.queryCells(name, cells, 9)
    val sampled = store.queryCells(name, cells, 9, doUncompact = true,
      template = Some(
        "SELECT * FROM <[table]> WHERE rand(42) < 0.5 AND h3index IN <[h3indexes]>"))
    sampled.columns.toSeq shouldBe full.columns.toSeq
    val n = sampled.count()
    n should be > 0L
    n should be < full.count()
  }

  test("same seed reproduces the sample; a different seed draws differently") {
    val a = sample(7)
    a shouldBe sample(7)
    a should not be sample(8)
  }
}

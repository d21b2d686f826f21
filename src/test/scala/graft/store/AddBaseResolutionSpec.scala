package graft.store

import java.nio.file.Files

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.SparkTestSession
import graft.h3.H3
import graft.schema.{AggregationMethod => Agg, GraftDataType => T, _}

class AddBaseResolutionSpec extends AnyFunSuite with Matchers with SparkTestSession {

  private val name = "backfill_ts"

  private def freshStore(): (CellStore, String) = {
    val root = Files.createTempDirectory("graft_abr_").toString
    val s = CellStore(spark, root)
    val cells = H3.toChildren(H3.fromParts(20, 5, Seq(0, 0, 0, 0, 0)), 7)
    val rows = cells.zipWithIndex.map { case (c, i) => Row(c, (i % 10).toDouble) }
    val input = spark.createDataFrame(
      spark.sparkContext.parallelize(rows.toIndexedSeq, 4),
      StructType(Seq(
        StructField("h3index", LongType, false),
        StructField("v", DoubleType, false))))
    s.insert(name, input,
      createSchema = Some(CompactedTableSchema.builder(name)
        .h3BaseResolutions(Seq(7))
        .addAggregatedColumn("v", T.Float64, Agg.Sum)
        .build()))
    (s, root)
  }

  test("backfill equals the declared-up-front rollup and updates the schema") {
    val (s, _) = freshStore()
    val finesBefore = s.scanForResolution(name, 7).count()
    s.addBaseResolution(name, 6)
    s.getTableset(name).baseResolutions shouldBe Seq(6, 7)
    // 49 res-7 cells under one res-5 hexagon -> 7 res-6 parents, each the
    // sum of its 7 children
    val r6 = s.scanForResolution(name, 6)
      .select("h3index", "v").collect().map(r => (r.getLong(0), r.getDouble(1)))
    r6.length shouldBe 7
    r6.map(_._2).sum shouldBe (0 until 49).map(_ % 10).sum.toDouble
    // the finest table is untouched
    s.scanForResolution(name, 7).count() shouldBe finesBefore
  }

  test("existing partitions' files are not rewritten by the backfill") {
    val (s, root) = freshStore()
    def res7Files = {
      def walk(f: java.io.File): Seq[java.io.File] = {
        val kids = Option(f.listFiles()).getOrElse(Array.empty).toSeq
        kids.filter(k => k.isFile && k.getName.endsWith(".parquet")) ++
          kids.filter(_.isDirectory).flatMap(walk)
      }
      walk(new java.io.File(s"$root/$name/data"))
        .filter(_.getPath.contains("resolution=7"))
        .map(f => (f.getPath, f.lastModified, f.length)).sorted
    }
    val before = res7Files
    s.addBaseResolution(name, 4)
    res7Files shouldBe before
  }

  test("rejects an existing resolution and a non-coarser one") {
    val (s, _) = freshStore()
    an[IllegalArgumentException] should be thrownBy s.addBaseResolution(name, 7)
    an[IllegalArgumentException] should be thrownBy s.addBaseResolution(name, 9)
    an[IllegalArgumentException] should be thrownBy s.addBaseResolution(name, -1)
  }

  test("queries route through the new resolution after backfill") {
    val (s, _) = freshStore()
    s.addBaseResolution(name, 6)
    // a res-6 probe answered at res 6 hits the new base table directly
    val probe = H3.toParentUnsafe(H3.toChildren(H3.fromParts(20, 5, Seq(0, 0, 0, 0, 0)), 7).head, 6)
    val got = s.queryCells(name, Seq(probe), 6, doUncompact = true, template = None)
      .select("h3index").collect().map(_.getLong(0))
    got shouldBe Array(probe)
  }
}

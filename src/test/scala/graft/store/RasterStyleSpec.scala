package graft.store

import java.nio.file.Files

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.SparkTestSession
import graft.h3.H3
import graft.h3.expr.functions._
import graft.schema.{AggregationMethod => Agg, GraftDataType => T, _}
import graft.traverse.Traversal

/** FIXTURES F3: raster-style mask ingest (reference `test_raster.py`).
  * A synthetic "water mask" of res-8 cells is ingested compacted with
  * RelativeToCellArea; assertions:
  *  - read-back at res 7 loses <0.5% of coverage (test_raster.py:77-84)
  *  - after rollup, no value exceeds 1.0 (test_raster.py:118-121). */
class RasterStyleSpec extends AnyFunSuite with Matchers with SparkTestSession {

  private def schema = CompactedTableSchema.builder("from_raster")
    .h3BaseResolutions(0 to 8)
    .addAggregatedColumn("is_water", T.Float32, Agg.RelativeToCellArea)
    .build()

  /** Synthetic mask: a deterministic blobby subset of the res-8 descendants
    * of one res-4 cell (~seeded pseudo-random 60% coverage). */
  private lazy val maskCells: Seq[Long] = {
    val root = H3.fromParts(20, 4, Seq(1, 2, 0, 3))
    H3.toChildren(root, 8).toSeq.filter { c =>
      val x = c * 2654435761L
      ((x >>> 16) & 7) < 5 // ~62% deterministic coverage
    }
  }

  private lazy val store: CellStore = {
    val s = CellStore(spark, Files.createTempDirectory("graft_raster_").toString)
    val rows = maskCells.map(c => Row(c, 1.0f))
    val input = spark.createDataFrame(
      spark.sparkContext.parallelize(rows.toIndexedSeq, 8),
      StructType(Seq(StructField("h3index", LongType, false),
        StructField("is_water", FloatType, false))))
    s.insert("from_raster", input, createSchema = Some(schema))
    s
  }

  test("coverage round-trip: traversal read-back at full res loses <0.5% of mask cells") {
    val aoi = maskCells.map(H3.toParentUnsafe(_, 4)).distinct
    val back = Traversal.traverseBulk(store, "from_raster", aoi, 8)
      .where(col("is_water") > 0)
      .select("h3index").collect().map(_.getLong(0)).toSet
    val lost = maskCells.count(!back.contains(_))
    (lost.toDouble / maskCells.size) should be < 0.005
    // and nothing extra invented
    (back -- maskCells.toSet) shouldBe empty
  }

  test("aggregation invariant: after rollup no is_water value exceeds 1.0") {
    (0 to 7).foreach { r =>
      val over = store.scanForResolution("from_raster", r)
        .where(col("is_water") > 1.0f + 1e-6f)
        .count()
      withClue(s"res $r: ") { over shouldBe 0L }
    }
  }

  test("area weighting: res-7 parent of a fully-covered sibling set is exactly 1.0") {
    // find parents with all 7 children in the mask
    val byParent = maskCells.groupBy(H3.toParentUnsafe(_, 7)).filter(_._2.size == 7)
    if (byParent.nonEmpty) {
      val full = byParent.keys.take(5).toSeq
      val vals = store.queryCells("from_raster", full, 7)
        .select("h3index", "is_water").collect()
        .map(r => r.getLong(0) -> r.getFloat(1)).toMap
      full.foreach { p => vals(p) shouldBe 1.0f +- 1e-6f }
    }
  }
}

package graft.store

import java.nio.file.Files

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.SparkTestSession
import graft.h3.H3
import graft.schema.{AggregationMethod => Agg, GraftDataType => T, _}

class TimeTravelSpec extends AnyFunSuite with Matchers with SparkTestSession {

  private val name = "travel_ts"

  private def frame(cells: Seq[Long], v: Long) = {
    val rows = cells.map(c => Row(c, v))
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows.toIndexedSeq, 2),
      StructType(Seq(
        StructField("h3index", LongType, false),
        StructField("v", LongType, false))))
  }

  private def freshStore(): CellStore = {
    val root = Files.createTempDirectory("graft_tt_").toString
    val s = CellStore(spark, root)
    val cells = H3.toChildren(H3.fromParts(20, 5, Seq(0, 0, 0, 0, 0)), 7).toSeq
    s.insert(name, frame(cells, 1),
      createSchema = Some(CompactedTableSchema.builder(name)
        .h3BaseResolutions(Seq(7)).useCompaction(false)
        .addAggregatedColumn("v", T.Int64, Agg.Max).build()))
    s.insert(name, frame(cells.take(10), 2))
    s
  }

  test("each insert is a snapshot; as-of reads exclude later inserts") {
    val s = freshStore()
    val ids = s.snapshotIds(name)
    ids shouldBe Seq(1L, 2L)
    s.scanForResolutionAsOf(name, 7, 1L).count() shouldBe 49
    s.scanForResolutionAsOf(name, 7, 2L).count() shouldBe 59
    s.scanForResolution(name, 7).count() shouldBe 59
  }

  test("unknown snapshot id is rejected") {
    val s = freshStore()
    an[IllegalArgumentException] should be thrownBy s.scanAsOf(name, 99L)
  }

  test("a rewrite invalidates earlier snapshots loudly, not silently") {
    val s = freshStore()
    s.compactFiles(name)
    val e = the[IllegalStateException] thrownBy s.scanAsOf(name, 1L)
    e.getMessage should include("invalidated")
    // current-state reads are unaffected
    s.scanForResolution(name, 7).count() shouldBe 59
  }

  test("rename keeps snapshot history valid (relative paths)") {
    val s = freshStore()
    s.renameTableset(name, "travel_renamed")
    s.scanForResolutionAsOf("travel_renamed", 7, 1L).count() shouldBe 49
    s.dropTableset("travel_renamed")
  }

  test("vacuum folds old snapshots into a checkpoint; kept ids still exact") {
    val s = freshStore()
    val cells = H3.toChildren(H3.fromParts(20, 5, Seq(0, 0, 0, 0, 0)), 7).toSeq
    s.insert(name, frame(cells.take(5), 3)) // snapshot 3
    val asOf2 = s.scanForResolutionAsOf(name, 7, 2L).count()
    val asOf3 = s.scanForResolutionAsOf(name, 7, 3L).count()
    s.vacuumSnapshots(name, keepLast = 2)
    s.snapshotIds(name) shouldBe Seq(2L, 3L)
    // id 2 is now the cumulative checkpoint: same rows as before the vacuum
    s.scanForResolutionAsOf(name, 7, 2L).count() shouldBe asOf2
    s.scanForResolutionAsOf(name, 7, 3L).count() shouldBe asOf3
    // vacuumed history is gone loudly
    an[IllegalArgumentException] should be thrownBy s.scanAsOf(name, 1L)
    // vacuum with nothing to fold is a no-op
    s.vacuumSnapshots(name, keepLast = 5)
    s.snapshotIds(name) shouldBe Seq(2L, 3L)
  }

  test("a backfilled resolution is its own snapshot commit") {
    val s = freshStore()
    s.addBaseResolution(name, 6)
    s.snapshotIds(name) shouldBe Seq(1L, 2L, 3L)
    // as-of 2 the res-6 table does not exist yet
    s.scanForResolutionAsOf(name, 6, 2L).count() shouldBe 0
    s.scanForResolutionAsOf(name, 6, 3L).count() shouldBe 7
  }
}

package graft.store

import java.nio.file.Files

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.SparkTestSession
import graft.h3.H3
import graft.schema.{GraftDataType => T, _}

/** [[CellStore.dropPartitionsWhere]] — ClickHouse DROP PARTITION semantics:
  * driver-only directory retirement, partition-column-only contract,
  * interplay with pending lightweight deletes and snapshots. */
class DropPartitionSpec extends AnyFunSuite with Matchers with SparkTestSession {

  private val name = "retire_ts"
  // two base cells -> two ph3 partition directories
  private val cellsA = H3.toChildren(H3.fromParts(20, 5, Seq(0, 0, 0, 0, 0)), 7).toSeq
  private val cellsB = H3.toChildren(H3.fromParts(25, 5, Seq(0, 0, 0, 0, 0)), 7).toSeq

  private def schema = CompactedTableSchema.builder(name)
    .h3BaseResolutions(Seq(7))
    .useCompaction(false)
    .engine(TableEngine.ReplacingMergeTree(None))
    .addSimpleColumn("v", T.Int64)
    .build()

  private def freshStore(): CellStore = {
    val root = Files.createTempDirectory("graft_retire_").toString
    val s = CellStore(spark, root)
    val rows = (cellsA ++ cellsB).zipWithIndex.map { case (c, i) => Row(c, i.toLong) }
    val input = spark.createDataFrame(
      spark.sparkContext.parallelize(rows.toIndexedSeq, 4),
      StructType(Seq(
        StructField("h3index", LongType, false),
        StructField("v", LongType, false))))
    s.insert(name, input, createSchema = Some(schema))
    s
  }

  test("drops exactly the matching ph3 directories, instantly, driver-only") {
    val s = freshStore()
    s.scanForResolution(name, 7).count() shouldBe 98L
    val dropped = s.dropPartitionsWhere(name, col("ph3") === 20)
    dropped shouldBe 1
    val kept = s.scanForResolution(name, 7)
    kept.count() shouldBe 49L
    // only base-cell-25 rows survive (they carried indices 49..97)
    kept.agg(min(col("v"))).collect()(0).getLong(0) shouldBe 49L
    // idempotent: nothing left to match
    s.dropPartitionsWhere(name, col("ph3") === 20) shouldBe 0
  }

  test("a row-column predicate fails analysis loudly, dropping nothing") {
    val s = freshStore()
    an[Exception] should be thrownBy s.dropPartitionsWhere(name, col("v") >= 40)
    s.scanForResolution(name, 7).count() shouldBe 98L
  }

  test("NULL predicate results never drop (coalesced to false)") {
    val s = freshStore()
    s.dropPartitionsWhere(name, lit(null).cast("boolean")) shouldBe 0
    s.scanForResolution(name, 7).count() shouldBe 98L
  }

  test("pending delete markers prune when their captured files are retired") {
    val s = freshStore()
    s.deleteWhere(name, "v < 10") // only base-cell-20 rows match
    s.scanForResolution(name, 7).count() shouldBe 88L
    s.dropPartitionsWhere(name, col("ph3") === 20) shouldBe 1
    // the marker survives for the still-live captured files of ph3=25...
    s.pendingDeletes(name) should have size 1
    // ...but masks nothing there; the scan is exactly the surviving cell set
    s.scanForResolution(name, 7).count() shouldBe 49L
    // retiring the other directory drains the capture set -> marker gone
    s.dropPartitionsWhere(name, col("ph3") === 25) shouldBe 1
    s.pendingDeletes(name) shouldBe empty
    s.scanForResolution(name, 7).count() shouldBe 0L
  }

  test("a drop invalidates earlier snapshots loudly, not silently") {
    val s = freshStore()
    val snap = s.snapshotIds(name).head
    s.dropPartitionsWhere(name, col("ph3") === 20)
    an[IllegalStateException] should be thrownBy s.scanAsOf(name, snap).count()
  }
}

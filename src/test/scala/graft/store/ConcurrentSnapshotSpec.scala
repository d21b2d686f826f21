package graft.store

import java.nio.file.Files

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.SparkTestSession
import graft.h3.H3
import graft.schema.{AggregationMethod => Agg, GraftDataType => T, _}

/** Multi-writer snapshot safety: concurrent appends must each land as their
  * OWN snapshot (claimSnapshotId's exclusive-create id claim), and overlap
  * between concurrently-captured file lists must never duplicate rows in an
  * as-of read (scanAsOf reads the union distinct). Before the claim, two
  * writers computing last+1 together would publish the same id — POSIX
  * rename overwrites, so one writer's history silently vanished. */
class ConcurrentSnapshotSpec extends AnyFunSuite with Matchers with SparkTestSession {

  private val name = "conc_snap_ts"

  private def frame(cells: Seq[Long], v: Long) = {
    val rows = cells.map(c => Row(c, v))
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows.toIndexedSeq, 2),
      StructType(Seq(
        StructField("h3index", LongType, false),
        StructField("v", LongType, false))))
  }

  // one disjoint 49-cell res-7 family per writer slot (distinct res-5 parents)
  private def cellsFor(slot: Int): Seq[Long] =
    H3.toChildren(H3.fromParts(20, 5, Seq(0, 0, 0, 0, slot + 1)), 7).toSeq

  test("concurrent inserts each commit their own snapshot; as-of reads stay exact") {
    val root = Files.createTempDirectory("graft_conc_").toString
    val s = CellStore(spark, root)
    s.insert(name, frame(cellsFor(0), 1),
      createSchema = Some(CompactedTableSchema.builder(name)
        .h3BaseResolutions(Seq(7)).useCompaction(false)
        .addAggregatedColumn("v", T.Int64, Agg.Max).build()))

    val writers = 4
    val errors = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    val threads = (1 to writers).map { slot =>
      new Thread(() =>
        try s.insert(name, frame(cellsFor(slot), slot.toLong))
        catch { case t: Throwable => errors.add(t) })
    }
    threads.foreach(_.start())
    threads.foreach(_.join())
    errors shouldBe empty

    // every writer's commit survived: one snapshot per insert, no clobbers
    val ids = s.snapshotIds(name)
    ids.size shouldBe (writers + 1)
    ids shouldBe ids.sorted

    // the full as-of read has every row exactly once — concurrent listings
    // may overlap file-wise, but never duplicate rows
    val latest = s.scanAsOf(name, ids.last)
    latest.count() shouldBe (writers + 1) * 49L
    latest.select("h3index").distinct().count() shouldBe (writers + 1) * 49L
    s.scanForResolution(name, 7).count() shouldBe (writers + 1) * 49L
  }

  test("a crashed claim (orphan marker) skips an id without breaking reads") {
    val root = Files.createTempDirectory("graft_conc2_").toString
    val s = CellStore(spark, root)
    s.insert(name, frame(cellsFor(0), 1),
      createSchema = Some(CompactedTableSchema.builder(name)
        .h3BaseResolutions(Seq(7)).useCompaction(false)
        .addAggregatedColumn("v", T.Int64, Agg.Max).build()))
    // simulate a writer that claimed id 2 and died before publishing
    val fs = org.apache.hadoop.fs.FileSystem.getLocal(
      spark.sparkContext.hadoopConfiguration)
    val claim = new org.apache.hadoop.fs.Path(
      s"$root/$name/_snapshots/.2.claim")
    fs.create(claim, false).close()

    s.insert(name, frame(cellsFor(1), 2))
    // the orphan id is skipped, not reused
    s.snapshotIds(name) shouldBe Seq(1L, 3L)
    s.scanAsOf(name, 3L).count() shouldBe 98
    s.scanForResolution(name, 7).count() shouldBe 98
  }
}

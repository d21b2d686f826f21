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

/** compactFiles: merges the file fragmentation of repeated inserts without
  * changing a single row — duplicates across inserts included — and only
  * in the touched partitions. */
class CompactFilesSpec extends AnyFunSuite with Matchers with SparkTestSession {

  private val name = "compact_files_ts"
  private val bcA = 20
  private val bcB = 25

  private def cells(bc: Int): Seq[Long] =
    H3.toChildren(H3.fromParts(bc, 5, Seq(0, 0, 0, 0, 0)), 7).toSeq

  private def frame(cs: Seq[Long], v: Long) = {
    val rows = cs.map(c => Row(c, v))
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows.toIndexedSeq, 4),
      StructType(Seq(
        StructField("h3index", LongType, false),
        StructField("v", LongType, false))))
  }

  private def dataDir(root: String) = new java.io.File(s"$root/$name/data")

  private def filesUnder(f: java.io.File): Seq[java.io.File] = {
    val (dirs, fs) = Option(f.listFiles()).getOrElse(Array.empty).toSeq
      .partition(_.isDirectory)
    fs.filter(x => x.getName.endsWith(".parquet")) ++ dirs.flatMap(filesUnder)
  }

  test("fewer files, identical rows (cross-insert duplicates preserved)") {
    val root = Files.createTempDirectory("graft_cf_").toString
    val s = CellStore(spark, root)
    s.insert(name, frame(cells(bcA), 1),
      createSchema = Some(CompactedTableSchema.builder(name)
        .h3BaseResolutions(Seq(7)).useCompaction(false)
        .addAggregatedColumn("v", T.Int64, Agg.Max).build()))
    s.insert(name, frame(cells(bcA), 2))
    s.insert(name, frame(cells(bcA), 1)) // exact duplicate of insert 1
    val before = filesUnder(dataDir(root)).size
    val rowsBefore = s.scanForResolution(name, 7)
      .select("h3index", "v").collect().map(r => (r.getLong(0), r.getLong(1)))
      .sorted.toSeq
    rowsBefore.size shouldBe cells(bcA).size * 3 // dup insert NOT collapsed
    s.compactFiles(name)
    val after = filesUnder(dataDir(root)).size
    after should be < before
    val rowsAfter = s.scanForResolution(name, 7)
      .select("h3index", "v").collect().map(r => (r.getLong(0), r.getLong(1)))
      .sorted.toSeq
    rowsAfter shouldBe rowsBefore
  }

  test("scoped compaction leaves untouched partition files byte-identical") {
    val root = Files.createTempDirectory("graft_cfs_").toString
    val s = CellStore(spark, root)
    s.insert(name, frame(cells(bcA) ++ cells(bcB), 1),
      createSchema = Some(CompactedTableSchema.builder(name)
        .h3BaseResolutions(Seq(7)).useCompaction(false)
        .addAggregatedColumn("v", T.Int64, Agg.Max).build()))
    s.insert(name, frame(cells(bcA) ++ cells(bcB), 2))
    s.insert(name, frame(cells(bcA), 3)) // extra fragmentation in bcA only
    def snapshot(bc: Int) = filesUnder(dataDir(root))
      .filter(_.getPath.contains(s"ph3=$bc"))
      .map(f => (f.getPath, f.lastModified, f.length)).sorted
    val bBefore = snapshot(bcB)
    val aBefore = snapshot(bcA).size
    s.compactFilesWhere(name, col("ph3") === bcA)
    snapshot(bcB) shouldBe bBefore // untouched dir: same paths, mtimes, sizes
    snapshot(bcA).size should be < aBefore
  }
}

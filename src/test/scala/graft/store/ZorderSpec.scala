package graft.store

import java.nio.file.Files

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.SparkTestSession
import graft.h3.H3
import graft.schema._

/** The claims ts33's result-equality oracle cannot check: zorderFiles
  * actually tightens per-file secondary-key ranges, the manifest records
  * them, and scanForValueRange's file selection genuinely prunes. */
class ZorderSpec extends AnyFunSuite with Matchers with SparkTestSession {

  private val name = "zorder_ts"

  /** Many cells in ONE base cell (so everything lands in one ph3 directory
    * — the adversarial case for value pruning: h3-sorted files would each
    * span the whole v domain), v correlated with nothing. */
  private def freshStore(): (CellStore, String) = {
    val root = Files.createTempDirectory("graft_zo_").toString
    val s = CellStore(spark, root)
    val parent = H3.fromParts(20, 5, Seq(0, 0, 0, 0, 0)) // res 5
    val cells = H3.toChildren(H3.toChildren(parent, 6).head, 8)
      .flatMap(c => H3.toChildren(c, 9)) // res-9 cells, single base cell
    val rows = cells.zipWithIndex.map { case (c, i) => Row(c, (i * 37 % 1000).toLong) }
    val input = spark.createDataFrame(
      spark.sparkContext.parallelize(rows.toIndexedSeq, 8),
      StructType(Seq(
        StructField("h3index", LongType, false),
        StructField("v", LongType, false))))
    s.insert(name, input,
      createSchema = Some(CompactedTableSchema.builder(name)
        .h3BaseResolutions(Seq(9))
        .useCompaction(false)
        .addColumn("v", ColumnDef.Simple(GraftDataType.Int64,
          orderKeyPosition = Some(1)))
        .build()))
    (s, root)
  }

  test("zorder + manifest k2 stats prune files for a value-range scan") {
    val (s, _) = freshStore()
    val before = s.scanForResolution(name, 9)
      .select(col("h3index"), col("v")).collect().toSet

    s.zorderFiles(name)
    s.buildManifest(name)

    // result-invisible rewrite
    val after = s.scanForResolution(name, 9)
      .select(col("h3index"), col("v")).collect().toSet
    after shouldBe before

    // a narrow value slice selects strictly fewer files than exist
    val sel = s.selectFilesForValueRange(name, 9, 0L, 49L)
    sel should not be empty
    sel.get.uncoveredFiles shouldBe 0
    sel.get.paths.size should be < sel.get.currentFiles
    // and the pruned scan returns exactly the filtered rows
    val got = s.scanForValueRange(name, 9, 0L, 49L)
      .select(col("h3index"), col("v")).collect().toSet
    got shouldBe before.filter(r => r.getLong(1) <= 49L)
  }

  test("per-file v-ranges are tighter after zorder than after plain write") {
    val (s, _) = freshStore()
    def avgWidth(): Double = {
      val files = s.scanForResolution(name, 9)
        .select(input_file_name().as("f"), col("v"))
        .groupBy(col("f")).agg((max(col("v")) - min(col("v"))).as("w"))
        .collect().map(_.getLong(1))
      files.sum.toDouble / files.length
    }
    val widthBefore = avgWidth()
    s.zorderFiles(name)
    val widthAfter = avgWidth()
    // Z-clustering must cut the average per-file v-span materially —
    // h3-sorted files each span nearly the full 0..999 domain
    widthAfter should be < widthBefore * 0.6
  }

  test("zorderFiles refuses a schema without a secondary ORDER BY column") {
    val root = Files.createTempDirectory("graft_zo2_").toString
    val s = CellStore(spark, root)
    val cells = H3.toChildren(H3.fromParts(20, 5, Seq(0, 0, 0, 0, 0)), 7)
    val input = spark.createDataFrame(
      spark.sparkContext.parallelize(cells.map(Row(_)).toIndexedSeq, 2),
      StructType(Seq(StructField("h3index", LongType, false))))
    s.insert("zo_nok2", input,
      createSchema = Some(CompactedTableSchema.builder("zo_nok2")
        .h3BaseResolutions(Seq(7)).useCompaction(false).build()))
    an[IllegalArgumentException] should be thrownBy s.zorderFiles("zo_nok2")
    an[IllegalArgumentException] should be thrownBy
      s.scanForValueRange("zo_nok2", 7, 0L, 1L)
  }
}

package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.SparkTestSession
import graft.h3.H3
import graft.schema.{AggregationMethod => Agg, GraftDataType => T, _}
import graft.store.CellStore

/** tailTableset: the store's append-only layout IS a file stream source —
  * consumers see each insert exactly once per checkpoint, resolution
  * filtering prunes at the partition level. */
class TailTablesetSpec extends AnyFunSuite with Matchers with SparkTestSession {

  private val name = "tail_ts"

  private def frame(cells: Seq[Long], v: Long) = {
    val rows = cells.map(c => Row(c, v))
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows.toIndexedSeq, 2),
      StructType(Seq(
        StructField("h3index", LongType, false),
        StructField("v", LongType, false))))
  }

  private def drain(store: CellStore, ckpt: String): Long = {
    // foreachBatch (not the memory sink): the only test sink that supports
    // RESUMING from a checkpoint, which is the property under test
    val seen = new java.util.concurrent.atomic.AtomicLong()
    val q = StreamOps.tailTableset(store, name, targetRes = 7)
      .writeStream
      .option("checkpointLocation", ckpt)
      .outputMode("append")
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
        seen.addAndGet(b.count()); ()
      }
      .start()
    q.awaitTermination()
    seen.get()
  }

  test("each insert surfaces exactly once per consumer checkpoint") {
    val root = Files.createTempDirectory("graft_tail_").toString
    val ckpt = Files.createTempDirectory("graft_tail_ckpt_").toString
    val s = CellStore(spark, root)
    val cells = H3.toChildren(H3.fromParts(20, 5, Seq(0, 0, 0, 0, 0)), 7).toSeq
    s.insert(name, frame(cells, 1),
      createSchema = Some(CompactedTableSchema.builder(name)
        .h3BaseResolutions(Seq(5, 7)).useCompaction(false)
        .addAggregatedColumn("v", T.Int64, Agg.Max).build()))
    drain(s, ckpt) shouldBe 49 // res-7 base rows only, not res-5
    s.insert(name, frame(cells.take(10), 2))
    // a resumed consumer sees ONLY the new insert's res-7 rows
    drain(s, ckpt) shouldBe 10
    // nothing new -> empty drain
    drain(s, ckpt) shouldBe 0
    // a fresh consumer (fresh checkpoint) replays everything
    val ckpt2 = Files.createTempDirectory("graft_tail_ckpt2_").toString
    drain(s, ckpt2) shouldBe 59
  }

  test("resolution filter tails the rollup, not the base data") {
    val root = Files.createTempDirectory("graft_tail5_").toString
    val ckpt = Files.createTempDirectory("graft_tail5_ckpt_").toString
    val s = CellStore(spark, root)
    val cells = H3.toChildren(H3.fromParts(20, 5, Seq(0, 0, 0, 0, 0)), 7).toSeq
    s.insert(name, frame(cells, 1),
      createSchema = Some(CompactedTableSchema.builder(name)
        .h3BaseResolutions(Seq(5, 7)).useCompaction(false)
        .addAggregatedColumn("v", T.Int64, Agg.Max).build()))
    spark.catalog.dropTempView("tail_r5")
    val q = StreamOps.tailTableset(s, name, targetRes = 5)
      .writeStream.format("memory").queryName("tail_r5")
      .option("checkpointLocation", ckpt)
      .outputMode("append")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    // one res-5 rollup row (the single res-5 ancestor of all 49 cells)
    spark.table("tail_r5").count() shouldBe 1
  }
}

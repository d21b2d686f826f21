package graft.streaming

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.SparkTestSession

/** The s20 store-consult device: per-batch reads of a maintained keyed
  * parquet store must (a) be EXACT — Bloom pruning has no false negatives
  * and the broadcast-candidate join removes every false positive — and
  * (b) plan with NO shuffle Exchange over the store (the r9 verdict's
  * quadratic-ingest finding: a full-store shuffle per micro-batch). */
class MaintainedStoreSpec extends AnyFunSuite with Matchers with SparkTestSession {

  private lazy val storeDir: String = {
    import spark.implicits._
    val dir = graft.util.TempDirs.create("graft_mstore_spec_")
    // 2000 string keys; k0000..k1999
    (0 until 2000).map(i => f"k$i%04d").toDF("sha")
      .write.mode("overwrite").parquet(s"$dir/sha")
    // composite-key store (band, bh, doc_id)
    (0 until 2000).map(i => (i % 2, (i / 2).toLong, i.toLong))
      .toDF("band", "bh", "doc_id")
      .write.mode("overwrite").parquet(s"$dir/band")
    dir
  }

  test("candidatesByString: exact anti-join under FORCED false positives") {
    import spark.implicits._
    // batch: 10 keys present in the store, 10 absent
    val batch = ((0 until 10).map(i => f"k$i%04d") ++
      (0 until 10).map(i => s"absent_$i")).toDF("sha").localCheckpoint()
    // fpp 0.5 over a 2000-row store forces many Bloom false positives, so
    // this pins that the candidate set is a PREfilter, not the verdict
    val cand = MaintainedStore.candidatesByString(
      spark, s"$storeDir/sha", batch, "sha", fpp = 0.5)
    val candKeys = cand.collect().map(_.getString(0)).toSet
    // no false negatives: every true match survives the Bloom
    (0 until 10).map(i => f"k$i%04d").foreach(k => candKeys should contain(k))
    // the exact join over candidates == the exact join over the full store
    val viaDevice = batch.join(broadcast(cand), Seq("sha"), "left_anti")
      .collect().map(_.getString(0)).toSet
    val viaFull = batch.join(spark.read.parquet(s"$storeDir/sha"),
      Seq("sha"), "left_anti").collect().map(_.getString(0)).toSet
    viaDevice shouldBe viaFull
    viaDevice shouldBe (0 until 10).map(i => s"absent_$i").toSet
  }

  test("candidatesByLong: composite (band, bh) key folded into one long") {
    import spark.implicits._
    val P = graft.text.TextOps.P
    // batch bands: 5 (band,bh) pairs present, 5 absent
    val batch = ((0 until 5).map(i => (i % 2, (i / 2).toLong)) ++
      (0 until 5).map(i => (i % 2, 900000L + i)))
      .toDF("band", "bh").localCheckpoint()
    val key = col("band").cast("long") * lit(P) + col("bh")
    val cand = MaintainedStore.candidatesByLong(
      spark, s"$storeDir/band", batch.select(key.as("k")), "k", key)
    val hit = batch.join(broadcast(cand.select(col("band"), col("bh"))),
      Seq("band", "bh")).select(col("band"), col("bh"))
      .collect().map(r => (r.getInt(0), r.getLong(1))).toSet
    hit shouldBe (0 until 5).map(i => (i % 2, (i / 2).toLong)).toSet
  }

  test("empty batch short-circuits: no Bloom build, empty candidates, exact joins hold") {
    import spark.implicits._
    // upstream filters can legitimately empty a micro-batch once batch
    // counts scale with arrivals; stat.bloomFilter NPEs on zero rows
    // (found by the scaled-batch s20 decade run at 100x/27 parts)
    val emptyS = Seq.empty[String].toDF("sha").localCheckpoint()
    val candS = MaintainedStore.candidatesByString(
      spark, s"$storeDir/sha", emptyS, "sha")
    candS.count() shouldBe 0L
    emptyS.join(broadcast(candS), Seq("sha"), "left_anti").count() shouldBe 0L
    val P = graft.text.TextOps.P
    val key = col("band").cast("long") * lit(P) + col("bh")
    val emptyL = Seq.empty[(Int, Long)].toDF("band", "bh").localCheckpoint()
    val candL = MaintainedStore.candidatesByLong(
      spark, s"$storeDir/band", emptyL.select(key.as("k")), "k", key)
    candL.count() shouldBe 0L
  }

  test("plan audit: no shuffle Exchange anywhere in the per-batch consult") {
    import spark.implicits._
    val batch = (0 until 50).map(i => f"k$i%04d").toDF("sha").localCheckpoint()
    val cand = MaintainedStore.candidatesByString(
      spark, s"$storeDir/sha", batch, "sha")
    val join = batch.join(broadcast(cand), Seq("sha"), "left_anti")
    join.collect() // execute so AQE finalizes the physical plan
    val plan = join.queryExecution.executedPlan.toString
    // the ONLY exchange is the broadcast of the pruned candidates; the
    // store scan feeds a Filter, never a hash-partitioned shuffle
    plan should not include "Exchange hashpartitioning"
    plan should include("BroadcastHashJoin")
    // and the Bloom predicate sits in the scan stage (a Filter over the
    // store's FileScan, visible as the UDF filter in the plan)
    plan.toLowerCase should include("filter")
  }
}

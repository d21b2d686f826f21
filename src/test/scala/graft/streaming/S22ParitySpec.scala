package graft.streaming

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.{PipelineQueries, SparkTestSession}

/** The keyed-streaming-state dedup backend (s22,
  * [[graft.streaming.KeyedDedup]]) must produce verdicts IDENTICAL to the
  * maintained-parquet-store backend (s21) on the same staged arrivals —
  * the selectable-backend contract: parquet is the default (replayable,
  * takedown-capable), keyed state the flat-per-batch-cost scale path, and
  * a deployment must be able to switch without a semantic diff. Pinned at
  * two batch compositions (the %parts arrival key changes who wins), so
  * the agreement is not an artifact of one chunking. */
class S22ParitySpec extends AnyFunSuite with Matchers with SparkTestSession {

  private val dir = "/root/testdata/sf0.001"

  private def verdicts(df: org.apache.spark.sql.DataFrame): Seq[(Long, Boolean)] =
    df.orderBy(col("doc_id")).collect().toSeq
      .map(r => (r.getLong(0), r.getBoolean(1)))

  test("keyed-state backend == parquet-store backend, parts = 3 (the gate)") {
    val keyed = verdicts(PipelineQueries.streamAudioDedupKeyed(spark, dir, 3))
    val store = verdicts(PipelineQueries.streamAudioDedup(spark, dir, 3)._1)
    keyed should not be empty
    keyed shouldBe store
    keyed.exists(_._2) shouldBe true  // planted copies guarantee duplicates
    keyed.exists(!_._2) shouldBe true // and survivors
  }

  test("keyed-state backend == parquet-store backend, parts = 4 (duplicate-heavy)") {
    val keyed = verdicts(PipelineQueries.streamAudioDedupKeyed(spark, dir, 4))
    val store = verdicts(PipelineQueries.streamAudioDedup(spark, dir, 4)._1)
    keyed shouldBe store
  }

  test("migration (s23): store-seeded keyed state == independent derivation") {
    // the migrated stream (seeded from the parquet store, then chunk 2 in
    // TWO micro-batches keyed on doc_id % 2) must reproduce the
    // first-arrival-wins verdicts an independent derivation states: a
    // chunk-2 doc is a duplicate iff its signature is STORED (some
    // chunk-0/1 holder — the seed) or a chunk-2 holder with a smaller
    // post-migration arrival key (doc_id % 2, doc_id) exists — the
    // contract that lets a deployment switch backends mid-stream without
    // re-ingesting
    val migrated = verdicts(PipelineQueries.s23StreamDedupMigrated(spark, dir))
    val sigs = graft.multimodal.Multimodal.audioSignatures(
        graft.multimodal.Multimodal.synthesizeAudioTable(
          spark.read.parquet(s"$dir/documents.parquet").select(col("doc_id"))),
        "content")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    val chunk2 = sigs.keySet.filter(_ % 3 == 2)
    def akey(d: Long): (Long, Long) = (d % 2, d)
    val expected = chunk2.toSeq.sorted.map { d =>
      val s = sigs(d)
      val stored = sigs.exists { case (o, os) => o % 3 != 2 && os == s }
      val earlier = chunk2.exists(o =>
        o != d && sigs(o) == s && Ordering[(Long, Long)].lt(akey(o), akey(d)))
      (d, stored || earlier)
    }
    migrated should not be empty
    migrated shouldBe expected
    // the seed matters: at least one chunk-2 doc is flagged ONLY because
    // its signature sits in the migrated store (no earlier-keyed chunk-2
    // doc shares it) — delete-the-seed would flip it, so the parity above
    // genuinely exercises handleInitialState
    val flagged = migrated.filter(_._2).map(_._1).toSet
    val onlyViaSeed = flagged.filter { d =>
      !chunk2.exists(o => o != d && sigs(o) == sigs(d) &&
        Ordering[(Long, Long)].lt(akey(o), akey(d)))
    }
    onlyViaSeed should not be empty
  }

  test("post-migration batches COMPOSE: a later-batch duplicate of an " +
      "earlier post-migration first-arrival is flagged") {
    // the migration scenario's selling point is per-batch cost O(batch)
    // from the first post-migration batch, PLURAL — which requires state
    // written by post-migration batch 1 to unify with the SEEDED state
    // when batch 2 consults it. The gate's fixture may or may not carry a
    // same-signature pair inside chunk 2, so this pins the property on a
    // constructed stream: seed holds only Y; batch 1 delivers X (new) and
    // Y (seeded dup); batch 2 re-delivers X — which is a duplicate ONLY
    // if batch 1's state write composed with the seed's
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.streaming.{OutputMode, TimeMode}
    val ss = spark.newSession()
    ss.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    import ss.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = ss.sqlContext
    val input = MemoryStream[KeyedDedup.SigArrival]
    val initState = ss.createDataset(Seq(((7L, 7L), true)))
      .groupByKey(_._1).mapValues(_._2)
    val out = input.toDS()
      .groupByKey(r => (r.asig_hi, r.asig_lo))
      .transformWithState(new KeyedDedup.FirstArrivalBySigMigrated,
        TimeMode.None(), OutputMode.Update(), initState)
    val ckpt = graft.util.TempDirs.create("graft_s23_compose_ckpt_")
    val q = out.toDF().writeStream
      .option("checkpointLocation", ckpt)
      .outputMode("update").format("memory").queryName("s23_compose").start()
    input.addData(KeyedDedup.SigArrival(100L, 1L, 1L),
      KeyedDedup.SigArrival(101L, 7L, 7L))
    q.processAllAvailable()
    input.addData(KeyedDedup.SigArrival(200L, 1L, 1L))
    q.processAllAvailable()
    val got = ss.table("s23_compose").collect()
      .map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    q.stop()
    got shouldBe Map(
      100L -> false, // first post-migration arrival of X: admitted
      101L -> true,  // seeded signature: flagged via handleInitialState
      200L -> true)  // batch-2 re-arrival of X: flagged via BATCH-1 state
  }
}

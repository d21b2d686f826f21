package graft.streaming

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.{PipelineQueries, SparkTestSession}

/** Takedown/content-removal on the keyed dedup backend (s24,
  * [[KeyedDedup.FirstArrivalWithTakedown]]): a tombstone event clears the
  * signature's keyed state, so the NEXT arrival of that signature is
  * admitted as a first-arrival — the same observable semantics the
  * parquet-store path gives when an operator deletes the signature's row
  * (s15/s17 delete-capture): the next consult finds nothing, the arrival
  * is admitted and re-stored. Without a removal path the keyed backend is
  * unusable for any corpus subject to content-removal requests (round-11
  * verdict Next #4). */
class S24TakedownSpec extends AnyFunSuite with Matchers with SparkTestSession {

  private val dir = "/root/testdata/sf0.001"

  test("s24 gate == independent event-order state machine; takedown flips verdicts") {
    val got = PipelineQueries.s24StreamDedupTakedown(spark, dir)
      .collect().toSeq.map(r => (r.getLong(0), r.getBoolean(1)))
    // independent derivation: replay the event lattice (arrival at
    // eid = 2·doc, tombstone at eid = 2·doc + 1 for doc % 8 == 0) in
    // stream order (eid % 3, eid) through a per-signature seen-set — the
    // shared contract of BOTH backends: tombstone == delete the
    // signature from the store/state, next arrival admitted
    val sigs = graft.multimodal.Multimodal.audioSignatures(
        graft.multimodal.Multimodal.synthesizeAudioTable(
          spark.read.parquet(s"$dir/documents.parquet").select(col("doc_id"))),
        "content")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    case class Ev(eid: Long, doc: Long, takedown: Boolean)
    val evs = (sigs.keys.map(d => Ev(d * 2, d, takedown = false)) ++
        sigs.keys.filter(_ % 8 == 0).map(d => Ev(d * 2 + 1, d, takedown = true)))
      .toSeq.sortBy(e => (e.eid % 3, e.eid))
    def replay(withTombstones: Boolean): Seq[(Long, Boolean)] = {
      var seen = Set.empty[(Long, Long)]
      val out = Seq.newBuilder[(Long, Boolean)]
      evs.foreach { e =>
        val s = sigs(e.doc)
        if (e.takedown) { if (withTombstones) seen -= s }
        else { out += ((e.doc, seen(s))); seen += s }
      }
      out.result().sortBy(_._1)
    }
    got should not be empty
    got shouldBe replay(withTombstones = true)
    // the tombstones are LOAD-BEARING: at least one arrival is admitted
    // only because a takedown cleared its signature first (it would be a
    // duplicate in the tombstone-free replay), so the parity above is not
    // vacuous — and the stream still flags genuine duplicates
    val without = replay(withTombstones = false).toMap
    val readmitted = got.filter { case (d, dup) => !dup && without(d) }
    readmitted should not be empty
    got.exists(_._2) shouldBe true
  }

  test("constructed stream: takedown clears state across AND within batches") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.streaming.{OutputMode, TimeMode}
    val ss = spark.newSession()
    ss.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    import ss.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = ss.sqlContext
    val input = MemoryStream[KeyedDedup.SigEvent]
    val out = input.toDS()
      .groupByKey(r => (r.asig_hi, r.asig_lo))
      .transformWithState(new KeyedDedup.FirstArrivalWithTakedown,
        TimeMode.None(), OutputMode.Update())
    val ckpt = graft.util.TempDirs.create("graft_s24_ckpt_spec_")
    val q = out.toDF().writeStream
      .option("checkpointLocation", ckpt)
      .outputMode("update").format("memory").queryName("s24_machine").start()
    def ev(eid: Long, doc: Long, td: Boolean) =
      KeyedDedup.SigEvent(eid, doc, 5L, 5L, td)
    // batch 1: first arrival admitted, same-batch re-arrival flagged
    input.addData(ev(0, 10, td = false), ev(1, 11, td = false))
    q.processAllAvailable()
    // batch 2: a WITHIN-batch [re-arrival, tombstone, re-arrival] — event
    // order (eid) must resolve it: 20 is a dup (state held), the
    // tombstone clears, 21 is re-admitted
    input.addData(ev(2, 20, td = false), ev(3, -1, td = true),
      ev(4, 21, td = false))
    q.processAllAvailable()
    // batch 3: state written by batch 2's re-admission persists — dup
    input.addData(ev(5, 30, td = false))
    q.processAllAvailable()
    val got = ss.table("s24_machine").collect()
      .map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    q.stop()
    got shouldBe Map(
      10L -> false, 11L -> true, // first-arrival-wins baseline
      20L -> true,               // pre-tombstone re-arrival: still a dup
      21L -> false,              // post-tombstone: admitted (re-stored)
      30L -> true)               // the re-store is real keyed state again
  }
}

package graft.streaming

import java.util.concurrent.atomic.{AtomicBoolean, AtomicReference}

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.SparkTestSession
import graft.schema.{AggregationMethod => Agg, GraftDataType => T, CompactedTableSchema}

/** Streaming ingest SOAKED with interleaved delete mutations (r5 advice #7):
  *
  *  - a mutator THREAD fires lightweight `deleteWhere` (commit-lock
  *    protected, O(metadata)) continuously while micro-batches insert —
  *    genuine cross-thread concurrency on the store's commit path;
  *  - the per-batch hook interleaves `applyDeletes` materializations and
  *    snapshot vacuums ON the streaming thread, serialized with inserts —
  *    the documented same-JVM contract for rewrites;
  *  - after termination one final `deleteWhere` captures everything, making
  *    the end state deterministic regardless of which rows each concurrent
  *    delete happened to capture: live = per-wave-distinct rows with
  *    v % 5 != 0 (cross-wave duplicates persist — dedup is per insert).
  *
  * Both the merge-on-read state and the fully materialized state must equal
  * that batch oracle, and the mutator thread must complete exception-free.
  *
  * Reference: the ClickHouse backend runs lightweight DELETEs concurrently
  * with inserts under the same table mutation log
  * (`crates/ukis_h3cellstore/src/clickhouse/mod.rs` query exec over a live
  * table); this pins the analogous contract for the Spark store. */
class StreamDeleteSoakSpec extends AnyFunSuite with Matchers with SparkTestSession {

  test("soak: concurrent deleteWhere + interleaved applyDeletes/vacuum during ingest converge to the batch oracle") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val root = java.nio.file.Files.createTempDirectory("graft_soak_root_").toString
    val ckpt = java.nio.file.Files.createTempDirectory("graft_soak_ckpt_").toString
    val store = graft.store.CellStore(spark, root)
    val name = "soak_del"
    val schema = CompactedTableSchema.builder(name)
      .h3BaseResolutions(Seq(9))
      .useCompaction(false)
      .addAggregatedColumn("v", T.Int64, Agg.Max)
      .build()

    val cells = graft.h3.H3.toChildren(
      graft.h3.H3.fromParts(20, 5, Seq(0, 0, 0, 0, 0)), 9).take(60).toSeq
    // 5 overlapping waves of 40 rows: wave w covers cells [w*5, w*5+40)
    def wave(w: Int): Seq[(Long, Long)] =
      (0 until 40).map(i => (cells(w * 5 + i), ((w * 5 + i) % 17).toLong))

    val stream = MemoryStream[(Long, Long)]
    val mutatorError = new AtomicReference[Throwable](null)
    val stop = new AtomicBoolean(false)
    val deletesIssued = new java.util.concurrent.atomic.AtomicInteger(0)
    val q = StreamOps.insertStream(
      stream.toDF().toDF("h3index", "v"), store, name, ckpt, Some(schema),
      onBatch = (st, nm, batchId) => {
        // rewrites/vacuums run HERE, serialized with inserts on the
        // streaming thread (the same-JVM contract for materialization)
        if (batchId % 2 == 1) st.applyDeletes(nm)
        if (batchId == 3) st.vacuumSnapshots(nm, keepLast = 2)
      })
    val mutator = new Thread(() => {
      try {
        while (!stop.get()) {
          store.deleteWhere(name, "v % 5 = 0")
          deletesIssued.incrementAndGet()
          Thread.sleep(2)
        }
      } catch { case t: Throwable => mutatorError.set(t) }
    }, "soak-mutator")
    try {
      mutator.start()
      (0 until 5).foreach { w =>
        stream.addData(wave(w): _*)
        q.processAllAvailable()
      }
    } finally {
      stop.set(true)
      mutator.join(30000)
      q.stop()
    }
    mutatorError.get() shouldBe null
    mutator.isAlive shouldBe false
    // the soak must have actually overlapped deletes with the ingest
    deletesIssued.get() should be > 5

    // deterministic closure: one delete that captures EVERYTHING, then the
    // merge-on-read state must equal the batch oracle...
    store.deleteWhere(name, "v % 5 = 0")
    val expected = (0 until 5).flatMap(w => wave(w).distinct)
      .filter(_._2 % 5 != 0).sorted
    def state() = store.scanForResolution(name, 9)
      .select("h3index", "v").as[(Long, Long)].collect().toSeq.sorted
    state() shouldBe expected
    // ...and materializing every accumulated marker must not change it
    store.pendingDeletes(name) should not be empty
    store.applyDeletes(name)
    store.pendingDeletes(name) shouldBe empty
    state() shouldBe expected
  }

  test("streaming arrival AFTER a delete survives the predicate (lightweight-delete capture semantics)") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val root = java.nio.file.Files.createTempDirectory("graft_soak2_root_").toString
    val ckpt = java.nio.file.Files.createTempDirectory("graft_soak2_ckpt_").toString
    val store = graft.store.CellStore(spark, root)
    val name = "soak_capture"
    val schema = CompactedTableSchema.builder(name)
      .h3BaseResolutions(Seq(9))
      .useCompaction(false)
      .addAggregatedColumn("v", T.Int64, Agg.Max)
      .build()
    val cells = graft.h3.H3.toChildren(
      graft.h3.H3.fromParts(20, 5, Seq(0, 0, 0, 0, 0)), 9).take(20).toSeq
    val stream = MemoryStream[(Long, Long)]
    val q = StreamOps.insertStream(
      stream.toDF().toDF("h3index", "v"), store, name, ckpt, Some(schema))
    try {
      stream.addData(cells.take(10).map(c => (c, 4L)): _*)
      q.processAllAvailable()
      store.deleteWhere(name, "v = 4") // captures ONLY the first batch
      stream.addData(cells.drop(10).map(c => (c, 4L)): _*)
      q.processAllAvailable()
    } finally q.stop()
    import spark.implicits._
    val live = store.scanForResolution(name, 9)
      .select("h3index").as[Long].collect().toSet
    // first batch masked, second batch (same predicate value!) live
    live shouldBe cells.drop(10).toSet
    // materialization preserves exactly that
    store.applyDeletes(name)
    store.scanForResolution(name, 9)
      .select("h3index").as[Long].collect().toSet shouldBe cells.drop(10).toSet
  }
}

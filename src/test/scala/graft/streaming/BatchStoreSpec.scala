package graft.streaming

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.SparkTestSession

/** [[BatchStore]]: the per-batch overwrite layout that makes foreachBatch
  * appends idempotent under the engine's at-least-once retry contract.
  * The two properties a retried batch needs, pinned directly:
  * (a) re-running a batch's append REPLACES its failed attempt (no
  * double rows), and (b) a batch's consult ([[BatchStore.readBefore]])
  * never sees that batch's own rows — committed-earlier batches only. */
class BatchStoreSpec extends AnyFunSuite with Matchers with SparkTestSession {

  import spark.implicits._

  private def freshStore(): String = {
    val dir = graft.util.TempDirs.create("graft_batchstore_spec_")
    BatchStore.seed(Seq.empty[Long].toDF("k"), dir)
    dir
  }

  test("seed alone reads as an empty frame with the right schema") {
    val dir = freshStore()
    val before = BatchStore.readBefore(spark, dir, 0L)
    before.columns.toSeq shouldBe Seq("k")
    before.count() shouldBe 0L
    BatchStore.readAll(spark, dir).count() shouldBe 0L
  }

  test("retry overwrites: re-appending a batch replaces, never duplicates") {
    val dir = freshStore()
    BatchStore.append(Seq(1L, 2L, 3L).toDF("k"), dir, 0L)
    // simulate the RETRY of batch 0 — same logical content, new attempt
    // (a real retry may even write different physical files; the
    // directory swap must still leave exactly one copy)
    BatchStore.append(Seq(1L, 2L, 3L).toDF("k"), dir, 0L)
    BatchStore.readAll(spark, dir).as[Long].collect().sorted shouldBe
      Array(1L, 2L, 3L)
    // a retry that computes a DIFFERENT (corrected) result also replaces
    BatchStore.append(Seq(7L).toDF("k"), dir, 0L)
    BatchStore.readAll(spark, dir).as[Long].collect().sorted shouldBe Array(7L)
  }

  test("readBefore scopes to committed batches: own partial rows invisible") {
    val dir = freshStore()
    BatchStore.append(Seq(10L).toDF("k"), dir, 0L)
    BatchStore.append(Seq(20L).toDF("k"), dir, 1L)
    // batch 2 is MID-FLIGHT: its failed first attempt left partial rows
    BatchStore.append(Seq(99L).toDF("k"), dir, 2L)
    // the retry of batch 2 consults readBefore(2): sees 0 and 1, NOT 99 —
    // the dedup-store property (a retry seeing its own append would flag
    // every first-arrival in the batch as a duplicate, round-10 ADVICE)
    BatchStore.readBefore(spark, dir, 2L).as[Long].collect().sorted shouldBe
      Array(10L, 20L)
    // batch 0's retry sees only the seed
    BatchStore.readBefore(spark, dir, 0L).count() shouldBe 0L
    // after the stream terminates, readAll sees everything
    BatchStore.readAll(spark, dir).as[Long].collect().sorted shouldBe
      Array(10L, 20L, 99L)
  }

  test("fold invariance: readBefore/readAll identical across a fold") {
    val dir = freshStore()
    (0L to 5L).foreach(b => BatchStore.append(Seq(b * 10, b * 10 + 1).toDF("k"), dir, b))
    val before4 = BatchStore.readBefore(spark, dir, 4L).as[Long].collect().sorted
    val all = BatchStore.readAll(spark, dir).as[Long].collect().sorted
    BatchStore.fold(spark, dir, 4L) shouldBe true
    // the folded prefix now lives in checkpoint-4; views are unchanged
    BatchStore.readBefore(spark, dir, 4L).as[Long].collect().sorted shouldBe before4
    BatchStore.readBefore(spark, dir, 5L).as[Long].collect().sorted shouldBe
      (before4 ++ Array(40L, 41L)).sorted
    BatchStore.readAll(spark, dir).as[Long].collect().sorted shouldBe all
    // the folded batch directories are gone — the consult plans O(1) +
    // batches-since-fold paths, the bounded-manifest contract
    val names = new java.io.File(dir).listFiles().map(_.getName).toSet
    names should contain("checkpoint-4")
    names.count(_.startsWith("batch-")) shouldBe 2 // batch-4, batch-5
    // appends continue past the fold; a second fold subsumes the first
    BatchStore.append(Seq(60L).toDF("k"), dir, 6L)
    BatchStore.fold(spark, dir, 6L) shouldBe true
    BatchStore.readAll(spark, dir).as[Long].collect().sorted shouldBe
      (all ++ Array(60L)).sorted
    new java.io.File(dir).listFiles().map(_.getName).toSet should not contain "checkpoint-4"
  }

  test("fold is retry-idempotent and loud on a consult behind the bound") {
    val dir = freshStore()
    (0L to 2L).foreach(b => BatchStore.append(Seq(b).toDF("k"), dir, b))
    BatchStore.fold(spark, dir, 2L) shouldBe true
    // the RETRY of batch 2 re-runs its fold: bound already at 2 -> no-op,
    // and its consult still sees exactly batches 0 and 1
    BatchStore.fold(spark, dir, 2L) shouldBe false
    BatchStore.readBefore(spark, dir, 2L).as[Long].collect().sorted shouldBe
      Array(0L, 1L)
    // a consult for a batch BEHIND the fold bound is a contract violation
    // (folds only run from the batch they fold up to) — loud, not silent
    val e = intercept[RuntimeException](BatchStore.readBefore(spark, dir, 1L))
    e.getMessage should include("behind the fold bound")
  }

  test("stray non-layout entries are loudly rejected, dot-hidden ignored") {
    val dir = freshStore()
    BatchStore.append(Seq(1L).toDF("k"), dir, 0L)
    // a crashed fold's temp dir is dot-hidden -> invisible to readers
    new java.io.File(dir, ".fold-7").mkdir()
    BatchStore.readAll(spark, dir).as[Long].collect() shouldBe Array(1L)
    // anything else means a writer outside the layout contract: refuse
    // rather than guess (or crash with a bare NumberFormatException)
    new java.io.File(dir, "batch-3_tmp").mkdir()
    val e = intercept[RuntimeException](BatchStore.readAll(spark, dir))
    e.getMessage should include("unrecognized entry")
  }

  test("MaintainedStore consult composes with a readBefore store view") {
    val dir = freshStore()
    BatchStore.append((1L to 100L).toDF("k"), dir, 0L)
    BatchStore.append((101L to 200L).toDF("k"), dir, 1L)
    val batchKeys = Seq(50L, 150L, 999L).toDF("k").localCheckpoint()
    val store = BatchStore.readBefore(spark, dir, 1L) // batch 1's view
    val cand = MaintainedStore.candidatesByLong(
      store, batchKeys, "k", col("k"), MaintainedStore.DefaultFpp)
    val hits = batchKeys.join(broadcast(cand), Seq("k")).as[Long].collect()
    // 50 committed before batch 1 -> hit; 150 is batch 1's OWN append ->
    // invisible; 999 never stored
    hits.sorted shouldBe Array(50L)
  }
}

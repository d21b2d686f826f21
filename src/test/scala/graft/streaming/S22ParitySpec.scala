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

  test("migration (s23): store-seeded keyed state == the never-migrated funnel") {
    // the never-migrated parquet funnel's verdicts for the post-migration
    // arrivals (chunk 2) must be REPRODUCED by the keyed stream that was
    // seeded from the store and never saw chunks 0/1 — the contract that
    // lets a deployment switch backends mid-stream without re-ingesting
    val migrated = verdicts(PipelineQueries.s23StreamDedupMigrated(spark, dir))
    val full = verdicts(PipelineQueries.streamAudioDedup(spark, dir, 3)._1)
      .filter(_._1 % 3 == 2)
    migrated should not be empty
    migrated shouldBe full
    // the seed matters: at least one chunk-2 doc is flagged ONLY because
    // its signature sits in the migrated store (no smaller chunk-2 doc
    // shares it) — delete-the-seed would flip it, so the parity above
    // genuinely exercises handleInitialState
    val sigs = graft.multimodal.Multimodal.audioSignatures(
        graft.multimodal.Multimodal.synthesizeAudioTable(
          spark.read.parquet(s"$dir/documents.parquet").select(col("doc_id"))),
        "content")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    val flagged = migrated.filter(_._2).map(_._1).toSet
    val onlyViaSeed = flagged.filter { d =>
      !sigs.exists { case (o, s) => o % 3 == 2 && o < d && s == sigs(d) }
    }
    onlyViaSeed should not be empty
  }
}

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
}

package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.{PipelineQueries, SparkTestSession}

/** s21 (streaming multimodal ingest dedup): the stream's
  * first-arrival-wins verdicts must equal an independent batch
  * derivation — min arrival key (chunk, doc_id) per FULL 64-bit decoded
  * signature, flag everyone above the minimum — because min over the
  * struct key is associative (the s9 rationale applied to m8's audio
  * signature chain; full-signature keys rather than 16-bit bands are the
  * scale design — see the s21 scaladoc). */
class S21ParitySpec extends AnyFunSuite with Matchers with SparkTestSession {

  private val dir = "/root/testdata/sf0.001"

  /** The verdicts as ONE batch expression over the decoded signatures,
    * under the (doc_id % parts, doc_id) arrival key. */
  private def batchDerivation(parts: Int = 3): DataFrame = {
    val d = spark.read.parquet(s"$dir/documents.parquet")
    val sigs = graft.multimodal.Multimodal.audioSignatures(
      graft.multimodal.Multimodal.synthesizeAudioTable(d.select(col("doc_id"))),
      "content")
    val akey = struct(pmod(col("doc_id"), lit(parts)).as("c"), col("doc_id").as("i"))
    val keyed = sigs.withColumn("akey", akey)
    val mins = keyed.groupBy(col("asig_hi"), col("asig_lo"))
      .agg(min(col("akey")).as("mkey"))
    val flagged = keyed.join(mins, Seq("asig_hi", "asig_lo"))
      .where(col("mkey") < col("akey"))
      .select(col("doc_id"))
    d.select(col("doc_id"))
      .join(flagged.withColumn("f", lit(true)), Seq("doc_id"), "left")
      .select(col("doc_id"), coalesce(col("f"), lit(false)).as("is_dup"))
      .orderBy(col("doc_id"))
  }

  test("s21 stream verdicts == independent batch min-per-signature derivation") {
    val stream = PipelineQueries.s21StreamAudioDedup(spark, dir)
      .collect().map(r => (r.getLong(0), r.getBoolean(1)))
    val batch = batchDerivation()
      .collect().map(r => (r.getLong(0), r.getBoolean(1)))
    stream should not be empty
    stream shouldBe batch
    // the planted audio copies guarantee positive verdicts: copies 0 and
    // 1 of each group of four are byte-identical WAVs (identical
    // signatures), so whichever of the pair arrives LATER (arrival key =
    // (doc_id % 3, doc_id) — first-arrival-wins, not smallest-id-wins)
    // must be flagged
    val flags = stream.toMap
    def akey(id: Long): (Long, Long) = (id % 3, id)
    stream.map(_._1).filter(id => id % 4 == 0 && flags.contains(id + 1))
      .foreach { g =>
        val later = if (Ordering[(Long, Long)].lt(akey(g), akey(g + 1))) g + 1 else g
        withClue(s"group ${g / 4} later copy $later: ") { flags(later) shouldBe true }
      }
    // and at least one survivor exists
    stream.exists(!_._2) shouldBe true
  }

  test("s21 store grows with distinct CONTENT, not arrivals (duplicate-heavy stream)") {
    // parts = 4 makes the stream duplicate-HEAVY across batches by
    // construction: audio copies 0/1 of every group of four are
    // byte-identical WAVs (identical signatures) and land in chunks 0 and
    // 1 (chunk = doc_id % 4), so batch 1 re-delivers hundreds of
    // signatures batch 0 already stored — exactly the workload whose
    // re-appends the round-10 verdict flagged (store rows grew with
    // per-batch distinct arrivals; worst case linear in batch count)
    val (out, storeDir) = PipelineQueries.streamAudioDedup(spark, dir, 4)
    // verdict parity first (the %4 arrival key changes who wins)
    out.orderBy(col("doc_id")).collect().map(r => (r.getLong(0), r.getBoolean(1))) shouldBe
      batchDerivation(4).collect().map(r => (r.getLong(0), r.getBoolean(1)))
    // THE scale contract: store rows == distinct signatures SEEN, exactly
    val stored = BatchStore.readAll(spark, storeDir)
    val nStored = stored.count()
    val nDistinctStored = stored.distinct().count()
    val nDistinctCorpus = graft.multimodal.Multimodal.audioSignatures(
        graft.multimodal.Multimodal.synthesizeAudioTable(
          spark.read.parquet(s"$dir/documents.parquet").select(col("doc_id"))),
        "content")
      .select(col("asig_hi"), col("asig_lo")).distinct().count()
    withClue(s"store rows $nStored vs distinct content $nDistinctCorpus: ") {
      nStored shouldBe nDistinctCorpus
      nDistinctStored shouldBe nStored // no signature stored twice, ever
    }
    // and the stream really was duplicate-heavy: arrivals > distinct sigs
    spark.read.parquet(s"$dir/documents.parquet").count() should be > nDistinctCorpus
  }
}

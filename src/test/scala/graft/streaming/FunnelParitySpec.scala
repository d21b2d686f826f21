package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.{PipelineQueries, SparkTestSession}
import graft.text.TextOps

/** Batch/stream parity for the s20 end-to-end curation funnel: the
  * micro-batched foreachBatch pipeline (decontam -> frozen-model quality
  * -> sha-store exact dedup -> signature-store near-dup) must equal a
  * BATCH DataFrame statement of the same composed semantics — arrival key
  * (doc_id mod 3, doc_id), first-arrival sha survivorship, bucket-min
  * near-dup — computed here independently (third implementation next to
  * the gate and its DuckDB oracle). */
class FunnelParitySpec extends AnyFunSuite with Matchers with SparkTestSession {

  private val dir = "/root/testdata/sf0.001"

  /** The composed funnel as ONE batch DataFrame expression. */
  private def batchFunnel: DataFrame = {
    val d = spark.read.parquet(s"$dir/documents.parquet")
    // stage 1: decontamination — 4-gram overlap with the %23 benchmark
    val grams = d.select(col("doc_id"),
      explode(TextOps.wordGramArray(col("text"), 4)).as("g"))
    val bench = grams.where(pmod(col("doc_id"), lit(23)) === 0)
      .select(col("g")).distinct()
    val contaminated = grams.join(bench, "g").select(col("doc_id")).distinct()
    val p1 = d.join(contaminated, Seq("doc_id"), "left_anti")
    // stage 2: the SAME frozen d33 model the stream serves
    val w = PipelineQueries.d33TrainWeights(spark, dir)
    val p2 = p1.withColumn("quality", PipelineQueries.d33QualityCol(w))
      .where(col("quality") >= 0.5)
      .withColumn("sha", sha2(col("text"), 256))
      .withColumn("akey", // struct ordering: collision-free for any id range
        struct(pmod(col("doc_id"), lit(3)).as("c"), col("doc_id").as("i")))
    // stage 3: first arrival per sha (arrival key = (chunk, doc_id))
    val p3 = p2.withColumn("rn", row_number().over(
        Window.partitionBy(col("sha")).orderBy(col("akey"))))
      .where(col("rn") === 1)
    // stage 4: bucket-min near-dup over the exact survivors
    val bands = p3.select(col("doc_id"), col("akey"), explode(array(
        struct(lit(0).as("band"), TextOps.lshBandHash(col("text"), 0).as("bh")),
        struct(lit(1).as("band"), TextOps.lshBandHash(col("text"), 1).as("bh")))).as("b"))
      .select(col("doc_id"), col("akey"),
        col("b.band").as("band"), col("b.bh").as("bh"))
    val mins = bands.groupBy(col("band"), col("bh"))
      .agg(min(col("akey")).as("mkey"))
    val flagged = bands.join(mins, Seq("band", "bh"))
      .where(col("mkey") < col("akey"))
      .select(col("doc_id")).distinct()
    p3.join(flagged, Seq("doc_id"), "left_anti")
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("num_docs"),
        round(avg(col("n_chars")), 2).as("avg_chars"),
        min(col("quality")).as("min_quality"),
        max(col("quality")).as("max_quality"))
      .orderBy(col("lang"))
  }

  test("s20 stream funnel == composed batch funnel (per-language summary)") {
    val stream = PipelineQueries.s20StreamCurationFunnel(spark, dir)
      .collect().map(_.toString).toSeq
    val batch = batchFunnel.collect().map(_.toString).toSeq
    stream should not be empty
    stream shouldBe batch
  }
}

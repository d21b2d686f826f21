package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Per-batch consult of an append-only keyed parquet STORE without a
 * store-side shuffle — the device that keeps a streaming-maintenance loop's
 * ingest cost from growing a full-store Exchange per micro-batch.
 *
 * The round-9 funnel (s20) read its sha store and signature store in full
 * into each batch's anti-join/join: at gate scale invisible, but with
 * batches proportional to arrivals the per-stream cost is
 * O(batches x store-shuffle) — quadratic in stream lifetime, and the one
 * unpruned scan in an ingest hot loop (round-9 verdict's #1 finding). The
 * fix follows the reference's insert pipeline, which consults only what the
 * batch touches (ukis_h3cellstore `optimize.rs:20-83`'s per-touched-
 * partition dedup):
 *
 *   1. Build a Bloom filter over the BATCH's keys (batch-sized: the batch
 *      frame must be materialized — localCheckpoint — since the count and
 *      the filter are two extra traversals).
 *   2. Scan the store with the Bloom as a map-side predicate: a single-
 *      column, map-only columnar read in which ~(1 - fpp) of non-matching
 *      store rows die inside the scan stage. No store row is ever
 *      shuffled.
 *   3. The survivors — true key matches plus fpp x |store| false
 *      positives, a BATCH-bounded set for any sane fpp — are BROADCAST
 *      into the batch-side join. Bloom filters have no false negatives,
 *      so an anti-join against the candidate set equals an anti-join
 *      against the full store, exactly.
 *
 * What this buys at scale: per batch, store-side work drops from
 * "shuffle/hash-build the whole store" to "stream one column through a
 * codegen'd filter"; the only Exchange left is the broadcast of the
 * candidate rows (default fpp 0.1% -> ~1M candidate rows per 1e9-row
 * store, ~32 MB of sha keys). The scan itself remains O(|store|) I/O per
 * batch — the honest residual; a deployment whose store outgrows even the
 * single-column scan budget moves to keyed streaming state
 * (dropDuplicatesWithinWatermark, the s4 device) or an LSM-style keyed
 * index, trading exact replayable parquet state for point lookups.
 * [[graft.streaming.MaintainedStoreSpec]] audits the plan (no shuffle
 * Exchange over the store scan) and forces a false-positive through the
 * Bloom to pin that the exact join removes it.
 */
object MaintainedStore {

  /** Default false-positive rate: candidates ~ |store|/1000 — broadcast-
    * safe while the store is < ~1e10 rows (document-scale corpora). */
  val DefaultFpp = 0.001

  /** Store rows whose STRING `keyCol` might equal some batch key.
    * `batchKeys` must be small-ish and cheap to re-traverse
    * (localCheckpoint'd): it is counted once and swept once for the Bloom
    * build. Returns a frame safe to `broadcast()` into the exact join.
    *
    * An EMPTY batch short-circuits to an empty candidate frame without
    * touching the store or building a filter: upstream filters (decontam,
    * quality) can legitimately empty a micro-batch once batch counts
    * scale with arrivals, and `DataFrameStatFunctions.bloomFilter` NPEs
    * on zero rows (its aggregate returns a null buffer) — found by the
    * scaled-batch decade run at 100x/27 parts. */
  def candidatesByString(spark: SparkSession, storeDir: String,
      batchKeys: DataFrame, keyCol: String,
      fpp: Double = DefaultFpp): DataFrame = {
    val n = batchKeys.count()
    if (n == 0L) return spark.read.parquet(storeDir).where(lit(false))
    val bf = batchKeys.stat.bloomFilter(keyCol, n, fpp)
    val bc = spark.sparkContext.broadcast(bf)
    val might = udf((s: String) => s != null && bc.value.mightContainString(s))
    spark.read.parquet(storeDir).where(might(col(keyCol)))
  }

  /** Store rows whose LONG key (an arbitrary Column over the store schema,
    * e.g. `band * P + bh` for a composite signature key) might equal some
    * batch key. `batchKeys` carries the same derived key under `keyCol`.
    * Same empty-batch short-circuit as [[candidatesByString]]. */
  def candidatesByLong(spark: SparkSession, storeDir: String,
      batchKeys: DataFrame, keyCol: String, storeKey: Column,
      fpp: Double = DefaultFpp): DataFrame = {
    val n = batchKeys.count()
    if (n == 0L) return spark.read.parquet(storeDir).where(lit(false))
    val bf = batchKeys.stat.bloomFilter(keyCol, n, fpp)
    val bc = spark.sparkContext.broadcast(bf)
    val might = udf((l: Long) => bc.value.mightContainLong(l))
    spark.read.parquet(storeDir).where(might(storeKey))
  }
}

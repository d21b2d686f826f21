package graft.util

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.broadcast

/**
 * Size-gated broadcast: keep the broadcast-hash-join plan while a frame is
 * provably small, and fall back to a plain (shuffle) join — degraded, not
 * dead — once it is not. An UNCONDITIONAL `broadcast()` on a data-derived
 * frame is a driver OOM waiting for the corpus that outgrows it (round-9
 * verdict #3: d36's merged-interval frame and Bpe's vocabulary token
 * counts); the escape hatch belongs in code, not prose.
 *
 * The frame is materialized once (eager localCheckpoint) and counted —
 * both the count and the join then read the checkpointed blocks, so the
 * gate costs one extra cheap job over an already-small-or-shuffling frame,
 * never a recompute of its upstream.
 */
object SizeGate {

  /** Default row ceiling for opting into a broadcast. Sized in BYTES, not
    * vanity rows: the gated frames carry ~40-100 B/row (a word + a count;
    * a doc_id + a few interval structs), so 2M rows is ~100-200 MB of
    * broadcast — the sane driver/executor ceiling. Callers with wider rows
    * pass their own ceiling. */
  val DefaultMaxRows = 2000000L

  /** Materialize `df`, count it, and return it wrapped in `broadcast()` if
    * it holds at most `maxRows` rows — else return it bare (the caller's
    * join shuffles: for the gated frames that is the same keyed-shuffle
    * regime their upstream already pays, merely extended one stage). */
  def broadcastIfSmall(df: DataFrame, maxRows: Long = DefaultMaxRows): DataFrame = {
    val c = df.localCheckpoint()
    if (c.count() <= maxRows) broadcast(c) else c
  }
}

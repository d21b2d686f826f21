package graft.streaming

import org.apache.spark.sql.Encoders
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor,
  StatefulProcessorWithInitialState, TimeMode, TimerValues, TTLConfig,
  ValueState}

/**
 * Keyed-STREAMING-STATE backend for a maintained dedup store — the
 * documented migration path past [[MaintainedStore]]'s honest residual
 * (MaintainedStore's parquet-store consult is Bloom-pruned and broadcast,
 * but the single-column store scan is still O(|store|) I/O per micro-batch,
 * so a stream's lifetime cost is O(batches x store)). Here the "store" IS
 * the streaming engine's keyed state: one ValueState[Boolean] per distinct
 * key, point-looked-up only for the keys the batch actually carries, so
 * per-batch cost is O(batch), flat in |store|. On the RocksDB state store
 * provider (required by transformWithState — the s13 device) the state
 * lives on executor disk with an in-memory cache and is checkpointed
 * incrementally via changelog, which is what bounds executor memory when
 * keyed state at 100 TB no longer fits a HashMap.
 *
 * Trade (why parquet stays the DEFAULT backend, s17's rationale): the
 * parquet store is replayable and takedown-capable — an operator can
 * inspect it, delete a signature (content removal), or rebuild it offline;
 * RocksDB state is opaque to everything but the query that owns it. A
 * deployment picks per stream: parquet while the store fits the per-batch
 * scan budget, keyed state past it.
 *
 * Semantics — FIRST-ARRIVAL-WINS, identical to the parquet-store funnels:
 * a row is a duplicate iff its key was seen in an EARLIER micro-batch
 * (state hit) or a smaller doc_id carries the same key in the SAME batch
 * (transformWithState hands each key's batch rows to one
 * handleInputRows call, so the within-batch min is a local fold — the
 * per-bucket MIN aggregate of the store form, computed for free).
 * S22ParitySpec pins stream ≡ the parquet-store form ≡ the batch min-per-
 * signature derivation on the same staged arrivals.
 */
object KeyedDedup {

  /** One decoded arrival: the 64-bit media signature as two halves. */
  case class SigArrival(doc_id: Long, asig_hi: Long, asig_lo: Long)

  /** The ingest-time verdict, FINAL at emission (never revised). */
  case class Verdict(doc_id: Long, is_dup: Boolean)

  /** First-arrival-wins per 64-bit signature: ValueState[Boolean] "seen".
    * State grows with distinct CONTENT by construction — a key's state is
    * written once, ever (the property the parquet store needed an
    * anti-join append to keep). */
  class FirstArrivalBySig
      extends StatefulProcessor[(Long, Long), SigArrival, Verdict] {
    @transient private var seen: ValueState[Boolean] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      seen = getHandle.getValueState[Boolean]("seen",
        Encoders.scalaBoolean, TTLConfig.NONE)

    override def handleInputRows(key: (Long, Long), rows: Iterator[SigArrival],
        timers: TimerValues): Iterator[Verdict] = {
      val ids = rows.map(_.doc_id).toArray
      val already = seen.exists()
      if (!already) seen.update(true)
      val mn = ids.min
      ids.iterator.map(d => Verdict(d, already || d != mn))
    }
  }

  /** [[FirstArrivalBySig]] with INITIAL state — the backend MIGRATION
    * device: a deployment switching from the parquet store to keyed state
    * seeds each stored signature as an already-seen key on the stream's
    * FIRST batch (Spark feeds the initial-state dataset through
    * [[handleInitialState]] before any input rows), then processes only
    * the remaining arrivals — the already-ingested corpus is never
    * re-decoded or re-streamed, and every verdict matches what the
    * parquet-store funnel would have said (S23 gate + MigrationParitySpec
    * pin it). */
  class FirstArrivalBySigMigrated
      extends StatefulProcessorWithInitialState[(Long, Long), SigArrival,
        Verdict, Boolean] {
    @transient private var seen: ValueState[Boolean] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      seen = getHandle.getValueState[Boolean]("seen",
        Encoders.scalaBoolean, TTLConfig.NONE)

    override def handleInitialState(key: (Long, Long), initial: Boolean,
        timers: TimerValues): Unit =
      if (initial) seen.update(true)

    override def handleInputRows(key: (Long, Long), rows: Iterator[SigArrival],
        timers: TimerValues): Iterator[Verdict] = {
      val ids = rows.map(_.doc_id).toArray
      val already = seen.exists()
      if (!already) seen.update(true)
      val mn = ids.min
      ids.iterator.map(d => Verdict(d, already || d != mn))
    }
  }
}

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
 * parquet store is replayable and inspectable — an operator can audit it
 * or rebuild it offline; RocksDB state is opaque to everything but the
 * query that owns it. Content REMOVAL, the other parquet headline, now has
 * a keyed-state answer too: [[FirstArrivalWithTakedown]] accepts tombstone
 * events on the same stream and `clear()`s the signature's state, so the
 * next arrival of a taken-down signature is admitted as a first-arrival —
 * parity with deleting the signature's row from the parquet store (the
 * s15/s17 delete-capture semantics), without a rebuild. A deployment picks
 * per stream: parquet while the store fits the per-batch scan budget,
 * keyed state past it (ScaleCrossover measures the handoff point).
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

  /** One CONTROL-OR-DATA event for the takedown-capable stream (s24):
    * `takedown = false` is an arrival of document `doc_id` carrying the
    * signature; `takedown = true` is a tombstone for the signature (its
    * `doc_id` names the removal request's subject, used only for event
    * ordering). `eid` totally orders events within a micro-batch —
    * a streaming shuffle does not preserve arrival order per key, so the
    * processor re-sorts each key's batch slice by it. */
  case class SigEvent(eid: Long, doc_id: Long, asig_hi: Long, asig_lo: Long,
      takedown: Boolean)

  /** The ingest-time verdict, FINAL at emission (never revised). */
  case class Verdict(doc_id: Long, is_dup: Boolean)

  /** First-arrival-wins per 64-bit signature: ValueState[Boolean] "seen".
    * State grows with distinct CONTENT by construction — a key's state is
    * written once, ever (the property the parquet store needed an
    * anti-join append to keep).
    *
    * Declared WITH initial-state support so the migration variant shares
    * this exact verdict logic (one definition site — a drifting copy would
    * silently fork the within-batch rule): used WITHOUT an initial state
    * (s22) `handleInitialState` is simply never invoked. */
  class FirstArrivalBySig
      extends StatefulProcessorWithInitialState[(Long, Long), SigArrival,
        Verdict, Boolean] {
    @transient private var seen: ValueState[Boolean] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      seen = getHandle.getValueState[Boolean]("seen",
        Encoders.scalaBoolean, TTLConfig.NONE)

    /** Migration seeding (the s23 device): each stored signature arrives
      * as an already-seen key BEFORE the first input batch. */
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

  /** [[FirstArrivalBySig]] under its backend-MIGRATION name — the s23
    * gate's processor. All logic inherited; the subclass exists so call
    * sites state which scenario they run (a deployment switching from the
    * parquet store to keyed state seeds each stored signature through
    * `handleInitialState`, then processes only the remaining arrivals —
    * the already-ingested corpus is never re-decoded or re-streamed;
    * S23 gate + S22ParitySpec pin verdict parity with the never-migrated
    * funnel). */
  class FirstArrivalBySigMigrated extends FirstArrivalBySig

  /** First-arrival-wins WITH CONTENT-REMOVAL (s24): the same seen-state
    * verdict, plus tombstone events that `clear()` the signature's state
    * mid-stream. Events for a key are processed in `eid` order (the
    * stream's total event order — the shuffle into the stateful operator
    * does not preserve it), so a batch may carry arrival(s), a takedown,
    * and a re-arrival of one signature and still resolve exactly: seen
    * before the tombstone → duplicate; first arrival after it → admitted.
    * Tombstones emit no verdict. Supports initial state for parity with
    * the migrated backend (a takedown-capable deployment that migrated
    * from parquet seeds the same way). */
  class FirstArrivalWithTakedown
      extends StatefulProcessorWithInitialState[(Long, Long), SigEvent,
        Verdict, Boolean] {
    @transient private var seen: ValueState[Boolean] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      seen = getHandle.getValueState[Boolean]("seen",
        Encoders.scalaBoolean, TTLConfig.NONE)

    override def handleInitialState(key: (Long, Long), initial: Boolean,
        timers: TimerValues): Unit =
      if (initial) seen.update(true)

    override def handleInputRows(key: (Long, Long), rows: Iterator[SigEvent],
        timers: TimerValues): Iterator[Verdict] = {
      val evs = rows.toArray.sortBy(_.eid)
      var isSeen = seen.exists()
      val out = Array.newBuilder[Verdict]
      var i = 0
      while (i < evs.length) {
        val e = evs(i)
        if (e.takedown) {
          if (isSeen) { seen.clear(); isSeen = false }
        } else {
          out += Verdict(e.doc_id, isSeen)
          if (!isSeen) { seen.update(true); isSeen = true }
        }
        i += 1
      }
      out.result().iterator
    }
  }
}

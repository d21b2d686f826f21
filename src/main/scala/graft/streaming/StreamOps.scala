package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/**
 * Structured Streaming operators for the events stream.
 *
 * The reference has no true stream processing — its "traversal streaming" is
 * a bounded async pull pipeline (SURVEY §2.9). This module provides the
 * Spark-native streaming surface a training-data pipeline needs on top of
 * that: watermarked event-time windows and stateful sessionization. The same
 * transformations run identically on batch DataFrames (Spark's unified
 * model), which is how the correctness gate exercises them.
 *
 * Scale notes: windowed aggregation state is bounded by the watermark;
 * sessionization state is one small Session object per active (user) key,
 * dropped on timeout. Both shuffle once on the grouping key.
 */
object StreamOps {

  /** Watermarked sliding-window counts/sums per event type. Works on a
    * streaming OR batch events frame with columns (ts, event_type, value). */
  def windowedEventStats(events: DataFrame, windowDuration: String,
      slideDuration: String, watermarkDelay: String): DataFrame = {
    val src = if (events.isStreaming) events.withWatermark("ts", watermarkDelay) else events
    src.groupBy(window(col("ts"), windowDuration, slideDuration), col("event_type"))
      .agg(count(lit(1)).as("num_events"), sum(col("value")).as("total_value"))
      .select(col("window.start").as("window_start"),
        col("window.end").as("window_end"),
        col("event_type"), col("num_events"), col("total_value"))
  }

  /** Gap-based sessionization via Spark's NATIVE `session_window` aggregate —
    * the scale path: sessions merge inside the tungsten hash aggregate (with
    * spill), no per-key in-memory event buffer, and the identical plan runs
    * on batch or streaming input. Prefer this over [[sessionize]] unless the
    * per-session state logic is genuinely custom. A new session starts when
    * an event arrives at or after the previous session's end (last ts + gap).
    * Input columns: (user_id, ts, value). */
  def sessionWindows(events: DataFrame, gap: String): DataFrame =
    events
      .groupBy(col("user_id"), session_window(col("ts"), gap).as("sw"))
      .agg(count(lit(1)).as("num_events"), sum(col("value")).as("total_value"))
      .select(col("user_id"), col("sw.start").as("session_start"),
        col("sw.end").as("session_end"), col("num_events"), col("total_value"))

  /** Streaming exact dedup for continuous document ingestion: drops any row
    * whose sha2-256 text hash was already seen within the watermark horizon.
    * `dropDuplicatesWithinWatermark` expires state-store keys once the
    * watermark passes them, so state is bounded by (arrival rate x horizon)
    * — the production shape for corpus ingestion, where exact GLOBAL dedup
    * would need unbounded state; pair it with a periodic batch optimize
    * (d1 / CellStore.deduplicateWhere) for cross-horizon duplicates. The
    * shuffle key is the 32-byte hash, never the document text (same rule as
    * d1). On a batch frame this degrades to dropDuplicates on the hash
    * (survivor arbitrary — use the d1 min-id shape when determinism
    * matters). Input columns: (ts, text, ...). */
  def dedupStream(docs: DataFrame, watermarkDelay: String): DataFrame = {
    val keyed = docs.withColumn("text_sha", sha2(col("text"), 256))
    if (keyed.isStreaming)
      keyed.withWatermark("ts", watermarkDelay)
        .dropDuplicatesWithinWatermark("text_sha")
    else keyed.dropDuplicates("text_sha")
  }

  /** Watermarked stream-stream interval join (the attribution shape: each
    * left event matches right events with the same key whose timestamp
    * falls in [left.ts, left.ts + horizon]). On streaming inputs BOTH
    * buffers are bounded: the watermarks plus the time-range predicate let
    * Spark expire join state older than watermark + horizon — without the
    * range condition a stream-stream inner join would buffer both sides
    * forever. The identical plan runs on batch frames (unified model),
    * which is how the spec cross-checks results. Column names must be
    * disjoint apart from `key`; the right frame's timestamp column is
    * `rightTs`. */
  /** `joinType`: "inner", "left_outer" or "full_outer". Outer rows (events
    * with no match) are emitted only once the watermark proves no partner
    * can still arrive: an unmatched LEFT row when the watermark passes its
    * horizon (left.ts + horizon), an unmatched RIGHT row when the watermark
    * passes its own timestamp (the range condition bounds candidate left
    * timestamps from below by right.ts - horizon, so a right row is settled
    * as soon as future left events must carry later timestamps than its
    * own). Under full_outer the key column is coalesced across sides — an
    * unmatched right row has no left key to carry. */
  def intervalJoin(left: DataFrame, right: DataFrame, key: String,
      leftTs: String, rightTs: String, horizon: String,
      watermarkDelay: String, joinType: String = "inner"): DataFrame = {
    // loud refusal for join types the key-coalescing select below doesn't
    // handle — e.g. "right_outer" would pass straight through to Spark and
    // then hit the .drop(r.key) branch, leaving NULL keys on unmatched right
    // rows: silently wrong output instead of an error (ADVICE r5)
    require(Set("inner", "left_outer", "full_outer", "full", "outer")
      .contains(joinType),
      s"intervalJoin supports inner/left_outer/full_outer, got '$joinType'")
    val l = (if (left.isStreaming) left.withWatermark(leftTs, watermarkDelay)
             else left).alias("l")
    val r = (if (right.isStreaming) right.withWatermark(rightTs, watermarkDelay)
             else right).alias("r")
    val joined = l.join(r,
      expr(s"l.$key = r.$key") &&
        col(s"r.$rightTs") >= col(s"l.$leftTs") &&
        col(s"r.$rightTs") <= col(s"l.$leftTs") + expr(s"INTERVAL '$horizon'"),
      joinType)
    if (joinType == "full_outer" || joinType == "full" || joinType == "outer") {
      val lCols = left.columns.filterNot(_ == key).map(c => col(s"l.$c"))
      val rCols = right.columns.filterNot(_ == key).map(c => col(s"r.$c"))
      joined.select(coalesce(col(s"l.$key"), col(s"r.$key")).as(key)
        +: (lCols ++ rCols): _*)
    } else joined.drop(col(s"r.$key"))
  }

  /** Continuous tableset ingest: run a streaming H3 DataFrame through the
    * FULL batch insert pipeline per micro-batch — validation, in-batch
    * dedup, compaction, rollup, partitioned append
    * ([[graft.store.CellStore.insert]]) — via foreachBatch. This is the
    * streaming analogue of the reference's chunked insert loop
    * (`cellstore.rs:30-57`): each micro-batch is one exactly-once-published
    * chunk (Spark tracks batch ids in the checkpoint; a replayed batch
    * re-appends, so pair with the periodic partition-scoped
    * [[graft.store.CellStore.deduplicateWhere]] optimize — the SAME
    * companion the reference needs for its insert retries, optimize.rs).
    * Cross-batch duplicates follow reference semantics: dedup is per
    * insert; the optimize pass removes the rest.
    *
    * `onBatch(store, name, batchId)` runs AFTER each micro-batch's insert,
    * on the streaming thread — the maintenance-interleave hook. Long-running
    * ingest needs housekeeping between batches (lightweight `deleteWhere`,
    * `applyDeletes` materialization, `deduplicateWhere`, snapshot vacuum),
    * and running it here serializes the maintenance with the inserts on the
    * store's own commit path, the same way the reference interleaves its
    * optimize pass with the chunked insert loop. A hook failure fails the
    * batch (and so the query) loudly — maintenance errors must not be
    * swallowed mid-ingest.
    *
    * Returns the started query; callers own its lifecycle. */
  def insertStream(stream: DataFrame, store: graft.store.CellStore, name: String,
      checkpointDir: String,
      createSchema: Option[graft.schema.CompactedTableSchema] = None,
      trigger: org.apache.spark.sql.streaming.Trigger =
        org.apache.spark.sql.streaming.Trigger.ProcessingTime(0L),
      invalidPolicy: graft.store.CellStore.InvalidPolicy =
        graft.store.CellStore.InvalidPolicy.Fail,
      onBatch: (graft.store.CellStore, String, Long) => Unit = (_, _, _) => ())
      : org.apache.spark.sql.streaming.StreamingQuery = {
    createSchema.foreach(store.createTableset)
    stream.writeStream
      .option("checkpointLocation", checkpointDir)
      .outputMode("append")
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        store.insert(name, batch, invalidPolicy = invalidPolicy)
        onBatch(store, name, batchId)
      }
      .start()
  }

  /** Subscribe to a tableset: a stream of rows as they are INSERTED — the
    * CDC-tail of the store. The store's layout is already a valid file
    * stream source (every insert appends immutable parquet files; the
    * checkpoint tracks which files a consumer has seen), so tailing costs
    * nothing at write time and each consumer resumes exactly where it left
    * off. `targetRes` filters to the D7 partitions of one resolution —
    * pushed as a partition-column filter, so a consumer of the coarse
    * rollup never lists, reads, or schedules the fine base data's files.
    *
    * Rewrites (deduplicate/compactFiles/alterPartitioning) re-append their
    * partitions' content as "new" files to a tail consumer — the same
    * at-least-once contract as any file-stream over a compacted table;
    * downstream dedup (e.g. [[dedupStream]]) restores exactly-once. */
  def tailTableset(store: graft.store.CellStore, name: String,
      targetRes: Int): DataFrame = {
    val schema = store.getTableset(name).toStructType
    val spark = SparkSession.active
    spark.readStream.schema(schema)
      .parquet(store.dataDir(name))
      .where(store.resolutionFilter(targetRes)) // the ONE D7 predicate
      .select(schema.fieldNames.map(col).toIndexedSeq: _*)
  }

  case class Event(event_id: Long, ts: Timestamp, user_id: Long,
      event_type: String, value: Double)
  case class Session(user_id: Long, start: Timestamp, end: Timestamp,
      num_events: Int, total_value: Double)
  private case class SessionState(start: Long, end: Long, n: Int, total: Double)

  case class UserStats(user_id: Long, n_events: Long, total_value: Double,
      max_value: Double)

  /** Per-user running aggregate on Spark 4's `transformWithState` — the
    * successor state API (typed per-key state objects from a
    * StatefulProcessorHandle, optional TTL, timers) and the one that runs
    * on the RocksDB state store, which is what bounds executor memory when
    * keyed state at 100 TB no longer fits a HashMap: state lives on disk
    * with an in-memory cache, checkpointed incrementally via changelog.
    * Within a batch the per-key fold is (ts, event_id)-ordered so the
    * float accumulation order — and therefore the emitted doubles — do not
    * depend on partition read order; across batches the state carries the
    * fold forward, so the FINAL emission per key equals the batch
    * aggregate: counts and max exactly for ANY micro-batching, and the
    * double total bit-exactly when batch boundaries respect (ts, event_id)
    * order. A late event arriving in a later batch folds OUT of global ts
    * order, so total_value can then differ from the batch aggregate in the
    * low bits of double addition (still equal to ~1e-12 relative — the
    * spec pins both regimes). Update output mode: one row per (key, batch)
    * with the running totals. */
  class RunningUserStats extends org.apache.spark.sql.streaming.StatefulProcessor[Long, Event, UserStats] {
    @transient private var state: org.apache.spark.sql.streaming.ValueState[UserStats] = _
    override def init(outputMode: OutputMode,
        timeMode: org.apache.spark.sql.streaming.TimeMode): Unit =
      state = getHandle.getValueState[UserStats]("stats",
        org.apache.spark.sql.Encoders.product[UserStats],
        org.apache.spark.sql.streaming.TTLConfig.NONE)
    override def handleInputRows(key: Long, rows: Iterator[Event],
        timers: org.apache.spark.sql.streaming.TimerValues): Iterator[UserStats] = {
      val prev =
        if (state.exists()) state.get()
        else UserStats(key, 0L, 0.0, Double.NegativeInfinity)
      val next = rows.toSeq.sortBy(e => (e.ts.getTime, e.event_id))
        .foldLeft(prev)((acc, e) => UserStats(key, acc.n_events + 1,
          acc.total_value + e.value, math.max(acc.max_value, e.value)))
      state.update(next)
      Iterator.single(next)
    }
  }

  /** [[RunningUserStats]] over a streaming (or bounded) Event dataset.
    * Requires the RocksDB state store provider
    * (`spark.sql.streaming.stateStore.providerClass`) — transformWithState
    * does not run on the default HDFS-backed store. */
  def runningUserStats(events: Dataset[Event]): Dataset[UserStats] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.user_id)
      .transformWithState(new RunningUserStats,
        org.apache.spark.sql.streaming.TimeMode.None(),
        OutputMode.Update())
  }

  /** Gap-based sessionization with mapGroupsWithState: a session closes when
    * no event arrives within `gapMillis` (processing-time timeout on
    * streams; on bounded input every group emits its final session). */
  def sessionize(events: Dataset[Event], gapMillis: Long): Dataset[Session] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, Session](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (userId: Long, it: Iterator[Event], state: GroupState[SessionState]) =>
          // bounded-input path: fold the user's events in time order,
          // emitting a session whenever the gap is exceeded
          val sorted = it.toSeq.sortBy(e => (e.ts.getTime, e.event_id))
          val sessions = scala.collection.mutable.ListBuffer.empty[Session]
          var cur: Option[SessionState] = state.getOption
          sorted.foreach { e =>
            val t = e.ts.getTime
            cur match {
              case Some(s) if t - s.end <= gapMillis =>
                cur = Some(SessionState(s.start, t, s.n + 1, s.total + e.value))
              case Some(s) =>
                sessions += Session(userId, new Timestamp(s.start), new Timestamp(s.end), s.n, s.total)
                cur = Some(SessionState(t, t, 1, e.value))
              case None =>
                cur = Some(SessionState(t, t, 1, e.value))
            }
          }
          cur.foreach { s =>
            sessions += Session(userId, new Timestamp(s.start), new Timestamp(s.end), s.n, s.total)
            state.remove()
          }
          sessions.iterator
      }
  }
}

package graft.util

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed global running (prefix) sum — the scan primitive behind
  * corpus sharding: "pack documents into training shards of <= B tokens
  * each, in a stable global order".
  *
  * The naive formulation — `sum(v) OVER (ORDER BY k)` with no PARTITION BY —
  * plans as a SINGLE-partition window: every row of the corpus funnels
  * through one reducer (Spark even warns `WindowExec: No Partition Defined`).
  * That is the textbook 100-TB failure. This operator is the classic
  * two-phase parallel scan instead:
  *
  *   1. range-repartition by the (unique) order key, stamp each row with its
  *      partition id, and compute a partition-LOCAL running sum — parallel
  *      across all partitions;
  *   2. aggregate one total per partition (a P-row frame, P = number of
  *      partitions), exclusive-prefix-sum THAT tiny list on the driver, and
  *      broadcast-join the per-partition offsets back.
  *
  * global_running = local_running + offset(partition). The only sequential
  * step is over P partials, never N rows, and the result is independent of
  * where the sampled range boundaries land because the order key is unique.
  *
  * Call this with a NARROW projection — (order key, value) and whatever id
  * the caller needs to join results back; the heavy columns (document text,
  * embeddings) should never ride through the two row shuffles here.
  */
object PrefixSum {

  /** Phase 1 in isolation: the range-partitioned frame with `__pid` and the
    * partition-local running sum `__local`, BEFORE checkpointing. Exposed
    * (package-private) so plan audits can assert the window never collapses
    * to a single partition — `runningSum`'s localCheckpoint truncates the
    * lineage, so the returned frame's plan cannot be audited for this. */
  private[graft] def localPrefix(df: DataFrame, orderCol: String,
      valueCol: String, p: Int): DataFrame = {
    val parted = df
      .repartitionByRange(p, col(orderCol))
      .withColumn("__pid", spark_partition_id())
    val w = Window.partitionBy(col("__pid")).orderBy(col(orderCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // NULL values count as 0 (coalesce BEFORE the sum): a sum over an
    // all-null partition would otherwise be NULL, and the driver-side
    // offsets collect below would NPE on it
    parted.withColumn("__local",
      sum(coalesce(col(valueCol).cast("long"), lit(0L))).over(w))
  }

  /** Adds `outCol` = running sum of `valueCol` (cast to long; NULL counts
    * as 0) over the global `orderCol` order, inclusive of the current row.
    *
    * `orderCol` must be globally unique — uniqueness is what makes the
    * result invariant to the sampled range-partition boundaries.
    *
    * `numPartitions` <= 0 uses `spark.sql.shuffle.partitions`. */
  def runningSum(df: DataFrame, orderCol: String, valueCol: String,
      outCol: String, numPartitions: Int = 0): DataFrame = {
    val spark = df.sparkSession
    val p =
      if (numPartitions > 0) numPartitions
      else spark.sessionState.conf.numShufflePartitions

    // Phase 1: partition-local running sums. The pid window costs one hash
    // exchange on the 4-byte pid (rows stay narrow by contract), keeping
    // the whole phase inside Tungsten/codegen rather than escaping to a
    // mapPartitions scan.
    //
    // localCheckpoint is load-bearing, not an optimization: the offsets
    // aggregation below and the frame returned to the caller both consume
    // `local`, and range-partition boundary SAMPLING is seeded per job —
    // two independent executions can place boundary-adjacent rows in
    // different partitions, silently corrupting the offsets. Materializing
    // once pins a single partition assignment (and runs the shuffle+window
    // once instead of twice).
    val local = localPrefix(df, orderCol, valueCol, p).localCheckpoint()

    // Phase 2: P partial totals -> driver exclusive prefix -> broadcast back.
    // repartitionByRange assigns ascending key ranges to ascending partition
    // ids, so offsets are the prefix over pid order. (NOT max(__local): the
    // running sum is only monotone for non-negative values.)
    val totals = local.groupBy(col("__pid"))
      .agg(sum(coalesce(col(valueCol).cast("long"), lit(0L))).as("__ptotal"))
      .collect()
      .map(r => (r.getInt(0), r.getLong(1)))
      .sortBy(_._1)
    val offsets = totals
      .scanLeft((0, 0L)) { case ((_, acc), (pid, tot)) => (pid, acc + tot) }
      .init // exclusive: offset for pid i is the sum of totals before it
      .zip(totals)
      .map { case ((_, off), (pid, _)) => (pid, off) }
    val offsetsDf = spark.createDataFrame(offsets.toIndexedSeq)
      .toDF("__pid", "__offset")

    local
      .join(broadcast(offsetsDf), Seq("__pid"))
      .withColumn(outCol, col("__local") + col("__offset"))
      .drop("__pid", "__local", "__offset")
  }
}

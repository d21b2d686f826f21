package graft.util

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Per-key union of integer intervals — the "merge overlapping spans"
 * primitive behind substring-dedup removal (Queries d28), span redaction,
 * and coverage accounting. Closed intervals [s, e]; touching intervals
 * (next.s == prev.e) merge, adjacent-but-disjoint (next.s == prev.e + 1)
 * do NOT — callers wanting adjacency-merge widen e by 1 first.
 *
 * Scale shape: ONE window pass partitioned by the key (state = a running
 * max per key, no global sort) followed by two map-side-combined
 * aggregations. The classic island detection: an interval starts a new
 * island iff its start exceeds the running max end of everything before
 * it in (s, e) order.
 */
object Intervals {

  /** Collapse `(key, s, e)` rows to one row per merged island:
    * `(key, island_s, island_e)`. Input rows with s > e are rejected at
    * runtime (assert inside the plan — corrupt spans would silently
    * produce negative-length islands). */
  def mergeIntervals(df: DataFrame, key: String, s: String, e: String): DataFrame = {
    val ord = Window.partitionBy(col(key)).orderBy(col(s), col(e))
    val prevMax = max(col(e)).over(ord.rowsBetween(Window.unboundedPreceding, -1))
    // the validity check is folded INTO the retained start column — a
    // side-channel assert_true column would be pruned away by the optimizer
    val checkedS = when(col(s) <= col(e), col(s)).otherwise(raise_error(
      concat(lit(s"interval $s > $e for key "), col(key).cast("string"))).cast("long"))
    df.select(col(key), checkedS.as(s), col(e))
      .withColumn("_brk", when(col(s) > coalesce(prevMax, col(s) - 1), 1L).otherwise(0L))
      .withColumn("_isl", sum(col("_brk")).over(ord.rowsBetween(Window.unboundedPreceding, 0)))
      .groupBy(col(key), col("_isl"))
      .agg(min(col(s)).as("island_s"), max(col(e)).as("island_e"))
      .select(col(key), col("island_s"), col("island_e"))
  }

  /** Sum of merged-island lengths per key (closed intervals: e - s + 1),
    * plus the island count — d28's removal accounting in one call. */
  def coveredLength(df: DataFrame, key: String, s: String, e: String): DataFrame =
    mergeIntervals(df, key, s, e)
      .groupBy(col(key))
      .agg(count(lit(1)).as("n_islands"),
        sum(col("island_e") - col("island_s") + 1).as("covered"))
}

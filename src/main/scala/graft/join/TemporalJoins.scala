package graft.join

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Whole-operator temporal joins the reference (and stock Spark SQL) lack as
 * built-ins, composed from existing relational operators so Catalyst keeps
 * full optimization freedom — no custom physical plan is needed because both
 * reduce to ONE hash-partitioned shuffle:
 *
 *  - [[asofJoin]]: most-recent-at-or-before match per key (the "as-of" join
 *    of tick stores). A naive formulation is a theta-join
 *    (`l.key = r.key AND r.ts <= l.ts` + argmax), which Spark plans as a
 *    BroadcastNestedLoop — quadratic per key. This one unions the tagged
 *    sides and carries the latest right payload forward with a running
 *    `last(ignoreNulls)` window: one shuffle on the key, linear scan within
 *    each partition, no join at all.
 *
 *  - [[rangeJoin]]: point-in-interval join. The naive `BETWEEN` theta-join is
 *    again a nested loop; banding turns it into an equi-join — intervals
 *    explode to the fixed-width time buckets they cover, points join on
 *    (key, bucket), and the exact containment predicate filters afterwards.
 *    The shuffle key is (key, bucket), which Catalyst hash-partitions like
 *    any other equi-join (AQE/skew handling included). `bucketWidth` trades
 *    interval fan-out against join selectivity: choose it near the typical
 *    interval length so each interval explodes to O(1) buckets.
 *
 * Both keep every row narrow through the shuffle (keys + payload columns the
 * caller selected — no full-table payloads), so the shapes hold at corpus
 * scale: the as-of union shuffles each side once, the range join shuffles
 * points once and intervals × avg-buckets-per-interval once.
 */
object TemporalJoins {

  /**
   * As-of join: for each `left` row, append the payload of the single most
   * recent `right` row with `right(rightTs) <= left(leftTs)` and the same
   * `key` (left-outer semantics: unmatched left rows keep NULL payloads —
   * the same contract as DuckDB's `ASOF LEFT JOIN`).
   *
   * Output columns: all of `left`, then `asofTsCol` (the matched right
   * timestamp) and each right payload column prefixed with `asof_`.
   *
   * The right side must be unique per (key, ts) — pre-aggregate otherwise;
   * with duplicates the winning payload among equal timestamps would be
   * partition-order-dependent.
   */
  def asofJoin(
      left: DataFrame,
      right: DataFrame,
      key: String,
      leftTs: String,
      rightTs: String,
      asofTsCol: String = "asof_ts"): DataFrame = {
    val lCols = left.columns.toSeq
    val rPayload = right.columns.toSeq.filterNot(c => c == key || c == rightTs)
    val lStruct = left.select(struct(lCols.map(col): _*).as("s")).schema("s").dataType
    val rStruct = right.select(struct((rightTs +: rPayload).map(col): _*).as("s")).schema("s").dataType

    // Tag the sides and align schemas; right rows sort BEFORE left rows at an
    // equal timestamp so the match is inclusive (<=), like ASOF JOIN.
    val lTagged = left.select(
      col(key).as("__k"), col(leftTs).as("__ts"), lit(1).as("__side"),
      struct(lCols.map(col): _*).as("__l"), lit(null).cast(rStruct).as("__r"))
    val rTagged = right.select(
      col(key).as("__k"), col(rightTs).as("__ts"), lit(0).as("__side"),
      lit(null).cast(lStruct).as("__l"),
      struct((rightTs +: rPayload).map(col): _*).as("__r"))

    val w = Window.partitionBy(col("__k")).orderBy(col("__ts"), col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val matched = lTagged.unionByName(rTagged)
      .withColumn("__asof", last(col("__r"), ignoreNulls = true).over(w))
      .where(col("__side") === 1)

    val out: Seq[Column] =
      lCols.map(c => col(s"__l.$c").as(c)) ++
        (col(s"__asof.$rightTs").as(asofTsCol) +:
          rPayload.map(c => col(s"__asof.$c").as(s"asof_$c")))
    matched.select(out: _*)
  }

  /**
   * Range (interval-containment) join: inner-join each `points` row to every
   * `intervals` row of the same `key` with `start <= ts <= end`.
   *
   * Output columns: all of `intervals`, then all of `points` (the caller
   * keeps the column sets disjoint apart from `key`). Each qualifying
   * (interval, point) pair appears exactly once — a point's timestamp falls
   * in exactly one bucket, and an interval covers each of its buckets once.
   *
   * `bucketWidth` is in seconds; timestamps are compared at full precision,
   * bucketing only routes the equi-join.
   */
  def rangeJoin(
      points: DataFrame,
      intervals: DataFrame,
      key: String,
      ts: String,
      start: String,
      end: String,
      bucketWidth: Long): DataFrame = {
    require(bucketWidth > 0, s"bucketWidth must be positive, got $bucketWidth")
    def bucket(c: Column): Column = floor(c.cast("long") / bucketWidth).cast("long")

    val pB = points.withColumn("__b", bucket(col(ts)))
    val iB = intervals
      .withColumn("__b", explode(sequence(bucket(col(start)), bucket(col(end)))))
    iB.join(pB, Seq(key, "__b"))
      .where(col(ts) >= col(start) && col(ts) <= col(end))
      .drop("__b")
  }
}

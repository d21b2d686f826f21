package graft.skew

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Skew mitigation for hot join keys.
 *
 * What Spark already solves — do NOT salt these:
 *  - algebraic aggregates (sum/min/max/count): partial aggregation combines
 *    map-side, reducers see one partial per map task per key;
 *  - `count(DISTINCT x)` by key: Catalyst plans the dedup shuffle on
 *    (key, x), which spreads a hot key by value;
 *  - sort-merge/shuffled-hash joins under AQE: `OptimizeSkewedJoin` splits
 *    oversized partitions using materialized shuffle statistics.
 *
 * What remains is the join AQE cannot fix: a skewed shuffle join where the
 * replan is unavailable or insufficient — streaming joins (no AQE),
 * a single key so hot that even a split partition's build side must be
 * replicated, or a downstream stateful operator pinning the partitioning.
 * [[saltedJoin]] is the classic explicit remedy: spread the hot left key
 * over `buckets` reducers, replicate the right side `buckets` times.
 * Profitable when |right| * (buckets - 1) extra rows cost less than the
 * straggler task. Salt derives from a hash of the full left row, so the
 * assignment is stable under repartitioning and task retries.
 */
object Skew {

  /** Inner equi-join on `key` with the LEFT side salted into `buckets` and
    * the RIGHT side replicated once per bucket. Result equals
    * `left.join(right, Seq(key))` for any bucket count >= 1. */
  def saltedJoin(left: DataFrame, right: DataFrame, key: String,
      buckets: Int): DataFrame = {
    require(buckets >= 1, "buckets must be >= 1")
    val salted = left.withColumn("_salt",
      pmod(hash(struct(left.columns.map(col).toIndexedSeq: _*)), lit(buckets)))
    val replicated = right.withColumn("_salt",
      explode(sequence(lit(0), lit(buckets - 1))))
    salted.join(replicated, Seq(key, "_salt")).drop("_salt")
  }
}

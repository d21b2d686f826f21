package graft.store

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions.col

/**
 * Bucketed mirrors: persist a frame hash-bucketed AND sorted by its join
 * key so that every later join/aggregation on that key runs WITHOUT a
 * shuffle or a sort — Spark's storage-level answer to co-located joins
 * (the ClickHouse-side analogue in the reference deployment is sharding
 * both tables by `cityHash64(h3index)`; cf. SURVEY §4's locality notes).
 *
 * At 100 TB the economics flip: a cell-keyed fact table is joined against
 * other grid datasets many times, and every sort-merge join of two
 * unbucketed tables pays a full shuffle of BOTH sides each time. Writing
 * each side ONCE as a bucketed table moves that cost into the write:
 * Spark's scan reports the bucket spec as its output partitioning (and,
 * with one file per bucket, the sort order), so the join plans with zero
 * Exchange and zero Sort — per-bucket merge joins, pipelined end to end.
 * Bucket counts must match across mirrors that will be joined (buckets
 * pair 1:1; choose a count once per grid, e.g. cells-at-coarse-res).
 *
 * The mirror is REDUNDANT storage derived from the tableset (like
 * [[graft.ann.IvfIndex]]'s cid-partitioned layout): rebuild at will,
 * results must be indistinguishable — the ts17 gate joins two mirrors
 * under ts12's oracle to pin exactly that.
 */
object Bucketing {

  /** Write `df` as a bucketed, per-bucket-sorted external parquet table
    * and register it in the session catalog under `table`.
    *
    * The pre-write `repartition(numBuckets, key)` is what makes the mirror
    * JOIN-OPTIMAL rather than merely bucketed: repartition's hash
    * placement matches the bucket-id function, so each write task holds
    * exactly one bucket and emits exactly ONE file — and one file per
    * bucket is the precondition for the scan to expose `sortBy`'s order
    * (multi-file buckets would need a runtime merge-sort, and Spark
    * re-sorts instead). Without it, every task writes a sliver of every
    * bucket: numTasks x numBuckets small files and no usable order.
    *
    * Overwrites any previous mirror at the same name/path (idempotent
    * rebuild — the mirror is derived data). */
  def writeMirror(spark: SparkSession, df: DataFrame, table: String,
      path: String, numBuckets: Int, key: String = "h3index"): Unit = {
    spark.sql(s"DROP TABLE IF EXISTS `$table`")
    df.repartition(numBuckets, col(key))
      .write.format("parquet")
      .bucketBy(numBuckets, key)
      .sortBy(key)
      .option("path", path)
      .mode(SaveMode.Overwrite)
      .saveAsTable(table)
  }

  /** The co-located equi-join of two registered mirrors on their shared
    * bucket key. The `merge` hint pins the sort-merge strategy so the
    * plan exercises the bucket layout (AQE would otherwise broadcast a
    * small side — also correct, but at mirror scale both sides are big:
    * that is the case the mirrors exist for). With matching bucket counts
    * the executed plan contains NO Exchange and NO Sort (audited by
    * BucketingSpec). */
  def colocatedJoin(spark: SparkSession, tableA: String, tableB: String,
      key: String = "h3index"): DataFrame = {
    // Since 3.0 Spark does not report a bucketed scan's sort order unless
    // this (SQL-runtime) flag is on — it is only safe when every bucket is
    // one file, which writeMirror's pre-repartition guarantees for ITS
    // tables. Plan under a CLONED session (isolated SQLConf, shared
    // SparkContext + catalog, so the persistent mirrors resolve) instead of
    // set/unset on the caller's conf: two threads planning concurrently
    // never see each other's flag, and nothing leaks to later bucketed
    // scans in the caller's session (round-3 advice).
    val planning = spark.newSession()
    planning.conf.set("spark.sql.legacy.bucketedTableScan.outputOrdering", "true")
    val df = planning.table(tableA).hint("merge").join(planning.table(tableB), key)
    df.queryExecution.executedPlan // force planning while the clone's flag is on
    df
  }
}

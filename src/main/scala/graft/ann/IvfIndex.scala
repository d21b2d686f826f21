package graft.ann

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Persistent IVF index: the corpus, PHYSICALLY PARTITIONED BY ASSIGNED
 * CENTROID CELL, plus the centroid table — the production layout
 * [[Ann.knnIvf]]'s scaladoc promises. Where knnIvf recomputes the
 * assignment per query batch (fine for one-shot jobs), an index built once
 * serves every subsequent query batch with PARTITION-PRUNED reads: probes
 * resolve to nprobe centroid cells per query, and the scan touches only
 * those `cid=` directories — at 100 TB a query batch reads
 * ~nprobe/C of the corpus instead of all of it, with no assignment
 * recomputation.
 *
 * Layout:
 *   <path>/centroids/   (cid, vec)           — small, read whole
 *   <path>/data/cid=<c>/ (id, vec)           — corpus rows by nearest centroid
 *
 * Determinism: assignment and search use the same [[Ann.ivfAssign]] /
 * [[Ann.rerank]] machinery as knnIvf, so a search over the index returns
 * EXACTLY knnIvf's results for the same (centroids, k, nprobe) — the e5
 * gate pins that equivalence against the e4 DuckDB oracle.
 *
 * Rows with empty/null vectors have no nearest centroid and are not
 * indexed (same contract as knnIvf).
 */
object IvfIndex {

  /** Build (or rebuild) the index at `path` from `corpus` (id, vec) and
    * `centroids` (cid, vec). One broadcast assignment pass over the corpus,
    * one cid-partitioned write; rows within each partition are written
    * id-sorted so re-rank joins scan ordered row groups. */
  def build(spark: SparkSession, corpus: DataFrame, centroids: DataFrame,
      path: String): Unit = {
    val nonEmpty = corpus.where(size(col("vec")) > 0)
    centroids.select(col("cid"), col("vec"))
      .coalesce(1)
      .write.mode(SaveMode.Overwrite).parquet(s"$path/centroids")
    val assign = Ann.ivfAssign(nonEmpty, centroids)
    nonEmpty.join(assign, "id")
      .repartition(col("cid"))
      .sortWithinPartitions(col("cid"), col("id"))
      .write.mode(SaveMode.Overwrite)
      .partitionBy("cid")
      .parquet(s"$path/data")
  }

  /** Incremental append: assign NEW rows to the EXISTING centroid table and
    * append them into their `cid=` partitions. The quantizer is frozen —
    * append never moves old rows or re-trains, exactly like a production
    * IVF index absorbing a new corpus shard. An index grown by appends is
    * indistinguishable to [[search]] from one built in a single pass over
    * the union (the e6 gate pins that against e4's oracle); only the
    * per-partition file count grows until a rebuild compacts it. */
  def append(spark: SparkSession, newRows: DataFrame, path: String): Unit = {
    val centroids = spark.read.parquet(s"$path/centroids")
    val nonEmpty = newRows.where(size(col("vec")) > 0)
    val assign = Ann.ivfAssign(nonEmpty, centroids)
    nonEmpty.join(assign, "id")
      .repartition(col("cid"))
      .sortWithinPartitions(col("cid"), col("id"))
      .write.mode(SaveMode.Append)
      .partitionBy("cid")
      .parquet(s"$path/data")
  }

  def exists(spark: SparkSession, path: String): Boolean = {
    val p = new Path(s"$path/data")
    p.getFileSystem(spark.sessionState.newHadoopConf()).exists(p)
  }

  /** Compact the index's data layout: rewrite every `cid=` partition down
    * to one file — the OPTIMIZE-after-streaming-inserts step a long-running
    * maintenance stream (s19) needs, since each micro-batch append lands
    * one file set per touched partition and a file-per-batch layout
    * eventually dominates scan open cost. The quantizer and the row set are
    * untouched, so [[search]] results are IDENTICAL before and after
    * (IvfIndexSpec pins this); only the file count drops.
    *
    * Concurrency contract: the caller must QUIESCE appends around the call
    * (s19 compacts after the stream drains; a production loop compacts
    * between triggers). The contract is ENFORCED, not assumed, and the
    * enforcement has no unguarded window: the file set is re-listed just
    * before the swap, and — because an append could still land between
    * that re-listing and the `data` -> `data_old` rename — the set is
    * verified a SECOND time after the rename, against what actually moved
    * into `data_old`. On mismatch the rename is rolled back and the
    * compaction fails loudly; nothing is deleted that was not in the
    * verified snapshot. Crash windows: before the
    * first rename — old layout intact; between the renames — `data/` is
    * momentarily ABSENT (old under `data_old`, new under
    * `data_compacting`; recover by renaming either back); after — new
    * layout, stale `data_old` removed on the next call. Never a mix of
    * halves inside `data/`. */
  def compact(spark: SparkSession, path: String): Unit = {
    val fs = new Path(path).getFileSystem(spark.sessionState.newHadoopConf())
    val dataP = new Path(s"$path/data")
    // relative suffixes so the pre-rename (data/) and post-rename
    // (data_old/) listings are comparable
    def listing(root: Path): Set[String] = {
      val it = fs.listFiles(root, true)
      val out = scala.collection.mutable.Set.empty[String]
      // listFiles returns SCHEME-QUALIFIED paths (file:/...); qualify the
      // root the same way or the strip silently no-ops
      val prefix = fs.makeQualified(root).toString
      while (it.hasNext) {
        val f = it.next().getPath
        if (f.getName.endsWith(".parquet"))
          out += f.toString.stripPrefix(prefix)
      }
      out.toSet
    }
    val before = listing(dataP)
    val staged = s"$path/data_compacting"
    spark.read.parquet(s"$path/data")
      .repartition(col("cid"))
      .sortWithinPartitions(col("cid"), col("id"))
      .write.mode(SaveMode.Overwrite)
      .partitionBy("cid")
      .parquet(staged)
    require(listing(dataP) == before,
      s"compact: concurrent modification of $dataP during the staged " +
        "rewrite — quiesce appends around compact() and retry")
    val oldP = new Path(s"$path/data_old")
    fs.delete(oldP, true) // stale leftover from a crashed prior call
    require(fs.rename(dataP, oldP), s"compact: cannot stage out $dataP")
    // second verification AFTER the rename: an append that slipped in
    // between the re-listing above and the rename now sits under data_old
    // — roll back and fail rather than sweep it into the delete below
    if (listing(oldP) != before) {
      require(fs.rename(oldP, dataP),
        s"compact: concurrent append detected AND rollback rename failed — " +
          s"manual recovery: restore $oldP to $dataP")
      sys.error(s"compact: concurrent modification of $dataP detected after " +
        "stage-out (rolled back) — quiesce appends around compact() and retry")
    }
    require(fs.rename(new Path(staged), dataP),
      s"compact: cannot publish $staged")
    fs.delete(oldP, true)
    ()
  }

  /** Data-file count of the index (diagnostics + the compaction spec). */
  def dataFileCount(spark: SparkSession, path: String): Int = {
    val root = new Path(s"$path/data")
    val fs = root.getFileSystem(spark.sessionState.newHadoopConf())
    val it = fs.listFiles(root, true)
    var n = 0
    while (it.hasNext) {
      val f = it.next()
      if (f.getPath.getName.endsWith(".parquet")) n += 1
    }
    n
  }

  /** Top-k cosine search against the index: for each query (id, vec), rank
    * the vectors stored in its `nprobe` nearest centroid cells. The probed
    * cid set is collected driver-side (<= |queries| * nprobe values) and
    * planted as a partition-value predicate, so the corpus scan prunes to
    * the probed `cid=` directories at planning time.
    * Output: (query_id, rnk, neighbor_id, cos). */
  def search(spark: SparkSession, path: String, queries: DataFrame,
      k: Int, nprobe: Int): DataFrame = {
    val centroids = spark.read.parquet(s"$path/centroids")
    val nonEmpty = queries.where(size(col("vec")) > 0)
    val wp = org.apache.spark.sql.expressions.Window
      .partitionBy(col("id")).orderBy(col("cos").desc, col("cid"))
    val probes = Ann.centroidCosines(nonEmpty, centroids)
      .withColumn("rn", row_number().over(wp))
      .where(col("rn") <= nprobe)
      .select(col("id").as("query_id"), col("cid"))
      .localCheckpoint() // consumed twice: cid collection + candidate join
    val probedCids = probes.select("cid").distinct().collect().map(_.get(0))
    val indexed = spark.read.parquet(s"$path/data")
      .where(col("cid").isin(probedCids: _*)) // partition pruning
    val cand = probes
      .join(indexed.select(col("id").as("neighbor_id"), col("cid")), "cid")
      .where(col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"))
      .distinct()
    Ann.rerank(cand, queries, indexed.select(col("id"), col("vec")), k)
  }
}

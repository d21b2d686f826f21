package graft.util

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Deterministic micro-batch staging for the streaming gates (s15 / s17 /
  * s19): split a frame into `parts` single-file chunks by `keyCol % parts`
  * and pin strictly increasing file modification times, so a
  * `maxFilesPerTrigger = 1` file stream schedules batch i == chunk i
  * (FileStreamSource schedules unread files oldest-modification-first).
  * One definition site for the part-file discovery, the move, and the
  * mtime base — the gates' capture-semantics oracles depend on this batch
  * order, so a drifting copy would silently change what a gate tests
  * (round-8 review: this block existed three times). */
object Staging {

  /** `dropKey`: write the chunk WITHOUT the routing key column (for
    * callers whose key is not part of the staged payload, e.g. s15 keys on
    * l_orderkey but stages (h3index, v) rows).
    *
    * ONE source pass regardless of `parts`: the frame is repartitioned by
    * the derived chunk id and written `partitionBy(chunk)` — each chunk
    * value lands in exactly one task, so every chunk directory holds
    * exactly one part file, which is then moved into place with the pinned
    * mtime. (The round-9 form filtered+wrote per chunk: `parts` full
    * source scans, quadratic staging once a decade run scales the batch
    * COUNT with the data — the honest protocol for the funnel gates.) */
  def stageChunks(df: DataFrame, keyCol: String, parts: Int,
      tag: String, dropKey: Boolean = false): String = {
    val staging = TempDirs.create(s"graft_${tag}_src_")
    val tmp = TempDirs.create(s"graft_${tag}_tmp_")
    val chunked = df.withColumn("__chunk", pmod(col(keyCol), lit(parts)))
    (if (dropKey) chunked.drop(keyCol) else chunked)
      .repartition(parts, col("__chunk"))
      .write.mode("overwrite").partitionBy("__chunk").parquet(tmp)
    (0 until parts).foreach { i =>
      val dirI = new java.io.File(tmp, s"__chunk=$i")
      // listFiles() returns null for URI-form or non-local paths (the same
      // silent local-FS assumption tableBytes once made) — fail with the
      // actual path instead of an unexplained NPE; a MISSING chunk dir
      // means an empty chunk, which would silently renumber every later
      // micro-batch — also loud
      val entries = Option(dirI.listFiles()).getOrElse(
        sys.error(s"$tag staging: cannot list $dirI — empty chunk $i of " +
          s"$parts (batch numbering would shift), or non-local/URI-form " +
          "path (stageChunks stages on the driver-local filesystem)"))
      val partFiles = entries
        .filter(f => f.getName.startsWith("part-") && f.getName.endsWith(".parquet"))
      require(partFiles.length == 1,
        s"$tag staging: expected exactly one part file under $dirI, " +
          s"found ${partFiles.length}")
      val dst = new java.io.File(staging, s"chunk_$i.parquet")
      java.nio.file.Files.move(partFiles.head.toPath, dst.toPath)
      require(dst.setLastModified(1700000000000L + i * 60000L),
        s"$tag staging: cannot pin mtime of $dst")
    }
    staging
  }
}

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
    * l_orderkey but stages (h3index, v) rows). */
  def stageChunks(df: DataFrame, keyCol: String, parts: Int,
      tag: String, dropKey: Boolean = false): String = {
    val staging = TempDirs.create(s"graft_${tag}_src_")
    (0 until parts).foreach { i =>
      val tmp = TempDirs.create(s"graft_${tag}_tmp_")
      val chunk = df.where(pmod(col(keyCol), lit(parts)) === i)
      (if (dropKey) chunk.drop(keyCol) else chunk)
        .coalesce(1).write.mode("overwrite").parquet(tmp)
      // listFiles() returns null for URI-form or non-local paths (the same
      // silent local-FS assumption tableBytes once made) — fail with the
      // actual path instead of an unexplained NPE
      val entries = Option(new java.io.File(tmp).listFiles()).getOrElse(
        sys.error(s"$tag staging: cannot list $tmp (non-local or URI-form " +
          "path? stageChunks stages on the driver-local filesystem)"))
      val part = entries
        .find(f => f.getName.startsWith("part-") && f.getName.endsWith(".parquet"))
        .getOrElse(sys.error(s"$tag staging: no part file under $tmp"))
      val dst = new java.io.File(staging, s"chunk_$i.parquet")
      java.nio.file.Files.move(part.toPath, dst.toPath)
      require(dst.setLastModified(1700000000000L + i * 60000L),
        s"$tag staging: cannot pin mtime of $dst")
    }
    staging
  }
}

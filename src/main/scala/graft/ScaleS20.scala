package graft

import org.apache.spark.sql.SparkSession

/** Decade runner for the s20 streaming curation funnel with the
  * micro-batch count SCALED with the data — the honest form of the s20
  * decade row: the per-batch store-consult term is measured, not pinned
  * away by running 3 batches at every scale (round-9 verdict #1; the
  * consult itself is Bloom-pruned + broadcast via
  * [[graft.streaming.MaintainedStore]], so the expected shape is ~linear
  * in arrivals even as batches multiply).
  *
  *   runMain graft.ScaleS20 <dir>:<parts> [<dir>:<parts> ...]
  *   e.g. runMain graft.ScaleS20 /root/testdata/sf0.1:3 /tmp/graft_sf10x:9 \
  *        /tmp/graft_sf100x:27 /tmp/graft_sf300x:81
  *
  * Reports the COLD end-to-end ingest per (dir, parts) — staging, d33
  * model training, decontam set build, and every micro-batch including
  * its store consults and appends — in ONE JVM (ScaleSmoke's same-host
  * rationale), releasing memoized frames and cached blocks between
  * decades so each scale is measured against its own working set. */
object ScaleS20 {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: ScaleS20 <dir>:<parts> [<dir>:<parts> ...]")
    val runs = args.toSeq.map { a =>
      val Array(dir, parts) = a.split(":")
      (dir, parts.toInt)
    }
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val results = runs.map { case (dir, parts) =>
      val t0 = System.nanoTime()
      PipelineQueries.streamCurationFunnel(spark, dir, parts)
        .write.format("noop").mode("overwrite").save()
      val t = (System.nanoTime() - t0) / 1e9
      println(f"""S20 {"dir":"$dir","parts":$parts,"cold_sec":$t%.1f}""")
      PipelineQueries.evictMemos()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = false))
      spark.catalog.clearCache()
      (dir, parts, t)
    }
    println("\ndir\tparts\tcold_sec")
    results.foreach { case (d, p, t) => println(f"$d\t$p\t$t%.1f") }
    spark.stop()
  }
}

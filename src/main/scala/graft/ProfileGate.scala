package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}
import org.apache.spark.sql.SparkSession

/** Measurement tool (optimization guide §1/§7): run one gate query with a
  * job-level listener and print every Spark job's wall time + description,
  * so a gate's seconds can be attributed to its actual jobs (scan, probe
  * collect, stream micro-batches, final noop) instead of guessed at.
  *
  *   runMain graft.ProfileGate <query> [sfDir] [passes]
  *
  * Pass 1 is warmup (memo/store builds print as jobs too — their cost is
  * visible but labeled); the LAST pass's jobs are what the bench's
  * min-of-2 protocol measures.
  */
object ProfileGate {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: ProfileGate <query>[,<query>...] [sfDir] [passes]")
    val gateNames = args(0).split(",").map(_.trim).filter(_.nonEmpty).toSeq
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val passes = if (args.length > 2) args(2).toInt else 2
    gateNames.foreach(n =>
      require(SparkEntry.queries.contains(n), s"unknown query: $n"))
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val builder = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
    // A/B experiment hook: SPARK_GRAFT_EXTRA_CONFS="k=v;k=v" layered on top
    sys.env.get("SPARK_GRAFT_EXTRA_CONFS").foreach(_.split(";").foreach { kv =>
      val Array(k, v) = kv.split("=", 2)
      builder.config(k.trim, v.trim)
    })
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val starts = new java.util.concurrent.ConcurrentHashMap[Int, (Long, String, Int)]()
    val rows = new java.util.concurrent.ConcurrentLinkedQueue[(Int, Double, Int, String)]()
    // streaming gates: per-trigger durationMs breakdown (walCommit,
    // stateStoreCommit, queryPlanning, addBatch, ...) — the fixed-cost
    // attribution §1 asks for before touching any stream machinery
    val progress = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    spark.streams.addListener(new org.apache.spark.sql.streaming.StreamingQueryListener {
      import org.apache.spark.sql.streaming.StreamingQueryListener._
      override def onQueryStarted(e: QueryStartedEvent): Unit =
        progress.add(f"  stream START  ${e.timestamp}")
      override def onQueryProgress(e: QueryProgressEvent): Unit = {
        val p = e.progress
        import scala.jdk.CollectionConverters._
        val dur = p.durationMs.asScala.toSeq.sortBy(-_._2)
          .map { case (k, v) => s"$k=${v}ms" }.mkString(" ")
        progress.add(f"  trigger batch=${p.batchId} rows=${p.numInputRows} $dur")
      }
      override def onQueryTerminated(e: QueryTerminatedEvent): Unit =
        progress.add(s"  stream END")
    })
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit = {
        val desc = Option(js.properties)
          .flatMap(p => Option(p.getProperty("spark.job.description")))
          .orElse(Option(js.properties)
            .flatMap(p => Option(p.getProperty("callSite.short"))))
          .getOrElse("")
        starts.put(js.jobId, (js.time, desc, js.stageInfos.map(_.numTasks).sum))
      }
      override def onJobEnd(je: SparkListenerJobEnd): Unit = {
        Option(starts.remove(je.jobId)).foreach { case (t0, desc, nTasks) =>
          rows.add((je.jobId, (je.time - t0) / 1e3, nTasks,
            f"t0=$t0%d t1=${je.time}%d " + desc))
        }
      }
    })

    gateNames.foreach { name =>
      (1 to passes).foreach { p =>
        rows.clear()
        progress.clear()
        val t0 = System.nanoTime()
        SparkEntry.queries(name)(spark, sfDir)
          .write.format("noop").mode("overwrite").save()
        val sec = (System.nanoTime() - t0) / 1e9
        // listener bus is async; give it a moment to drain before printing
        Thread.sleep(300)
        println(f"\n=== pass $p: $name = $sec%.3f s, ${rows.size} jobs ===")
        import scala.jdk.CollectionConverters._
        // print each job with the driver-side GAP since the previous job's
        // end — the wall-minus-job-sum attribution §1 asks for
        var prevEnd = 0L
        rows.asScala.toSeq.sortBy(_._1).foreach { case (id, d, nt, desc) =>
          val (t0, t1, rest) = {
            val m = "t0=(\\d+) t1=(\\d+) (.*)".r
            desc match {
              case m(a, b, r) => (a.toLong, b.toLong, r)
              case _          => (0L, 0L, desc)
            }
          }
          val gap = if (prevEnd == 0L || t0 == 0L) 0.0 else (t0 - prevEnd) / 1e3
          prevEnd = math.max(prevEnd, t1)
          println(f"  job $id%4d  $d%7.3f s  gap=$gap%6.3f s  tasks=$nt%4d  ${rest.take(90)}")
        }
        progress.asScala.foreach(println)
      }
    }
    spark.stop()
  }
}

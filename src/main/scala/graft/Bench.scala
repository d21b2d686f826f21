package graft
import org.apache.spark.sql.SparkSession

/** Benchmark entry: runs every SparkEntry query against SPARK_GRAFT_SF_DIR
  * and prints ONE JSON line. Queries execute into the `noop` sink so the full
  * plan (projections included) runs — `count()` would let Catalyst prune the
  * very expressions being measured. */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def run(fn: (SparkSession, String) => org.apache.spark.sql.DataFrame): Double = {
      val t0 = System.nanoTime()
      try fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      catch { case _: Throwable => return -1.0 }
      (System.nanoTime() - t0) / 1e9
    }

    // local-iteration filter (driver runs without it -> full bench)
    val names = SparkEntry.queries.keys.toSeq.sorted
      .filter(SparkEntry.onlySelected)
    // one warmup pass (JIT + codegen cache + file-footer cache), then two
    // measured passes, reporting the per-query MIN: this VM sees bursty
    // host CPU steal (minutes-long windows where every task runs 10-40x
    // slow), and a single pass randomly inflates whichever queries the
    // burst lands on; the min of two spaced passes is steal-robust while
    // still measuring the full warm plan
    names.foreach(n => run(SparkEntry.queries(n)))
    val pass1 = names.map(n => n -> run(SparkEntry.queries(n))).toMap
    val pass2 = names.map(n => n -> run(SparkEntry.queries(n))).toMap
    val results = names.map { n =>
      val (a, b) = (pass1(n), pass2(n))
      n -> (if (a < 0) b else if (b < 0) a else math.min(a, b))
    }

    val qs = results.map { case (k, v) => "\"" + k + "\":" + f"$v%.3f" }
      .mkString("{", ",", "}")
    val total = results.map(_._2).filter(_ >= 0).sum
    println(f"""{"metric":"total","value":$total%.3f,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}

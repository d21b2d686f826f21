package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare.
  *
  * With a trailing `--check` argument, the dump is followed by the full
  * local gate in one command (fails loudly on any mismatch):
  *   1. tools/compare_oracle.py — every oracle SQL re-run in DuckDB and
  *      hash-compared against the Spark parquet (the driver's gate, local);
  *   2. tools/independent_check.py — the third-implementation checks
  *      (formulas re-derived from their published definitions, media bytes
  *      re-decoded with pure-Python codecs).
  * Both tools skip gates whose output is absent, so `--check` composes
  * with SPARK_GRAFT_ONLY-filtered sweeps. */
object Verify {
  def main(args: Array[String]): Unit = {
    val (Array(sfDir, outDir), runCheck) =
      if (args.lastOption.contains("--check")) (args.dropRight(1), true)
      else (args, false)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    SparkEntry.queries
      .filter { case (name, _) => SparkEntry.onlySelected(name) }
      .foreach { case (name, fn) =>
      try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
        .parquet(s"$outDir/$name")
      catch { case e: Throwable =>
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
      }
      }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql
      .filter { case (k, _) => SparkEntry.onlySelected(k) }
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    spark.stop()
    if (runCheck) {
      import scala.sys.process._
      // resolve tools/ against the REPO ROOT, not the cwd: sbt forks mains
      // in the repo root but a bare java/spark-submit launch may not, and a
      // cwd-relative path would then fail — or worse, run a DIFFERENT
      // checkout's checkers (round-10 ADVICE). Override with
      // GRAFT_REPO_ROOT; otherwise walk up from the cwd to build.sbt.
      val root = sys.env.get("GRAFT_REPO_ROOT").getOrElse {
        Iterator.iterate(new java.io.File(".").getCanonicalFile)(_.getParentFile)
          .takeWhile(_ != null)
          .find(d => new java.io.File(d, "build.sbt").exists())
          .getOrElse(sys.error("--check: no build.sbt above the cwd — run " +
            "from inside the repo or set GRAFT_REPO_ROOT"))
          .getPath
      }
      // driver-side python3 (duckdb/pandas) — the same tools the round
      // gate runs; inherit stdio so per-gate ok/FAIL lines stay visible
      val compare = Seq("python3", s"$root/tools/compare_oracle.py", sfDir, outDir).!
      val indep = Seq("python3", s"$root/tools/independent_check.py", sfDir, outDir).!
      if (compare != 0 || indep != 0)
        sys.error(s"--check FAILED (compare_oracle=$compare, independent_check=$indep)")
      println("[verify] --check: oracle compare + independent checks PASS")
    }
  }
}

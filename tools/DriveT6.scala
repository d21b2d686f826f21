import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

object DriveT6 {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/graft_sf1x100")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", false).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time(label: String)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val n = f
      println(f"T6PROF $label: ${(System.nanoTime() - t0) / 1e9}%.2f s (rows=$n)")
    }
    // warm the memo frames like the bench protocol does
    time("warm full t6")(graft.PipelineQueries.t6NgramJaccardTopk(spark, dir).count())
    time("full t6 (warm)")(graft.PipelineQueries.t6NgramJaccardTopk(spark, dir).count())
    // stage timings via the public pieces: signatures and bands
    val mh = graft.PipelineQueries.t1MinhashSignatures(spark, dir)
    time("minhash frame scan")(mh.count())
    val poly4 = (cs: Seq[String]) => cs.foldLeft(lit(0L))((a, c) => (a * 31L + col(c)) % graft.text.TextOps.P)
    val bands = mh.select(col("doc_id"), explode(array(
      struct(lit(0).as("band"), poly4(Seq("mh0","mh1","mh2","mh3")).as("bh")),
      struct(lit(1).as("band"), poly4(Seq("mh4","mh5","mh6","mh7")).as("bh")))).as("b"))
      .select(col("doc_id"), col("b.band").as("band"), col("b.bh").as("bh"))
    val w = Window.partitionBy(col("band"), col("bh")).orderBy(col("doc_id"))
    val cand = bands
      .withColumn("nb1", lead(col("doc_id"), 1).over(w))
      .withColumn("nb2", lead(col("doc_id"), 2).over(w))
      .select(col("doc_id").as("doc_a"), explode(array(col("nb1"), col("nb2"))).as("doc_b"))
      .where(col("doc_b").isNotNull)
    time("window + explode (pre-distinct)")(cand.count())
    time("window + explode + distinct")(cand.distinct().count())
    // bucket-size skew profile
    val sizes = bands.groupBy("band", "bh").count()
    val top = sizes.orderBy(col("count").desc).limit(5).collect()
    println("T6PROF top buckets: " + top.map(r => r.getLong(2)).mkString(", "))
    spark.stop()
  }
}

import org.apache.spark.sql.SparkSession
object DriveProf {
  def main(a: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions","8").config("spark.ui.enabled","false")
      .config("spark.sql.session.timeZone","UTC").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.1"
    graft.SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      val t0 = System.nanoTime()
      try fn(spark, dir).write.format("noop").mode("overwrite").save()
      catch { case e: Throwable => println(f"PROF $name FAILED ${e.getMessage.take(60)}") }
      println(f"PROF $name ${(System.nanoTime()-t0)/1e9}%.1fs")
    }
    spark.stop()
  }
}

package graft.ann


import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.SparkTestSession

/** Structural + plan properties of the persistent IVF index: the layout is
  * really partitioned by cid, searches prune to the probed partitions at
  * planning time, and results equal the ad-hoc knnIvf path (the e5 gate
  * additionally pins that equivalence against the DuckDB oracle). */
class IvfIndexSpec extends AnyFunSuite with Matchers with SparkTestSession {

  private def vectors = {
    import spark.implicits._
    // deterministic 40-dim lattice vectors, ids 0..199
    (0L until 200L).map { i =>
      (i, (0 until 40).map(j => (((i * 31 + j * 17) % 19) - 9).toDouble))
    }.toDF("id", "vec")
  }

  private lazy val indexPath: String = {
    val p = graft.util.TempDirs.create("graft_ivf_spec_")
    val v = vectors
    val centroids = v.where(pmod(col("id"), lit(23)) === 0)
      .select(col("id").as("cid"), col("vec"))
    IvfIndex.build(spark, v, centroids, p)
    p
  }

  test("layout is physically partitioned by cid") {
    IvfIndex.exists(spark, indexPath) shouldBe true
    val dirs = new java.io.File(s"$indexPath/data").listFiles()
      .filter(_.isDirectory).map(_.getName)
    all(dirs) should startWith("cid=")
    dirs.length should be > 1
    // every corpus row with a non-empty vector is indexed exactly once
    spark.read.parquet(s"$indexPath/data").count() shouldBe 200
  }

  test("search prunes to the probed cid partitions at planning time") {
    val queries = vectors.where(col("id") < 3)
    val plan = IvfIndex.search(spark, indexPath, queries, 4, 2)
      .queryExecution.executedPlan.toString
    plan.linesIterator.filter(_.contains("PartitionFilters"))
      .mkString should include("cid")
  }

  test("kmeans-trained quantizer + persisted index: recall floor vs brute force") {
    // the production composition: Lloyd-trained centroids -> build -> search;
    // nprobe=4 of 8 trained cells must recover most true top-4 neighbors
    val v = vectors
    val trained = Ann.kmeansCentroids(v, k = 8, iters = 3, stride = 25)
    val p = graft.util.TempDirs.create("graft_ivf_kmeans_")
    IvfIndex.build(spark, v, trained, p)
    val queries = v.where(col("id") < 10)
    val got = IvfIndex.search(spark, p, queries, 4, 4)
      .select("query_id", "neighbor_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val truth = Ann.knnBruteForce(queries, v, 4)
      .select("query_id", "neighbor_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (got & truth).size.toDouble / truth.size
    recall should be >= 0.7
  }

  test("append: a grown index equals a single-pass build, and old files are untouched") {
    val v = vectors
    val centroids = v.where(pmod(col("id"), lit(23)) === 0)
      .select(col("id").as("cid"), col("vec"))
    val p = graft.util.TempDirs.create("graft_ivf_append_spec_")
    IvfIndex.build(spark, v.where(pmod(col("id"), lit(2)) === 0), centroids, p)
    def files() = {
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(java.nio.file.Paths.get(s"$p/data")).iterator().asScala
        .filter(_.toString.endsWith(".parquet"))
        .map(f => f.toString -> java.nio.file.Files.getLastModifiedTime(f).toMillis)
        .toMap
    }
    val before = files()
    IvfIndex.append(spark, v.where(pmod(col("id"), lit(2)) === 1), p)
    // append-only: every pre-existing file survives byte-identical
    val after = files()
    before.foreach { case (f, mtime) => after.get(f) shouldBe Some(mtime) }
    after.size should be > before.size
    spark.read.parquet(s"$p/data").count() shouldBe 200
    // the grown index answers exactly like the single-pass index
    val queries = v.where(col("id") < 5)
    val grown = IvfIndex.search(spark, p, queries, 4, 2)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    val single = IvfIndex.search(spark, indexPath, queries, 4, 2)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    grown shouldBe single
  }

  test("s19 composition: a STREAM-grown index answers exactly like the batch build") {
    // the s19 gate pins this against the DuckDB oracle on the real corpus;
    // here the property is isolated on the lattice vectors — foreachBatch
    // build-then-append over three micro-batches, any chunking
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val v = vectors
    val centroids = v.where(pmod(col("id"), lit(23)) === 0)
      .select(col("id").as("cid"), col("vec")).localCheckpoint()
    val p = graft.util.TempDirs.create("graft_ivf_stream_spec_")
    val stream = MemoryStream[(Long, Seq[Double])]
    val ckpt = graft.util.TempDirs.create("graft_ivf_stream_ckpt_")
    val q = stream.toDF().toDF("id", "vec").writeStream
      .option("checkpointLocation", ckpt)
      .outputMode("append")
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, batchId: Long) =>
        if (batchId == 0L) IvfIndex.build(spark, batch, centroids, p)
        else IvfIndex.append(spark, batch, p)
      }
      .start()
    try {
      // stream rows come from the SAME fixture the batch index was built
      // from — one source of truth for the vector geometry
      val rows = v.as[(Long, Seq[Double])].collect().toSeq.sortBy(_._1)
      rows.grouped(70).foreach { chunk =>
        stream.addData(chunk: _*)
        q.processAllAvailable()
      }
    } finally q.stop()
    val queries = v.where(col("id") < 5)
    val streamed = IvfIndex.search(spark, p, queries, 4, 2)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    val single = IvfIndex.search(spark, indexPath, queries, 4, 2)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    streamed shouldBe single
  }

  test("compact: N-batch stream -> compact -> search unchanged, file count bounded") {
    // the maintenance-loop hygiene case (round 9): micro-batch appends
    // accumulate one file set per batch per touched partition; compact()
    // rewrites to ONE file per cid= partition without changing a single
    // search result (the s19 gate runs this composition against the
    // DuckDB oracle on the real corpus)
    val v = vectors
    val centroids = v.where(pmod(col("id"), lit(23)) === 0)
      .select(col("id").as("cid"), col("vec"))
    val p = graft.util.TempDirs.create("graft_ivf_compact_spec_")
    // 4 "micro-batches": build + 3 appends (the append path is what a
    // foreachBatch maintenance loop calls per batch)
    IvfIndex.build(spark, v.where(pmod(col("id"), lit(4)) === 0), centroids, p)
    (1 to 3).foreach(i =>
      IvfIndex.append(spark, v.where(pmod(col("id"), lit(4)) === i), p))
    val queries = v.where(col("id") < 5)
    val before = IvfIndex.search(spark, p, queries, 4, 2)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    val filesBefore = IvfIndex.dataFileCount(spark, p)
    val nCids = new java.io.File(s"$p/data").listFiles()
      .count(f => f.isDirectory && f.getName.startsWith("cid="))
    filesBefore should be > nCids // appends really did accumulate files
    IvfIndex.compact(spark, p)
    // bounded: exactly one file per occupied partition
    IvfIndex.dataFileCount(spark, p) shouldBe nCids
    new java.io.File(s"$p/data_old").exists() shouldBe false
    new java.io.File(s"$p/data_compacting").exists() shouldBe false
    spark.read.parquet(s"$p/data").count() shouldBe 200
    val after = IvfIndex.search(spark, p, queries, 4, 2)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    after shouldBe before
  }

  test("index search equals ad-hoc knnIvf for the same parameters") {
    val v = vectors
    val centroids = v.where(pmod(col("id"), lit(23)) === 0)
      .select(col("id").as("cid"), col("vec"))
    val queries = v.where(col("id") < 5)
    val viaIndex = IvfIndex.search(spark, indexPath, queries, 4, 2)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    val adHoc = Ann.knnIvf(queries, v, centroids, 4, 2)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    viaIndex shouldBe adHoc
  }
}

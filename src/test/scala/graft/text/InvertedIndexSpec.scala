package graft.text

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.SparkTestSession

class InvertedIndexSpec extends AnyFunSuite with Matchers with SparkTestSession {

  private def docs = {
    import spark.implicits._
    Seq(
      (1L, "alpha beta gamma alpha"),
      (2L, "beta beta delta"),
      (3L, "gamma alpha epsilon zeta"),
      (4L, "unrelated words only here"),
      (5L, "")).toDF("doc_id", "text")
  }

  private lazy val path: String = {
    val p = Files.createTempDirectory("graft_inv_").toString
    InvertedIndex.build(spark, docs, p, numBuckets = 8)
    p
  }

  test("driver bucketOf matches the engine's crc32 bucket expression") {
    import spark.implicits._
    val terms = Seq("alpha", "beta", "gamma", "δ-unicode", "", "hash")
    val engine = terms.toDF("term")
      .select(col("term"), pmod(crc32(encode(col("term"), "UTF-8")), lit(8L)).as("tb"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    terms.foreach { t =>
      InvertedIndex.bucketOf(t, 8) shouldBe engine(t)
    }
  }

  test("search reads only the query terms' tb partitions (plan-level pruning)") {
    val plan = InvertedIndex.search(spark, path, Seq("alpha"), 3)
      .queryExecution.executedPlan.toString
    plan should include("PartitionFilters")
    val expected = InvertedIndex.bucketOf("alpha", 8)
    plan.linesIterator.filter(_.contains("PartitionFilters"))
      .mkString should include(s"tb")
    // the postings scan must not read every bucket: partition count in the
    // scan is bounded by the probe, not the layout
    val scanned = plan.linesIterator.find(_.contains("PartitionFilters")).get
    scanned should include(expected.toString)
  }

  test("search ranks by the d18 scoring, ties broken on doc_id") {
    val r = InvertedIndex.search(spark, path, Seq("alpha", "beta"), 10)
      .collect().map(r => (r.getInt(0), r.getLong(1)))
    // docs 1,2,3 match; 4 and 5 don't
    r.map(_._2).toSet shouldBe Set(1L, 2L, 3L)
    r.map(_._1).toSeq shouldBe (1 to r.length)
    // doc 1 (alpha x2 + beta... no beta) vs doc 2 (beta x2): both terms are
    // equally rare (df=2 each); doc 1 has tf(alpha)=2 in dl=4 -> strongest
    r.head._2 shouldBe 1L
  }

  test("a doc with no tokens dilutes avgdl but never matches") {
    val st = spark.read.parquet(s"$path/stats").first()
    st.getLong(st.fieldIndex("n_docs")) shouldBe 5L
    st.getLong(st.fieldIndex("sum_dl")) shouldBe 15L // 4+3+4+4+0 tokens
  }

  test("append equals a single-pass build (search-identical)") {
    val p2 = Files.createTempDirectory("graft_inv_app_").toString
    InvertedIndex.build(spark, docs.where(col("doc_id") % 2 === 0), p2, numBuckets = 8)
    InvertedIndex.append(spark, docs.where(col("doc_id") % 2 =!= 0), p2)
    val st = spark.read.parquet(s"$p2/stats").first()
    st.getLong(st.fieldIndex("n_docs")) shouldBe 5L
    st.getLong(st.fieldIndex("sum_dl")) shouldBe 15L
    val full = InvertedIndex.search(spark, path, Seq("alpha", "beta"), 10).collect()
    val grown = InvertedIndex.search(spark, p2, Seq("alpha", "beta"), 10).collect()
    grown shouldBe full
  }

  test("rebuild is idempotent (overwrite)") {
    InvertedIndex.build(spark, docs, path, numBuckets = 8)
    spark.read.parquet(s"$path/doclen").count() shouldBe 4 // docs with tokens
  }

  test("search with no terms is rejected loudly (ADVICE r3)") {
    an[IllegalArgumentException] should be thrownBy
      InvertedIndex.search(spark, path, Seq.empty, k = 5)
  }

  test("search on an EMPTY index returns an empty frame, not NaN scores") {
    import spark.implicits._
    val p = Files.createTempDirectory("graft_inv_empty_").toString
    InvertedIndex.build(spark, Seq.empty[(Long, String)].toDF("doc_id", "text"),
      p, numBuckets = 8)
    val res = InvertedIndex.search(spark, p, Seq("alpha"), k = 5)
    res.columns.toSeq shouldBe Seq("rnk", "doc_id", "score")
    res.count() shouldBe 0L
  }
}

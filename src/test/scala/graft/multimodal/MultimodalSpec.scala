package graft.multimodal

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.SparkTestSession

class MultimodalSpec extends AnyFunSuite with Matchers with SparkTestSession {

  private lazy val media = {
    import spark.implicits._
    val docs = Seq((0L, "hello world, this is a binary payload"),
      (1L, "another longer payload with more bytes in it for the histogram"),
      (2L, "x")).toDF("doc_id", "text")
    Multimodal.synthesizeMediaTable(docs)
  }

  test("media table: binary payload + mime metadata") {
    val rows = media.collect()
    rows.length shouldBe 3
    rows.foreach { r =>
      r.getAs[Array[Byte]]("content").length should be > 0
      Set("image/png", "image/jpeg", "audio/wav") should contain(r.getAs[String]("mime"))
    }
  }

  test("decodeStub: deterministic metadata from payload") {
    val out = media.select(col("doc_id"),
      Multimodal.decodeStub(col("content"), col("mime")).as("meta")).collect()
    out.foreach { r =>
      val m = r.getStruct(1)
      m.getAs[Int]("width") should (be >= 16 and be < 80)
      m.getAs[Int]("height") should (be >= 16 and be < 80)
      m.getAs[Int]("channels") should (be >= 1 and be <= 3)
    }
    // determinism: run twice, identical
    val again = media.select(Multimodal.decodeStub(col("content"), col("mime"))).collect()
    again.map(_.toString) shouldBe out.map(r => org.apache.spark.sql.Row(r.get(1)).toString)
  }

  test("byte histogram: 16 normalized bins per row, partition-local") {
    val out = Multimodal.withByteHistogram(media, "content")
    val feats = out.select("features").collect().map(_.getSeq[Float](0))
    feats.foreach { f =>
      f.length shouldBe 16
      f.sum shouldBe 1.0f +- 1e-3f
    }
  }

  test("sampleFrames: stride-sampled frames with index") {
    val out = Multimodal.sampleFrames(media, "content", numFrames = 4, stride = 2)
    val byDoc = out.groupBy("doc_id").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    byDoc.values.foreach(_ shouldBe 2L) // frames 0 and 2
    out.select("frame_idx").distinct().collect().map(_.getInt(0)).sorted shouldBe Array(0, 2)
  }

  test("resizeStub: payload shrinks to at most the target size") {
    val fl = org.apache.spark.sql.functions.length _ // shadowed by Matchers.length
    val out = media.select(fl(Multimodal.resizeStub(col("content"), 10)).as("len"),
      fl(col("content")).as("orig")).collect()
    out.foreach { r =>
      r.getInt(0) should be <= 11 // ceil rounding slack of one byte
      if (r.getInt(1) <= 10) r.getInt(0) shouldBe r.getInt(1)
    }
  }
}

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

  test("averageHash: 32-bit halves, deterministic, identical payloads collide") {
    import spark.implicits._
    val dup = Seq((0L, "the same payload bytes exactly"),
      (1L, "the same payload bytes exactly"),
      (2L, "completely different content with other letters and length")).toDF("doc_id", "text")
    val sig = Multimodal.withAverageHash(Multimodal.synthesizeMediaTable(dup), "content")
      .select("doc_id", "ahash_hi", "ahash_lo").collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    // halves stay within 32 unsigned bits (engine-portable packing)
    sig.values.foreach { case (hi, lo) =>
      hi should (be >= 0L and be < (1L << 32))
      lo should (be >= 0L and be < (1L << 32))
    }
    sig(0L) shouldBe sig(1L) // identical bytes -> identical signature
    sig(0L) should not be sig(2L)
    // reference check vs an independent scalar computation of doc 0
    val bytes = "the same payload bytes exactly".getBytes("UTF-8")
    val n = bytes.length
    val sums = new Array[Long](64); val cnts = new Array[Long](64); var tot = 0L
    bytes.zipWithIndex.foreach { case (b, i) =>
      val blk = (i.toLong * 64 / n).toInt
      sums(blk) += (b & 0xFF); cnts(blk) += 1; tot += (b & 0xFF)
    }
    var hi = 0L; var lo = 0L
    (0 until 64).foreach { blk =>
      if (sums(blk) * n > tot * cnts(blk)) {
        if (blk < 32) lo |= 1L << blk else hi |= 1L << (blk - 32)
      }
    }
    sig(0L) shouldBe ((hi, lo))
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

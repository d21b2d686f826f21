package graft.text

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.{PipelineQueries, Queries, SparkTestSession}

/** Branches the sf-scale oracles do NOT exercise:
  *  - d11's df-cap (no 12-word span in the synthetic corpus occurs in more
  *    than 50 documents, so the cap never fires in the gate) — a crafted
  *    boilerplate span shared by ALL docs must be dropped before pairing,
  *    while a rare shared span still pairs;
  *  - c3 ≡ c2 on real data: the Bloom prefilter must not change the result
  *    (false positives are removed by the exact verify join).
  */
class DedupGatesSpec extends AnyFunSuite with Matchers with SparkTestSession {

  /** Write a crafted documents.parquet into a temp dir shaped like an sf
    * dir, so the d-series queries can run on it unchanged. */
  private def corpusDir(texts: Seq[String]): String = {
    val dir = Files.createTempDirectory("graft_dedup_gate_").toString
    import spark.implicits._
    texts.zipWithIndex
      .map { case (t, i) =>
        (i.toLong, t, "en", s"src$i", t.length.toLong)
      }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.parquet(s"$dir/documents.parquet")
    dir
  }

  private def words(prefix: String, n: Int): String =
    (0 until n).map(i => s"$prefix$i").mkString(" ")

  test("d11: ubiquitous spans are dropped by the df-cap; rare spans pair") {
    // 60 docs all opening with the SAME 12-word boilerplate (df=60 > cap=50)
    // and otherwise unique text; docs 0 and 1 additionally share one rare
    // 12-word span. Without the cap, the boilerplate alone would produce
    // C(60,2) = 1770 pairs.
    val boiler = words("b", 12)
    val rare = words("r", 12)
    val texts = (0 until 60).map { i =>
      val tail = if (i <= 1) rare else words(s"u$i-", 12)
      s"$boiler $tail"
    }
    val dir = corpusDir(texts)
    // NOTE: windows STRADDLING the boilerplate/tail boundary are unique per
    // doc (the tail differs), so only the pure-boilerplate window is capped.
    val out = Queries.d11DupSpanPairs(spark, dir).collect()
    out.map(r => (r.getLong(0), r.getLong(1))).toSeq shouldBe Seq((0L, 1L))
    // docs 0 and 1: identical text "boiler rare" => every window of the
    // 24-word doc is shared; the boilerplate-only window (position 1) is
    // capped out, leaving the 12 windows at positions 2..13.
    out.head.getLong(2) shouldBe 12L
  }

  test("d11: documents shorter than the span width produce no rows") {
    val dir = corpusDir(Seq(words("a", 5), words("a", 5)))
    Queries.d11DupSpanPairs(spark, dir).count() shouldBe 0L
  }

  test("d12: hapax terms are counted (always 0 at gate scale — crafted corpus)") {
    // two docs: "common" appears in both (f=4), "only0"/"only1" once each
    val dir = corpusDir(Seq("common common only0", "common common only1"))
    val r = graft.Queries.d12VocabStats(spark, dir).collect().head
    r.getLong(0) shouldBe 6L // total tokens
    r.getLong(1) shouldBe 3L // vocab: common, only0, only1
    r.getLong(2) shouldBe 2L // hapax: only0, only1
    r.getDouble(3) shouldBe 0.5 // ttr = 3/6
  }

  test("d36 size-gated interval broadcast: forced shuffle fallback == broadcast path") {
    // a corpus with real removals: a shared 12-word span (= D11SpanWords)
    // duplicated across docs
    val span = (0 until 12).map(i => s"w$i").mkString(" ")
    val dir = corpusDir(Seq(
      s"$span zeta", s"eta $span", s"$span theta iota", "kappa lambda"))
    val viaBroadcast = graft.Queries.d36DedupCorpus(spark, dir)
      .collect().map(_.toSeq).toSet
    val viaShuffle = graft.Queries.d36DedupCorpus(spark, dir, broadcastMaxRows = 0L)
      .collect().map(_.toSeq).toSet
    viaShuffle shouldBe viaBroadcast
    // the fixture actually exercised removals (not a vacuous pass)
    viaBroadcast.exists(r => r(1) != r(2)) shouldBe true // n_words != kept_words
  }

  test("memo tolerates nested builders (regression: Recursive update flake)") {
    // c1/t6/t8 builders nest memo calls; computeIfAbsent threw
    // IllegalStateException("Recursive update") depending on which query
    // populated the inner frames first (registry iteration order)
    val df = PipelineQueries.memo(spark, "reentrancy_outer") {
      PipelineQueries.memo(spark, "reentrancy_inner") {
        spark.range(3).toDF("x")
      }
    }
    df.count() shouldBe 3L
  }

  test("c3 bloom decontamination equals c2 exact broadcast on sf0.001") {
    val dir = "/root/testdata/sf0.001"
    val c2 = PipelineQueries.c2Contamination(spark, dir).collect().toSeq
    val c3 = PipelineQueries.c3BloomDecontam(spark, dir).collect().toSeq
    c3 shouldBe c2
  }
}

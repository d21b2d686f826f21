package graft.text

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers
import org.scalacheck.Gen

import graft.{PropHelper, SparkTestSession}

/** Pins the two equivalences [[Bpe]]'s oracle parity stands on:
  *
  * 1. The sweep implementation ([[Bpe.tokenCount]]) equals the CANONICAL
  *    merge loop — "repeatedly merge the leftmost occurrence of the
  *    best-ranked pair present" (the reference here is an independently
  *    structured one-merge-per-iteration loop, not the sweep).
  * 2. The oracle's delimited-string surgery
  *    ([[Bpe.tokenCountStringForm]] — MaxMergesPerRule first-occurrence
  *    replacements per rule, the verbatim shape of the SQL CTE chain)
  *    produces the same token counts.
  *
  * Both are exercised on the adversarial corner that breaks naive
  * replace-all approaches: same-character runs ("aaaa" under rule (a,a)
  * must become (aa)(aa), never (aa)·a·a), plus random words over a small
  * alphabet so rule interactions get dense coverage.
  */
class BpeSpec extends AnyFunSuite with Matchers with PropHelper
    with SparkTestSession {

  /** Independent canonical reference: one merge per iteration — find the
    * best-ranked (lowest rank) rule present anywhere, merge its LEFTMOST
    * occurrence, repeat until no rule applies. */
  private def canonical(word: String, rules: Seq[(String, String)]): Int = {
    val rank = rules.zipWithIndex.toMap
    var toks = word.map(_.toString).toVector
    var done = false
    while (!done) {
      val best = toks.indices.dropRight(1)
        .flatMap(i => rank.get((toks(i), toks(i + 1))).map(r => (r, i)))
        .sortBy(identity).headOption
      best match {
        case Some((_, i)) =>
          toks = (toks.take(i) :+ (toks(i) + toks(i + 1))) ++ toks.drop(i + 2)
        case None => done = true
      }
    }
    toks.length
  }

  private val runRules = Seq(("a", "a"), ("a", "b"), ("b", "a"))

  test("same-char runs: sweep == canonical == string form (the corner)") {
    // aaaa -> (aa)(aa) = 2; aaa -> (aa)a = 2; aaaaa -> (aa)(aa)a = 3
    Bpe.tokenCount("aaaa", Seq(("a", "a"))) shouldBe 2
    Bpe.tokenCount("aaa", Seq(("a", "a"))) shouldBe 2
    Bpe.tokenCount("aaaaa", Seq(("a", "a"))) shouldBe 3
    for (w <- Seq("aaaa", "aaa", "aaaaa", "aabbaa", "abababab", "baab")) {
      Bpe.tokenCount(w, runRules) shouldBe canonical(w, runRules)
      Bpe.tokenCountStringForm(w, runRules) shouldBe canonical(w, runRules)
    }
  }

  test("property: sweep == canonical == oracle string form on random words") {
    val wordGen = for {
      n <- Gen.choose(1, 2 * Bpe.MaxMergesPerRule) // the oracle-bound regime
      cs <- Gen.listOfN(n, Gen.oneOf('a', 'b', 'c'))
    } yield cs.mkString
    val rulesGen = for {
      k <- Gen.choose(1, 6)
      ps <- Gen.listOfN(k, Gen.zip(Gen.oneOf("a", "b", "c"), Gen.oneOf("a", "b", "c")))
    } yield ps.distinct
    forAll(Gen.zip(wordGen, rulesGen), n = 500) { case (w, rules) =>
      val expect = canonical(w, rules)
      Bpe.tokenCount(w, rules) shouldBe expect
      Bpe.tokenCountStringForm(w, rules) shouldBe expect
    }
    // sweep == canonical holds at ANY length (the string form's R bound
    // does not apply to the sweep): a long same-char run
    val long = "a" * 12
    Bpe.tokenCount(long, Seq(("a", "a"))) shouldBe canonical(long, Seq(("a", "a")))
  }

  test("training: one-pass pair counts with (count DESC, pair ASC) tie-break") {
    import spark.implicits._
    // "abab" contributes ab x2, ba x1; "ba" contributes ba x1 -> tie ab=2? no:
    // ab: 2 (from abab), ba: 2 (abab's middle + "ba") -> tie broken to (a,b)
    val docs = Seq((0L, "abab ba"), (1L, "cc")).toDF("doc_id", "text")
    val rules = Bpe.trainMerges(docs, 3)
    rules shouldBe Seq(("a", "b"), ("b", "a"), ("c", "c"))
  }

  test("docTokenCounts: end-to-end counts on a tiny corpus") {
    import spark.implicits._
    val docs = Seq((0L, "abab abab"), (1L, "ba cc"), (2L, "")).toDF("doc_id", "text")
    val rules = Bpe.trainMerges(docs)
    val out = Bpe.docTokenCounts(spark, docs).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    val expect0 = 2L * Bpe.tokenCount("abab", rules)
    val expect1 = Bpe.tokenCount("ba", rules) + Bpe.tokenCount("cc", rules)
    out(0L) shouldBe ((2L, expect0))
    out(1L) shouldBe ((2L, expect1.toLong))
    out(2L) shouldBe ((0L, 0L)) // wordless doc keeps (0, 0)
  }

  test("iterative training: retrained counts produce MULTI-char rules") {
    import spark.implicits._
    // "abab" x3: one-pass char pairs are (a,b):6, (b,a):3 — it can never
    // emit a rule with a multi-char side. The canonical loop retrains
    // after each merge: round 1 (a,b) -> [ab, ab]; round 2's most frequent
    // adjacent TOKEN pair is (ab, ab).
    val docs = Seq((0L, "abab abab"), (1L, "abab")).toDF("doc_id", "text")
    val rules = Bpe.trainMergesIterative(spark, docs, numMerges = 2)
    rules.head shouldBe (("a", "b"))
    rules(1) shouldBe (("ab", "ab"))
    // and the one-pass table on the same corpus stays single-char
    Bpe.trainMerges(docs, 2).foreach { case (a, b) =>
      a.length shouldBe 1; b.length shouldBe 1
    }
  }

  test("iterative application: sweep == string surgery for multi-char rules") {
    // the delimiter-anchored pattern '|a|b|' cannot match mid-token, so
    // first-occurrence surgery == leftmost token merge even when rule
    // sides are multi-char — incl. the same-token run corner
    val rules = Seq(("a", "b"), ("ab", "ab"), ("abab", "c"))
    Seq("abab", "ababab", "abababab", "ababc", "ababcc", "ba", "c", "")
      .foreach { w =>
        withClue(s"word '$w': ") {
          Bpe.tokenCount(w, rules) shouldBe Bpe.tokenCountStringForm(w, rules)
        }
      }
  }

  test("iterative training: early stop when no adjacent pair remains") {
    import spark.implicits._
    val docs = Seq((0L, "a b c"), (1L, "d e")).toDF("doc_id", "text")
    Bpe.trainMergesIterative(spark, docs) shouldBe empty
    val out = Bpe.docTokenCountsIterative(spark, docs).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    out(0L) shouldBe ((3L, 3L))
    out(1L) shouldBe ((2L, 2L))
  }

  test("docTokenCountsIterative: end-to-end counts on a tiny corpus") {
    import spark.implicits._
    val docs = Seq((0L, "abab abab"), (1L, "ba cc"), (2L, "")).toDF("doc_id", "text")
    val rules = Bpe.trainMergesIterative(spark, docs)
    val out = Bpe.docTokenCountsIterative(spark, docs).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    out(0L) shouldBe ((2L, 2L * Bpe.tokenCount("abab", rules)))
    out(1L) shouldBe ((2L,
      (Bpe.tokenCount("ba", rules) + Bpe.tokenCount("cc", rules)).toLong))
    out(2L) shouldBe ((0L, 0L))
  }

  test("size-gated vocab broadcast: forced shuffle fallback == broadcast path") {
    import spark.implicits._
    val docs = Seq((0L, "abab abab"), (1L, "ba cc"), (2L, "aa bb ab"))
      .toDF("doc_id", "text")
    val viaBroadcast = Bpe.docTokenCounts(spark, docs)
      .collect().map(_.toSeq).toSet
    // maxRows = 0 forces SizeGate past its ceiling -> plain shuffle join
    val viaShuffle = Bpe.docTokenCounts(spark, docs, broadcastMaxRows = 0L)
      .collect().map(_.toSeq).toSet
    viaShuffle shouldBe viaBroadcast
  }

  test("requireOracleBound fails loudly past 2*MaxMergesPerRule") {
    noException should be thrownBy Bpe.requireOracleBound(2 * Bpe.MaxMergesPerRule)
    an[IllegalArgumentException] should be thrownBy
      Bpe.requireOracleBound(2 * Bpe.MaxMergesPerRule + 1)
  }

  test("wordless corpus keeps the (0, 0) contract; '|' in vocabulary fails loudly") {
    import spark.implicits._
    val empty = Seq((0L, ""), (1L, "   ")).toDF("doc_id", "text")
    val out = Bpe.docTokenCounts(spark, empty).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    out(0L) shouldBe ((0L, 0L))
    out(1L) shouldBe ((0L, 0L))
    // the oracle reserves '|' as the token delimiter — a corpus word
    // containing it must fail the parity guard, never silently diverge
    val piped = Seq((0L, "a|b ok")).toDF("doc_id", "text")
    an[IllegalArgumentException] should be thrownBy
      Bpe.docTokenCounts(spark, piped).collect()
  }
}

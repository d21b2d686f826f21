package graft.text

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.SparkTestSession

/** The Column API (interpreted HOFs, for composability) and the exploded
  * codegen formulation used by the gate queries must agree exactly. */
class TextOpsSpec extends AnyFunSuite with Matchers with SparkTestSession {
  import TextOps.P

  private lazy val docs = {
    import spark.implicits._
    Seq(
      (0L, "the quick brown fox jumps over the lazy dog"),
      (1L, "the quick brown fox jumps over the lazy dog"), // exact dup
      (2L, "der schnelle braune fuchs springt"),
      (3L, "ab"), // below shingle size
      (4L, "aaaaaaaaaa"), // degenerate repeats
      (5L, "水水水 der la the 的的的")) // multibyte
      .toDF("doc_id", "text")
  }

  test("minhash: column API == exploded aggregation") {
    val viaColumn = docs.select(col("doc_id"),
      TextOps.minhashSignature(col("text"), 8).as("sig")).collect()
      .map(r => r.getLong(0) -> r.getSeq[Any](1).map(Option(_))).toMap

    val aggs = (0 until 8).map { j =>
      min((pmod(col("code"), lit(P)) * TextOps.hashA(j) + TextOps.hashB(j)) % P).as(s"mh$j")
    }
    val viaExplode = docs
      .select(col("doc_id"), explode_outer(TextOps.shingleCodes(col("text"))).as("code"))
      .groupBy("doc_id").agg(aggs.head, aggs.tail: _*)
      .collect()
      .map(r => r.getLong(0) -> (1 to 8).map(i => Option(r.get(i)))).toMap

    viaColumn.keySet shouldBe viaExplode.keySet
    viaColumn.foreach { case (id, sig) => sig shouldBe viaExplode(id) }
    // doc 3 has no shingles -> all-null signature
    viaColumn(3L).foreach(_ shouldBe None)
    // exact dups share signatures
    viaColumn(0L) shouldBe viaColumn(1L)
  }

  test("simhash: column API == exploded bit votes") {
    val viaColumn = docs.select(col("doc_id"),
      TextOps.simhash31(col("text")).as("s")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap

    val h = (pmod(col("code"), lit(P)) * TextOps.hashA(0) + TextOps.hashB(0)) % P
    val votes = (0 until 31).map { b =>
      sum(shiftright(col("h"), b).bitwiseAND(lit(1L)) * 2L - 1L).as(s"v$b")
    }
    val bits = (0 until 31).map { b =>
      when(col(s"v$b") > 0, lit(1L << b)).otherwise(lit(0L))
    }
    val viaExplode = docs
      .select(col("doc_id"), explode_outer(TextOps.shingleCodes(col("text"))).as("code"))
      .select(col("doc_id"), h.as("h"))
      .groupBy("doc_id").agg(votes.head, votes.tail: _*)
      .select(col("doc_id"), bits.reduce(_ + _).as("s"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

    viaColumn shouldBe viaExplode
    viaColumn(3L) shouldBe 0L // no shingles -> 0
  }

  test("jaccard: identical texts 1.0, disjoint 0.0, empty 0.0") {
    import spark.implicits._
    val pairs = Seq(
      ("the quick brown fox", "the quick brown fox", 1.0),
      ("aaaa bbbb cccc", "xxxx yyyy zzzz", 0.0),
      ("ab", "cd", 0.0))
      .toDF("a", "b", "expected")
    pairs.select(TextOps.jaccardShingles(col("a"), col("b")).as("j"), col("expected"))
      .collect().foreach(r => r.getDouble(0) shouldBe r.getDouble(1) +- 1e-9)
  }

  test("redactPii: emails, IPv4s, phones replaced; email claimed before IP") {
    import spark.implicits._
    val out = Seq(
      "mail a.b-c%d@sub.example.org now",
      "server at 192.168.0.1 responded",
      "call 555-0123 or 555-9999",
      // the dotted digits inside the address belong to the EMAIL, not an IP
      "odd address 1.2.3.4@5.6.7.8mail.com here",
      "no pii at all",
      "v1.2.3 is not an ip, 1.2.3.4 is").toDF("text")
      .select(TextOps.redactPii(col("text"))).as[String].collect()
    out(0) shouldBe "mail <EMAIL> now"
    out(1) shouldBe "server at <IP> responded"
    out(2) shouldBe "call <PHONE> or <PHONE>"
    out(3) shouldBe "odd address <EMAIL> here"
    out(4) shouldBe "no pii at all"
    out(5) shouldBe "v1.2.3 is not an ip, <IP> is"
  }

  test("langId deterministic and sane on marker-rich text") {
    import spark.implicits._
    val out = Seq(
      "the cat and the dog of the house",
      "der hund und die katze und der vogel",
      "xx zz qq ww").toDF("text")
      .select(TextOps.langId(col("text"))).collect().map(_.getString(0))
    out(0) shouldBe "en"
    out(1) shouldBe "de"
    out(2) shouldBe "und" // no markers
  }

  test("wordGrams (batch positions form) == wordGramArray (stream in-row form)") {
    // the two gram definition sites must stay in lockstep: the batch form
    // is codegen'd (10x faster, round-9 A/B), the array form feeds s18's
    // in-row streaming filter — identical (doc_id, g) rows, all edges
    import spark.implicits._
    val docs = Seq(
      (0L, "a b c d e f"),           // normal
      (1L, "one two three"),         // shorter than k=4 -> no grams
      (2L, "  x   y  z   w  q "),    // irregular whitespace
      (3L, ""),                      // empty
      (4L, "r r r r r r r r"))       // repeats
      .toDF("doc_id", "text")
    for (k <- Seq(3, 4)) {
      val batch = graft.text.TextOps.wordGrams(docs, k)
        .collect().map(r => (r.getLong(0), r.getString(1))).sorted.toSeq
      val stream = docs.select(col("doc_id"),
          explode(graft.text.TextOps.wordGramArray(col("text"), k)).as("g"))
        .collect().map(r => (r.getLong(0), r.getString(1))).sorted.toSeq
      batch shouldBe stream
    }
  }
}

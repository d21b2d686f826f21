package graft.text

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/**
 * Text-analysis operators for large-scale training-data pipelines:
 * shingling, MinHash, SimHash, Jaccard, language-ID, fingerprinting.
 *
 * Every operator is built from Spark's codegen-friendly built-ins
 * (higher-order array functions, no UDFs), with arithmetic chosen to be
 * reproducible bit-for-bit in an independent SQL engine (the DuckDB oracles)
 * — deterministic seeded "randomness", integer modular hashing, codepoint
 * (not byte) character semantics.
 *
 * Scale notes: all per-document operators are narrow (no shuffle). MinHash
 * signatures are fixed-width arrays -> the LSH band join shuffles only
 * (band_id, band_hash, doc_id) triples, never the text. Pairwise verification
 * joins are blocked (LSH bucket or (lang, length-bucket)), so candidate sets
 * stay near-linear instead of O(n^2).
 */
object TextOps {
  /** Modulus for all hashing: the Mersenne prime 2^31-1. */
  val P = 2147483647L

  /** Word k-grams of a text column as an IN-ROW array (split on
    * whitespace, empties dropped, tokens re-joined with single spaces);
    * docs shorter than k yield an empty array. STREAM-SIDE form: the s18
    * ingest filter consumes the array in-row (no explode, no shuffle).
    * The higher-order `transform` lambda is INTERPRETED — the round-9
    * isolated A/B measured gram formation at 2.71 s via this form vs
    * 0.27 s via [[wordGrams]]' exploded-positions form at sf0.1 — so the
    * BATCH path must not route through it; [[TextOpsSpec]] pins the two
    * forms to identical (doc_id, gram) rows so they cannot drift. */
  def wordGramArray(text: Column, k: Int): Column = {
    val ws = filter(split(text, "\\s+"), x => x =!= "")
    when(size(ws) >= k,
        transform(sequence(lit(1), size(ws) - (k - 1)),
          i => array_join(slice(ws, i, lit(k)), " ")))
      .otherwise(array().cast("array<string>"))
  }

  /** Word k-grams of a documents frame: (doc_id, g). BATCH form — the
    * gram formation for d9/d11/c2/c3: explode window START POSITIONS and
    * build each gram with codegen'd slice/array_join on the way out (no
    * interpreted per-row lambda over the gram array — see
    * [[wordGramArray]]'s 10x measurement). Docs shorter than k yield no
    * rows. Callers hash `g` (sha2) before any shuffle. */
  def wordGrams(docs: org.apache.spark.sql.DataFrame, k: Int)
      : org.apache.spark.sql.DataFrame = {
    val ws = filter(split(col("text"), "\\s+"), x => x =!= "")
    docs.select(col("doc_id"), ws.as("_ws"))
      .select(col("doc_id"), col("_ws"), explode(
        when(size(col("_ws")) >= k, sequence(lit(1), size(col("_ws")) - (k - 1)))
          .otherwise(array().cast("array<int>"))).as("_i"))
      .select(col("doc_id"),
        array_join(slice(col("_ws"), col("_i"), lit(k)), " ").as("g"))
  }

  /** Hash family: h_j(x) = (x*A_j + B_j) mod P. A_j stays < 2^21 so
    * (P-1)*A_j fits comfortably in a signed 64-bit long. */
  def hashA(j: Int): Long = 976369L + (2L * j * 1299721L) % 1048573L
  def hashB(j: Int): Long = (433024223L + j.toLong * 15485863L) % P

  /** Character 3-gram codes over unicode codepoints:
    * code_i = cp(i)*65536 + cp(i+1)*256 + cp(i+2); empty below 3 chars. */
  def shingleCodes(text: Column): Column =
    when(char_length(text) < 3, array().cast("array<bigint>"))
      .otherwise(transform(
        sequence(lit(1), char_length(text) - 2),
        i => (ascii(text.substr(i, lit(1))) * 65536L +
          ascii(text.substr(i + 1, lit(1))) * 256L +
          ascii(text.substr(i + 2, lit(1)))).cast("bigint")))

  /** MinHash signature: sig_j = min over shingles of h_j(code mod P), j < n.
    * NULL entries for texts without shingles. */
  def minhashSignature(text: Column, numHashes: Int): Column = {
    val codes = shingleCodes(text)
    val sig = (0 until numHashes).map { j =>
      array_min(transform(codes, c => (pmod(c, lit(P)) * hashA(j) + hashB(j)) % P))
    }
    array(sig: _*)
  }

  /** LSH band bucket: polynomial combine of `rowsPerBand` adjacent signature
    * entries (band 0 = entries [0, rowsPerBand)). */
  def bandHash(sig: Column, band: Int, rowsPerBand: Int): Column =
    pmod(aggregate(slice(sig, band * rowsPerBand + 1, rowsPerBand),
      lit(0L), (acc, x) => (acc * 31L + x) % P), lit(P))

  /** t2's 2x4 band bucket straight from text — the codegen'd
    * [[LshBandHash]] expression (one compiled pass per row; see its
    * scaladoc for the parity contract with minhashSignature+bandHash). */
  def lshBandHash(text: Column, band: Int): Column = {
    import org.apache.spark.sql.graft.shims.{column, expression}
    column(LshBandHash(expression(text),
      org.apache.spark.sql.catalyst.expressions.Literal(band)))
  }

  /** 31-bit SimHash from the h_0 hash of each shingle: bit b is 1 iff the
    * +1/-1 votes of all shingle hashes at bit b sum positive. */
  def simhash31(text: Column): Column = {
    val hashes = transform(shingleCodes(text),
      c => (pmod(c, lit(P)) * hashA(0) + hashB(0)) % P)
    val bits = (0 until 31).map { b =>
      when(aggregate(hashes, lit(0L),
        (acc, h) => acc + (shiftright(h, b).bitwiseAND(lit(1L)) * 2L - 1L)) > 0,
        lit(1L << b)).otherwise(lit(0L))
    }
    bits.reduce(_ + _)
  }

  /** Distinct shingle set of a text (materialize this ONCE per document
    * before any pairwise join — recomputing it per candidate pair turns a
    * seconds-long join into minutes). */
  def distinctShingles(text: Column): Column = array_distinct(shingleCodes(text))

  /** Jaccard similarity of two precomputed distinct shingle-set columns. */
  def jaccardFromSets(sa: Column, sb: Column): Column = {
    val inter = size(array_intersect(sa, sb)).cast("double")
    val union = size(array_union(sa, sb)).cast("double")
    when(union === 0, 0.0).otherwise(inter / union)
  }

  /** Exact Jaccard similarity of the distinct shingle sets of two texts.
    * Prefer [[jaccardFromSets]] over precomputed sets in pairwise joins. */
  def jaccardShingles(a: Column, b: Column): Column =
    jaccardFromSets(distinctShingles(a), distinctShingles(b))

  /** Per-language stopword markers (padded with spaces; zh uses single
    * characters). Scores are marker occurrence counts. */
  val LangMarkers: Seq[(String, Seq[String])] = Seq(
    "de" -> Seq(" der ", " und ", " die "),
    "en" -> Seq(" the ", " and ", " of "),
    "es" -> Seq(" el ", " los ", " y "),
    "fr" -> Seq(" le ", " les ", " et "),
    "zh" -> Seq("的", "是", "了"))

  private def occurrences(text: Column, marker: String): Column =
    ((char_length(text) - char_length(regexp_replace(text,
      java.util.regex.Pattern.quote(marker), ""))) / marker.length).cast("long")

  /** English stopword markers, space-padded for word-boundary matching (the
    * same replace-count heuristic the language-ID markers use — counts are
    * approximate under adjacent repeats, identically so in the oracle). */
  val Stopwords: Seq[String] =
    Seq(" the ", " and ", " of ", " to ", " in ", " is ", " it ", " that ")

  /** Total stopword occurrences in `text` (padded). */
  def stopwordCount(text: Column): Column = {
    val padded = concat(lit(" "), text, lit(" "))
    Stopwords.map(m => occurrences(padded, m)).reduce(_ + _)
  }

  /** Predicted language = argmax of marker occurrence counts; ties break to
    * the lexicographically largest language code; "und" when no marker hits.
    * The argmax is a `greatest` over zero-padded "score||lang" strings so the
    * identical formulation runs in the DuckDB oracle (whose `greatest` does
    * not take structs). */
  def langId(text: Column): Column = {
    val padded = concat(lit(" "), text, lit(" "))
    val scored = LangMarkers.map { case (lang, markers) =>
      concat(lpad(markers.map(m => occurrences(padded, m)).reduce(_ + _).cast("string"),
        10, "0"), lit(lang))
    }
    val best = greatest(scored: _*)
    when(substring(best, 1, 10) > "0000000000", substring(best, 11, 2)).otherwise(lit("und"))
  }

  /** PII scrubbing patterns. Deliberately restricted to regex syntax with
    * identical semantics in Java regex (Spark's engine) and RE2 (the DuckDB
    * oracle's): plain character classes, bounded/unbounded repeats, and `\b`
    * word boundaries — no backreferences or lookaround. */
  val EmailRe = "[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\\.[a-zA-Z]{2,}"
  val Ipv4Re = "\\b[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\b"
  val PhoneRe = "\\b555-[0-9]{4}\\b"

  /** Redact emails, then IPv4 addresses, then phone numbers with typed
    * placeholder tokens. Email first: an address's local/domain parts contain
    * dotted digit runs the IP pattern could otherwise claim. Narrow per-row
    * codegen'd `regexp_replace` chain — no shuffle, no UDF; at corpus scale
    * this is a map-only pass that pipelines into whatever filter or write
    * follows it. */
  def redactPii(text: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(text, EmailRe, "<EMAIL>"),
        Ipv4Re, "<IP>"),
      PhoneRe, "<PHONE>")

  /** Order-sensitive document fingerprint: position-weighted polynomial hash
    * of the shingle codes, weights 31^(i mod 8) mod P; 0 for empty. */
  def fingerprint(text: Column): Column = {
    val w = (0 until 8).map(k => (0 until k).foldLeft(1L)((acc, _) => acc * 31 % P))
    val codes = shingleCodes(text)
    when(size(codes) === 0, lit(0L)).otherwise(
      pmod(aggregate(
        zip_with(codes, sequence(lit(0), size(codes) - 1),
          (c, i) => pmod(c, lit(P)) * element_at(array(w.map(lit): _*), pmod(i, lit(8)) + 1) % P),
        lit(0L), (acc, x) => (acc + x) % P), lit(P)))
  }
}

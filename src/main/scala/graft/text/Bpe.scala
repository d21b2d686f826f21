package graft.text

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/**
 * Merge-table BPE tokenization (Sennrich et al., ACL 2016 — the byte-pair
 * encoding every production tokenizer applies), trained and applied
 * engine-independently so a DuckDB oracle can reproduce the counts
 * bit-for-bit.
 *
 * TRAINING — one aggregation pass (the brief's contract): adjacent
 * character pairs are counted over every word OCCURRENCE in the corpus and
 * the top [[NumMerges]] by (count DESC, pair ASC) become the merge table in
 * that rank order. (Canonical BPE retrains counts after each merge; the
 * one-pass table is the deterministic, engine-independent variant — the
 * ranking is a pure aggregate both engines compute identically. The shuffle
 * carries only (char, char, partial count) triples, map-side combined to at
 * most alphabet^2 rows, at ANY corpus scale.)
 *
 * APPLICATION — canonical merge semantics: rules in rank order, each
 * applied exhaustively, always merging the LEFTMOST occurrence first.
 * Because every rule merges two SINGLE characters (one-pass training never
 * produces multi-character left-hand sides), a merge can never create a new
 * occurrence of any rule — so rank-order exhaustive application equals the
 * classic "repeatedly merge the best-ranked pair present" loop, and one
 * left-to-right sweep per rule is exhaustive ([[BpeSpec]] pins both
 * equivalences, including the same-character-run corner: "aaaa" with rule
 * (a,a) must become (aa)(aa), not (aa)a a).
 *
 * The DuckDB oracle mirrors application as delimited-string surgery:
 * tokens rendered "|a|b|c|", one merge = replace the FIRST occurrence of
 * "|a|b|" with "|ab|", repeated [[MaxMergesPerRule]] times per rule —
 * equivalent to the leftmost-first token merge (the spec pins this string
 * form against the token form too). [[MaxMergesPerRule]] bounds the
 * repetitions a single rule can need in one word (floor(maxWordLen / 2));
 * [[requireOracleBound]] fails loudly if a corpus' words outgrow it.
 *
 * Scale shape: training is one map-side-combined aggregation; application
 * runs over the DISTINCT VOCABULARY (a narrow mapPartitions pass with the
 * 16-rule table broadcast), and per-document counts come from an
 * explode -> broadcast-join -> partial-agg sum — the corpus text never
 * transits a shuffle (words leave their rows only as join keys against the
 * broadcast vocabulary, and the groupBy ships (doc_id, count) pairs).
 */
object Bpe {
  /** Merge-table size. Small because the gate corpus' alphabet is small;
    * production tables are 10k-100k — nothing here depends on the size. */
  val NumMerges = 16

  /** Oracle-side bound: max first-occurrence replacements one rule may need
    * within one word = floor(maxWordLen / 2). The gate corpus caps word
    * length at 8 (asserted via [[requireOracleBound]]). */
  val MaxMergesPerRule = 4

  /** The words of a text column: whitespace split, empties dropped — the
    * corpus-wide convention (TextOps.wordGramArray, d14, d23). */
  private def wordsOf(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"),
      explode(filter(split(col("text"), "\\s+"), x => x =!= "")).as("w"))

  /** Train the merge table: ONE aggregation pass over adjacent char pairs
    * of every word occurrence; top-[[NumMerges]] by (count DESC, a, b).
    * Returns rules in rank order (rank 1 first). Driver-side result is
    * model-not-data: NumMerges rows. */
  def trainMerges(docs: DataFrame, numMerges: Int = NumMerges): Seq[(String, String)] =
    wordsOf(docs)
      .where(length(col("w")) >= 2)
      .select(col("w"), explode(sequence(lit(1), length(col("w")) - 1)).as("i"))
      .select(col("w").substr(col("i"), lit(1)).as("a"),
        col("w").substr(col("i") + 1, lit(1)).as("b"))
      .groupBy(col("a"), col("b"))
      .agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("a"), col("b"))
      .limit(numMerges)
      .collect()
      .map(r => (r.getString(0), r.getString(1))).toSeq

  /** Canonical application over one word: one left-to-right sweep per rule
    * in rank order (exhaustive for single-char-pair rules — see object
    * scaladoc). Returns the token count. */
  def tokenCount(word: String, rules: Seq[(String, String)]): Int = {
    var tokens = word.map(_.toString).toArray
    var n = tokens.length
    rules.foreach { case (a, b) =>
      var i = 0
      var out = 0
      while (i < n) {
        if (i + 1 < n && tokens(i) == a && tokens(i + 1) == b) {
          tokens(out) = a + b; i += 2
        } else {
          tokens(out) = tokens(i); i += 1
        }
        out += 1
      }
      n = out
    }
    n
  }

  /** The oracle's string-surgery form of one merge step: replace the FIRST
    * occurrence of "|a|b|" with "|ab|" in the delimited rendering. Used by
    * the spec to pin string-form == token-form; the oracle SQL is its
    * verbatim mirror (strpos + substr + concat). */
  private[text] def replaceFirst(cur: String, pat: String, rep: String): String = {
    val p = cur.indexOf(pat)
    if (p < 0) cur else cur.substring(0, p) + rep + cur.substring(p + pat.length)
  }

  /** Reference string-form tokenizer (spec + oracle-parity device):
    * delimited rendering, [[MaxMergesPerRule]] first-occurrence
    * replacements per rule in rank order; token count = delimiters - 1. */
  private[text] def tokenCountStringForm(word: String, rules: Seq[(String, String)]): Int = {
    var cur = "|" + word.flatMap(c => s"$c|")
    rules.foreach { case (a, b) =>
      (1 to MaxMergesPerRule).foreach { _ =>
        cur = replaceFirst(cur, s"|$a|$b|", s"|$a$b|")
      }
    }
    cur.length - word.length - 1
  }

  /** Fail loudly when a corpus' words outgrow the oracle's per-rule
    * replacement bound (the SQL unrolls [[MaxMergesPerRule]] steps/rule). */
  def requireOracleBound(maxWordLen: Int): Unit =
    require(maxWordLen <= 2 * MaxMergesPerRule,
      s"BPE oracle parity bound: max word length $maxWordLen exceeds " +
        s"2*MaxMergesPerRule = ${2 * MaxMergesPerRule}; grow MaxMergesPerRule " +
        "and the oracle's unrolled steps together")

  /** Per-word token counts over the distinct vocabulary: a narrow
    * mapPartitions pass with the rule table on the closure (16 entries).
    * Vocabulary-sized frame — broadcast it into the per-doc join. */
  def vocabTokenCounts(vocab: DataFrame, rules: Seq[(String, String)]): DataFrame = {
    val schema = StructType(Seq(
      StructField("w", StringType, nullable = false),
      StructField("n_tokens_w", IntegerType, nullable = false)))
    val rdd = vocab.select(col("w")).rdd.mapPartitions { it =>
      it.map { r =>
        val w = r.getString(0)
        Row(w, tokenCount(w, rules))
      }
    }
    vocab.sparkSession.createDataFrame(rdd, schema)
  }

  /** Per-document (n_words, n_tokens) under the corpus-trained merge table
    * — the full pipeline: train (one agg pass) -> distinct vocabulary ->
    * tokenize vocabulary -> explode + broadcast-join + sum. Documents with
    * no words keep (0, 0). The vocabulary broadcast is SIZE-GATED
    * ([[graft.util.SizeGate]]): merge-table TRAINING is alphabet²-bounded,
    * but the token-count frame grows with the vocabulary, which web-scale
    * corpora make hapax-heavy — past `broadcastMaxRows` the per-doc join
    * falls back to a plain shuffle of single words (the gram-shuffle
    * regime), identical output ([[BpeSpec]] forces the fallback). */
  def docTokenCounts(spark: SparkSession, docs: DataFrame,
      broadcastMaxRows: Long = graft.util.SizeGate.DefaultMaxRows): DataFrame = {
    val rules = trainMerges(docs)
    val words = wordsOf(docs)
    val vocab = words.select(col("w")).distinct()
    // one vocab aggregate guards BOTH oracle-parity assumptions loudly:
    // the unrolled-replacement length bound, and the '|' delimiter the
    // oracle's string surgery reserves (a word containing '|' would
    // corrupt the delimited rendering and silently diverge the counts).
    // max over an EMPTY vocabulary is NULL (wordless corpus) — legal, and
    // every document then keeps its documented (0, 0) row.
    val stats = vocab.agg(max(length(col("w"))), max(col("w").contains("|"))).head()
    val maxLen = if (stats.isNullAt(0)) 0 else stats.getInt(0)
    requireOracleBound(maxLen)
    require(stats.isNullAt(1) || !stats.getBoolean(1),
      "BPE oracle parity: the corpus vocabulary contains '|', the oracle's " +
        "reserved token delimiter — pick a delimiter outside the alphabet")
    val wtok = vocabTokenCounts(vocab, rules)
    docs.select(col("doc_id"))
      .join(
        words.join(graft.util.SizeGate.broadcastIfSmall(wtok, broadcastMaxRows),
            Seq("w"))
          .groupBy(col("doc_id"))
          .agg(count(lit(1)).as("n_words"),
            sum(col("n_tokens_w")).cast("long").as("n_tokens")),
        Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_words"), lit(0L)).as("n_words"),
        coalesce(col("n_tokens"), lit(0L)).as("n_tokens"))
  }

  /** The oracle-side mirror, generated programmatically so both gates
    * (d35, d14) embed ONE definition: training CTEs (pair counts -> ranked
    * rules), delimited vocabulary, [[NumMerges]] x [[MaxMergesPerRule]]
    * unrolled first-occurrence replacement steps (strpos/substr/concat —
    * no regex beyond the char split), and per-word token counts. Exposes
    * CTEs `wocc(doc_id, w)` and `wtok(w, nt)`. Iteration CTEs are
    * MATERIALIZED (DuckDB would otherwise inline the chain exponentially —
    * the unrolled-CTE rule every iterative oracle here follows). */
  val oracleCtesSql: String = {
    val train =
      s"""wocc AS MATERIALIZED (SELECT doc_id,
         |    unnest(list_filter(regexp_split_to_array(text, '\\s+'), x -> x != '')) AS w
         |  FROM documents),
         |bpe_pairs AS (SELECT substr(w, i::INT, 1) AS a, substr(w, (i+1)::INT, 1) AS b
         |  FROM (SELECT w, unnest(range(1, length(w))) AS i FROM wocc WHERE length(w) >= 2)),
         |bpe_rules AS MATERIALIZED (SELECT a, b,
         |    '|' || a || '|' || b || '|' AS pat, '|' || a || b || '|' AS rep, rnk
         |  FROM (SELECT a, b, count(*) AS cnt,
         |      row_number() OVER (ORDER BY count(*) DESC, a, b) AS rnk
         |    FROM bpe_pairs GROUP BY a, b)
         |  WHERE rnk <= $NumMerges),
         |bpe_s0 AS MATERIALIZED (SELECT w,
         |    '|' || regexp_replace(w, '(.)', '\\1|', 'g') AS cur
         |  FROM (SELECT DISTINCT w FROM wocc))""".stripMargin
    val steps = (1 to NumMerges).flatMap { i =>
      (1 to MaxMergesPerRule).map { r =>
        val prev = if (r == 1 && i == 1) "bpe_s0"
          else if (r == 1) s"bpe_s${i - 1}_$MaxMergesPerRule"
          else s"bpe_s${i}_${r - 1}"
        // NOTE: no generated line may BEGIN with '|' — gate oracles embed
        // this block inside their own stripMargin template, which would
        // strip a leading '||' concat down to '|'
        s"""bpe_s${i}_$r AS MATERIALIZED (SELECT w,
           |    CASE WHEN ru.pat IS NOT NULL AND strpos(cur, ru.pat) > 0
           |      THEN substr(cur, 1, strpos(cur, ru.pat) - 1) || ru.rep ||
           |        substr(cur, strpos(cur, ru.pat) + length(ru.pat))
           |      ELSE cur END AS cur
           |  FROM $prev LEFT JOIN (SELECT pat, rep FROM bpe_rules WHERE rnk = $i) ru
           |    ON true)""".stripMargin
      }
    }
    val last = s"bpe_s${NumMerges}_$MaxMergesPerRule"
    val wtok =
      s"""wtok AS MATERIALIZED (SELECT w,
         |    (length(cur) - length(w) - 1)::BIGINT AS nt
         |  FROM $last)""".stripMargin
    (Seq(train) ++ steps ++ Seq(wtok)).mkString(",\n")
  }
}

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
    * in rank order. A sweep is exhaustive per rule even for MULTI-char
    * rules (iterative training produces them): the merged token a+b is
    * strictly longer than a and than b, so a merge can never create a new
    * occurrence of the SAME rule to its left or right — (prev, ab) would
    * need b == ab and (ab, next) would need a == ab, both impossible.
    * Returns the tokens. */
  def tokenize(word: String, rules: Seq[(String, String)]): Array[String] = {
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
    tokens.take(n)
  }

  /** Token count under [[tokenize]]. */
  def tokenCount(word: String, rules: Seq[(String, String)]): Int =
    tokenize(word, rules).length

  /** CANONICAL iterative BPE training (Sennrich's actual loop): round r's
    * rule is the most frequent adjacent TOKEN pair of the corpus AFTER
    * merges 1..r-1 are applied — so rules gain multi-character sides from
    * round 2 on, unlike [[trainMerges]]'s one-pass char-pair variant
    * (kept: d35 documents it as the single-aggregation form). Counting
    * runs over the distinct VOCABULARY weighted by word-occurrence counts
    * — the classic word-frequency-table training — so each round is one
    * vocab-sized job: tokenize under the rules so far (narrow mapPartitions,
    * rule table on the closure), explode adjacent pairs x weight, one
    * map-side-combined aggregation, take the (count DESC, a, b) argmax.
    * The per-round winner is collected driver-side (model-not-data: ONE
    * row/round, the d33 re-inject pattern); training stops early when no
    * adjacent pair remains. R rounds = R vocab-sized jobs at any corpus
    * scale; the corpus itself is touched once (the occurrence count). */
  def trainMergesIterative(spark: SparkSession, docs: DataFrame,
      numMerges: Int = NumMerges): Seq[(String, String)] = {
    val wc = wordsOf(docs).groupBy(col("w")).agg(count(lit(1)).as("cnt"))
      .localCheckpoint() // vocab-sized; re-swept once per round
    val rules = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    var r = 0
    var exhausted = false
    while (r < numMerges && !exhausted) {
      val frozen = rules.toSeq
      val pairSchema = StructType(Seq(
        StructField("a", StringType, nullable = false),
        StructField("b", StringType, nullable = false),
        StructField("cnt", LongType, nullable = false)))
      val pairs = spark.createDataFrame(
        wc.rdd.mapPartitions { it =>
          it.flatMap { row =>
            val toks = tokenize(row.getString(0), frozen)
            val n = row.getLong(1)
            (0 until toks.length - 1).iterator.map(i => Row(toks(i), toks(i + 1), n))
          }
        }, pairSchema)
      val top = pairs.groupBy(col("a"), col("b"))
        .agg(sum(col("cnt")).as("c"))
        .orderBy(col("c").desc, col("a"), col("b"))
        .limit(1).collect()
      if (top.isEmpty) exhausted = true
      else { rules += ((top(0).getString(0), top(0).getString(1))); r += 1 }
    }
    rules.toSeq
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
      broadcastMaxRows: Long = graft.util.SizeGate.DefaultMaxRows): DataFrame =
    docTokenCountsWith(spark, docs, trainMerges(docs), broadcastMaxRows)

  /** [[docTokenCounts]] under the CANONICAL iterative table
    * ([[trainMergesIterative]]) — the d37 gate's pipeline. */
  def docTokenCountsIterative(spark: SparkSession, docs: DataFrame,
      broadcastMaxRows: Long = graft.util.SizeGate.DefaultMaxRows): DataFrame =
    docTokenCountsWith(spark, docs, trainMergesIterative(spark, docs),
      broadcastMaxRows)

  private def docTokenCountsWith(spark: SparkSession, docs: DataFrame,
      rules: Seq[(String, String)], broadcastMaxRows: Long): DataFrame = {
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

  /** The ITERATIVE trainer's oracle mirror ([[trainMergesIterative]] /
    * [[docTokenCountsIterative]], gate d37): per round, re-derive the
    * current tokenization's adjacent-pair counts over the delimited
    * vocabulary WEIGHTED by word-occurrence counts, take the
    * (count DESC, a, b) argmax as that round's rule, and apply it with
    * [[MaxMergesPerRule]] unrolled first-occurrence replacements — the
    * train-inside-the-loop the one-pass [[oracleCtesSql]] hoists out.
    * String surgery stays exact for MULTI-char tokens: the pattern
    * '|a|b|' is delimiter-anchored on both sides and tokens cannot
    * contain '|' (guarded in [[docTokenCounts]]), so a match can never
    * start or end mid-token. Exposes `wocc(doc_id, w)` and
    * `wtok(w, nt)`; every iteration CTE is MATERIALIZED (the unrolled-CTE
    * rule: DuckDB would otherwise inline the chain exponentially). An
    * exhausted round (no adjacent pair anywhere) yields an EMPTY winner
    * CTE, the LEFT JOIN hands every word a NULL pattern, and the round is
    * an identity — matching the Scala trainer's early stop. */
  val iterativeOracleCtesSql: String = {
    val head =
      s"""wocc AS MATERIALIZED (SELECT doc_id,
         |    unnest(list_filter(regexp_split_to_array(text, '\\s+'), x -> x != '')) AS w
         |  FROM documents),
         |wcnt AS MATERIALIZED (SELECT w, count(*) AS cnt FROM wocc GROUP BY w),
         |it_s0 AS MATERIALIZED (SELECT w,
         |    '|' || regexp_replace(w, '(.)', '\\1|', 'g') AS cur
         |  FROM (SELECT DISTINCT w FROM wocc))""".stripMargin
    val rounds = (1 to NumMerges).flatMap { r =>
      val prev = if (r == 1) "it_s0" else s"it_s${r - 1}_$MaxMergesPerRule"
      // NOTE: no generated line may BEGIN with '|' — gate oracles embed
      // this block inside their own stripMargin template
      val winner =
        s"""it_r$r AS MATERIALIZED (SELECT a, b,
           |    '|' || a || '|' || b || '|' AS pat, '|' || a || b || '|' AS rep
           |  FROM (SELECT a, b, sum(cnt) AS c FROM (
           |      SELECT tl[i::INT] AS a, tl[(i+1)::INT] AS b, cnt FROM (
           |        SELECT tl, cnt, unnest(range(1, length(tl))) AS i FROM (
           |          SELECT list_filter(string_split(cur, chr(124)), x -> x != '') AS tl,
           |            cnt
           |          FROM $prev JOIN wcnt USING (w))))
           |    GROUP BY a, b)
           |  ORDER BY c DESC, a, b LIMIT 1)""".stripMargin
      val steps = (1 to MaxMergesPerRule).map { k =>
        val p = if (k == 1) prev else s"it_s${r}_${k - 1}"
        s"""it_s${r}_$k AS MATERIALIZED (SELECT w,
           |    CASE WHEN ru.pat IS NOT NULL AND strpos(cur, ru.pat) > 0
           |      THEN substr(cur, 1, strpos(cur, ru.pat) - 1) || ru.rep ||
           |        substr(cur, strpos(cur, ru.pat) + length(ru.pat))
           |      ELSE cur END AS cur
           |  FROM $p LEFT JOIN (SELECT pat, rep FROM it_r$r) ru ON true)""".stripMargin
      }
      winner +: steps
    }
    val last = s"it_s${NumMerges}_$MaxMergesPerRule"
    val wtok =
      s"""wtok AS MATERIALIZED (SELECT w,
         |    (length(cur) - length(w) - 1)::BIGINT AS nt
         |  FROM $last)""".stripMargin
    (Seq(head) ++ rounds ++ Seq(wtok)).mkString(",\n")
  }
}

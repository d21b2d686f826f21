package graft.text

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Persistent inverted index: term-bucket-partitioned posting lists — the
 * text-retrieval analogue of [[graft.ann.IvfIndex]]'s cid-partitioned
 * layout. Build ONCE (one tokenization of the corpus), search MANY: a
 * keyword query reads only the `tb=` partition directories its terms hash
 * into, so the per-query IO is |terms|/numBuckets of the postings — never
 * the corpus, never even the full postings table.
 *
 * Layout under `path`:
 *   postings/tb=<bucket>/   (term, doc_id, tf)   partition-pruned by query
 *   doclen/                 (doc_id, dl)         joined for matching docs only
 *   stats/                  (n_docs, sum_dl, num_buckets)   one row
 *
 * The bucket function is CRC32(utf8(term)) % numBuckets — chosen because it
 * is computable identically on the driver ([[bucketOf]], java.util.zip.CRC32)
 * and in codegen'd Spark (`crc32(encode(term, 'UTF-8'))`), which is what
 * lets the driver turn query terms into a partition-value IN-list at
 * planning time (the same probe-planting move as the cell store's ph3
 * pruning). Scoring reproduces the d18 BM25-variant bit-for-bit (rational
 * idf, fixed caller-order pivoted sum), so an index search and the ad-hoc
 * d18 ranking are hash-identical — pinned by the d20 gate under d18's
 * DuckDB oracle.
 *
 * At 100 TB: postings shuffle once at build (narrow (term, doc_id, tf)
 * rows); a search shuffles only the matching docs' partials. df/idf are
 * derived from the pruned postings themselves, nothing global is read but
 * the one-row stats sidecar.
 */
object InvertedIndex {

  val DefaultBuckets = 64

  /** Driver-side twin of the engine's `crc32(encode(term,'UTF-8')) % B`. */
  def bucketOf(term: String, numBuckets: Int): Long = {
    val crc = new java.util.zip.CRC32()
    val b = term.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    crc.update(b, 0, b.length)
    crc.getValue % numBuckets
  }

  /** Tokenization shared with the ad-hoc d10/d12/d18 term frame: whitespace
    * split, empty tokens dropped. One definition per engine would drift. */
  private def tokenize(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"),
      explode(filter(split(col("text"), "\\s+"), x => x =!= "")).as("term"))

  /** Build the index from `docs` (doc_id, text). Overwrites any previous
    * index at `path` (derived data, rebuild at will). */
  def build(spark: SparkSession, docs: DataFrame, path: String,
      numBuckets: Int = DefaultBuckets): Unit = {
    // consumed twice (postings + doclen) and the partitioned write's range
    // sampling would re-tokenize a third time — materialize once
    val words = tokenize(docs).localCheckpoint()
    val postings = words
      .groupBy(col("term"), col("doc_id")).agg(count(lit(1)).as("tf"))
      .withColumn("tb", pmod(crc32(encode(col("term"), "UTF-8")), lit(numBuckets.toLong)))
    postings
      .repartition(col("tb"))
      .sortWithinPartitions(col("tb"), col("term"), col("doc_id"))
      .write.mode(SaveMode.Overwrite).partitionBy("tb")
      .parquet(s"$path/postings")
    val dl = words.groupBy(col("doc_id")).agg(count(lit(1)).as("dl"))
    dl.write.mode(SaveMode.Overwrite).parquet(s"$path/doclen")
    // n_docs counts ALL documents (a doc with no tokens still dilutes
    // avgdl), exactly like the ad-hoc path's documents.count()
    import spark.implicits._
    val sumDl = dl.agg(coalesce(sum(col("dl")), lit(0L))).first().getLong(0)
    Seq((docs.count(), sumDl, numBuckets))
      .toDF("n_docs", "sum_dl", "num_buckets")
      .coalesce(1).write.mode(SaveMode.Overwrite).parquet(s"$path/stats")
  }

  /** Incremental growth (the [[graft.ann.IvfIndex.append]] of the text
    * side): tokenize ONLY the new docs, append their postings into the same
    * `tb=` partitions, append their doc lengths, and fold the corpus stats
    * forward. Existing posting files are never touched; document
    * frequencies need no maintenance because [[search]] derives df from the
    * pruned postings at query time — a grown index answers exactly like a
    * single-pass build (d21 gate). New docs must be NEW doc_ids: appending
    * an existing id would split its postings across files and double-count
    * its dl. */
  def append(spark: SparkSession, docs: DataFrame, path: String): Unit = {
    val st = spark.read.parquet(s"$path/stats").first()
    val numBuckets = st.getInt(st.fieldIndex("num_buckets"))
    val words = tokenize(docs).localCheckpoint()
    words
      .groupBy(col("term"), col("doc_id")).agg(count(lit(1)).as("tf"))
      .withColumn("tb", pmod(crc32(encode(col("term"), "UTF-8")), lit(numBuckets.toLong)))
      .repartition(col("tb"))
      .sortWithinPartitions(col("tb"), col("term"), col("doc_id"))
      .write.mode(SaveMode.Append).partitionBy("tb")
      .parquet(s"$path/postings")
    val dl = words.groupBy(col("doc_id")).agg(count(lit(1)).as("dl"))
    dl.write.mode(SaveMode.Append).parquet(s"$path/doclen")
    import spark.implicits._
    val sumDlDelta = dl.agg(coalesce(sum(col("dl")), lit(0L))).first().getLong(0)
    Seq((st.getLong(st.fieldIndex("n_docs")) + docs.count(),
        st.getLong(st.fieldIndex("sum_dl")) + sumDlDelta, numBuckets))
      .toDF("n_docs", "sum_dl", "num_buckets")
      .coalesce(1).write.mode(SaveMode.Overwrite).parquet(s"$path/stats")
  }

  /** Top-k BM25-variant search. `terms` order is part of the contract: the
    * per-term partials are summed in exactly this order (float addition is
    * not associative; the fixed order is what keeps rankings bit-identical
    * across engines). Returns (rnk, doc_id, score). */
  def search(spark: SparkSession, path: String, terms0: Seq[String],
      k: Int): DataFrame = {
    // dedupe (first occurrence keeps its position): a repeated term would
    // otherwise produce two identically-named pivot columns (ambiguous
    // reference) — and scoring a term twice is never meant
    val terms = terms0.distinct
    require(terms.nonEmpty, "search requires at least one term")
    val st = spark.read.parquet(s"$path/stats").first()
    val nDocs = st.getLong(st.fieldIndex("n_docs"))
    // an empty index has no meaningful avgdl (0/0 = NaN would poison every
    // score) — an empty result in the declared shape is the honest answer
    if (nDocs == 0L)
      return spark.read.parquet(s"$path/doclen")
        .select(lit(0).as("rnk"), col("doc_id"), lit(0.0).as("score"))
        .limit(0)
    val avgdl = st.getLong(st.fieldIndex("sum_dl")).toDouble / nDocs.toDouble
    val numBuckets = st.getInt(st.fieldIndex("num_buckets"))
    val buckets = terms.map(bucketOf(_, numBuckets)).distinct
    // tb is a partition column: the IN-list prunes directories at planning;
    // the term IN-list then pushes to the surviving parquet footers
    val tf = spark.read.parquet(s"$path/postings")
      .where(col("tb").isin(buckets: _*))
      .where(col("term").isin(terms: _*))
    val dfreq = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val dl = spark.read.parquet(s"$path/doclen")
    val tfd = col("tf").cast("double")
    val dfd = col("df").cast("double")
    val dld = col("dl").cast("double")
    val idf = (lit(nDocs.toDouble) - dfd + lit(0.5)) / (dfd + lit(0.5))
    val partial = (idf * (tfd * lit(2.2))) /
      (tfd + lit(1.2) * (lit(0.25) + lit(0.75) * dld / lit(avgdl)))
    val perTerm = tf.join(dfreq, Seq("term")).join(dl, Seq("doc_id"))
      .select(col("doc_id"), col("term"), partial.as("s"))
    // positional aliases (s_0, s_1, ...): a term containing '.' or '`'
    // would make col("s_" + term) parse as a nested-field path
    val pivoted = terms.zipWithIndex.map { case (tm, i) =>
      coalesce(max(when(col("term") === tm, col("s"))), lit(0.0)).as(s"s_$i")
    }
    val score = terms.indices.map(i => col(s"s_$i")).reduce(_ + _)
    perTerm.groupBy(col("doc_id")).agg(pivoted.head, pivoted.tail: _*)
      .select(col("doc_id"), score.as("score"))
      .orderBy(col("score").desc, col("doc_id"))
      .limit(k)
      .select(row_number().over(Window.orderBy(col("score").desc, col("doc_id"))).as("rnk"),
        col("doc_id"), col("score"))
      .orderBy(col("rnk"))
  }
}

package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.ann.Ann
import graft.text.TextOps

/**
 * Training-data pipeline queries (dedup / similarity / text analysis) with
 * programmatically generated DuckDB oracles — the oracle SQL is built from
 * the same constants ([[TextOps.hashA]], [[Ann.planeWeights]]) as the Spark
 * implementation, but evaluates through DuckDB's independent list/lambda
 * engine, so the pipelines are cross-checked end to end.
 */
object PipelineQueries {
  import TextOps.P

  private def docs(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(s"$dir/documents.parquet")
  private def emb(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(s"$dir/embeddings.parquet")

  /** MinHash signatures, 8 hashes as columns. */
  def t1MinhashSignatures(spark: SparkSession, dir: String): DataFrame = {
    val sig = docs(spark, dir).select(col("doc_id"),
      TextOps.minhashSignature(col("text"), 8).as("sig"))
    (0 until 8).foldLeft(sig) { (df, j) =>
      df.withColumn(s"mh$j", element_at(col("sig"), j + 1))
    }.drop("sig").orderBy(col("doc_id"))
  }

  /** MinHash + LSH near-duplicate pairs: 2 bands x 4 rows candidate
    * generation, exact shingle-Jaccard verification at >= 0.8.
    * At scale: the band join shuffles only (band, hash, id) triples. */
  def t2MinhashLshPairs(spark: SparkSession, dir: String): DataFrame = {
    val d = docs(spark, dir).select(col("doc_id"), col("text"))
    val sig = d.select(col("doc_id"), TextOps.minhashSignature(col("text"), 8).as("sig"))
    val bands = sig.select(col("doc_id"), explode(array(
      struct(lit(0).as("band"), TextOps.bandHash(col("sig"), 0, 4).as("bh")),
      struct(lit(1).as("band"), TextOps.bandHash(col("sig"), 1, 4).as("bh")))).as("b"))
      .select(col("doc_id"), col("b.band").as("band"), col("b.bh").as("bh"))
    val cand = bands.as("x").join(bands.as("y"),
        col("x.band") === col("y.band") && col("x.bh") === col("y.bh") &&
          col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"))
      .distinct()
    cand
      .join(d.select(col("doc_id").as("doc_a"), col("text").as("ta")), "doc_a")
      .join(d.select(col("doc_id").as("doc_b"), col("text").as("tb")), "doc_b")
      .withColumn("jacc", round(TextOps.jaccardShingles(col("ta"), col("tb")), 4))
      .where(col("jacc") >= 0.8)
      .select(col("doc_a"), col("doc_b"), col("jacc"))
      .orderBy(col("doc_a"), col("doc_b"))
  }

  /** 31-bit SimHash per document. */
  def t3Simhash(spark: SparkSession, dir: String): DataFrame =
    docs(spark, dir)
      .select(col("doc_id"), TextOps.simhash31(col("text")).as("simhash31"))
      .orderBy(col("doc_id"))

  /** Heuristic language-ID. */
  def t4LangId(spark: SparkSession, dir: String): DataFrame =
    docs(spark, dir)
      .select(col("doc_id"), TextOps.langId(col("text")).as("lang_pred"))
      .orderBy(col("doc_id"))

  /** Rolling-hash document fingerprint. */
  def t5Fingerprint(spark: SparkSession, dir: String): DataFrame =
    docs(spark, dir)
      .select(col("doc_id"), TextOps.fingerprint(col("text")).as("fp"))
      .orderBy(col("doc_id"))

  /** Blocked n-gram-Jaccard near-dup: top-20 most similar pairs within
    * (lang, length-bucket) blocks. */
  def t6NgramJaccardTopk(spark: SparkSession, dir: String): DataFrame = {
    val d = docs(spark, dir).select(col("doc_id"), col("lang"),
      (col("n_chars") / 100).cast("long").as("lb"), col("text"))
    d.as("a").join(d.as("b"),
        col("a.lang") === col("b.lang") && col("a.lb") === col("b.lb") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
        round(TextOps.jaccardShingles(col("a.text"), col("b.text")), 4).as("jacc"))
      .orderBy(col("jacc").desc, col("doc_a"), col("doc_b"))
      .limit(20)
  }

  /** Banded LSH ANN (16 random hyperplanes, 4 bands x 4 bits, dim 64) for
    * the first 10 vectors, k=5 candidate re-rank. */
  def e2LshAnn(spark: SparkSession, dir: String): DataFrame = {
    val e = emb(spark, dir)
    val queries = e.where(col("vec_id") < 10)
      .select(col("vec_id").as("id"), col("embedding").as("vec"))
    val corpus = e.select(col("vec_id").as("id"), col("embedding").as("vec"))
    Ann.knnLsh(queries, corpus, 5, 16, 64, 4)
      .select(col("query_id"), col("rnk"), col("neighbor_id"),
        round(col("cos"), 4).as("cos_sim"))
      .orderBy(col("query_id"), col("rnk"))
  }

  // ------------------------------------------------------------ oracle SQL

  private val codesSql =
    "CASE WHEN length(text) < 3 THEN [] ELSE list_transform(range(1, length(text)-1), " +
      "i -> ascii(substr(text, i::INT, 1))::BIGINT*65536 + " +
      "ascii(substr(text, (i+1)::INT, 1))::BIGINT*256 + " +
      "ascii(substr(text, (i+2)::INT, 1))::BIGINT) END"

  private def mhSql(j: Int): String =
    s"list_min(list_transform(codes, c -> ((c % $P) * ${TextOps.hashA(j)} + ${TextOps.hashB(j)}) % $P))"

  private def bandSql(cols: Seq[String]): String =
    cols.foldLeft("0")((acc, c) => s"((($acc) * 31 + $c) % $P)")

  private val jaccSql =
    "round(CASE WHEN length(list_distinct(list_concat(a.s, b.s))) = 0 THEN 0.0 " +
      "ELSE length(list_intersect(a.s, b.s))::DOUBLE / length(list_distinct(list_concat(a.s, b.s))) END, 4)"

  private val langScoredSql: String = TextOps.LangMarkers.map { case (lang, ms) =>
    val score = ms.map(m =>
      s"((length(p) - length(replace(p, '$m', '')))/${m.length})::BIGINT").mkString(" + ")
    s"lpad(($score)::VARCHAR, 10, '0') || '$lang'"
  }.mkString(", ")

  private def sigSql(vecExpr: String): String =
    (0 until 16).map { j =>
      val w = Ann.planeWeights(j, 64).map(x => s"$x.0").mkString("[", ",", "]")
      s"(CASE WHEN list_dot_product($vecExpr, $w::DOUBLE[]) > 0 THEN ${1L << j} ELSE 0 END)"
    }.mkString(" + ")

  val oracles: Map[String, String] = Map(
    "t1_minhash_signatures" -> {
      val mh = (0 until 8).map(j => s"${mhSql(j)} AS mh$j").mkString(", ")
      s"""WITH c AS (SELECT doc_id, $codesSql AS codes FROM documents)
         |SELECT doc_id, $mh FROM c ORDER BY doc_id""".stripMargin
    },
    "t2_minhash_lsh_pairs" -> {
      val mh = (0 until 8).map(j => s"${mhSql(j)} AS mh$j").mkString(", ")
      val b0 = bandSql(Seq("mh0", "mh1", "mh2", "mh3"))
      val b1 = bandSql(Seq("mh4", "mh5", "mh6", "mh7"))
      s"""WITH c AS (SELECT doc_id, $codesSql AS codes FROM documents),
         |s AS (SELECT doc_id, $mh FROM c),
         |bands AS (SELECT doc_id, 0 AS band, $b0 AS bh FROM s
         |          UNION ALL SELECT doc_id, 1, $b1 FROM s),
         |cand AS (SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b
         |         FROM bands x JOIN bands y
         |           ON x.band = y.band AND x.bh = y.bh AND x.doc_id < y.doc_id),
         |sh AS (SELECT doc_id, list_distinct($codesSql) AS s FROM documents)
         |SELECT doc_a, doc_b, $jaccSql AS jacc
         |FROM cand JOIN sh a ON a.doc_id = doc_a JOIN sh b ON b.doc_id = doc_b
         |WHERE $jaccSql >= 0.8
         |ORDER BY doc_a, doc_b""".stripMargin
    },
    "t3_simhash" -> {
      val hs = s"list_transform(codes, c -> ((c % $P) * ${TextOps.hashA(0)} + ${TextOps.hashB(0)}) % $P)"
      val bits = (0 until 31).map { b =>
        s"(CASE WHEN list_sum(list_transform(hs, h -> ((h >> $b) & 1)*2 - 1)) > 0 THEN ${1L << b} ELSE 0 END)"
      }.mkString(" + ")
      s"""WITH c AS (SELECT doc_id, $codesSql AS codes FROM documents),
         |h AS (SELECT doc_id, $hs AS hs FROM c)
         |SELECT doc_id, $bits AS simhash31 FROM h ORDER BY doc_id""".stripMargin
    },
    "t4_lang_id" -> {
      s"""WITH p AS (SELECT doc_id, ' ' || text || ' ' AS p FROM documents)
         |SELECT doc_id, CASE WHEN substr(greatest($langScoredSql), 1, 10) > '0000000000'
         |  THEN substr(greatest($langScoredSql), 11, 2) ELSE 'und' END AS lang_pred
         |FROM p ORDER BY doc_id""".stripMargin
    },
    "t5_fingerprint" -> {
      val w = (0 until 8).map(k => (0 until k).foldLeft(1L)((acc, _) => acc * 31 % P))
      val wList = w.mkString("[", ",", "]")
      s"""WITH c AS (SELECT doc_id, $codesSql AS codes FROM documents)
         |SELECT doc_id, CASE WHEN length(codes) = 0 THEN 0 ELSE
         |  list_sum(list_transform(codes, (c, i) ->
         |    (c % $P) * ($wList)[((i-1) % 8) + 1] % $P)) % $P END AS fp
         |FROM c ORDER BY doc_id""".stripMargin
    },
    "t6_ngram_jaccard_topk" -> {
      s"""WITH c AS (SELECT doc_id, lang, n_chars//100 AS lb,
         |  list_distinct($codesSql) AS s FROM documents)
         |SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, $jaccSql AS jacc
         |FROM c a JOIN c b ON a.lang = b.lang AND a.lb = b.lb AND a.doc_id < b.doc_id
         |ORDER BY jacc DESC, doc_a, doc_b LIMIT 20""".stripMargin
    },
    "e2_lsh_ann" -> {
      val bandSelects = (0 until 4).map { b =>
        s"SELECT vec_id, $b AS band, (sig >> ${4 * b}) & 15 AS bucket FROM s"
      }.mkString(" UNION ALL ")
      s"""WITH s AS (SELECT vec_id, embedding::DOUBLE[] AS v,
         |  ${sigSql("embedding::DOUBLE[]")} AS sig FROM embeddings),
         |bands AS ($bandSelects),
         |cand AS (SELECT DISTINCT q.vec_id AS query_id, e.vec_id AS neighbor_id
         |  FROM bands q JOIN bands e ON q.band = e.band AND q.bucket = e.bucket
         |    AND q.vec_id != e.vec_id
         |  WHERE q.vec_id < 10)
         |SELECT query_id, rnk, neighbor_id, round(cos, 4) AS cos_sim FROM (
         |  SELECT query_id, neighbor_id,
         |    list_cosine_similarity(a.v, b.v) AS cos,
         |    row_number() OVER (PARTITION BY query_id
         |      ORDER BY list_cosine_similarity(a.v, b.v) DESC, neighbor_id) AS rnk
         |  FROM cand JOIN s a ON a.vec_id = query_id JOIN s b ON b.vec_id = neighbor_id)
         |WHERE rnk <= 5 ORDER BY query_id, rnk""".stripMargin
    }
  )

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "t1_minhash_signatures" -> t1MinhashSignatures,
    "t2_minhash_lsh_pairs" -> t2MinhashLshPairs,
    "t3_simhash" -> t3Simhash,
    "t4_lang_id" -> t4LangId,
    "t5_fingerprint" -> t5Fingerprint,
    "t6_ngram_jaccard_topk" -> t6NgramJaccardTopk,
    "e2_lsh_ann" -> e2LshAnn
  )
}

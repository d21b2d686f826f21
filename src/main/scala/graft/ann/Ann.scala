package graft.ann

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.ann.expr.functions.{vec_cosine, vec_dot}

/**
 * Approximate-nearest-neighbor search over embedding columns
 * (`Array[Float]`), for training-data dedup/retrieval pipelines.
 *
 * Two paths:
 *  - [[cosine]] + brute-force top-k: the exactness baseline (O(n*q)).
 *  - Random-hyperplane LSH ([[rhpSignature]]): each vector gets a small bit
 *    signature; candidate pairs share a signature bucket, then re-rank with
 *    exact cosine. At scale the bucket join replaces the quadratic cross
 *    join with a shuffle on (bucket, id) — recall tunable via planes/bands.
 *
 * Hyperplane weights are a deterministic integer lattice (seeded Knuth-hash
 * arithmetic; the DuckDB oracles embed the resulting literals, so they stay
 * in lockstep by construction). NOTE: a plain affine form like
 * ((7*(j+1) + 11*k) mod 5) is periodic in j mod 5 — only 5 distinct planes
 * regardless of numPlanes — which silently caps recall; the multiplicative
 * hash below decorrelates every (j, k).
 */
object Ann {

  /** Deterministic hyperplane weights for plane j (0-based) over `dim`,
    * values in [-2, 2]. */
  def planeWeights(j: Int, dim: Int): Seq[Int] =
    (0 until dim).map { k =>
      val x = (j.toLong * 73 + k.toLong * 151 + 29) * 2654435761L
      ((((x >> 13) % 5).toInt + 5) % 5) - 2
    }

  /** Cosine similarity of two double-array columns — the codegen'd one-pass
    * [[graft.ann.expr.VecCosine]] (bit-identical to the interpreted
    * aggregate/zip_with formulation it replaced; see that file's contract). */
  def cosine(a: Column, b: Column): Column = vec_cosine(a, b)

  /** Random-hyperplane signature: bit j = (v . w_j) > 0, packed to a long.
    * Each dot product is a codegen'd [[graft.ann.expr.VecDot]] against a
    * literal weight array — the whole signature evaluates inside one
    * whole-stage-codegen stage (the interpreted higher-order formulation
    * cost ~2x the whole query at a 50k corpus; the previous workaround was
    * an explode-once/aggregate shape, now unnecessary). Empty or null
    * vectors sign to 0 on every plane -> signature 0. */
  /** All-plane RHP signature as ONE fused codegen'd expression
    * ([[graft.ann.expr.RhpSignature]]): the per-plane
    * `when(vec_dot(vec, w_j) > 0, 1L << j)` sum it replaces generated one
    * inlined cast+dot loop PER PLANE, blowing the whole-stage method past
    * the JIT's huge-method threshold (measured 26s -> ~1s for 200k x 32
    * planes). Bit semantics and per-plane accumulation order unchanged. */
  def rhpSignature(vec: Column, numPlanes: Int, dim: Int): Column =
    graft.ann.expr.functions.rhp_signature(vec,
      (0 until numPlanes).flatMap(j => planeWeights(j, dim).map(_.toDouble)),
      numPlanes, dim)

  /** Brute-force exact top-k: for each query vector, the k nearest neighbors
    * by cosine. `queries`/`corpus`: (id, vec) with vec castable to
    * array<double>. Output: (query_id, rnk, neighbor_id, cos). */
  def knnBruteForce(queries: DataFrame, corpus: DataFrame, k: Int): DataFrame = {
    val q = queries.select(col("id").as("query_id"), col("vec").cast("array<double>").as("qv"))
    val c = corpus.select(col("id").as("neighbor_id"), col("vec").cast("array<double>").as("nv"))
    val w = Window.partitionBy(col("query_id")).orderBy(col("cos").desc, col("neighbor_id"))
    q.crossJoin(c)
      .where(col("query_id") =!= col("neighbor_id"))
      .withColumn("cos", cosine(col("qv"), col("nv")))
      .withColumn("rnk", row_number().over(w))
      .where(col("rnk") <= k)
      .select(col("query_id"), col("rnk"), col("neighbor_id"), col("cos"))
  }

  /** Banded LSH ANN: the signature is split into `numBands` bands of
    * `numPlanes/numBands` bits; candidates share at least ONE band value
    * (OR-amplification — a single full-signature bucket has poor recall).
    * Candidates are re-ranked by exact cosine.
    *
    * Scale shape:
    *  - the band join and candidate dedup carry ONLY (band, bucket, id) /
    *    (query_id, neighbor_id) — embedding payloads never enter a shuffle;
    *    vectors are joined back exactly once for the final cosine re-rank;
    *  - `multiprobe = true` additionally probes, on the QUERY side only,
    *    every bucket at Hamming distance 1 from each band bucket
    *    (1 + bandBits probes per band). This is the classic probing-vs-
    *    tables trade: recall per band rises from p^b to
    *    p^b + b*p^(b-1)*(1-p) at the cost of (1+b)x candidate lookups,
    *    with no extra signature storage. Leave it off when the corpus is
    *    unstructured (near-random vectors would make most pairs
    *    candidates); turn it on for clustered/real embedding spaces.
    *
    * Output: (query_id, rnk, neighbor_id, cos). */
  /** (id, sig) RHP signatures: one narrow projection, all planes codegen'd
    * ([[rhpSignature]]'s VecDot loops) — no explode, no aggregation, no
    * shuffle. Ids with empty/null vectors keep their row with sig 0. */
  private def signatureFrame(df: DataFrame, idAs: String,
      numPlanes: Int, dim: Int): DataFrame =
    df.select(col("id").as(idAs),
      rhpSignature(col("vec").cast("array<double>"), numPlanes, dim).as("sig"))

  /** (id, band, bucket) banding of the RHP signature; with `probe` also
    * emits every bucket at Hamming distance 1 (all-1-flip multiprobe). */
  private def bandsOf(df: DataFrame, idAs: String, numPlanes: Int, dim: Int,
      numBands: Int, probe: Boolean): DataFrame = {
    val bandBits = numPlanes / numBands
    val mask = (1L << bandBits) - 1
    val bands = (0 until numBands).map { b =>
      struct(lit(b).as("band"),
        shiftright(col("sig"), b * bandBits).bitwiseAND(lit(mask)).as("bucket"))
    }
    val exact = signatureFrame(df, idAs, numPlanes, dim)
      .select(col(idAs), explode(array(bands: _*)).as("b"))
      .select(col(idAs), col("b.band").as("band"), col("b.bucket").as("bucket"))
    if (!probe) exact
    else {
      val probes = lit(0L) +: (0 until bandBits).map(f => lit(1L << f))
      exact.select(col(idAs), col("band"),
        explode(array(probes.map(col("bucket").bitwiseXOR(_)): _*)).as("bucket"))
    }
  }

  def knnLsh(queries: DataFrame, corpus: DataFrame, k: Int,
      numPlanes: Int, dim: Int, numBands: Int = 8,
      multiprobe: Boolean = false): DataFrame = {
    require(numPlanes % numBands == 0, "numPlanes must divide into numBands")

    val cand = bandsOf(queries, "query_id", numPlanes, dim, numBands, probe = multiprobe)
      .join(bandsOf(corpus, "neighbor_id", numPlanes, dim, numBands, probe = false),
        Seq("band", "bucket"))
      .where(col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"))
      .distinct() // id-pair dedup only — no vector payloads shuffled
    rerank(cand, queries, corpus, k)
  }

  // ------------------------------------------------------------------- IVF

  /** (id, pos, x) exploded view of (id, vec) — the codegen-friendly shape
    * for batched dot products (see [[signatureFrame]]'s 8x lesson). */
  private def exploded(df: DataFrame, idAs: String, xAs: String): DataFrame =
    df.select(col("id").as(idAs),
      posexplode(col("vec").cast("array<double>")).as(Seq("pos", xAs)))

  /** All pairwise cosines between `data` (id, vec) and the (small) centroid
    * set (cid, vec): output (id, cid, cos). The centroid side (vectors +
    * precomputed norms) is BROADCAST; each (row, centroid) dot product is a
    * codegen'd [[graft.ann.expr.VecDot]] loop — embeddings never enter a
    * shuffle and there is no explode/aggregation at all (the previous
    * explode-join-aggregate shape pushed n*k*dim rows through a hash
    * aggregate; this streams n rows against k broadcast centroids).
    * Accumulation is in array order on both engines (VecDot's determinism
    * contract; verified cross-engine by the e2/e3/e4 gates). */
  private[ann] def centroidCosines(data: DataFrame, centroids: DataFrame): DataFrame = {
    val c = centroids.select(col("cid"), col("vec").cast("array<double>").as("cv"),
      sqrt(vec_dot(col("vec").cast("array<double>"), col("vec").cast("array<double>"))).as("cnorm"))
    data.select(col("id"), col("vec").cast("array<double>").as("dv"),
        sqrt(vec_dot(col("vec").cast("array<double>"), col("vec").cast("array<double>"))).as("dnorm"))
      .crossJoin(broadcast(c))
      .select(col("id"), col("cid"),
        (vec_dot(col("dv"), col("cv")) / (col("dnorm") * col("cnorm"))).as("cos"))
  }

  /** IVF coarse-quantizer assignment: each vector -> its nearest centroid
    * (cosine desc, centroid id asc on ties). One broadcast join + one
    * map-side-combined aggregation; the `max(struct(cos, -cid))` argmax
    * avoids a per-id sort window.
    *
    * `centroids` here is any small (cid, vec) frame. A production IVF trains
    * it with k-means; a deterministic corpus sample (cf. e4's `id % 29`)
    * gives the same query-time shape and keeps results oracle-checkable —
    * swap in trained centroids without touching the search path. */
  def ivfAssign(data: DataFrame, centroids: DataFrame): DataFrame =
    centroidCosines(data, centroids)
      // ids with empty/null vectors have NO nearest centroid (their cos is
      // null for every centroid) and are excluded from assignment — without
      // this filter the max(struct) argmax would fall through the all-null
      // cos field and "assign" them to the lowest-numbered centroid
      .where(col("cos").isNotNull)
      .groupBy(col("id"))
      .agg(max(struct(col("cos"), (-col("cid")).as("ncid"))).as("best"))
      .select(col("id"), (-col("best.ncid")).as("cid"))

  /** Deterministic Lloyd/k-means training for the IVF coarse quantizer
    * (cosine objective). Seeded by an id-stride sample (every n/k-th vector
    * by id — deterministic, no RNG); each iteration is two distributed
    * steps: (1) assignment = [[ivfAssign]] (broadcast centroids, one
    * map-side-combined aggregation), (2) re-estimation = per-(cid, pos)
    * mean over the exploded vectors — one shuffle of (cid, pos, sum, n),
    * never a vector collect. Per-round frames are k rows; `localCheckpoint`
    * keeps the loop's lineage flat.
    *
    * Clusters that lose all members keep their previous centroid (k never
    * shrinks silently). Returns (cid, vec) ready for [[knnIvf]] — swap for
    * the deterministic modulo sample without touching the search path. */
  def kmeansCentroids(data: DataFrame, k: Int, iters: Int,
      stride: Long): DataFrame = {
    require(k > 0 && iters >= 0, "k and iters must be positive")
    var cent = data
      .where(pmod(col("id"), lit(stride)) === 0)
      .select(dense_rank().over(Window.orderBy(col("id"))).cast("long").as("cid"),
        col("vec").cast("array<double>").as("vec"))
      .where(col("cid") <= k)
      .localCheckpoint()
    for (_ <- 1 to iters) {
      val assign = ivfAssign(data, cent)
      val means = exploded(data, "id", "x")
        .join(assign, "id")
        .groupBy(col("cid"), col("pos"))
        .agg(avg(col("x")).as("m"))
        .groupBy(col("cid"))
        .agg(array_sort(collect_list(struct(col("pos"), col("m")))).as("pm"))
        .select(col("cid"), transform(col("pm"), p => p.getField("m")).as("vec"))
      // empty clusters: fall back to the previous centroid
      cent = cent.select(col("cid"), col("vec").as("prev"))
        .join(means, Seq("cid"), "left")
        .select(col("cid"), coalesce(col("vec"), col("prev")).as("vec"))
        .localCheckpoint()
    }
    cent
  }

  /** Norm of the vector column, computed once per row: (idAs, vector, norm). */
  private def withNorm(df: DataFrame, idAs: String, vecAs: String,
      normAs: String): DataFrame =
    df.select(col("id").as(idAs), col("vec").cast("array<double>").as(vecAs),
      sqrt(vec_dot(col("vec").cast("array<double>"),
        col("vec").cast("array<double>"))).as(normAs))

  /** dot(a, b) / (na * nb) — same operations in the same order as
    * [[cosine]], but with the norms precomputed: candidate re-ranking walks
    * each pair's arrays ONCE (a codegen'd VecDot loop) instead of three
    * times. */
  private def cosineWithNorms(a: Column, b: Column, na: Column, nb: Column): Column =
    vec_dot(a, b) / (na * nb)

  /** Exact-cosine re-rank of an id-pair candidate set: join the vectors
    * back (once, with per-vector norms precomputed), score, keep top-k per
    * query. Shared by [[knnLsh]] and [[knnIvf]] so tie-breaking (cos desc,
    * neighbor_id) and double-precision handling stay in one place. */
  private[ann] def rerank(cand: DataFrame, queries: DataFrame, corpus: DataFrame,
      k: Int): DataFrame = {
    val qv = withNorm(queries, "query_id", "qv", "qn")
    val nv = withNorm(corpus, "neighbor_id", "nv", "nn")
    val w = Window.partitionBy(col("query_id")).orderBy(col("cos").desc, col("neighbor_id"))
    cand
      .join(qv, "query_id")
      .join(nv, "neighbor_id")
      .withColumn("cos",
        cosineWithNorms(col("qv"), col("nv"), col("qn"), col("nn")))
      .withColumn("rnk", row_number().over(w))
      .where(col("rnk") <= k)
      .select(col("query_id"), col("rnk"), col("neighbor_id"), col("cos"))
  }

  /** IVF ANN: probe the `nprobe` nearest centroid cells per query, then
    * exact-cosine top-k over ONLY the vectors assigned to those cells.
    *
    * The 100 TB shape: the corpus is scanned once to build the (id, cid)
    * assignment (in production: written as a cid-partitioned table so probes
    * prune partitions); a query then touches ~nprobe/C of the corpus instead
    * of all of it, and the candidate join carries only (query_id, cid) /
    * (id, cid) pairs — vectors join back once for the re-rank, exactly like
    * [[knnLsh]]. Recall/cost is tuned by C (cell count) and nprobe.
    *
    * CONTRACT: rows with NULL or empty vectors have no defined nearest
    * centroid (zero norm) and take no part in assignment, probing, or
    * results — unlike the LSH path, which maps them to signature 0. The
    * exclusion is explicit here, not an artifact of the join shape.
    *
    * Output: (query_id, rnk, neighbor_id, cos). */
  def knnIvf(queries: DataFrame, corpus: DataFrame, centroids: DataFrame,
      k: Int, nprobe: Int): DataFrame = {
    val nonEmpty = (df: DataFrame) => df.where(size(col("vec")) > 0)
    val assign = ivfAssign(nonEmpty(corpus), centroids)
    val wp = Window.partitionBy(col("id")).orderBy(col("cos").desc, col("cid"))
    val probes = centroidCosines(nonEmpty(queries), centroids)
      .withColumn("rn", row_number().over(wp))
      .where(col("rn") <= nprobe)
      .select(col("id").as("query_id"), col("cid"))
    val cand = probes.join(assign.withColumnRenamed("id", "neighbor_id"), "cid")
      .where(col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"))
      .distinct()
    rerank(cand, queries, corpus, k)
  }

  /** The nprobe SWEEP of [[knnIvf]] in one pass: centroid assignment,
    * probe ranking, candidate fetch and the exact-cosine scoring all run
    * ONCE at the maximum budget; each candidate (carrying the rank `rn` of
    * the probe that found it) is then replicated to every budget
    * np >= rn — slim (ids, cos) rows only — and cut top-k per (np, query).
    * Row-identical to unioning knnIvf over np = 1..maxNprobe (each corpus
    * vector is assigned exactly one cell, so the budget-np candidate set
    * is exactly {rn <= np}), at one Nth of the assignment + scoring cost
    * for an N-budget sweep. */
  def knnIvfSweep(queries: DataFrame, corpus: DataFrame, centroids: DataFrame,
      k: Int, maxNprobe: Int): DataFrame = {
    val nonEmpty = (df: DataFrame) => df.where(size(col("vec")) > 0)
    val assign = ivfAssign(nonEmpty(corpus), centroids)
    val wp = Window.partitionBy(col("id")).orderBy(col("cos").desc, col("cid"))
    val probes = centroidCosines(nonEmpty(queries), centroids)
      .withColumn("rn", row_number().over(wp))
      .where(col("rn") <= maxNprobe)
      .select(col("id").as("query_id"), col("cid"), col("rn"))
    val cand = probes.join(assign.withColumnRenamed("id", "neighbor_id"), "cid")
      .where(col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"), col("rn"))
    val qv = withNorm(queries, "query_id", "qv", "qn")
    val nv = withNorm(corpus, "neighbor_id", "nv", "nn")
    val w = Window.partitionBy(col("nprobe"), col("query_id"))
      .orderBy(col("cos").desc, col("neighbor_id"))
    cand
      .join(qv, "query_id")
      .join(nv, "neighbor_id")
      .withColumn("cos",
        cosineWithNorms(col("qv"), col("nv"), col("qn"), col("nn")))
      .select(col("query_id"), col("neighbor_id"), col("cos"),
        explode(sequence(col("rn"), lit(maxNprobe))).as("nprobe"))
      .withColumn("rnk", row_number().over(w))
      .where(col("rnk") <= k)
      .select(col("nprobe"), col("query_id"), col("rnk"),
        col("neighbor_id"), col("cos"))
  }

  // -------------------------------------------------------------------- PQ

  /** Product-quantization codebooks: the vector space is split into
    * `numSub` contiguous subspaces of `subDim` dims; each subspace gets a
    * `ksub`-codeword codebook. Codewords here are a deterministic corpus
    * sample (subvectors of ids < ksub — the same swap-in-trained-centroids
    * contract as [[ivfAssign]]: production trains each codebook with
    * k-means ([[kmeansCentroids]] per subspace) without touching the
    * search path, and the DuckDB oracle stays in lockstep by construction).
    * Output: (m, code, cw: array<double>, cwn2 = dot(cw, cw)) —
    * numSub*ksub rows, broadcast-sized by design.
    *
    * Rows whose vector is not exactly numSub*subDim wide are excluded
    * (a PQ code is undefined for them) — same explicit-exclusion contract
    * as [[knnIvf]]'s empty-vector rule. */
  def pqCodebooks(corpus: DataFrame, numSub: Int, subDim: Int,
      ksub: Int): DataFrame = {
    val subs = (0 until numSub).map { m =>
      struct(lit(m).as("m"), slice(col("vec"), m * subDim + 1, subDim).as("cw"))
    }
    corpus.select(col("id").as("code"), col("vec").cast("array<double>").as("vec"))
      .where(col("code") < ksub && size(col("vec")) === numSub * subDim)
      .select(col("code"), explode(array(subs: _*)).as("s"))
      .select(col("s.m").as("m"), col("code"), col("s.cw").as("cw"),
        vec_dot(col("s.cw"), col("s.cw")).as("cwn2"))
  }

  /** PQ encoding: each vector -> `numSub` one-byte-sized codes, one per
    * subspace, by exact L2 argmin against that subspace's codebook.
    * argmin ||x_m - c||^2 == argmax (2*dot(x_m, c) - ||c||^2) — the ||x_m||^2
    * term is constant per (id, m), so the assignment needs only codegen'd
    * [[graft.ann.expr.VecDot]] loops (no subtraction expression). One
    * broadcast join + one map-side-combined `max(struct)` argmax, ties to
    * the lowest code id. Output: (id, m, code).
    *
    * This is the 100 TB story: the encoded corpus is numSub bytes per
    * vector (64x smaller than 64 float dims) and is what a scan touches —
    * full-precision vectors stay in cold storage until re-rank. */
  /** `carry`: extra columns of `data` to thread through unchanged (one value
    * per id — e.g. [[knnIvfPq]]'s cell assignment), so callers need no
    * second corpus-sized join to restore them. */
  def pqAssign(data: DataFrame, codebooks: DataFrame,
      numSub: Int, subDim: Int, carry: Seq[String] = Nil): DataFrame = {
    // the codebook is broadcast-sized BY CONSTRUCTION (numSub*ksub rows) —
    // collect it once and encode each vector with the fused
    // [[graft.ann.expr.PqEncode]] loop instead of cross-joining every
    // vector against numSub*ksub codebook rows and argmax-aggregating the
    // blowup (2048x the corpus row count for 8x256 codebooks; the r4
    // smoke's dominant e7 cost). Same arithmetic, same tie-break, same
    // collected cwn2 doubles — bit-identical codes (spec-pinned).
    val rows = codebooks
      .select(col("m").cast("int"), col("code").cast("long"), col("cw"), col("cwn2"))
      .orderBy(col("m"), col("code")).collect()
    val counts = (0 until numSub).map(m => rows.count(_.getInt(0) == m))
    val cbFlat = rows.flatMap(_.getSeq[Double](2))
    val cwn2 = rows.map(_.getDouble(3))
    val codeVals = rows.map(_.getLong(1))
    val ids = col("id") +: carry.map(col)
    data.select(ids :+ col("vec").cast("array<double>").as("dv"): _*)
      .where(size(col("dv")) === numSub * subDim)
      .select(ids :+ posexplode(graft.ann.expr.functions.pq_encode(col("dv"),
        cbFlat.toIndexedSeq, cwn2.toIndexedSeq, codeVals.toIndexedSeq,
        counts, numSub, subDim)): _*)
      .select(ids ++ Seq(col("pos").as("m"), col("col").as("code")): _*)
  }

  /** Per-query ADC lookup table: lut(q, m, code) = dot(q_m, codebook[m][code])
    * — numSub*ksub doubles per query, computed once and reused against every
    * encoded corpus vector (the FAISS ADC shape). */
  private def adcTable(queries: DataFrame, codebooks: DataFrame,
      numSub: Int, subDim: Int): DataFrame =
    queries.select(col("id").as("query_id"), col("vec").cast("array<double>").as("qv"))
      .where(size(col("qv")) === numSub * subDim)
      .crossJoin(broadcast(codebooks))
      .select(col("query_id"), col("m"), col("code"),
        vec_dot(slice(col("qv"), col("m") * subDim + 1, lit(subDim)), col("cw")).as("l"))

  /** PQ-ADC approximate top-k: rank corpus vectors by the quantized inner
    * product adc(q, x) = sum_m lut(q, m, code(x, m)) and keep the top k per
    * query (adc desc, neighbor_id asc). The scan never touches a corpus
    * vector — only its codes — so the per-candidate cost is numSub LUT
    * probes instead of a dim-wide float loop, and the candidate frame
    * carries (query_id, neighbor_id, m, l) narrow rows only.
    *
    * DETERMINISM: the per-pair ADC sum is pivoted into per-subspace columns
    * (`max(when(m = i))` — exactly one row per (q, x, m)) and added in fixed
    * left-to-right subspace order, so the double result is bit-identical to
    * the oracle's identically-associated sum (the d18 fixed-order-sum
    * pattern); a bare `sum()` would add in partition order.
    *
    * Output: (query_id, rnk, neighbor_id, adc). */
  def knnPqAdc(queries: DataFrame, corpus: DataFrame, k: Int,
      numSub: Int, subDim: Int, ksub: Int): DataFrame = {
    val cb = pqCodebooks(corpus, numSub, subDim, ksub)
    val codes = pqAssign(corpus, cb, numSub, subDim)
      .withColumnRenamed("id", "neighbor_id")
    val perSub = (0 until numSub).map(m =>
      max(when(col("m") === m, col("l"))).as(s"l$m"))
    val adc = (0 until numSub).map(m => col(s"l$m")).reduce(_ + _)
    val w = Window.partitionBy(col("query_id")).orderBy(col("adc").desc, col("neighbor_id"))
    adcTable(queries, cb, numSub, subDim)
      .join(codes, Seq("m", "code"))
      .where(col("query_id") =!= col("neighbor_id"))
      .groupBy(col("query_id"), col("neighbor_id"))
      .agg(perSub.head, perSub.tail: _*)
      .select(col("query_id"), col("neighbor_id"), adc.as("adc"))
      .withColumn("rnk", row_number().over(w))
      .where(col("rnk") <= k)
      .select(col("query_id"), col("rnk"), col("neighbor_id"), col("adc"))
  }

  /** IVF-PQ ADC search — the composed index shape (FAISS IVFPQ; Jégou et
    * al., "Product Quantization for Nearest Neighbor Search", IEEE TPAMI
    * 2011 §IV): corpus vectors are assigned to coarse cells, their
    * RESIDUALS against the assigned centroid are PQ-encoded, and a query
    * scores candidates in its `nprobe` probed cells as
    * `dot(q, centroid) + sum_m lut(q, m, code_m)` — the coarse term plus
    * the quantized-residual inner product. Residual encoding is what makes
    * PQ codes sharp inside a cell (vectors in one cell share the centroid,
    * so the residual space is centered), and the probe restriction is what
    * a cid-partitioned code layout prunes at planning.
    *
    * Codebooks are the deterministic corpus sample (residual subvectors of
    * ids < ksub — same swap-in-trained-centroids contract as [[pqAssign]]);
    * cell probing and tie-breaking mirror [[knnIvf]]; the ADC sum uses
    * [[knnPqAdc]]'s fixed-order pivot so the double result is bit-identical
    * cross-engine (coarse term first, then subspaces 0..numSub-1).
    *
    * The 100 TB story compounds both parents': a query reads numSub bytes
    * per candidate (not dim floats) and only from nprobe/C of the corpus
    * (not all cells). Output: (query_id, rnk, neighbor_id, adc). */
  def knnIvfPq(queries: DataFrame, corpus: DataFrame, centroids: DataFrame,
      k: Int, nprobe: Int, numSub: Int, subDim: Int, ksub: Int): DataFrame = {
    val dims = numSub * subDim
    val corp = corpus.where(size(col("vec")) === dims)
    // centroid set filtered to the PQ width too — an off-width centroid
    // would diverge Spark's assignment from the (width-filtered) oracle's
    // instead of failing loudly
    val centW = centroids.where(size(col("vec")) === dims)
    val cent = centW.select(col("cid"), col("vec").cast("array<double>").as("cv"))
    val resid = corp.select(col("id"), col("vec").cast("array<double>").as("dv"))
      .join(ivfAssign(corp, centW), "id")
      .join(broadcast(cent), "cid")
      .select(col("id"), col("cid"),
        zip_with(col("dv"), col("cv"), (a, b) => a - b).as("rv"))
    // codebooks/encode/LUT are the SAME determinism-critical machinery as
    // the flat-PQ path, applied to the residual frame — one implementation
    // of the tie-break and fixed-order contracts ([[pqCodebooks]],
    // [[pqAssign]] with the cell carried through, [[adcTable]])
    val rvec = resid.select(col("id"), col("cid"), col("rv").as("vec"))
    val cb = pqCodebooks(rvec, numSub, subDim, ksub)
    val codes = pqAssign(rvec, cb, numSub, subDim, carry = Seq("cid"))
      .select(col("id").as("neighbor_id"), col("cid"), col("m"), col("code"))
    val q = queries.where(size(col("vec")) === dims)
      .select(col("id").as("query_id"), col("vec").cast("array<double>").as("qv"))
    val wp = Window.partitionBy(col("id")).orderBy(col("cos").desc, col("cid"))
    val probes = centroidCosines(queries.where(size(col("vec")) === dims), centW)
      .withColumn("rn", row_number().over(wp))
      .where(col("rn") <= nprobe)
      .select(col("id").as("query_id"), col("cid"))
    val qc = probes.join(q, "query_id").join(broadcast(cent), "cid")
      .select(col("query_id"), col("cid"), vec_dot(col("qv"), col("cv")).as("qc"))
    val lut = adcTable(queries.where(size(col("vec")) === dims), cb, numSub, subDim)
    val perSub = (0 until numSub).map(m =>
      max(when(col("m") === m, col("l"))).as(s"l$m"))
    val adc = (0 until numSub).map(m => col(s"l$m")).foldLeft(col("qc"))(_ + _)
    val w = Window.partitionBy(col("query_id")).orderBy(col("adc").desc, col("neighbor_id"))
    qc.join(codes, "cid")
      .where(col("query_id") =!= col("neighbor_id"))
      .join(lut, Seq("query_id", "m", "code"))
      .groupBy(col("query_id"), col("neighbor_id"), col("qc"))
      .agg(perSub.head, perSub.tail: _*)
      .select(col("query_id"), col("neighbor_id"), adc.as("adc"))
      .withColumn("rnk", row_number().over(w))
      .where(col("rnk") <= k)
      .select(col("query_id"), col("rnk"), col("neighbor_id"), col("adc"))
  }

  /** Production PQ search: ADC shortlist of `rerankFactor * k` candidates
    * per query, then exact-cosine re-rank over full-precision vectors —
    * [[rerank]]'s shared tie-breaking, like [[knnLsh]]/[[knnIvf]]. Vectors
    * are fetched for shortlist ids only: at 100 TB the ADC pass reads the
    * codes table (numSub B/vector) and the re-rank reads
    * O(queries * rerankFactor * k) full vectors, not the corpus. */
  def knnPq(queries: DataFrame, corpus: DataFrame, k: Int,
      numSub: Int, subDim: Int, ksub: Int, rerankFactor: Int = 4): DataFrame = {
    val cand = knnPqAdc(queries, corpus, k * rerankFactor, numSub, subDim, ksub)
      .select(col("query_id"), col("neighbor_id"))
    rerank(cand, queries, corpus, k)
  }

  /** Embedding-cosine near-duplicate PAIRS: every (id_a < id_b) pair that
    * shares at least one LSH band bucket and has cosine >= `threshold`.
    * The corpus-scale shape of embedding dedup: linear banded candidate
    * generation (ids only through the shuffle), exact cosine verification,
    * and a canonical survivor is then a min() aggregation over the pairs.
    * Input: (id, vec). Output: (id_a, id_b, cos).
    *
    * TUNING — band width is the candidate-volume throttle: a random pair
    * collides in a b-bit band with probability ~2^-b, so expected candidates
    * are ~numBands * n^2 / 2^(b+1). At n=50k, 4-bit bands are effectively
    * all-pairs (measured: 52% of the e3 bench before widening); 8-bit bands
    * cut candidates ~20x. Raise b further as n or the similarity threshold
    * grows (high-threshold near-dups survive wide bands: p_bit^b stays
    * usable when p_bit is ~0.9+). */
  /** Adaptive band COUNT for [[nearDupPairs]] over a 48-plane signature —
    * the corpus-size-scaled throttle (the e9 SemDeDup rule applied to
    * banding): expected random candidates are ~numBands * n^2 / 2^(b+1),
    * so the band width b must grow ~log2(n) for the candidate volume to
    * stay ~linear. Regrouping the FIXED 48-bit signature into fewer, wider
    * bands (6x8 -> 4x12 -> 3x16 -> 2x24 bits) widens b without changing
    * the signature computation, so the per-vector work is identical at
    * every scale and only the band extraction adapts. Each threshold
    * doubles-to-16x the corpus bound that keeps candidates linear
    * (2000 * 2^(b-8)); beyond ~1.3e8 vectors the 2x24 split stands and
    * recall/candidate volume is the operator's documented knob (raise
    * numPlanes past 48 for more bands at 24 bits). Recall trade: fewer,
    * wider bands lower the match probability p_band = p_bit^b summed over
    * fewer bands — acceptable for HIGH-similarity near-dup thresholds
    * (p_bit ~ 0.9+), which is this operator's regime (cf. the TUNING note
    * below). Mirrored verbatim by the DuckDB oracle via a COUNT scalar
    * subquery, the e9 device, so both engines adapt identically. */
  def adaptiveNearDupBands(n: Long): Int =
    if (n <= 2000L) 6          // 8-bit bands — the sf0.01/sf0.1 gate regime
    else if (n <= 32000L) 4    // 12-bit — covers the 10x/30x smoke
    else if (n <= 512000L) 3   // 16-bit
    else 2                     // 24-bit

  /** Adaptive band COUNT for [[knnLsh]] over a 32-plane signature — the
    * same corpus-scaled regrouping as [[adaptiveNearDupBands]], tuned for
    * the top-k ANN regime (narrower signature, moderate-similarity
    * neighbors): 8x4-bit bands at gate scale, 4x8-bit through ~512k
    * vectors (candidates ~ 4n/256 per query — linear, recall still sound
    * for p_bit ~ 0.7+), 2x16-bit beyond. Past ~512k the production
    * answers are IVF ([[knnIvf]]/[[ann.IvfIndex]] — the cid-pruned scale
    * path) or multiprobe/more planes; the 2x16 tier keeps candidate
    * volume bounded for a user who stays on LSH. Mirrored by the DuckDB
    * oracle via the COUNT scalar-subquery device. */
  def adaptiveKnnBands(n: Long): Int =
    if (n <= 2000L) 8 else if (n <= 512000L) 4 else 2

  def nearDupPairs(data: DataFrame, threshold: Double,
      numPlanes: Int, dim: Int, numBands: Int = 8): DataFrame = {
    require(numPlanes % numBands == 0, "numPlanes must divide into numBands")
    // lazy localCheckpoint: the band frame feeds BOTH sides of the
    // self-join; without it every signature (numPlanes dot products per
    // vector) is computed twice. At corpus scale this frame is a written
    // signature table. eager=false keeps DataFrame CONSTRUCTION free (the
    // job runs on first action, once); blocks are reclaimed when the frame
    // is GC'd — callers invoking this repeatedly on the same data should
    // memoize the result (cf. PipelineQueries e3) rather than accumulate
    // one copy per call.
    val bands = bandsOf(data, "id", numPlanes, dim, numBands, probe = false)
      .localCheckpoint(eager = false)
    val cand = bands.select(col("id").as("id_a"), col("band"), col("bucket"))
      .join(bands.select(col("id").as("id_b"), col("band"), col("bucket")),
        Seq("band", "bucket"))
      .where(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"))
      .distinct()
    // MERGE hint: the vector sides scale with the corpus and carry the
    // embedding arrays — a misestimated broadcast would build the whole
    // vector table on the driver (same trap as PipelineQueries.shingleSets;
    // measured there at 10x). Verification joins stay sort-merge.
    val va = withNorm(data, "id_a", "va", "na").hint("merge")
    val vb = withNorm(data, "id_b", "vb", "nb").hint("merge")
    cand
      .join(va, "id_a")
      .join(vb, "id_b")
      .withColumn("cos",
        cosineWithNorms(col("va"), col("vb"), col("na"), col("nb")))
      .where(col("cos") >= threshold)
      .select(col("id_a"), col("id_b"), col("cos"))
  }
}

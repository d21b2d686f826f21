package graft.insert

import scala.collection.mutable

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.h3.expr.functions._

/**
 * H3 compaction / uncompaction of DataFrames (reference: insert-side
 * `h3_compact_dataframe`, `insert.rs:99-108`; read-side
 * `h3_uncompact_dataframe_subset`, `compacted_tables/mod.rs:459-477`).
 *
 * Compaction: wherever ALL children of a parent cell are present and carry
 * identical values in every non-index column, the children are replaced by
 * the parent, recursively — a lossless 7^k storage reduction for uniform
 * regions (reference README.md:21-23). Pentagon parents have 6 children;
 * [[graft.h3.H3.childrenCount]] is pentagon-aware, so the completeness test
 * is exact.
 *
 * Scale note: one groupBy shuffle per resolution level (<= 15). The groupBy
 * key is (parent, value-columns...), so the shuffle co-locates each candidate
 * sibling set; skew is bounded by 7 rows per group. Input must be
 * row-deduplicated first (duplicate rows would inflate the sibling count and
 * is the reference's ReplacingMergeTree precondition).
 */
object Compaction {

  /** Compact a deduplicated H3 DataFrame. All columns except `h3Col` are
    * treated as value columns (equality required for merging). */
  def compact(df: DataFrame, h3Col: String = "h3index"): DataFrame = {
    val valueCols = df.columns.filterNot(_ == h3Col).toSeq
    val maxRes = df.select(max(h3_get_resolution(col(h3Col)))).head() match {
      case r if r.isNullAt(0) => return df // empty input
      case r => r.getInt(0)
    }
    val present = mutable.Set[Int](
      df.select(h3_get_resolution(col(h3Col)).as("r")).distinct()
        .collect().map(_.getInt(0)).toIndexedSeq: _*)
    var acc = df
    var r = maxRes
    while (r >= 1) {
      if (!present(r)) { r -= 1 }
      else {
      present += (r - 1)
      val atRes = acc.where(h3_get_resolution(col(h3Col)) === r)
      val rest = acc.where(h3_get_resolution(col(h3Col)) =!= r)
      val parent = h3_to_parent(col(h3Col), lit(r - 1))
      // sibling sets: group by (parent, values); complete iff count == pentagon-aware child count
      val grouped = atRes
        .groupBy((parent.as(h3Col) +: valueCols.map(col)): _*)
        .agg(count(lit(1)).as("_sibling_cnt"))
      val promoted = grouped
        .where(col("_sibling_cnt") === h3_children_count(col(h3Col), lit(r)))
        .drop("_sibling_cnt")
        .select(df.columns.map(col).toIndexedSeq: _*)
      // rows whose (parent, values) group was NOT promoted survive at res r
      val survivors = atRes
        .join(promoted.select((col(h3Col).as("_p") +: valueCols.map(c => col(c).as(s"_v_$c"))): _*),
          valueCols.foldLeft(parent === col("_p")) { (acc0, c) =>
            acc0 && col(c) <=> col(s"_v_$c")
          },
          "left_anti")
        .select(df.columns.map(col).toIndexedSeq: _*)
      // localCheckpoint truncates the logical plan: without it the
      // self-referencing union/filter lineage grows ~3^levels and chokes
      // the optimizer well before data size matters.
      acc = rest.unionByName(survivors).unionByName(promoted).localCheckpoint()
      r -= 1
      }
    }
    acc
  }

  /** Expand every cell to `targetRes`; cells already at/above targetRes pass
    * through unchanged (matches reference uncompaction: only coarser cells
    * expand, `mod.rs:459-477`). */
  def uncompact(df: DataFrame, targetRes: Int, h3Col: String = "h3index"): DataFrame = {
    val others = df.columns.filterNot(_ == h3Col).map(col).toIndexedSeq
    val expanded = df
      .withColumn("_children",
        when(h3_get_resolution(col(h3Col)) < targetRes,
          h3_to_children(col(h3Col), lit(targetRes)))
          .otherwise(array(col(h3Col))))
      .withColumn(h3Col, explode(col("_children")))
      .drop("_children")
    expanded.select(df.columns.map(col).toIndexedSeq: _*)
  }

  /** Restricted uncompaction (A7): produce exactly the requested target-res
    * cells, taking each cell's value from its stored ancestor (reference
    * `h3_uncompact_dataframe_subset`, `mod.rs:459-477`).
    *
    * Spark-first formulation: instead of exploding stored cells into up to
    * 7^k children and filtering (the naive reading of the reference), the
    * *request set* is expanded into its (resolution, ancestor) pairs —
    * at most 16 rows per requested cell — and equi-joined against the stored
    * cells. No data-side explosion, one hash join, broadcastable probe side;
    * this survives a res-0 compacted cell queried at res 15, which the
    * explode formulation cannot. */
  def uncompactRestricted(df: DataFrame, targetRes: Int, targetCells: DataFrame,
      h3Col: String = "h3index"): DataFrame = {
    val cellCol = targetCells.columns.head
    val ancestors = (0 to targetRes).map { r =>
      struct(lit(r).as("_r"), h3_to_parent(col("_t"), lit(r)).as("_anc"))
    }
    val tExp = targetCells.select(col(cellCol).as("_t")).distinct()
      .select(col("_t"), explode(array(ancestors: _*)).as("_x"))
      .select(col("_t"), col("_x._r").as("_r"), col("_x._anc").as("_anc"))
    df.withColumn("_res", h3_get_resolution(col(h3Col)))
      .join(tExp, col(h3Col) === col("_anc") && col("_res") === col("_r"))
      .withColumn(h3Col, col("_t"))
      .select(df.columns.map(col).toIndexedSeq: _*)
  }

  /** Children expansion with the store's loudness contract: an oversized
    * expansion must fail, not silently truncate (cf. CellStore probe guard). */
  private def guardedChildren(cell: org.apache.spark.sql.Column, res: Int) =
    when(h3_children_count(cell, lit(res)) > (1L << 28),
      raise_error(concat(lit("uncompaction expansion to resolution "), lit(res),
        lit(" exceeds 2^28 children for cell "), cell.cast("string")))
        .cast("array<bigint>"))
      .otherwise(h3_to_children(cell, lit(res)))

  /** A7 driven by the RAW probe set, for stored rows COARSER than
    * `targetRes` only. Each (stored row, probe) ancestor match explodes
    * exactly the intersection subtree — the finer of the two cells — to
    * `targetRes`, so the work is OUTPUT-sized. [[uncompactRestricted]]'s
    * request-side enumeration is |probes| * 7^(targetRes - probeRes) rows
    * BEFORE the join regardless of matches: exact, but a scale hazard when
    * coarse probes cover large areas (measured 25s of a 128s bench on a
    * 20k-probe res-5 -> res-9 traversal before this path existed).
    *
    * Probes finer than `targetRes` clamp to their targetRes ancestor.
    * Matching joins on parent-at-min-resolution keys: probes emit at most
    * one (res, key) row per physical resolution (never children), stored
    * rows compute the key via `h3_to_parent` — one hash join per distinct
    * probe resolution (one, in practice). Output duplicates can only arise
    * from NESTED probes (impossible within one resolution), so the dedup
    * shuffle runs only for mixed-resolution probe sets.
    *
    * `includeTargetRes = true` extends the key set to `targetRes`
    * INCLUSIVE, so rows already AT the target resolution ride the SAME
    * join — their ancestor match is exact-key equality and their
    * children-explosion at equal resolution is themselves — which lets a
    * doUncompact cell query run as ONE pass over the scan instead of a
    * fine/coarse union that scans the store twice and builds the probe
    * relation per branch (round 12, guide §2.4: the join IS the semi-join
    * predicate, so the separate probe semi-join is redundant work).
    *
    * `driverCells`: when the caller holds the probe set on the driver and
    * it is SMALL, the (q, res, key) relation is a pure function of it —
    * built at plan time as a local relation instead of a distributed
    * explode+distinct (the queryCells probe-key device, same 8192-row
    * gate applied AFTER normalization+dedup so a duplicate-heavy or
    * finer-than-target Seq that collapses under the gate still takes the
    * plan-time path, same [[graft.h3.expr.H3ExprUtil]] evals so keys are
    * bit-identical to the Column form).
    *
    * `broadcastProbes`: callers that broadcast-hinted their probe relation
    * in the semi-join this one-pass form replaces (Seq-probe queryCells)
    * keep the hint on the distributed qside here — without it a mid-size
    * Seq probe set past the plan-time gate is left to AQE's size estimate
    * and can regress to a sort-merge join (round-12 ADVICE). */
  def uncompactCoarseToProbes(coarse: DataFrame, targetRes: Int,
      probes: DataFrame, h3Col: String = "h3index",
      knownProbeRes: Option[Seq[Int]] = None,
      includeTargetRes: Boolean = false,
      driverCells: Option[Seq[Long]] = None,
      broadcastProbes: Boolean = false): DataFrame = {
    import graft.h3.H3
    val keyResBound = if (includeTargetRes) targetRes + 1 else targetRes
    val q0 = probes.columns.head
    lazy val pn = probes.select(
        when(h3_get_resolution(col(q0)) > targetRes,
          h3_to_parent(col(q0), lit(targetRes))).otherwise(col(q0)).as("_q"))
      .distinct()
    // driver-known SMALL probe sets: normalize + dedup FIRST, then gate on
    // the deduplicated count (normalization is pure per-element bit math,
    // so running it before the gate costs nanoseconds per cell and lets
    // duplicate-heavy / finer-than-target sets that collapse well take the
    // plan-time path instead of the distributed fallback)
    val localCells: Option[Seq[Long]] = driverCells
      .map(_.map(c =>
          if (H3.getResolution(c) > targetRes)
            graft.h3.expr.H3ExprUtil.toParentTotal(c, targetRes) else c)
        .distinct)
      .filter(cs => cs.length.toLong * keyResBound <= 8192)
    // callers that KNOW the probe resolutions (traversal: one fixed res;
    // Seq probes: driver-computed) skip the per-execution discovery job —
    // clamped to targetRes exactly as the pn normalization clamps the cells
    val pRes = knownProbeRes
      .map(_.map(r => math.min(r, targetRes)).distinct.sorted)
      .getOrElse(localCells
        .map(_.map(H3.getResolution).distinct.sorted.toSeq)
        .getOrElse(pn.select(h3_get_resolution(col("_q")).as("p")).distinct()
          .collect().map(_.getInt(0)).toSeq.sorted))
    val spark = coarse.sparkSession
    import spark.implicits._
    val parts = pRes.map { p =>
      val qside = localCells match {
        case Some(cs) =>
          cs.filter(H3.getResolution(_) == p).flatMap { q =>
            (0 until keyResBound).map { r =>
              (q, r,
                if (r < p) graft.h3.expr.H3ExprUtil.toParentTotal(q, r) else q)
            }
          }.distinct.toDF("_q", "_r", "_key")
        case None =>
          val keys = (0 until keyResBound).map { r =>
            struct(lit(r).as("_r"),
              (if (r < p) h3_to_parent(col("_q"), lit(r)) else col("_q")).as("_key"))
          }
          pn.where(h3_get_resolution(col("_q")) === p)
            .select(col("_q"), explode(array(keys: _*)).as("_x"))
            .select(col("_q"), col("_x._r").as("_r"), col("_x._key").as("_key"))
            .distinct()
      }
      val qhinted = if (broadcastProbes && localCells.isEmpty) broadcast(qside) else qside
      val sres = h3_get_resolution(col(h3Col))
      val skey = when(sres >= p, h3_to_parent(col(h3Col), lit(p))).otherwise(col(h3Col))
      coarse.join(qhinted, sres === col("_r") && skey === col("_key"))
        .withColumn("_f",
          when(h3_get_resolution(col("_q")) > h3_get_resolution(col(h3Col)), col("_q"))
            .otherwise(col(h3Col)))
        .withColumn(h3Col, explode(guardedChildren(col("_f"), targetRes)))
        .select(coarse.columns.map(col).toIndexedSeq: _*)
    }
    val out =
      if (parts.isEmpty) coarse.limit(0)
      else parts.reduce(_ unionByName _)
    if (pRes.lengthCompare(1) <= 0) out else out.dropDuplicates()
  }
}

package graft.store

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.types.{IntegerType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/**
 * SQL table-valued functions over the cell store: `graft_scan(root,
 * tableset, res)` exposes the D7 resolution scan (compacted partitions at
 * res <= r plus the base partition at r) to PURE SQL — a `spark.sql` user
 * can join/aggregate tablesets without touching the DataFrame API:
 *
 *   SELECT h3_to_parent(h3index, 5), sum(qty)
 *   FROM graft_scan('/data/store', 'elephants', 9) GROUP BY 1
 *
 * The builder runs at ANALYSIS time on the driver: it reads the sidecar
 * schema, builds the pruned scan plan, and splices the resolved subtree
 * into the query — so partition pruning, the declared-schema read, and
 * every downstream optimization (including
 * [[graft.plans.H3ParentPredicateRewrite]]'s range inference over filters
 * above the TVF) apply exactly as for the DataFrame path. Arguments must
 * be literals (they parameterize plan construction, not row evaluation).
 *
 * Registered by [[graft.Graft.register]] alongside the scalar functions.
 */
object TableFunctions {

  def register(spark: SparkSession): Unit = {
    spark.sessionState.tableFunctionRegistry.registerFunction(
      FunctionIdentifier("graft_scan"),
      new ExpressionInfo("graft.store", null, "graft_scan",
        "graft_scan(root, tableset, res) - rows of a tableset at the given resolution", ""),
      graftScanBuilder)
    spark.sessionState.tableFunctionRegistry.registerFunction(
      FunctionIdentifier("graft_traverse"),
      new ExpressionInfo("graft.store", null, "graft_traverse",
        "graft_traverse(root, tableset, res, array(aoiCells...), maxFetchCount) - " +
          "§3.3 bulk AOI traversal: rows at res tagged with their traversal cell", ""),
      graftTraverseBuilder)
    spark.sessionState.tableFunctionRegistry.registerFunction(
      FunctionIdentifier("graft_traverse_df"),
      new ExpressionInfo("graft.store", null, "graft_traverse_df",
        "graft_traverse_df(root, tableset, res, aoiQuery, maxFetchCount " +
          "[, prefilterTemplate]) - bulk AOI traversal where the AOI is a " +
          "SUBQUERY (SQL string or TABLE(...) argument) instead of a " +
          "literal array: the AOI plan is spliced in distributed, never " +
          "collected to the driver - continent-sized AOIs from pure SQL", ""),
      graftTraverseDfBuilder)
    spark.sessionState.tableFunctionRegistry.registerFunction(
      FunctionIdentifier("graft_stats"),
      new ExpressionInfo("graft.store", null, "graft_stats",
        "graft_stats(root, tableset) - per-resolution stored/derived cell counts (A9/A10)", ""),
      graftStatsBuilder)
    spark.sessionState.tableFunctionRegistry.registerFunction(
      FunctionIdentifier("graft_range"),
      new ExpressionInfo("graft.store", null, "graft_range",
        "graft_range(root, tableset, res, lo, hi) - rows at the resolution whose " +
          "secondary ORDER BY column lands in [lo, hi], manifest-file-pruned " +
          "(effective after zorderFiles)", ""),
      graftRangeBuilder)
    spark.sessionState.tableFunctionRegistry.registerFunction(
      FunctionIdentifier("graft_asof"),
      new ExpressionInfo("graft.store", null, "graft_asof",
        "graft_asof(root, tableset, res, snapshotId) - time travel: the " +
          "resolution scan as of the given snapshot (the lakehouse " +
          "VERSION AS OF read from pure SQL)", ""),
      graftAsofBuilder)
    spark.sessionState.tableFunctionRegistry.registerFunction(
      FunctionIdentifier("graft_final"),
      new ExpressionInfo("graft.store", null, "graft_final",
        "graft_final(root, tableset, res) - SELECT ... FINAL from pure SQL: " +
          "the resolution scan with the declared engine's collapse applied " +
          "at read time (keep-latest / sum / declared aggregate)", ""),
      graftFinalBuilder)
    spark.sessionState.tableFunctionRegistry.registerFunction(
      FunctionIdentifier("graft_deletes"),
      new ExpressionInfo("graft.store", null, "graft_deletes",
        "graft_deletes(root, tableset) - pending lightweight-delete mutations " +
          "(id, predicate, captured file count) awaiting materialization", ""),
      graftDeletesBuilder)
    spark.sessionState.tableFunctionRegistry.registerFunction(
      FunctionIdentifier("graft_cells"),
      new ExpressionInfo("graft.store", null, "graft_cells",
        "graft_cells(root, tableset, res, array(cells...)) - §3.1 cell query: " +
          "fetch the given cells' data at the resolution, uncompacting as needed", ""),
      graftCellsBuilder)
  }

  private def strArg(fn: String, e: Expression, what: String): String = e match {
    case Literal(s: UTF8String, StringType) => s.toString
    case _ => throw new IllegalArgumentException(
      s"$fn: $what must be a STRING literal, got $e")
  }

  private def intArg(fn: String, e: Expression, what: String): Int = e match {
    case Literal(i: Int, IntegerType) => i
    case _ => throw new IllegalArgumentException(
      s"$fn: $what must be an INTEGER literal, got $e")
  }

  private def graftScanBuilder: Seq[Expression] => LogicalPlan = { args =>
    if (args.length != 3)
      throw new IllegalArgumentException(
        s"graft_scan(root, tableset, targetRes) expects 3 arguments, got ${args.length}")
    val spark = SparkSession.active
    val store = CellStore(spark, strArg("graft_scan", args(0), "root"))
    val name = strArg("graft_scan", args(1), "tableset")
    val res = intArg("graft_scan", args(2), "targetRes")
    // a FRESH bucketed mirror (CellStore.buildMirror) backs the TVF when one
    // exists: pure-SQL joins of two mirrored scans plan with zero Exchange,
    // exactly like the DataFrame-side Bucketing path; any write to the
    // tableset flips the freshness token and the TVF falls back to the live
    // scan — the mirror can change PLANS, never results
    store.mirrorFor(name, res) match {
      case Some(table) => spark.table(table).queryExecution.analyzed
      case None => store.scanForResolution(name, res).queryExecution.analyzed
    }
  }

  /** `graft_traverse(root, tableset, res, array(...), maxFetchCount)` — the
    * reference's bulk AOI traversal (SURVEY §3.3) from pure SQL: T1 picks
    * the traversal resolution from maxFetchCount, the store query runs once
    * for the whole AOI, every row tagged with its `traversal_cell`. The AOI
    * array must be foldable, same contract as `graft_cells`. */
  private def graftTraverseBuilder: Seq[Expression] => LogicalPlan = { args =>
    if (args.length != 5)
      throw new IllegalArgumentException(
        s"graft_traverse(root, tableset, targetRes, aoiCells, maxFetchCount) " +
          s"expects 5 arguments, got ${args.length}")
    val aoi = foldableCells("graft_traverse", args(3))
    graft.traverse.Traversal.traverseBulk(
      CellStore(SparkSession.active, strArg("graft_traverse", args(0), "root")),
      strArg("graft_traverse", args(1), "tableset"), aoi,
      intArg("graft_traverse", args(2), "targetRes"),
      graft.traverse.Traversal.TraversalOptions(
        maxFetchCount = intArg("graft_traverse", args(4), "maxFetchCount")))
      .queryExecution.analyzed
  }

  /** `graft_traverse_df(root, tableset, res, aoiQuery, maxFetchCount
    * [, prefilterTemplate])` — the DataFrame-AOI traversal overload (T2 +
    * T3) from pure SQL, completing what `graft_traverse` cannot express:
    * its foldable-array AOI materializes every cell in the SQL text, which
    * caps it at driver-literal scale. Here the AOI is a QUERY — a one-LONG-
    * column subquery passed either as a SQL string literal (analysis-time
    * `spark.sql` splice) or as a `TABLE(SELECT ...)` argument where the
    * session's parser supports table arguments for registry TVFs — and its
    * plan flows into [[graft.traverse.Traversal.traverseBulk]]'s
    * distributed overload: traversal-cell derivation, the optional
    * prefilter, and the store semi-join all stay on executors, no
    * LocalTableScan of the AOI anywhere in the final plan (the ts40
    * contract, now reachable without leaving SQL). */
  private def graftTraverseDfBuilder: Seq[Expression] => LogicalPlan = { args =>
    if (args.length < 5 || args.length > 6)
      throw new IllegalArgumentException(
        s"graft_traverse_df(root, tableset, targetRes, aoiQuery, maxFetchCount" +
          s"[, prefilterTemplate]) expects 5-6 arguments, got ${args.length}")
    val spark = SparkSession.active
    val aoi = args(3) match {
      case t: org.apache.spark.sql.catalyst.expressions.FunctionTableSubqueryArgumentExpression =>
        org.apache.spark.sql.graft.shims.ofRows(spark, t.plan)
      case Literal(s: UTF8String, StringType) => spark.sql(s.toString)
      case e => throw new IllegalArgumentException(
        "graft_traverse_df: aoiQuery must be a SQL string literal or a " +
          s"TABLE(...) argument, got $e")
    }
    val prefilter =
      if (args.length == 6) Some(strArg("graft_traverse_df", args(5), "prefilterTemplate"))
      else None
    graft.traverse.Traversal.traverseBulk(
      CellStore(spark, strArg("graft_traverse_df", args(0), "root")),
      strArg("graft_traverse_df", args(1), "tableset"), aoi,
      intArg("graft_traverse_df", args(2), "targetRes"),
      graft.traverse.Traversal.TraversalOptions(
        maxFetchCount = intArg("graft_traverse_df", args(4), "maxFetchCount"),
        prefilterTemplate = prefilter))
      .queryExecution.analyzed
  }

  /** `graft_range(root, tableset, res, lo, hi)` — [[CellStore.scanForValueRange]]
    * from pure SQL: the secondary-key range scan with manifest file pruning
    * (the z-order read path). Bounds are LONG (or INT) literals — they
    * drive driver-side file selection at analysis time, like graft_cells'
    * probe array. */
  private def graftRangeBuilder: Seq[Expression] => LogicalPlan = { args =>
    if (args.length != 5)
      throw new IllegalArgumentException(
        s"graft_range(root, tableset, res, lo, hi) expects 5 arguments, got ${args.length}")
    def boundArg(e: Expression, what: String): Long = e match {
      case Literal(l: Long, LongType) => l
      case Literal(i: Int, IntegerType) => i.toLong
      case _ => throw new IllegalArgumentException(
        s"graft_range: $what must be an integer literal, got $e")
    }
    val store = CellStore(SparkSession.active, strArg("graft_range", args(0), "root"))
    store.scanForValueRange(
      strArg("graft_range", args(1), "tableset"),
      intArg("graft_range", args(2), "targetRes"),
      boundArg(args(3), "lo"), boundArg(args(4), "hi"))
      .queryExecution.analyzed
  }

  /** `graft_asof(root, tableset, res, snapshotId)` — [[CellStore.scanForResolutionAsOf]]
    * from pure SQL: the explicit-file-list historical read (snapshot union,
    * invalidation checked loudly at analysis time). The snapshot id is a
    * LONG (or INT) literal, mirroring Delta's `VERSION AS OF n`. */
  private def graftAsofBuilder: Seq[Expression] => LogicalPlan = { args =>
    if (args.length != 4)
      throw new IllegalArgumentException(
        s"graft_asof(root, tableset, res, snapshotId) expects 4 arguments, got ${args.length}")
    val snap = args(3) match {
      case Literal(l: Long, LongType) => l
      case Literal(i: Int, IntegerType) => i.toLong
      case e => throw new IllegalArgumentException(
        s"graft_asof: snapshotId must be an integer literal, got $e")
    }
    CellStore(SparkSession.active, strArg("graft_asof", args(0), "root"))
      .scanForResolutionAsOf(strArg("graft_asof", args(1), "tableset"),
        intArg("graft_asof", args(2), "targetRes"), snap)
      .queryExecution.analyzed
  }

  /** `graft_stats(root, tableset)` — A9/A10 per-resolution counts from pure
    * SQL. The stats computation runs at analysis time (it is itself a small
    * Spark job over the partition-column groupBy); the spliced subtree is
    * the materialized local result. */
  private def graftStatsBuilder: Seq[Expression] => LogicalPlan = { args =>
    if (args.length != 2)
      throw new IllegalArgumentException(
        s"graft_stats(root, tableset) expects 2 arguments, got ${args.length}")
    CellStore(SparkSession.active, strArg("graft_stats", args(0), "root"))
      .tablesetStats(strArg("graft_stats", args(1), "tableset"))
      .queryExecution.analyzed
  }

  /** `graft_final(root, tableset, res)` — ClickHouse `SELECT ... FINAL`
    * from pure SQL: [[CellStore.scanForResolutionFinal]]'s read-time
    * engine collapse (keep-latest for versioned Replacing, sum for
    * Summing, declared method for Aggregating) spliced at analysis time.
    * Files untouched — the on-disk collapse is `replace`/ts25. */
  private def graftFinalBuilder: Seq[Expression] => LogicalPlan = { args =>
    if (args.length != 3)
      throw new IllegalArgumentException(
        s"graft_final(root, tableset, targetRes) expects 3 arguments, got ${args.length}")
    CellStore(SparkSession.active, strArg("graft_final", args(0), "root"))
      .scanForResolutionFinal(strArg("graft_final", args(1), "tableset"),
        intArg("graft_final", args(2), "targetRes"))
      .queryExecution.analyzed
  }

  /** `graft_deletes(root, tableset)` — observability for the lightweight-
    * delete queue ([[CellStore.deleteWhere]]): one row per PENDING mutation
    * with its snapshot id, predicate SQL and captured-file count (shrinks
    * as rewrites materialize; the row disappears when the capture set
    * drains). Driver-local metadata spliced as a local relation, like
    * `graft_stats`. */
  private def graftDeletesBuilder: Seq[Expression] => LogicalPlan = { args =>
    if (args.length != 2)
      throw new IllegalArgumentException(
        s"graft_deletes(root, tableset) expects 2 arguments, got ${args.length}")
    val spark = SparkSession.active
    val dels = CellStore(spark, strArg("graft_deletes", args(0), "root"))
      .pendingDeletes(strArg("graft_deletes", args(1), "tableset"))
    import spark.implicits._
    dels.map(d => (d.id, d.predicate, d.files.size.toLong))
      .toDF("id", "predicate", "num_files")
      .queryExecution.analyzed
  }

  /** `graft_cells(root, tableset, res, array(c1, c2, ...))` — the reference's
    * headline `query_tableset_cells` (SURVEY §3.1) from pure SQL: probe
    * cells of ANY resolution, rows materialized at `res` with restricted
    * uncompaction. The probe array must be FOLDABLE (literals or literal
    * arithmetic): it is evaluated at analysis time into the driver-known
    * probe set, which plants the ph3 partition filter and the OR-of-ranges
    * h3index scan predicate exactly like the Seq-probe DataFrame API. */
  /** Evaluate a foldable ARRAY<BIGINT|INT> argument into driver-side cells
    * (shared by graft_cells and graft_traverse). */
  private def foldableCells(fn: String, cellsExpr: Expression): Seq[Long] = {
    if (!cellsExpr.foldable)
      throw new IllegalArgumentException(
        s"$fn: the cell array must be foldable (literal cells)")
    def elems(a: org.apache.spark.sql.catalyst.util.ArrayData,
        get: Int => Long): Seq[Long] =
      (0 until a.numElements()).map { i =>
        if (a.isNullAt(i)) throw new IllegalArgumentException(
          s"$fn: cell array contains NULL at position $i")
        get(i)
      }
    (cellsExpr.eval(), cellsExpr.dataType) match {
      case (a: org.apache.spark.sql.catalyst.util.ArrayData,
          org.apache.spark.sql.types.ArrayType(LongType, _)) =>
        elems(a, a.getLong)
      case (a: org.apache.spark.sql.catalyst.util.ArrayData,
          org.apache.spark.sql.types.ArrayType(IntegerType, _)) =>
        elems(a, i => a.getInt(i).toLong)
      case (_, dt) => throw new IllegalArgumentException(
        s"$fn: expected ARRAY<BIGINT> cells, got $dt")
    }
  }

  private def graftCellsBuilder: Seq[Expression] => LogicalPlan = { args =>
    if (args.length != 4)
      throw new IllegalArgumentException(
        s"graft_cells(root, tableset, targetRes, cells) expects 4 arguments, got ${args.length}")
    val cells = foldableCells("graft_cells", args(3))
    CellStore(SparkSession.active, strArg("graft_cells", args(0), "root"))
      .queryCells(strArg("graft_cells", args(1), "tableset"), cells,
        intArg("graft_cells", args(2), "targetRes"))
      .queryExecution.analyzed
  }
}

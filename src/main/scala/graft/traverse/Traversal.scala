package graft.traverse

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.h3.H3
import graft.h3.expr.functions._
import graft.schema.CompactedTableSchema
import graft.store.CellStore

/**
 * Bulk area traversal — the Spark-native re-expression of the reference's
 * streaming AOI traversal (`compacted_tables/traversal.rs`, SURVEY §2.9/§3.3).
 *
 * The reference fans the AOI's traversal cells out to N worker connections,
 * each running one cell query, with bounded channels for backpressure
 * (T2/T5). On Spark that entire pipeline collapses into ONE declarative job:
 * AOI cells -> semi-join -> grouped by traversal cell; executors provide the
 * parallelism, shuffle services the backpressure. The per-cell-iterator UX
 * (a pull-based stream of per-cell DataFrames) is kept as a driver-side
 * batched loop for API compatibility ([[traverseIterator]]).
 */
object Traversal {

  final case class TraversalOptions(
      maxFetchCount: Int = 500, // reference default, traversal.rs:96
      doUncompact: Boolean = true,
      prefilterTemplate: Option[String] = None, // T3 filter query
      template: Option[String] = None,
      includeBuffer: Int = 0) // G4: k-ring buffer around fetched cells

  /** T1: coarsest base resolution r < targetRes with 7^(targetRes-r) <=
    * maxFetchCount; falls back to targetRes (`traversal.rs:24-50`). */
  def selectTraversalResolution(schema: CompactedTableSchema, targetRes: Int,
      maxFetchCount: Int): Int = {
    val candidates = schema.baseResolutions.filter(_ < targetRes).sorted
    candidates.find(r => H3.pow7(targetRes - r) <= maxFetchCount)
      .getOrElse(targetRes)
  }

  /** AOI cells -> deduplicated, sorted traversal cells at the traversal
    * resolution (`traversal.rs:152-161`: change_resolution + sort + dedup). */
  def traversalCells(aoiCells: Seq[Long], traversalRes: Int): Seq[Long] =
    aoiCells.flatMap { c =>
      if (H3.getResolution(c) >= traversalRes) Seq(H3.toParentUnsafe(c, traversalRes))
      else H3.toChildren(c, traversalRes).toSeq
    }.distinct.sorted

  /** T3 prefilter: run the filter query at the traversal resolution and keep
    * only traversal cells that return rows (`traversal.rs:357-393`). The
    * reference chunks cells x50 per query; one distinct-aggregation job
    * subsumes the chunking.
    *
    * The filter query runs WITH uncompaction to travRes — the reference's
    * `prefilter_traversal_cells` queries via `QueryOptions::new`, whose
    * `do_uncompact` defaults to true (`compacted_tables/mod.rs:51`). This
    * matters on a compacted store: a matched row stored COARSER than
    * travRes must surface as exactly the travRes probe cells it contains
    * (restricted uncompaction bounds that expansion to the probe set), not
    * pass through h3_to_parent unchanged and silently drop its whole branch
    * from the traversal (round-8 advice; the old doUncompact=false shape
    * lost compacted branches). The distinct returned indexes ARE the
    * surviving traversal cells — traversal.rs:377 "use only the indexes
    * from the filter query" — all at travRes by construction. */
  def prefilter(store: CellStore, name: String, travCells: Seq[Long],
      travRes: Int, filterTemplate: String): Seq[Long] = {
    store.queryCells(name, travCells, travRes,
        doUncompact = true, template = Some(filterTemplate))
      .select(col(CompactedTableSchema.ColH3Index).as("tc"))
      .distinct()
      .collect()
      .map(_.getLong(0))
      .toSeq.sorted
  }

  /** G4 buffer (`traversal.rs:403-418`): expand the queried cells with the
    * k-ring of every target-res child of each traversal cell. */
  private def bufferCells(travCells: Seq[Long], targetRes: Int, k: Int): Seq[Long] =
    travCells.flatMap { tc =>
      H3.toChildren(tc, targetRes).flatMap(c => graft.geom.Grid.gridDisk(c, k))
    }.distinct.sorted

  /** T2 bulk: one DataFrame of the whole AOI at `targetRes`, with a
    * `traversal_cell` column marking each row's traversal group. Empty
    * traversal cells simply produce no rows (T4). */
  def traverseBulk(store: CellStore, name: String, aoiCells: Seq[Long],
      targetRes: Int, options: TraversalOptions = TraversalOptions()): DataFrame = {
    val schema = store.getTableset(name)
    val travRes = selectTraversalResolution(schema, targetRes, options.maxFetchCount)
    var cells = traversalCells(aoiCells, travRes)
    options.prefilterTemplate.foreach { ft =>
      cells = prefilter(store, name, cells, travRes, ft)
    }
    val queryCells =
      if (options.includeBuffer > 0) bufferCells(cells, targetRes, options.includeBuffer)
      else cells
    store.queryCells(name, queryCells, targetRes, options.doUncompact, options.template)
      .withColumn("traversal_cell",
        h3_to_parent(col(CompactedTableSchema.ColH3Index), lit(travRes)))
  }

  /** DataFrame-AOI overload of [[traverseBulk]]: the AOI stays distributed
    * end to end — traversal-cell derivation (codegen'd H3 expressions +
    * one distinct), the optional prefilter (the distinct indexes of the
    * UNCOMPACTED filter query ARE the surviving traversal cells, feeding
    * the fine fetch directly), the optional k-ring buffer (executor-side
    * flatMap over the H3 algebra), and the store's DataFrame-probe
    * semi-join ([[CellStore.queryCells]]'s no-collect overload). A
    * continent-sized AOI — a polyfill output, another query's result —
    * never materializes on the driver; Catalyst/AQE picks the join
    * strategy from the probe frame's actual size. `aoiCells` must have
    * exactly one LONG column. */
  def traverseBulk(store: CellStore, name: String, aoiCells: DataFrame,
      targetRes: Int, options: TraversalOptions): DataFrame = {
    val schema = store.getTableset(name)
    val travRes = selectTraversalResolution(schema, targetRes, options.maxFetchCount)
    var cells = traversalCellsFrame(aoiCells, travRes)
    options.prefilterTemplate.foreach { ft =>
      // Reference semantics, same as the Seq overload's [[prefilter]]: the
      // filter query runs WITH uncompaction to travRes, so a matched row
      // stored compacted COARSER than travRes surfaces as the travRes probe
      // cells it contains (restricted uncompaction — output bounded by the
      // probe set) instead of silently dropping its branch, and rows at
      // travRes are probe cells via the template's mandatory <[h3indexes]>
      // splice. The distinct returned indexes ARE the surviving traversal
      // cells (traversal.rs:377), so they feed the fine fetch DIRECTLY —
      // no semi-join back into `cells`, which re-derived the AOI's
      // traversal-cell frame a second time per execution (VERDICT r7 #3);
      // TraversalSpec's compacted-store parity spec proves Seq/DataFrame
      // equality on this shape.
      cells = store.queryCellsFrame(name, cells, travRes,
          doUncompact = true, template = Some(ft), probeRes = Seq(travRes))
        .select(col(CompactedTableSchema.ColH3Index).as("qcell"))
        .distinct()
    }
    val queryCells =
      if (options.includeBuffer > 0)
        bufferCellsFrame(cells, targetRes, options.includeBuffer)
      else cells
    // buffered cells are at targetRes, plain traversal cells at travRes
    val probeRes = if (options.includeBuffer > 0) Seq(targetRes) else Seq(travRes)
    store.queryCellsFrame(name, queryCells, targetRes, options.doUncompact,
        options.template, probeRes = probeRes)
      .withColumn("traversal_cell",
        h3_to_parent(col(CompactedTableSchema.ColH3Index), lit(travRes)))
  }

  /** [[traversalCells]] as a distributed transform: parent for cells at or
    * finer than the traversal resolution, exploded children for coarser —
    * all codegen'd H3 expressions, one distinct, no driver round-trip. */
  private[graft] def traversalCellsFrame(aoi: DataFrame, travRes: Int): DataFrame = {
    require(aoi.columns.length == 1,
      s"AOI DataFrame must have exactly one column, got ${aoi.columns.mkString(", ")}")
    val c0 = col(aoi.columns.head)
    // h3_to_children is TOTAL and returns an EMPTY array past the 2^28-
    // children cap — a silent drop of the whole AOI cell. Same loud guard
    // as CellStore.changeResolutions: areas that coarse need a coarser
    // travRes (maxFetchCount), not a quietly vanished region.
    val guardedChildren =
      when(h3_children_count(c0, lit(travRes)) > (1L << 28),
        raise_error(concat(
          lit("AOI cell expansion to traversal resolution "), lit(travRes),
          lit(" exceeds 2^28 children for cell "), c0.cast("string"),
          lit("; raise maxFetchCount so a coarser traversal resolution is selected")))
          .cast("array<bigint>"))
        .otherwise(h3_to_children(c0, lit(travRes)))
    aoi.select(explode(
        when(h3_get_resolution(c0) >= travRes,
          array(h3_to_parent(c0, lit(travRes))))
          .otherwise(guardedChildren)).as("qcell"))
      .distinct()
  }

  /** [[bufferCells]] distributed: the per-cell child + k-ring expansion
    * runs as an executor-side flatMap over the pure H3 algebra. */
  private def bufferCellsFrame(travCells: DataFrame, targetRes: Int, k: Int): DataFrame = {
    val spark = travCells.sparkSession
    import spark.implicits._
    travCells.select(col(travCells.columns.head).cast("long")).as[Long]
      .flatMap(tc =>
        H3.toChildren(tc, targetRes).flatMap(c => graft.geom.Grid.gridDisk(c, k)))
      .toDF("qcell").distinct()
  }

  /** Geometry AOI (reference `TraversalArea::Geometry`): polyfill at the
    * traversal resolution, then traverse. Coordinates are (lng, lat) degrees. */
  def traverseBulkGeometry(store: CellStore, name: String,
      geom: org.locationtech.jts.geom.Geometry, targetRes: Int,
      options: TraversalOptions = TraversalOptions()): DataFrame = {
    val schema = store.getTableset(name)
    val travRes = selectTraversalResolution(schema, targetRes, options.maxFetchCount)
    traverseBulk(store, name, graft.geom.Geo.polyfill(geom, travRes), targetRes, options)
  }

  final case class TraversedCell(cell: Long, df: DataFrame)

  /** T2 compat: pull-based iterator of per-traversal-cell DataFrames, like
    * the reference's `Traverser` stream. `batchSize` traversal cells are
    * fetched per Spark job (the reference fetches 1 per gRPC query across 3
    * connections; a Spark job batches better). Cells yielding no rows are
    * skipped (T4), so the iterator may be shorter than its size hint. */
  def traverseIterator(store: CellStore, name: String, aoiCells: Seq[Long],
      targetRes: Int, options: TraversalOptions = TraversalOptions(),
      batchSize: Int = 8): Iterator[TraversedCell] = {
    val schema = store.getTableset(name)
    val travRes = selectTraversalResolution(schema, targetRes, options.maxFetchCount)
    var cells = traversalCells(aoiCells, travRes)
    options.prefilterTemplate.foreach { ft =>
      cells = prefilter(store, name, cells, travRes, ft)
    }
    val batches = cells.grouped(batchSize)
    // Each batch's DataFrame is cached while its cells are being consumed and
    // unpersisted when the iterator moves to the next batch (and after the
    // last batch) — long traversals hold at most ONE batch of executor
    // storage. A TraversedCell.df used after its batch is passed over simply
    // recomputes from the store (correct, just uncached).
    new Iterator[TraversedCell] {
      private var current: Iterator[TraversedCell] = Iterator.empty
      private var cached: DataFrame = _
      private def release(): Unit =
        if (cached != null) { cached.unpersist(false); cached = null }
      private def advance(): Unit = {
        while (!current.hasNext && batches.hasNext) {
          release()
          val batch = batches.next()
          val df = store.queryCells(name, batch, targetRes, options.doUncompact, options.template)
            .withColumn("_tc", h3_to_parent(col(CompactedTableSchema.ColH3Index), lit(travRes)))
            .cache()
          cached = df
          val present = df.select("_tc").distinct().collect().map(_.getLong(0)).toSet
          current = batch.filter(present.contains).map { tc =>
            TraversedCell(tc, df.where(col("_tc") === tc).drop("_tc"))
          }.iterator
        }
        if (!current.hasNext && !batches.hasNext) release()
      }
      override def hasNext: Boolean = { advance(); current.hasNext }
      override def next(): TraversedCell = { advance(); current.next() }
    }
  }
}

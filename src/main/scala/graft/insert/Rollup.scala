package graft.insert

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.h3.expr.functions._
import graft.schema.{AggregationMethod, CompactedTableSchema}

/**
 * Insert-time rollup: aggregate data at a fine base resolution into the next
 * coarser base resolution with per-column aggregation methods — the
 * analytical heart of the reference engine
 * (`write_aggregated_resolutions`, `insert.rs:278-548`).
 *
 * Reference semantics reproduced:
 *  - step over consecutive base-resolution pairs fine->coarse
 *    (`insert.rs:279-287,337-339`)
 *  - sources per step: the base data at the source resolution plus compacted
 *    cells at resolutions in (target, source] (`insert.rs:352-378`)
 *  - GROUP BY parent cell + every non-aggregated column (`insert.rs:305-323`)
 *  - aggregation expressions A1-A5 (`insert.rs:391-436`), incl. the
 *    RelativeToCellArea area-weighted mean with pre-scaling of rows coarser
 *    than the source resolution (`insert.rs:477-486`) — generalized here to
 *    any mixed-resolution input via pentagon-aware children counts, which
 *    reduces exactly to the reference formula on contiguous resolutions.
 *
 * Scale notes: each step is ONE shuffle (groupBy parent+passthrough) with
 * map-side partial aggregation for sum/min/max/avg. The reference's manual
 * 1M-row modulo batching (`insert.rs:445-469`) is unnecessary — the shuffle
 * partitions the group space (SURVEY §4). SetNullOnConflict uses collect_set
 * capped by group size 7^1, so state stays bounded.
 */
object Rollup {

  /** One rollup step: aggregate `source` (cells at resolutions in
    * (targetRes, sourceRes], mixed allowed) into cells at `targetRes`. */
  def rollupStep(source: DataFrame, schema: CompactedTableSchema,
      sourceRes: Int, targetRes: Int): DataFrame = {
    val h3Col = CompactedTableSchema.ColH3Index
    val parent = h3_to_parent(col(h3Col), lit(targetRes))
    val groupCols = parent.as(h3Col) +: schema.groupByColumns.map(col)

    val aggExprs: Seq[Column] = schema.aggregatedColumns.map { case (name, _, agg) =>
      (agg match {
        case AggregationMethod.Sum => sum(col(name))
        case AggregationMethod.Min => min(col(name))
        case AggregationMethod.Max => max(col(name))
        case AggregationMethod.Average => avg(col(name))
        case AggregationMethod.RelativeToCellArea =>
          // area-weighted sum: value * (cells covered at sourceRes).
          // Rows already at sourceRes have weight 1 (childrenCount(c, res(c)) == 1),
          // coarser rows weigh by their subtree size — the generalization of
          // the reference's `if(h3GetResolution(h3index)=target, col*length(...), col)`
          // pre-scaling (`insert.rs:477-486`). Divided by the parent's total
          // child count in the post-projection below.
          sum(col(name) * h3_children_count(col(h3Col), lit(sourceRes)))
        case AggregationMethod.SetNullOnConflict =>
          // keep the value iff the group is unanimous, else NULL
          // (`if(length(groupUniqArray(col))=1, first_value(col), null)`)
          when(size(collect_set(col(name))) === 1, first(col(name), ignoreNulls = true))
            .otherwise(lit(null))
      }).as(name)
    }

    val aggregated = source
      .groupBy(groupCols: _*)
      .agg(aggExprs.head, aggExprs.tail: _*)

    // finalize RelativeToCellArea: divide by the parent's pentagon-aware
    // total child count at sourceRes (the output h3index IS the parent).
    val finalized = schema.aggregatedColumns.foldLeft(aggregated) {
      case (df, (name, _, AggregationMethod.RelativeToCellArea)) =>
        df.withColumn(name, col(name) / h3_children_count(col(h3Col), lit(sourceRes)))
      case (df, _) => df
    }
    // aggregates widen (sum/avg/divide -> Long/Double); restore the declared
    // column types so every stored frame has the schema's exact StructType
    val retyped = schema.aggregatedColumns.foldLeft(finalized) {
      case (df, (name, dt, _)) => df.withColumn(name, col(name).cast(dt.sparkType))
    }
    retyped.select(schema.columns.keys.map(col).toIndexedSeq: _*)
  }
}

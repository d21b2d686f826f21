package graft

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.h3.H3
import graft.schema.{AggregationMethod => Agg, GraftDataType => T, _}
import graft.store.CellStore

/** Physical-plan audits: the scale properties the engine is designed around
  * must be visible in the executed plan, not just assumed — partition
  * pruning on the Hive layout, predicate pushdown to parquet, broadcast
  * semi-join for cell probes, and column pruning for auto-projection.
  * These assertions are string-level on the formatted plan (stable across
  * the Spark 4.x formatting) so a regression in any layout/plan decision
  * fails loudly. */
class PlanAuditSpec extends AnyFunSuite with Matchers with SparkTestSession {

  private val hexRes5 = H3.fromParts(20, 5, Seq(0, 0, 0, 0, 0))
  private val ts = Timestamp.valueOf("2023-06-15 12:00:00")

  private lazy val store: CellStore = {
    val dir = Files.createTempDirectory("graft_plan_").toString
    val schema = CompactedTableSchema.builder("plan_audit")
      .h3BaseResolutions(0 to 7)
      .addSimpleColumn("observed_on", T.DateTime64T)
      .addAggregatedColumn("density", T.Float64, Agg.Max)
      .build()
    val cells = H3.toChildren(hexRes5, 7)
    val rows = cells.zipWithIndex.map { case (c, i) => Row(c, ts, i.toDouble) }
    val input = spark.createDataFrame(
      spark.sparkContext.parallelize(rows.toIndexedSeq, 4),
      StructType(Seq(
        StructField("h3index", LongType, false),
        StructField("observed_on", TimestampType, false),
        StructField("density", DoubleType, false))))
    val s = CellStore(spark, dir)
    s.insert("plan_audit", input, createSchema = Some(schema))
    s
  }

  private def planOf(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.executedPlan.toString

  test("scanForResolution prunes on the kind/resolution partition columns") {
    val plan = planOf(store.scanForResolution("plan_audit", 7))
    plan should include("PartitionFilters")
    plan should include("kind")
    plan should include("resolution")
    // the pruning predicates must NOT appear as a post-scan row filter
    // (they are partition columns, resolved at file listing time)
    plan.linesIterator.filter(_.contains("PartitionFilters")).mkString should include("kind")
  }

  test("queryCells probes via a broadcast left-semi join (J1)") {
    val cells = H3.toChildren(hexRes5, 7).take(5).toSeq
    val plan = planOf(store.queryCells("plan_audit", cells, 7, doUncompact = false))
    plan should include("BroadcastHashJoin")
    plan should include("LeftSemi")
  }

  test("Seq-probe queries prune ph3 (spatial) partitions at planning time") {
    val cells = H3.toChildren(hexRes5, 7).take(5).toSeq
    val plan = planOf(store.queryCells("plan_audit", cells, 7, doUncompact = false))
    // all probes share base cell 20 -> the scan's PartitionFilters must
    // carry a ph3 predicate (driver-derived, no discovery job)
    plan.linesIterator.filter(_.contains("PartitionFilters"))
      .mkString should include("ph3")
  }

  test("Seq-probe queries push h3index range envelopes into the parquet scan") {
    // the probes' per-resolution descendant envelopes must reach parquet as
    // BETWEEN-style pushed filters — this plus h3index-sorted files is what
    // makes row-group min/max skipping real for probe queries
    val cells = H3.toChildren(hexRes5, 7).take(5).toSeq
    val plan = planOf(store.queryCells("plan_audit", cells, 7, doUncompact = false))
    val pushed = plan.linesIterator.filter(_.contains("PushedFilters")).mkString
    pushed should include("GreaterThanOrEqual(h3index")
    pushed should include("LessThanOrEqual(h3index")
  }

  test("probe side is (res, key) pairs — no 7^k children expansion in the plan") {
    // a res-5 probe queried at res 7 must NOT enumerate its 49 children:
    // the key-join expands probes to parents only and matches finer stored
    // rows via h3_to_parent on the scan side
    val plan = planOf(store.queryCells("plan_audit", Seq(hexRes5), 7, doUncompact = false))
    plan should not include "h3_to_children"
    plan should include("h3_to_parent")
  }

  test("temporal bucket (pt) filters prune partitions at planning time (F7)") {
    val dir = Files.createTempDirectory("graft_plan_pt_").toString
    val schema = CompactedTableSchema.builder("plan_pt")
      .h3BaseResolutions(Seq(7))
      .addSimpleColumn("observed_on", T.DateTime64T)
      .addAggregatedColumn("density", T.Float64, Agg.Max)
      .temporalPartitioning(TemporalPartitioning.Months(6))
      .build()
    val cells = H3.toChildren(hexRes5, 7).take(100)
    val rows = cells.zipWithIndex.map { case (c, i) =>
      Row(c, Timestamp.valueOf(s"202${i % 3}-0${1 + i % 9}-15 12:00:00"), i.toDouble)
    }
    val input = spark.createDataFrame(
      spark.sparkContext.parallelize(rows.toIndexedSeq, 4),
      StructType(Seq(
        StructField("h3index", LongType, false),
        StructField("observed_on", TimestampType, false),
        StructField("density", DoubleType, false))))
    val s = CellStore(spark, dir)
    s.insert("plan_pt", input, createSchema = Some(schema))
    // Feb 2021 bucket: ceil((202100 + 100*1/12)/6) = 33685 — populated by
    // the generator (month 2 rows are exactly the 2021 rows), so the pruned
    // scan must both carry the pt PartitionFilter AND return rows
    val pruned = s.scanForResolution("plan_pt", 7).where(col("pt") === 33685L)
    planOf(pruned).linesIterator.filter(_.contains("PartitionFilters"))
      .mkString should include("pt")
    pruned.count() should be > 0L
  }

  test("h3index range filters reach the parquet scan (PK page-skipping analogue)") {
    // files are written h3index-sorted (sortedForWrite), so row-group
    // min/max stats form disjoint ranges — effective iff the range
    // predicate is pushed to the scan
    val plan = planOf(store.scanForResolution("plan_audit", 7)
      .where(col("h3index") >= hexRes5))
    plan.linesIterator.filter(_.contains("PushedFilters"))
      .mkString should include("h3index")
  }

  test("SQL TVF queries keep pruning: partition filters + rule-inferred ranges") {
    val dir = Files.createTempDirectory("graft_plan_tvf_").toString
    val schema = CompactedTableSchema.builder("plan_tvf")
      .h3BaseResolutions(Seq(7))
      .useCompaction(false)
      .addAggregatedColumn("density", T.Float64, Agg.Max)
      .build()
    val cells = H3.toChildren(hexRes5, 7)
    val rows = cells.zipWithIndex.map { case (c, i) => Row(c, i.toDouble) }
    val input = spark.createDataFrame(
      spark.sparkContext.parallelize(rows.toIndexedSeq, 4),
      StructType(Seq(
        StructField("h3index", LongType, false),
        StructField("density", DoubleType, false))))
    CellStore(spark, dir).insert("plan_tvf", input, createSchema = Some(schema))
    graft.Graft.register(spark)
    // graft_scan splices a resolved scan: the D7 partition filter must
    // survive, and a SQL h3_to_parent equality above it must gain the
    // rule's raw-h3index range pushdown
    val df = spark.sql(
      s"""SELECT * FROM graft_scan('$dir', 'plan_tvf', 7)
         |WHERE h3_to_parent(h3index, 5) = ${hexRes5}L""".stripMargin)
    val plan = planOf(df)
    plan.linesIterator.filter(_.contains("PartitionFilters"))
      .mkString should include("resolution")
    val pushed = plan.linesIterator.filter(_.contains("PushedFilters")).mkString
    pushed should include("Or(")
    pushed should include(s"EqualTo(h3index,$hexRes5)")
    df.count() shouldBe cells.length.toLong
    // graft_cells plants the driver-known ph3 partition filter like the
    // Seq-probe DataFrame API
    val plan2 = planOf(spark.sql(
      s"SELECT * FROM graft_cells('$dir', 'plan_tvf', 7, array(${hexRes5}L))"))
    plan2.linesIterator.filter(_.contains("PartitionFilters"))
      .mkString should include("ph3")
  }

  test("relational gate query pushes the date filter into the parquet scan") {
    val plan = planOf(Queries.q1PricingSummary(spark, "/root/testdata/sf0.001"))
    plan should include("PushedFilters")
    plan.linesIterator.filter(_.contains("PushedFilters"))
      .mkString should include("l_shipdate")
  }

  test("projection prunes the read schema to referenced columns") {
    val df = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
      .select(col("l_orderkey"), col("l_quantity"))
    val plan = planOf(df)
    val readSchema = plan.linesIterator.filter(_.contains("ReadSchema")).mkString
    readSchema should include("l_orderkey")
    readSchema should include("l_quantity")
    readSchema should not include "l_comment"
    readSchema should not include "l_extendedprice"
  }

  test("broadcast dimension joins stay broadcast (q2: no shuffle of orders for dims)") {
    val plan = planOf(Queries.q2NationOrders(spark, "/root/testdata/sf0.001"))
    plan should include("BroadcastHashJoin")
    // orders join customer/nation must not be a SortMergeJoin
    plan should not include "SortMergeJoin"
  }

  test("q15: one hash shuffle on the window key; read schema pruned to 4 columns") {
    val plan = planOf(Queries.q15RunningWindow(spark, "/root/testdata/sf0.001"))
    val hashEx = plan.linesIterator
      .filter(l => l.contains("Exchange hashpartitioning")).toSeq
    hashEx should have size 1 // the final orderBy is rangepartitioning
    hashEx.head should include("user_id")
    val readSchema = plan.linesIterator.filter(_.contains("ReadSchema")).mkString
    readSchema should not include "props"
    readSchema should not include "event_type"
  }

  test("q14: JSON aggregation is map-side partial before the shuffle") {
    val plan = planOf(Queries.q14JsonProps(spark, "/root/testdata/sf0.001"))
    plan should include("from_json")
    // partial aggregate must appear (map-side combine of the parsed rows)
    plan should include("partial_avg")
    plan should include("partial_sum")
  }

  test("q16: set ops plan as aggregated semi/anti joins, never a cartesian product") {
    val plan = planOf(Queries.q16SetOps(spark, "/root/testdata/sf0.001"))
    plan should not include "CartesianProduct"
    plan should not include "BroadcastNestedLoopJoin"
    (plan should include).regex("LeftSemi|LeftAnti")
  }

  test("d11: no exchange ships span text — shuffle keys are the sha2 hash or doc ids") {
    val plan = planOf(Queries.d11DupSpanPairs(spark, "/root/testdata/sf0.001"))
    val exchanges = plan.linesIterator.filter(_.contains("Exchange")).toSeq
    exchanges should not be empty
    // the span string materializer must never appear in an exchange row
    all(exchanges) should not include "array_join"
    all(exchanges) should not include "ws#"
  }

  test("d28: dup-span removal shuffles hashes + positions, never word arrays; no global window") {
    val plan = planOf(Queries.d28DupSpanRemoval(spark, "/root/testdata/sf0.001"))
    val exchanges = plan.linesIterator.filter(_.contains("Exchange")).toSeq
    exchanges should not be empty
    // the word array and the gram-text materializer stay inside their rows
    all(exchanges) should not include "ws#"
    all(exchanges) should not include "array_join"
    // the island merge is a per-document window, not a global sort
    plan should not include "Exchange SinglePartition"
  }

  test("e10: IVF-PQ broadcasts codebooks/centroids; exchanges never carry vectors") {
    val v = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .select(col("vec_id").as("id"), col("embedding").as("vec"))
    val cent = v.where(expr("id % 29 = 0")).select(col("id").as("cid"), col("vec"))
    val plan = planOf(graft.ann.Ann.knnIvfPq(
      v.where(col("id") < 5), v, cent, 5, 3, 8, 8, 16))
    plan should include("BroadcastExchange") // codebooks + centroid frames
    plan should not include "CartesianProduct"
    val exchanges = plan.linesIterator.filter(_.contains("Exchange")).toSeq
    // residual/query/corpus vector arrays never transit a shuffle — codes,
    // ids and per-subspace partial maxes do
    all(exchanges) should not include "rv#"
    all(exchanges) should not include "dv#"
    all(exchanges) should not include "qv#"
  }

  test("e17: re-rank join broadcasts the slim shortlist; vectors never shuffle") {
    val plan = planOf(
      PipelineQueries.e17IvfPqRerankRaw(spark, "/root/testdata/sf0.001"))
    plan should include("BroadcastExchange")
    plan should not include "CartesianProduct"
    // corpus/query vector arrays never transit a shuffle exchange — the
    // only things exchanged are ids and the per-query window rows
    val exchanges = plan.linesIterator
      .filter(l => l.contains("Exchange") && !l.contains("Broadcast")).toSeq
    all(exchanges) should not include "nv#"
    all(exchanges) should not include "qv#"
    all(exchanges) should not include "dv#"
    all(exchanges) should not include "rv#"
  }

  test("d34: weighted sampling plans TakeOrderedAndProject, not a global sort") {
    val plan = planOf(Queries.d34WeightedSample(spark, "/root/testdata/sf0.001"))
    // per-partition top-k heaps + k-row driver merge; the only Sort allowed
    // is the k-row window over the ALREADY-cut sample
    plan should include("TakeOrderedAndProject")
  }

  test("d14: shard packing never plans a single-partition window") {
    // audit PrefixSum's phase 1 directly on d14's token frame: the gate's
    // own plan starts at the localCheckpoint (lineage truncated), so the
    // window shape must be asserted on the pre-checkpoint frame
    val toks = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
      .select(col("doc_id"),
        expr("size(filter(split(text, '\\\\s+'), x -> x != ''))")
          .cast("long").as("n_tokens"))
    val phase1 = graft.util.PrefixSum.localPrefix(toks, "doc_id", "n_tokens", 32)
      .queryExecution.executedPlan.toString
    phase1 should not include "Exchange SinglePartition"
    phase1 should include("Window")
    val plan = planOf(Queries.d14ShardPacking(spark, "/root/testdata/sf0.001"))
    plan should not include "Exchange SinglePartition"
    plan should include("BroadcastHashJoin") // per-partition offsets join
  }

  test("d35: BPE doc counts broadcast the tokenized vocabulary; corpus text never shuffles") {
    // audit the pre-memo frame (the gate's own plan starts at the
    // localCheckpoint, lineage truncated — the d14 audit convention)
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val plan = planOf(graft.text.Bpe.docTokenCounts(spark, docs))
    plan should include("BroadcastHashJoin") // per-word counts via broadcast vocab
    val shuffles = plan.linesIterator
      .filter(l => l.contains("Exchange") && !l.contains("Broadcast")).toSeq
    // exchanges carry (doc_id, partial aggregates) — never document text
    all(shuffles) should not include "text#"
  }

  test("d36: retained-text assembly broadcasts interval arrays — text never shuffles") {
    val plan = planOf(Queries.d36DedupCorpus(spark, "/root/testdata/sf0.001"))
    // the documents -> merged-intervals join must be a broadcast hash join:
    // the scan side (text, word arrays) meets its removal intervals with
    // NO exchange of ws/text; gram/survivor shuffles carry sha2 keys +
    // positions only
    plan should include("BroadcastHashJoin")
    val shuffles = plan.linesIterator
      .filter(l => l.contains("Exchange") && !l.contains("Broadcast")).toSeq
    shuffles should not be empty
    all(shuffles) should not include "ws#"
    all(shuffles) should not include "text#"
    all(shuffles) should not include "array_join"
  }

  test("q21: LATERAL correlated LIMIT subquery decorrelates — no nested loop per outer row") {
    val plan = planOf(Queries.q21LateralJoin(spark, "/root/testdata/sf0.001"))
    // the per-nation LIMIT 2 must become a partitioned rank filter over one
    // customer shuffle, not a re-executed subquery or a cartesian expansion
    plan should include("Window")
    plan should not include "CartesianProduct"
    plan should not include "LateralJoin" // fully rewritten away
  }

  test("q17: correlated scalar subquery decorrelates to one aggregate + join") {
    val plan = planOf(Queries.q17CorrelatedSubquery(spark, "/root/testdata/sf0.001"))
    // Catalyst must rewrite the per-row subquery into a relational join —
    // a surviving scalar-subquery node would re-run the aggregate per row
    plan should not include "Subquery subquery"
    plan should not include "ScalarSubquery"
    plan should include("HashAggregate")
    (plan should include).regex("SortMergeJoin|BroadcastHashJoin|ShuffledHashJoin")
  }

  test("q18: pivot with explicit values — two partial-agg stages, no collect job") {
    val plan = planOf(Queries.q18Pivot(spark, "/root/testdata/sf0.001"))
    // explicit pivot values -> no eager distinct-collect job; Spark plans
    // the pivot as agg(priority, yr) then pivotfirst(priority): two hash
    // exchanges, both preceded by map-side partial aggregates, keys narrow
    plan.linesIterator.count(_.contains("Exchange hashpartitioning")) shouldBe 2
    plan should include("partial_pivotfirst")
    plan should include("partial_sum")
  }

  test("q22: keep-latest plans one key shuffle — rank filter fuses into the window stage") {
    val plan = planOf(Queries.q22KeepLatest(spark, "/root/testdata/sf0.001"))
    plan should include("Window")
    plan should not include "Exchange SinglePartition"
    // one hash exchange on user_id for the window; the final ORDER BY is a
    // range exchange, not a second hash repartition
    plan.linesIterator.count(_.contains("Exchange hashpartitioning")) shouldBe 1
  }

  test("c4: decile groupBy reuses the window's lang partitioning — one hash shuffle total") {
    val plan = planOf(Queries.c4QualityNtile(spark, "/root/testdata/sf0.001"))
    plan should include("Window")
    // hashpartitioning(lang) satisfies the (lang, decile) grouping: the
    // aggregate must NOT introduce a second hash exchange
    plan.linesIterator.count(_.contains("Exchange hashpartitioning")) shouldBe 1
    plan should not include "Exchange SinglePartition"
  }

  test("FINAL scan: keep-latest is a partial-agg groupBy under partition pruning, no window sort") {
    val dir = Files.createTempDirectory("graft_plan_v_").toString
    val schema = CompactedTableSchema.builder("plan_versioned")
      .h3BaseResolutions(Seq(7))
      .useCompaction(false)
      .engine(TableEngine.ReplacingMergeTree(Some("version")))
      .addSimpleColumn("version", T.Int64)
      .addSimpleColumn("val", T.Int64)
      .build()
    val cells = H3.toChildren(hexRes5, 7).take(8)
    val input = spark.createDataFrame(
      spark.sparkContext.parallelize(
        cells.map(c => Row(c, 1L, 7L)).toIndexedSeq, 2),
      StructType(Seq(
        StructField("h3index", LongType, false),
        StructField("version", LongType, false),
        StructField("val", LongType, false))))
    val s = CellStore(spark, dir)
    s.insert("plan_versioned", input, createSchema = Some(schema))
    val plan = planOf(s.scanForResolutionFinal("plan_versioned", 7))
    // the collapse must be a hash aggregate with a MAP-SIDE partial max —
    // never a row_number window (which would sort every partition)
    plan should include("partial_max")
    plan should not include "Window"
    // and the D7 partition pruning must survive below the aggregate
    plan.linesIterator.filter(_.contains("PartitionFilters")).mkString should include("kind")
  }

  test("d17: provenance joins shuffle ids and sources only — no exchange ships document text") {
    val plan = planOf(PipelineQueries.d17NearDupProvenance(spark, "/root/testdata/sf0.001"))
    val exchanges = plan.linesIterator.filter(_.contains("Exchange")).toSeq
    exchanges should not be empty
    all(exchanges) should not include "text#"
  }
}

package graft.store

import java.nio.file.Files

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.SparkTestSession
import graft.h3.H3
import graft.schema.{AggregationMethod => Agg, GraftDataType => T, _}

/** Model-based (state-machine) testing of the store: seeded random
  * OPERATION SEQUENCES run against both the real CellStore and a trivial
  * in-memory model, with full-scan equivalence asserted after every step.
  * The oracle gates (ts1-ts35) pin each operation's semantics in
  * isolation; this spec pins their COMPOSITIONS — the interleavings a
  * deployment actually produces (insert, insert, optimize, compact,
  * rename, insert, ...) where bugs live in the seams (a rewrite dropping
  * rows an append just added, dedup collapsing across an insert boundary
  * it shouldn't, a rename losing files).
  *
  * Model semantics (single res-7 base, no compaction, Max agg):
  *  - insert(batch)          -> model ++= batch.distinct (within-insert
  *                              full-row dedup — the documented exact-write
  *                              strengthening)
  *  - deduplicateWhere(true) -> model = model.distinct (all partitions)
  *  - compactFiles           -> model unchanged (layout-only)
  *  - rename                 -> model unchanged (metadata-only)
  */
class StoreModelSpec extends AnyFunSuite with Matchers with SparkTestSession {

  private val parents = Seq(1, 2, 3).map(d => H3.fromParts(20, 5, Seq(0, 0, 0, 0, d)))
  private val pool: IndexedSeq[Long] = parents.flatMap(p => H3.toChildren(p, 7)).toIndexedSeq

  private def frame(rows: Seq[(Long, Long)]) =
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows.map(r => Row(r._1, r._2)), 3),
      StructType(Seq(
        StructField("h3index", LongType, false),
        StructField("v", LongType, false))))

  private def randBatch(rnd: scala.util.Random): Seq[(Long, Long)] =
    Seq.fill(1 + rnd.nextInt(60))((pool(rnd.nextInt(pool.size)), rnd.nextInt(5).toLong))

  test("random op sequences: store scan == in-memory model after every step") {
    for (seed <- Seq(11, 23, 47)) {
      val rnd = new scala.util.Random(seed)
      val root = Files.createTempDirectory(s"graft_model_$seed").toString
      val s = CellStore(spark, root)
      var name = s"model_ts_$seed"
      var model = Vector.empty[(Long, Long)]

      def check(step: String): Unit = {
        val got = s.scanForResolution(name, 7)
          .select(col("h3index"), col("v"))
          .collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
        withClue(s"seed=$seed after $step") { got shouldBe model.sorted }
      }

      val first = randBatch(rnd)
      s.insert(name, frame(first),
        createSchema = Some(CompactedTableSchema.builder(name)
          .h3BaseResolutions(Seq(7)).useCompaction(false)
          .addAggregatedColumn("v", T.Int64, Agg.Max).build()))
      model = model ++ first.distinct
      check("initial insert")

      for (step <- 1 to 12) {
        rnd.nextInt(4) match {
          case 0 =>
            val b = randBatch(rnd)
            s.insert(name, frame(b))
            model = model ++ b.distinct
            check(s"$step:insert(${b.size})")
          case 1 =>
            s.deduplicateWhere(name, col("ph3") >= 0)
            model = model.distinct
            check(s"$step:deduplicateWhere")
          case 2 =>
            s.compactFiles(name)
            check(s"$step:compactFiles")
          case 3 =>
            val renamed = s"${name}_r$step"
            s.renameTableset(name, renamed)
            name = renamed
            check(s"$step:rename")
        }
      }
      s.dropTableset(name)
    }
  }

  /** Mutation variant: the round-5 ops — lightweight [[CellStore.deleteWhere]]
    * (masks rows in CAPTURED files; later inserts unmasked),
    * [[CellStore.applyDeletes]] (materialization-only, result-invisible) and
    * [[CellStore.dropPartitionsWhere]] (directory retirement) — composed
    * randomly with inserts, dedup rewrites and renames. The model applies a
    * delete as a point-in-time filter (exactly the captured-file contract:
    * every current model row lives in a current file) and a drop as a
    * base-cell filter; rewrites and renames must not change what a scan
    * returns. This is where the seams live: a delete crossing a rename, a
    * dedup rewriting masked partitions, a drop retiring half a capture
    * set. */
  private val poolB: IndexedSeq[Long] =
    (Seq(1, 2).map(d => H3.fromParts(20, 5, Seq(0, 0, 0, 0, d))) ++
      Seq(1, 2).map(d => H3.fromParts(25, 5, Seq(0, 0, 0, 0, d))))
      .flatMap(p => H3.toChildren(p, 7)).toIndexedSeq

  test("mutation random sequences: deletes/drops/rewrites match the model after every step") {
    for (seed <- Seq(5, 17, 41)) {
      val rnd = new scala.util.Random(seed)
      val root = Files.createTempDirectory(s"graft_dmodel_$seed").toString
      val s = CellStore(spark, root)
      var name = s"dmodel_ts_$seed"
      var model = Vector.empty[(Long, Long)]

      def batch() = Seq.fill(1 + rnd.nextInt(50))(
        (poolB(rnd.nextInt(poolB.size)), rnd.nextInt(6).toLong))

      def check(step: String): Unit = {
        val got = s.scanForResolution(name, 7)
          .select(col("h3index"), col("v"))
          .collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
        withClue(s"seed=$seed after $step") { got shouldBe model.sorted }
      }

      val first = batch()
      s.insert(name, frame(first),
        createSchema = Some(CompactedTableSchema.builder(name)
          .h3BaseResolutions(Seq(7)).useCompaction(false)
          .addAggregatedColumn("v", T.Int64, Agg.Max).build()))
      model = model ++ first.distinct
      check("initial insert")

      for (step <- 1 to 14) {
        rnd.nextInt(7) match {
          case 0 | 1 =>
            val b = batch()
            s.insert(name, frame(b))
            model = model ++ b.distinct
            check(s"$step:insert(${b.size})")
          case 2 =>
            val k = rnd.nextInt(6).toLong
            s.deleteWhere(name, s"v >= $k")
            model = model.filterNot(_._2 >= k)
            check(s"$step:deleteWhere(v >= $k)")
          case 3 =>
            s.applyDeletes(name)
            check(s"$step:applyDeletes")
          case 4 =>
            val bc = if (rnd.nextBoolean()) 20 else 25
            s.dropPartitionsWhere(name, col("ph3") === bc)
            model = model.filterNot(r => H3.getBaseCell(r._1) == bc)
            check(s"$step:dropPartitions(ph3=$bc)")
          case 5 =>
            s.deduplicateWhere(name, col("ph3") >= 0)
            model = model.distinct
            check(s"$step:deduplicateWhere")
          case 6 =>
            val renamed = s"${name}_r$step"
            s.renameTableset(name, renamed)
            name = renamed
            check(s"$step:rename")
        }
      }
      s.dropTableset(name)
    }
  }

  /** Versioned variant: ReplacingMergeTree(version) under random
    * insert / replace / compactFiles sequences — BOTH read paths checked
    * each step: the raw scan against the uncollapsed multiset, the FINAL
    * scan against the keep-latest collapse (survivor = lexicographic max
    * of (version, payload) per h3index, the engine's documented tiebreak). */
  private def vframe(rows: Seq[(Long, Long, Long)]) =
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows.map(r => Row(r._1, r._2, r._3)), 3),
      StructType(Seq(
        StructField("h3index", LongType, false),
        StructField("version", LongType, false),
        StructField("val", LongType, false))))

  test("versioned random sequences: raw + FINAL reads match the keep-latest model") {
    for (seed <- Seq(7, 31)) {
      val rnd = new scala.util.Random(seed)
      val root = Files.createTempDirectory(s"graft_vmodel_$seed").toString
      val s = CellStore(spark, root)
      val name = s"vmodel_ts_$seed"
      var raw = Vector.empty[(Long, Long, Long)]
      def collapsed = raw.groupBy(_._1).valuesIterator
        .map(_.maxBy(r => (r._2, r._3))).toVector
      def batch() = Seq.fill(1 + rnd.nextInt(50))(
        (pool(rnd.nextInt(pool.size)), rnd.nextInt(4).toLong, rnd.nextInt(5).toLong))

      def check(step: String): Unit = {
        val gotRaw = s.scanForResolution(name, 7)
          .select(col("h3index"), col("version"), col("val"))
          .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sorted.toSeq
        withClue(s"seed=$seed raw after $step") { gotRaw shouldBe raw.sorted }
        val gotFinal = s.scanForResolutionFinal(name, 7)
          .select(col("h3index"), col("version"), col("val"))
          .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sorted.toSeq
        withClue(s"seed=$seed FINAL after $step") { gotFinal shouldBe collapsed.sorted }
      }

      val first = batch()
      s.insert(name, vframe(first),
        createSchema = Some(CompactedTableSchema.builder(name)
          .h3BaseResolutions(Seq(7)).useCompaction(false)
          .engine(TableEngine.ReplacingMergeTree(Some("version")))
          .addSimpleColumn("version", T.Int64)
          .addSimpleColumn("val", T.Int64)
          .build()))
      raw = raw ++ first.distinct
      check("initial insert")

      for (step <- 1 to 10) {
        rnd.nextInt(3) match {
          case 0 =>
            val b = batch()
            s.insert(name, vframe(b))
            raw = raw ++ b.distinct
            check(s"$step:insert(${b.size})")
          case 1 =>
            s.replace(name)
            raw = collapsed
            check(s"$step:replace")
          case 2 =>
            s.compactFiles(name)
            check(s"$step:compactFiles")
        }
      }
      s.dropTableset(name)
    }
  }
}

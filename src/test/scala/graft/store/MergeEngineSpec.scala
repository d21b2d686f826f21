package graft.store

import java.nio.file.Files

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.SparkTestSession
import graft.h3.H3
import graft.schema.{AggregationMethod => Agg, GraftDataType => T, _}

/** Engine-specific OPTIMIZE/FINAL collapse semantics (reference
  * `schema/other.rs:11-15` declares the engines; ClickHouse's merges give
  * each one distinct behavior — a declared SummingMergeTree must SUM, not
  * silently keep-latest). */
class MergeEngineSpec extends AnyFunSuite with Matchers with SparkTestSession {

  private def newStore() = {
    val dir = Files.createTempDirectory("graft_store_").toString
    (dir, CellStore(spark, dir))
  }

  private val hexRes5 = H3.fromParts(20, 5, Seq(0, 0, 0, 0, 0))
  private def cells(n: Int) = H3.toChildren(hexRes5, 7).take(n).toSeq

  private def summingSchema = CompactedTableSchema.builder("summed")
    .h3BaseResolutions(Seq(7))
    .useCompaction(false)
    .engine(TableEngine.SummingMergeTree(Seq("val", "cnt")))
    .addSimpleColumn("val", T.Int64)
    .addSimpleColumn("cnt", T.Int64)
    .addSimpleColumn("tag", T.Int32)
    .build()

  private def summingInput(cs: Seq[Long], valOf: Int => Long, tag: Int) = {
    val rows = cs.zipWithIndex.map { case (c, i) => Row(c, valOf(i), 1L, tag) }
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows.toIndexedSeq, 2),
      StructType(Seq(
        StructField("h3index", LongType, false),
        StructField("val", LongType, false),
        StructField("cnt", LongType, false),
        StructField("tag", IntegerType, false))))
  }

  test("SummingMergeTree OPTIMIZE sums declared columns per sort key across batches") {
    val (_, store) = newStore()
    val cs = cells(8)
    store.insert("summed", summingInput(cs, i => 10L + i, tag = 1),
      createSchema = Some(summingSchema))
    store.insert("summed", summingInput(cs.take(3), i => 100L * (i + 1), tag = 2))
    store.replace("summed")
    val rows = store.scanForResolution("summed", 7)
      .select("h3index", "val", "cnt", "tag").collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getInt(3)))).toMap
    rows should have size 8
    cs.take(3).zipWithIndex.foreach { case (c, i) =>
      rows(c)._1 shouldBe (10L + i) + 100L * (i + 1)
      rows(c)._2 shouldBe 2L
      // non-summed payload: deterministic max-struct survivor
      rows(c)._3 shouldBe 2
    }
    cs.drop(3).zipWithIndex.foreach { case (c, i) =>
      rows(c) shouldBe ((10L + i + 3, 1L, 1))
    }
  }

  test("SummingMergeTree FINAL read sums at read time without rewriting files") {
    val (dir, store) = newStore()
    val cs = cells(5)
    store.insert("summed", summingInput(cs, _ => 7L, tag = 1),
      createSchema = Some(summingSchema))
    store.insert("summed", summingInput(cs, _ => 5L, tag = 1))
    def files = {
      import scala.jdk.CollectionConverters._
      Files.walk(java.nio.file.Paths.get(dir)).iterator().asScala
        .filter(_.toString.endsWith(".parquet")).map(_.toString).toSet
    }
    val before = files
    val rows = store.scanForResolutionFinal("summed", 7)
      .select("h3index", "val", "cnt").collect()
    rows should have length 5
    all(rows.map(_.getLong(1))) shouldBe 12L
    all(rows.map(_.getLong(2))) shouldBe 2L
    files shouldBe before // SELECT ... FINAL never writes
    store.scanForResolution("summed", 7).count() shouldBe 10 // stale rows live
  }

  test("SummingMergeTree with EMPTY declaration sums every numeric non-key column") {
    val (_, store) = newStore()
    val cs = cells(4)
    val schema = CompactedTableSchema.builder("sumall")
      .h3BaseResolutions(Seq(7))
      .useCompaction(false)
      .engine(TableEngine.SummingMergeTree(Seq.empty))
      .addSimpleColumn("val", T.Int64)
      .addSimpleColumn("cnt", T.Int64)
      .addSimpleColumn("tag", T.Int32)
      .build()
    val in = summingInput(cs, _ => 3L, tag = 4)
    store.insert("sumall", in, createSchema = Some(schema))
    store.insert("sumall", summingInput(cs, _ => 2L, tag = 6))
    store.replace("sumall")
    val rows = store.scanForResolution("sumall", 7)
      .select("val", "cnt", "tag").collect()
    rows should have length 4
    all(rows.map(_.getLong(0))) shouldBe 5L
    all(rows.map(_.getLong(1))) shouldBe 2L
    all(rows.map(_.getInt(2))) shouldBe 10 // tag is numeric + non-key -> summed too
  }

  test("AggregatingMergeTree collapse honors each column's declared method") {
    val (_, store) = newStore()
    val cs = cells(3)
    val schema = CompactedTableSchema.builder("agged")
      .h3BaseResolutions(Seq(7))
      .useCompaction(false)
      .engine(TableEngine.AggregatingMergeTree)
      .addAggregatedColumn("lo", T.Int64, Agg.Min)
      .addAggregatedColumn("hi", T.Int64, Agg.Max)
      .addAggregatedColumn("total", T.Int64, Agg.Sum)
      .addAggregatedColumn("cat", T.UInt8, Agg.SetNullOnConflict, nullable = true)
      .build()
    def in(lo: Long, hi: Long, total: Long, cat: Int => Any) = {
      val rows = cs.zipWithIndex.map { case (c, i) => Row(c, lo, hi, total, cat(i)) }
      spark.createDataFrame(
        spark.sparkContext.parallelize(rows.toIndexedSeq, 2),
        StructType(Seq(
          StructField("h3index", LongType, false),
          StructField("lo", LongType, false),
          StructField("hi", LongType, false),
          StructField("total", LongType, false),
          StructField("cat", ShortType, true))))
    }
    store.insert("agged", in(5L, 5L, 10L, _ => 9.toShort), createSchema = Some(schema))
    // cell 0 keeps category 9 (unanimous), cells 1..2 conflict -> null
    store.insert("agged", in(3L, 8L, 7L, i => if (i == 0) 9.toShort else 2.toShort))
    store.replace("agged")
    val rows = store.scanForResolution("agged", 7)
      .select("h3index", "lo", "hi", "total", "cat").collect()
      .map(r => r.getLong(0) -> r).toMap
    rows should have size 3
    cs.foreach { c =>
      rows(c).getLong(1) shouldBe 3L
      rows(c).getLong(2) shouldBe 8L
      rows(c).getLong(3) shouldBe 17L
    }
    rows(cs.head).getAs[Any]("cat") shouldBe 9.toShort
    cs.tail.foreach { c => Option(rows(c).getAs[Any]("cat")) shouldBe None }
  }

  test("AggregatingMergeTree collapse refuses non-re-mergeable aggregations loudly") {
    val (_, store) = newStore()
    val cs = cells(2)
    val schema = CompactedTableSchema.builder("avged")
      .h3BaseResolutions(Seq(7))
      .useCompaction(false)
      .engine(TableEngine.AggregatingMergeTree)
      .addAggregatedColumn("mean", T.Float64, Agg.Average)
      .build()
    val rows = cs.map(c => Row(c, 1.5))
    val in = spark.createDataFrame(
      spark.sparkContext.parallelize(rows.toIndexedSeq, 1),
      StructType(Seq(
        StructField("h3index", LongType, false),
        StructField("mean", DoubleType, false))))
    store.insert("avged", in, createSchema = Some(schema))
    val e = the[IllegalArgumentException] thrownBy store.replace("avged")
    e.getMessage should include("average")
    an[IllegalArgumentException] should be thrownBy
      store.scanForResolutionFinal("avged", 7).collect()
  }

  test("replaceWhere is partition-scoped for Summing too (untouched ph3 keeps duplicates)") {
    val (_, store) = newStore()
    val csA = cells(4)
    val csB = H3.toChildren(H3.fromParts(25, 5, Seq(0, 0, 0, 0, 0)), 7).take(4).toSeq
    store.insert("summed", summingInput(csA ++ csB, _ => 3L, tag = 1),
      createSchema = Some(summingSchema))
    store.insert("summed", summingInput(csA ++ csB, _ => 4L, tag = 1))
    store.replaceWhere("summed", col("ph3") === 20)
    val rows = store.scanForResolution("summed", 7)
      .groupBy("h3index").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    csA.foreach(c => rows(c) shouldBe 1L) // touched: summed to one row
    csB.foreach(c => rows(c) shouldBe 2L) // untouched: both rows intact
    val summed = store.scanForResolution("summed", 7)
      .where(col("ph3") === 20).select("val").collect().map(_.getLong(0))
    all(summed) shouldBe 7L
  }

  test("SummingMergeTree refuses compaction (parent coverage cannot absorb later children)") {
    a[SchemaError] should be thrownBy {
      CompactedTableSchema.builder("badsum")
        .h3BaseResolutions(Seq(7))
        .useCompaction(true)
        .engine(TableEngine.SummingMergeTree(Seq("val")))
        .addSimpleColumn("val", T.Int64)
        .build()
    }
  }

  test("SummingMergeTree schema: sum column must be numeric and off the sort key") {
    a[SchemaError] should be thrownBy {
      CompactedTableSchema.builder("bad")
        .h3BaseResolutions(Seq(7))
        .useCompaction(false)
        .engine(TableEngine.SummingMergeTree(Seq("when")))
        .addSimpleColumn("when", T.DateTimeT)
        .build()
    }
    a[SchemaError] should be thrownBy {
      CompactedTableSchema.builder("bad")
        .h3BaseResolutions(Seq(7))
        .useCompaction(false)
        .engine(TableEngine.SummingMergeTree(Seq("k")))
        .addColumn("k", ColumnDef.Simple(T.Int64, orderKeyPosition = Some(0)))
        .build()
    }
  }
}

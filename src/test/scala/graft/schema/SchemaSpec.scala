package graft.schema

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.schema.{AggregationMethod => Agg, GraftDataType => T}

/** Port of the reference schema unit tests (`schema/mod.rs:493-572`,
  * `tests/clickhouse/test_schema.py:10-32`). */
class SchemaSpec extends AnyFunSuite with Matchers {

  private def elephantBuilder = CompactedTableSchema.builder("okavango_delta")
    .h3BaseResolutions(0 to 7)
    .temporalPartitioning(TemporalPartitioning.Months(1))
    .addSimpleColumn("is_valid", T.UInt8)
    .addSimpleColumn("observed_on", T.DateTime64T)
    .addAggregatedColumn("elephant_density", T.Float32, Agg.RelativeToCellArea)
    .addAggregatedColumn("some_category", T.UInt8, Agg.SetNullOnConflict, nullable = true)

  test("valid schema builds; resolutions normalized sorted+deduped") {
    val s = CompactedTableSchema.builder("t_x")
      .h3BaseResolutions(Seq(5, 3, 5, 1))
      .addSimpleColumn("v", T.Int32)
      .build()
    s.baseResolutions shouldBe Seq(1, 3, 5)
    s.maxBaseResolution shouldBe 5
  }

  test("table name regex (reference schema/mod.rs:138-149)") {
    // reference regex ^[a-zA-Z].[_a-zA-Z_0-9]+$
    for (ok <- Seq("okavango_delta", "a_b", "ab1", "zZ_9")) {
      CompactedTableSchema.builder(ok).h3BaseResolutions(Seq(3)).build()
    }
    for (bad <- Seq("1abc", "_abc", "ab", "a", "")) {
      a[SchemaError] should be thrownBy {
        CompactedTableSchema.builder(bad).h3BaseResolutions(Seq(3)).build()
      }
    }
  }

  test("h3index column is mandatory and auto-added by builder") {
    val s = CompactedTableSchema.builder("some_table").h3BaseResolutions(Seq(4)).build()
    s.columns.keys should contain("h3index")
    s.orderByKey.head shouldBe "h3index"
  }

  test("columns may not start with reserved prefix h3index") {
    a[SchemaError] should be thrownBy {
      CompactedTableSchema.builder("some_table").h3BaseResolutions(Seq(4))
        .addSimpleColumn("h3index_extra", T.Int32).build()
    }
  }

  test("base resolutions: empty or out-of-range rejected") {
    a[SchemaError] should be thrownBy {
      CompactedTableSchema.builder("some_table").build()
    }
    a[SchemaError] should be thrownBy {
      CompactedTableSchema.builder("some_table").h3BaseResolutions(Seq(16)).build()
    }
  }

  test("aggregation applicability matrix (reference agg.rs:22-31)") {
    // Sum on temporal -> invalid
    a[SchemaError] should be thrownBy {
      CompactedTableSchema.builder("some_table").h3BaseResolutions(Seq(3))
        .addAggregatedColumn("ts", T.DateTimeT, Agg.Sum).build()
    }
    // Sum on String -> invalid
    a[SchemaError] should be thrownBy {
      CompactedTableSchema.builder("some_table").h3BaseResolutions(Seq(3))
        .addAggregatedColumn("s", T.StringT, Agg.Sum).build()
    }
    // SetNullOnConflict requires nullable
    a[SchemaError] should be thrownBy {
      CompactedTableSchema.builder("some_table").h3BaseResolutions(Seq(3))
        .addAggregatedColumn("c", T.UInt8, Agg.SetNullOnConflict, nullable = false).build()
    }
    // Min/Max/Average need numbers
    a[SchemaError] should be thrownBy {
      CompactedTableSchema.builder("some_table").h3BaseResolutions(Seq(3))
        .addAggregatedColumn("s", T.StringT, Agg.Min).build()
    }
    // valid combinations
    CompactedTableSchema.builder("some_table").h3BaseResolutions(Seq(3))
      .addAggregatedColumn("a", T.Float64, Agg.Sum)
      .addAggregatedColumn("b", T.Int32, Agg.Average)
      .addAggregatedColumn("c", T.UInt8, Agg.SetNullOnConflict, nullable = true)
      .build()
  }

  test("Sum disables compaction (reference agg.rs:33-42)") {
    val withSum = CompactedTableSchema.builder("some_table").h3BaseResolutions(Seq(3))
      .addAggregatedColumn("a", T.Float64, Agg.Sum).build()
    withSum.compactionEnabled shouldBe false
    val noSum = CompactedTableSchema.builder("some_table").h3BaseResolutions(Seq(3))
      .addAggregatedColumn("a", T.Float64, Agg.Max).build()
    noSum.compactionEnabled shouldBe true
  }

  test("SummingMergeTree sum columns must exist (schema/mod.rs:103-118)") {
    a[SchemaError] should be thrownBy {
      CompactedTableSchema.builder("some_table").h3BaseResolutions(Seq(3))
        .engine(TableEngine.SummingMergeTree(Seq("nope"))).build()
    }
  }

  test("ReplacingMergeTree version column: must exist, be simple, non-nullable, compaction off") {
    def base = CompactedTableSchema.builder("some_table").h3BaseResolutions(Seq(3))
      .useCompaction(false)
      .addSimpleColumn("v", T.Int64)
      .addAggregatedColumn("x", T.Float64, Agg.Max)
    base.engine(TableEngine.ReplacingMergeTree(Some("v"))).build()
      .versionColumn shouldBe Some("v")
    base.engine(TableEngine.ReplacingMergeTree(Some("v"))).build()
      .replaceKey shouldBe Seq("h3index") // version never part of the sort key
    a[SchemaError] should be thrownBy // not in schema
      base.engine(TableEngine.ReplacingMergeTree(Some("nope"))).build()
    a[SchemaError] should be thrownBy // aggregated column can't be the version
      base.engine(TableEngine.ReplacingMergeTree(Some("x"))).build()
    a[SchemaError] should be thrownBy { // nullable version rejected
      CompactedTableSchema.builder("some_table").h3BaseResolutions(Seq(3))
        .useCompaction(false)
        .addColumn("v", ColumnDef.Simple(T.Int64, nullable = true))
        .engine(TableEngine.ReplacingMergeTree(Some("v"))).build()
    }
    a[SchemaError] should be thrownBy { // compaction + version mutually exclusive
      CompactedTableSchema.builder("some_table").h3BaseResolutions(Seq(3))
        .addSimpleColumn("v", T.Int64)
        .engine(TableEngine.ReplacingMergeTree(Some("v"))).build()
    }
  }

  test("version column survives the JSON round-trip") {
    val s = CompactedTableSchema.builder("some_table").h3BaseResolutions(Seq(3))
      .useCompaction(false)
      .addSimpleColumn("v", T.Int64)
      .engine(TableEngine.ReplacingMergeTree(Some("v"))).build()
    CompactedTableSchema.fromJson(s.toJson) shouldBe s
  }

  test("temporal partitioning parse: '5 years' valid, '0 years'/'z years' raise (test_schema.py:10-15)") {
    TemporalPartitioning.parse("5 years") shouldBe TemporalPartitioning.Years(5)
    TemporalPartitioning.parse("1 month") shouldBe TemporalPartitioning.Months(1)
    a[SchemaError] should be thrownBy TemporalPartitioning.parse("0 years")
    a[SchemaError] should be thrownBy TemporalPartitioning.parse("z years")
    a[SchemaError] should be thrownBy TemporalPartitioning.parse("years")
  }

  test(">1 temporal column without explicit partitionBy rejected (schema/mod.rs:252-271)") {
    a[SchemaError] should be thrownBy {
      elephantBuilder.addSimpleColumn("second_time", T.DateTimeT).build()
    }
    // explicit partitionBy fixes it
    elephantBuilder.addSimpleColumn("second_time", T.DateTimeT)
      .partitionBy(Seq("observed_on")).build()
  }

  test("codec validation ranges (other.rs:36-65)") {
    a[SchemaError] should be thrownBy {
      CompactedTableSchema.builder("some_table").h3BaseResolutions(Seq(3))
        .defaultCodec(ColumnCodec.ZSTD(23)).build()
    }
    a[SchemaError] should be thrownBy {
      CompactedTableSchema.builder("some_table").h3BaseResolutions(Seq(3))
        .defaultCodec(ColumnCodec.LZ4HC(10)).build()
    }
    a[SchemaError] should be thrownBy {
      CompactedTableSchema.builder("some_table").h3BaseResolutions(Seq(3))
        .defaultCodec(ColumnCodec.Delta(3)).build()
    }
    CompactedTableSchema.builder("some_table").h3BaseResolutions(Seq(3))
      .defaultCodec(ColumnCodec.Delta(4)).build()
  }

  test("order-by key: h3index first, then order_key_position, ties by name (schema/mod.rs:169-199)") {
    val s = CompactedTableSchema.builder("some_table").h3BaseResolutions(Seq(3))
      .addColumn("zeta", ColumnDef.Simple(T.Int32, orderKeyPosition = Some(1)))
      .addColumn("alpha", ColumnDef.Simple(T.Int32, orderKeyPosition = Some(1)))
      .addColumn("beta", ColumnDef.Simple(T.Int32, orderKeyPosition = Some(0)))
      .addSimpleColumn("unkeyed", T.Int32)
      .build()
    s.orderByKey shouldBe Seq("h3index", "beta", "alpha", "zeta")
  }

  test("JSON round-trip (test_schema.py:19-32)") {
    val s = elephantBuilder.engine(TableEngine.SummingMergeTree(Seq("elephant_density")))
      .useCompaction(false) // Summing + compaction is refused (MergeEngineSpec)
      .h3Partitioning(H3Partitioning.LowerResolution(7))
      .build()
    val json = s.toJson
    val back = CompactedTableSchema.fromJson(json)
    back shouldBe s
    // and a second round trip is stable
    CompactedTableSchema.fromJson(back.toJson) shouldBe back
  }

  test("elephant fixture schema builds (FIXTURES F1)") {
    val s = elephantBuilder.build()
    s.compactionEnabled shouldBe true
    s.temporalColumns shouldBe Seq("observed_on")
    s.groupByColumns should contain allOf ("is_valid", "observed_on")
    s.toStructType.fieldNames.toSeq shouldBe
      Seq("h3index", "is_valid", "observed_on", "elephant_density", "some_category")
  }
}

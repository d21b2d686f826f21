package graft.schema

import scala.collection.immutable.ListMap

import org.apache.spark.sql.types._

/**
 * User-declared logical schema for a compacted tableset — the Spark-native
 * re-expression of the reference's `CompactedTableSchema`
 * (reference `compacted_tables/schema/mod.rs:34-47`, builder `:404-491`,
 * validation `:93-133`).
 *
 * Types are the reference's closed enum (`schema/datatype.rs:11-26`) mapped
 * onto Spark types (unsigned ints widen — SURVEY §1.2). Column kinds mirror
 * `ColumnDefinition` (`schema/column.rs:13-29`): Simple / H3Index /
 * WithAggregation. Physical-layout knobs (engine, codecs, partitioning)
 * keep the reference's validation semantics; per-column codecs are recorded
 * but map to Parquet's table-level compression (documented intentional loss).
 */
sealed abstract class GraftDataType(val name: String, val sparkType: DataType) {
  def isTemporal: Boolean = this match {
    case GraftDataType.DateT | GraftDataType.DateTimeT | GraftDataType.DateTime64T => true
    case _ => false
  }
  def isSignedInteger: Boolean = this match {
    case GraftDataType.Int8 | GraftDataType.Int16 | GraftDataType.Int32 | GraftDataType.Int64 => true
    case _ => false
  }
  def isUnsignedInteger: Boolean = this match {
    case GraftDataType.UInt8 | GraftDataType.UInt16 | GraftDataType.UInt32 | GraftDataType.UInt64 => true
    case _ => false
  }
  def isFloat: Boolean = this match {
    case GraftDataType.Float32 | GraftDataType.Float64 => true
    case _ => false
  }
  /** `is_number` predicate (`datatype.rs:29-50`). */
  def isNumber: Boolean = isSignedInteger || isUnsignedInteger || isFloat
}

object GraftDataType {
  case object UInt8 extends GraftDataType("UInt8", ShortType)
  case object UInt16 extends GraftDataType("UInt16", IntegerType)
  case object UInt32 extends GraftDataType("UInt32", LongType)
  case object UInt64 extends GraftDataType("UInt64", LongType)
  case object Int8 extends GraftDataType("Int8", ByteType)
  case object Int16 extends GraftDataType("Int16", ShortType)
  case object Int32 extends GraftDataType("Int32", IntegerType)
  case object Int64 extends GraftDataType("Int64", LongType)
  case object Float32 extends GraftDataType("Float32", FloatType)
  case object Float64 extends GraftDataType("Float64", DoubleType)
  case object DateT extends GraftDataType("Date", DateType)
  case object DateTimeT extends GraftDataType("DateTime", TimestampType)
  case object DateTime64T extends GraftDataType("DateTime64", TimestampType)
  case object StringT extends GraftDataType("String", StringType)

  val all: Seq[GraftDataType] = Seq(UInt8, UInt16, UInt32, UInt64, Int8, Int16,
    Int32, Int64, Float32, Float64, DateT, DateTimeT, DateTime64T, StringT)
  def fromName(n: String): GraftDataType =
    all.find(_.name == n).getOrElse(throw new SchemaError(s"unknown datatype: $n"))
}

class SchemaError(msg: String) extends IllegalArgumentException(msg)

/** Per-column aggregation used by the insert-time rollup (reference
  * `schema/agg.rs`, applicability matrix `agg.rs:22-31`). */
sealed abstract class AggregationMethod(val name: String) {
  /** Can this aggregation apply to a column of the given type/nullability?
    * (`schema/column.rs:76-99`). */
  def applicableTo(dt: GraftDataType, nullable: Boolean): Boolean = this match {
    case AggregationMethod.Sum | AggregationMethod.RelativeToCellArea =>
      dt.isNumber && !dt.isTemporal
    case AggregationMethod.Min | AggregationMethod.Max | AggregationMethod.Average =>
      dt.isNumber
    case AggregationMethod.SetNullOnConflict => nullable
  }
  /** Compaction must be disabled when any column uses Sum — reading
    * compacted + summed data would double-count (`agg.rs:33-42`). */
  def allowsCompaction: Boolean = this != AggregationMethod.Sum
}

object AggregationMethod {
  case object Sum extends AggregationMethod("sum")
  case object Min extends AggregationMethod("min")
  case object Max extends AggregationMethod("max")
  case object Average extends AggregationMethod("average")
  case object RelativeToCellArea extends AggregationMethod("relativetocellarea")
  case object SetNullOnConflict extends AggregationMethod("setnullonconflict")
  val all: Seq[AggregationMethod] =
    Seq(Sum, Min, Max, Average, RelativeToCellArea, SetNullOnConflict)
  def fromName(n: String): AggregationMethod =
    all.find(_.name == n.toLowerCase)
      .getOrElse(throw new SchemaError(s"unknown aggregation method: $n"))
}

/** Table engine semantics (`schema/other.rs:11-15`). In the Spark port the
  * dedup/merge behavior is realized explicitly at publish time (SURVEY §4):
  * ReplacingMergeTree -> dropDuplicates on the order-by key.
  *
  * ReplacingMergeTree optionally carries a VERSION column (ClickHouse's
  * `ReplacingMergeTree([ver])`): when set, collapse keeps the row with the
  * largest version per sort key instead of plain distinct. Collapse runs at
  * optimize time ([[graft.store.CellStore.replaceWhere]]) or at read time
  * (`scanForResolutionFinal`, the `SELECT ... FINAL` analogue) — inserts
  * never collapse across batches, exactly like ClickHouse merges. */
sealed trait TableEngine
object TableEngine {
  final case class ReplacingMergeTree(versionColumn: Option[String] = None)
      extends TableEngine
  final case class SummingMergeTree(sumColumns: Seq[String]) extends TableEngine
  case object AggregatingMergeTree extends TableEngine
}

/** Compression codec declarations (`schema/other.rs:27-65`). Validated with
  * the reference's ranges; Parquet applies a table-level codec only, so these
  * are metadata in the port. */
sealed trait ColumnCodec
object ColumnCodec {
  final case class ZSTD(level: Int) extends ColumnCodec
  final case class LZ4HC(level: Int) extends ColumnCodec
  final case class Delta(width: Int) extends ColumnCodec
  case object Gorilla extends ColumnCodec
  case object T64 extends ColumnCodec
  case object DoubleDelta extends ColumnCodec

  def validate(c: ColumnCodec): Unit = c match {
    case ZSTD(l) if l < 1 || l > 22 => throw new SchemaError(s"ZSTD level $l outside 1..22")
    case LZ4HC(l) if l < 1 || l > 9 => throw new SchemaError(s"LZ4HC level $l outside 1..9")
    case Delta(w) if !Set(1, 2, 4, 8)(w) => throw new SchemaError(s"Delta width $w not in {1,2,4,8}")
    case _ => ()
  }
}

sealed trait TemporalResolution
object TemporalResolution {
  case object Second extends TemporalResolution
  case object Day extends TemporalResolution
}

/** Temporal partition bucketing (`schema/partitioning.rs:63-94`): Months(n)
  * buckets by ceil((year*100 + 100*(month-1)/12)/n), Years(n) by
  * floor(year/n)*n — reproduced exactly in [[graft.store]]. */
sealed trait TemporalPartitioning { def n: Int }
object TemporalPartitioning {
  final case class Months(n: Int) extends TemporalPartitioning
  final case class Years(n: Int) extends TemporalPartitioning

  /** Parse the reference's human syntax, e.g. "5 years" / "3 months"
    * (`py schema.rs` exposes this; invalid counts must raise —
    * `test_schema.py:10-15`). */
  def parse(s: String): TemporalPartitioning = {
    val parts = s.trim.toLowerCase.split("\\s+")
    if (parts.length != 2) throw new SchemaError(s"cannot parse temporal partitioning: '$s'")
    val n = try parts(0).toInt catch {
      case _: NumberFormatException => throw new SchemaError(s"invalid count in '$s'")
    }
    if (n <= 0) throw new SchemaError(s"temporal partitioning count must be positive: '$s'")
    parts(1) match {
      case "year" | "years" => Years(n)
      case "month" | "months" => Months(n)
      case other => throw new SchemaError(s"unknown temporal unit: '$other'")
    }
  }
}

/** H3-derived first partition expression (`schema/partitioning.rs:98-130`):
  * BaseCell -> h3_get_base_cell(h3index); LowerResolution(d) ->
  * h3_to_parent(h3index, max(res - d, 0)). */
sealed trait H3Partitioning
object H3Partitioning {
  case object BaseCell extends H3Partitioning
  final case class LowerResolution(resolutionDifference: Int) extends H3Partitioning
}

sealed trait ColumnDef {
  def dataType: GraftDataType
  def nullable: Boolean
  def orderKeyPosition: Option[Int]
  def codec: Option[ColumnCodec]
}
object ColumnDef {
  /** Plain stored column. */
  final case class Simple(dataType: GraftDataType, nullable: Boolean = false,
      orderKeyPosition: Option[Int] = None, codec: Option[ColumnCodec] = None)
      extends ColumnDef
  /** The mandatory h3index column: always UInt64, non-null, order-key first
    * (`schema/column.rs:32-66`, forced weight -100 `schema/mod.rs:169-199`). */
  case object H3Index extends ColumnDef {
    val dataType: GraftDataType = GraftDataType.UInt64
    val nullable = false
    val orderKeyPosition: Option[Int] = Some(0)
    val codec: Option[ColumnCodec] = None
  }
  /** Column aggregated during the rollup to coarser resolutions. */
  final case class WithAggregation(dataType: GraftDataType, agg: AggregationMethod,
      nullable: Boolean = false, orderKeyPosition: Option[Int] = None,
      codec: Option[ColumnCodec] = None) extends ColumnDef
}

final case class CompactedTableSchema(
    name: String,
    baseResolutions: Seq[Int],
    columns: ListMap[String, ColumnDef],
    engine: TableEngine = TableEngine.ReplacingMergeTree(),
    useCompaction: Boolean = true,
    temporalResolution: TemporalResolution = TemporalResolution.Second,
    temporalPartitioning: Option[TemporalPartitioning] = None,
    h3Partitioning: H3Partitioning = H3Partitioning.BaseCell,
    partitionBy: Seq[String] = Nil,
    defaultCodec: ColumnCodec = ColumnCodec.ZSTD(6)) {

  import CompactedTableSchema._

  def maxBaseResolution: Int = baseResolutions.max

  /** Sorted + deduped (`schema/mod.rs:391-402` semantics, applied eagerly). */
  def normalizedResolutions: Seq[Int] = baseResolutions.distinct.sorted

  /** Compaction is requested AND no Sum column forbids it (`agg.rs:33-42`). */
  def compactionEnabled: Boolean = useCompaction && columns.values.forall {
    case ColumnDef.WithAggregation(_, agg, _, _, _) => agg.allowsCompaction
    case _ => true
  }

  def aggregatedColumns: Seq[(String, GraftDataType, AggregationMethod)] =
    columns.collect { case (n, ColumnDef.WithAggregation(dt, agg, _, _, _)) =>
      (n, dt, agg)
    }.toSeq

  /** Non-aggregated, non-h3index columns become GROUP BY keys in the rollup
    * (`insert.rs:305-323`). */
  def groupByColumns: Seq[String] = columns.collect {
    case (n, _: ColumnDef.Simple) => n
  }.toSeq

  def temporalColumns: Seq[String] =
    columns.collect { case (n, c) if c.dataType.isTemporal => n }.toSeq

  /** ReplacingMergeTree's declared version column, if any. */
  def versionColumn: Option[String] = engine match {
    case TableEngine.ReplacingMergeTree(v) => v
    case _ => None
  }

  /** Sort key a versioned collapse groups on: the ORDER BY key minus the
    * version column (ClickHouse collapses rows with an identical sort key;
    * the version decides the survivor, it is not part of the key). */
  def replaceKey: Seq[String] = orderByKey.filterNot(versionColumn.contains)

  /** ORDER BY (primary key): h3index first (forced weight -100), then by
    * order_key_position, ties by name (`schema/mod.rs:169-199`). */
  def orderByKey: Seq[String] = {
    val weighted = columns.toSeq.flatMap { case (n, c) =>
      val w = if (c == ColumnDef.H3Index) Some(-100) else c.orderKeyPosition
      w.map(weight => (weight, n))
    }
    weighted.sortBy { case (w, n) => (w, n) }.map(_._2)
  }

  def toStructType: StructType = StructType(columns.toSeq.map { case (n, c) =>
    StructField(n, c.dataType.sparkType, nullable = c.nullable)
  })

  /** Eager validation (`schema/mod.rs:93-133`). Throws [[SchemaError]]. */
  def validated: CompactedTableSchema = {
    if (!TableNameRegex.matches(name))
      throw new SchemaError(s"invalid table name: '$name'")
    if (baseResolutions.isEmpty)
      throw new SchemaError("at least one base resolution is required")
    if (baseResolutions.exists(r => r < 0 || r > graft.h3.H3.MaxRes))
      throw new SchemaError(s"base resolutions must be within 0..15: $baseResolutions")
    val h3cols = columns.collect { case (n, ColumnDef.H3Index) => n }
    if (h3cols.toSeq != Seq(ColH3Index))
      throw new SchemaError(
        s"exactly one H3Index column named '$ColH3Index' is required (got: $h3cols)")
    columns.foreach { case (n, c) =>
      if (n != ColH3Index && n.startsWith(ColH3Index))
        throw new SchemaError(
          s"column name '$n' collides with derived-column prefix '$ColH3Index'")
      c.codec.foreach(ColumnCodec.validate)
      c match {
        case ColumnDef.WithAggregation(dt, agg, nullable, _, _) =>
          if (!agg.applicableTo(dt, nullable))
            throw new SchemaError(
              s"aggregation '${agg.name}' not applicable to column '$n' " +
                s"(type ${dt.name}, nullable=$nullable)")
        case _ => ()
      }
    }
    ColumnCodec.validate(defaultCodec)
    engine match {
      case TableEngine.SummingMergeTree(sumCols) =>
        // same mutual exclusion as the versioned Replacing engine below:
        // compaction moves 7 equal children's coverage to a PARENT cell
        // (different sort key), so a later child row could never sum into
        // that coverage — the collapse would silently under-merge
        if (useCompaction)
          throw new SchemaError(
            "SummingMergeTree requires useCompaction(false): a compacted parent " +
              "cell stands for its children's values, and a sum collapse cannot " +
              "merge a later child row into that coverage")
        val missing = sumCols.filterNot(columns.contains)
        if (missing.nonEmpty)
          throw new SchemaError(s"SummingMergeTree sum columns missing: $missing")
        // ClickHouse constraints: summed columns must be numeric and must
        // not be part of the sort key (a key column cannot also collapse)
        sumCols.foreach { c =>
          if (!columns(c).dataType.isNumber)
            throw new SchemaError(
              s"SummingMergeTree sum column '$c' must be numeric " +
                s"(got ${columns(c).dataType.name})")
          if (orderByKey.contains(c))
            throw new SchemaError(
              s"SummingMergeTree sum column '$c' is part of the ORDER BY key — " +
                "a sort-key column cannot be summed across the rows it identifies")
        }
      case TableEngine.ReplacingMergeTree(Some(ver)) =>
        // compaction merges equal-valued sibling groups into a PARENT cell;
        // a later version of one child could then never shadow its coverage
        // (the parent's h3index differs from the child's sort key). The two
        // features are mutually exclusive by construction.
        if (useCompaction)
          throw new SchemaError(
            "a ReplacingMergeTree version column requires useCompaction(false): " +
              "compacted parent cells cannot be shadowed by a newer child version")
        columns.get(ver) match {
          case None =>
            throw new SchemaError(s"ReplacingMergeTree version column '$ver' not in schema")
          case Some(ColumnDef.Simple(_, nullable, _, _)) =>
            if (nullable)
              throw new SchemaError(
                s"ReplacingMergeTree version column '$ver' must be non-nullable " +
                  "(a NULL version has no place in the keep-latest order)")
          case Some(_) =>
            throw new SchemaError(
              s"ReplacingMergeTree version column '$ver' must be a simple column " +
                "(h3index and aggregated columns cannot carry the row version)")
        }
      case _ => ()
    }
    // partitioning derivability (`schema/mod.rs:252-271`)
    if (partitionBy.isEmpty && temporalPartitioning.isDefined && temporalColumns.length > 1)
      throw new SchemaError(
        s"more than one temporal column (${temporalColumns.mkString(", ")}) " +
          "requires an explicit partitionBy")
    partitionBy.foreach { p =>
      if (!columns.contains(p)) throw new SchemaError(s"partitionBy column '$p' not in schema")
    }
    h3Partitioning match {
      case H3Partitioning.LowerResolution(d) if d < 0 =>
        throw new SchemaError(s"LowerResolution difference must be >= 0: $d")
      case _ => ()
    }
    copy(baseResolutions = normalizedResolutions)
  }

  def toJson: String = SchemaJson.write(this)
}

object CompactedTableSchema {
  /** Mandatory H3 column name (`compacted_tables/mod.rs:35`). */
  val ColH3Index = "h3index"
  /** Reference regex `schema/mod.rs:138-149` (second char is any char). */
  val TableNameRegex = "^[a-zA-Z].[_a-zA-Z_0-9]+$".r

  def fromJson(json: String): CompactedTableSchema = SchemaJson.read(json)

  def builder(name: String): Builder = new Builder(name)

  /** Fluent builder mirroring the reference's `CompactedTableSchemaBuilder`
    * (`schema/mod.rs:404-491`; Python mirror `py schema.rs:87-345`). */
  final class Builder(name: String) {
    private var resolutions: Seq[Int] = Nil
    private var cols: ListMap[String, ColumnDef] = ListMap(ColH3Index -> ColumnDef.H3Index)
    private var engine: TableEngine = TableEngine.ReplacingMergeTree()
    private var compaction = true
    private var tempRes: TemporalResolution = TemporalResolution.Second
    private var tempPart: Option[TemporalPartitioning] = None
    private var h3Part: H3Partitioning = H3Partitioning.BaseCell
    private var partBy: Seq[String] = Nil
    private var codec: ColumnCodec = ColumnCodec.ZSTD(6)

    def h3BaseResolutions(rs: Seq[Int]): Builder = { resolutions = rs; this }
    def engine(e: TableEngine): Builder = { engine = e; this }
    def useCompaction(b: Boolean): Builder = { compaction = b; this }
    def temporalResolution(t: TemporalResolution): Builder = { tempRes = t; this }
    def temporalPartitioning(t: TemporalPartitioning): Builder = { tempPart = Some(t); this }
    def temporalPartitioning(spec: String): Builder =
      temporalPartitioning(TemporalPartitioning.parse(spec))
    def h3Partitioning(p: H3Partitioning): Builder = { h3Part = p; this }
    def partitionBy(cs: Seq[String]): Builder = { partBy = cs; this }
    def defaultCodec(c: ColumnCodec): Builder = { codec = c; this }
    def addColumn(name: String, c: ColumnDef): Builder = { cols += (name -> c); this }
    def addSimpleColumn(name: String, dt: GraftDataType, nullable: Boolean = false): Builder =
      addColumn(name, ColumnDef.Simple(dt, nullable))
    def addAggregatedColumn(name: String, dt: GraftDataType, agg: AggregationMethod,
        nullable: Boolean = false): Builder =
      addColumn(name, ColumnDef.WithAggregation(dt, agg, nullable))

    /** Validates eagerly; throws [[SchemaError]]. */
    def build(): CompactedTableSchema =
      CompactedTableSchema(name, resolutions, cols, engine, compaction, tempRes,
        tempPart, h3Part, partBy, codec).validated
  }
}

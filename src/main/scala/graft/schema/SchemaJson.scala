package graft.schema

import scala.collection.immutable.ListMap

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import com.fasterxml.jackson.databind.node.{ArrayNode, ObjectNode}

/** Explicit JSON (de)serialization of [[CompactedTableSchema]] — the
  * reference round-trips schemas through serde JSON
  * (`py schema.rs:39-48`, tested `tests/clickhouse/test_schema.py:19-32`).
  * Hand-written mapping (no reflection) so the wire format is stable. */
object SchemaJson {
  private val mapper = new ObjectMapper()

  def write(s: CompactedTableSchema): String = {
    val root = mapper.createObjectNode()
    root.put("name", s.name)
    val res = root.putArray("base_resolutions")
    s.baseResolutions.foreach(res.add)
    root.set[ObjectNode]("engine", engineNode(s.engine))
    root.put("use_compaction", s.useCompaction)
    root.put("temporal_resolution", s.temporalResolution match {
      case TemporalResolution.Second => "second"
      case TemporalResolution.Day => "day"
    })
    s.temporalPartitioning match {
      case Some(TemporalPartitioning.Months(n)) =>
        root.putObject("temporal_partitioning").put("unit", "months").put("n", n)
      case Some(TemporalPartitioning.Years(n)) =>
        root.putObject("temporal_partitioning").put("unit", "years").put("n", n)
      case None => root.putNull("temporal_partitioning")
    }
    s.h3Partitioning match {
      case H3Partitioning.BaseCell =>
        root.putObject("h3_partitioning").put("type", "basecell")
      case H3Partitioning.LowerResolution(d) =>
        root.putObject("h3_partitioning").put("type", "lower_resolution")
          .put("resolution_difference", d)
    }
    val pb = root.putArray("partition_by")
    s.partitionBy.foreach(pb.add)
    root.set[ObjectNode]("default_codec", codecNode(s.defaultCodec))
    val cols = root.putArray("columns")
    s.columns.foreach { case (name, c) =>
      val n = cols.addObject()
      n.put("name", name)
      c match {
        case ColumnDef.H3Index => n.put("kind", "h3index")
        case sc: ColumnDef.Simple =>
          n.put("kind", "simple")
          n.put("datatype", sc.dataType.name)
          n.put("nullable", sc.nullable)
          sc.orderKeyPosition.foreach(n.put("order_key_position", _))
          sc.codec.foreach(cd => n.set[ObjectNode]("codec", codecNode(cd)))
        case ac: ColumnDef.WithAggregation =>
          n.put("kind", "agg")
          n.put("datatype", ac.dataType.name)
          n.put("nullable", ac.nullable)
          n.put("agg", ac.agg.name)
          ac.orderKeyPosition.foreach(n.put("order_key_position", _))
          ac.codec.foreach(cd => n.set[ObjectNode]("codec", codecNode(cd)))
      }
    }
    mapper.writerWithDefaultPrettyPrinter().writeValueAsString(root)
  }

  private def engineNode(e: TableEngine): ObjectNode = {
    val n = mapper.createObjectNode()
    e match {
      case TableEngine.ReplacingMergeTree(ver) =>
        n.put("type", "ReplacingMergeTree")
        ver.foreach(n.put("version_column", _))
      case TableEngine.SummingMergeTree(cols) =>
        n.put("type", "SummingMergeTree")
        val a = n.putArray("sum_columns"); cols.foreach(a.add)
      case TableEngine.AggregatingMergeTree => n.put("type", "AggregatingMergeTree")
    }
    n
  }

  private def codecNode(c: ColumnCodec): ObjectNode = {
    val n = mapper.createObjectNode()
    c match {
      case ColumnCodec.ZSTD(l) => n.put("type", "zstd").put("level", l)
      case ColumnCodec.LZ4HC(l) => n.put("type", "lz4hc").put("level", l)
      case ColumnCodec.Delta(w) => n.put("type", "delta").put("width", w)
      case ColumnCodec.Gorilla => n.put("type", "gorilla")
      case ColumnCodec.T64 => n.put("type", "t64")
      case ColumnCodec.DoubleDelta => n.put("type", "doubledelta")
    }
    n
  }

  def read(json: String): CompactedTableSchema = {
    val root = mapper.readTree(json)
    def fail(msg: String) = throw new SchemaError(s"schema json: $msg")
    def req(n: JsonNode, f: String): JsonNode = {
      val v = n.get(f); if (v == null) fail(s"missing field '$f'"); v
    }
    val name = req(root, "name").asText()
    val resolutions = req(root, "base_resolutions") match {
      case a: ArrayNode => (0 until a.size()).map(a.get(_).asInt())
      case _ => fail("base_resolutions must be an array")
    }
    val engine = {
      val e = req(root, "engine")
      req(e, "type").asText() match {
        case "ReplacingMergeTree" =>
          TableEngine.ReplacingMergeTree(
            Option(e.get("version_column")).filterNot(_.isNull).map(_.asText()))
        case "AggregatingMergeTree" => TableEngine.AggregatingMergeTree
        case "SummingMergeTree" =>
          val a = req(e, "sum_columns").asInstanceOf[ArrayNode]
          TableEngine.SummingMergeTree((0 until a.size()).map(a.get(_).asText()))
        case other => fail(s"unknown engine: $other")
      }
    }
    val tempRes = req(root, "temporal_resolution").asText() match {
      case "second" => TemporalResolution.Second
      case "day" => TemporalResolution.Day
      case other => fail(s"unknown temporal resolution: $other")
    }
    val tempPart = root.get("temporal_partitioning") match {
      case null => None
      case n if n.isNull => None
      case n => req(n, "unit").asText() match {
        case "months" => Some(TemporalPartitioning.Months(req(n, "n").asInt()))
        case "years" => Some(TemporalPartitioning.Years(req(n, "n").asInt()))
        case other => fail(s"unknown temporal partitioning unit: $other")
      }
    }
    val h3Part = {
      val n = req(root, "h3_partitioning")
      req(n, "type").asText() match {
        case "basecell" => H3Partitioning.BaseCell
        case "lower_resolution" =>
          H3Partitioning.LowerResolution(req(n, "resolution_difference").asInt())
        case other => fail(s"unknown h3 partitioning: $other")
      }
    }
    val partBy = root.get("partition_by") match {
      case a: ArrayNode => (0 until a.size()).map(a.get(_).asText())
      case _ => Seq.empty[String]
    }
    def codecOf(n: JsonNode): ColumnCodec = req(n, "type").asText() match {
      case "zstd" => ColumnCodec.ZSTD(req(n, "level").asInt())
      case "lz4hc" => ColumnCodec.LZ4HC(req(n, "level").asInt())
      case "delta" => ColumnCodec.Delta(req(n, "width").asInt())
      case "gorilla" => ColumnCodec.Gorilla
      case "t64" => ColumnCodec.T64
      case "doubledelta" => ColumnCodec.DoubleDelta
      case other => fail(s"unknown codec: $other")
    }
    val defaultCodec = codecOf(req(root, "default_codec"))
    val colsArr = req(root, "columns").asInstanceOf[ArrayNode]
    var cols = ListMap.empty[String, ColumnDef]
    (0 until colsArr.size()).foreach { i =>
      val n = colsArr.get(i)
      val cname = req(n, "name").asText()
      val okp = Option(n.get("order_key_position")).filterNot(_.isNull).map(_.asInt())
      val codec = Option(n.get("codec")).filterNot(_.isNull).map(codecOf)
      val cdef: ColumnDef = req(n, "kind").asText() match {
        case "h3index" => ColumnDef.H3Index
        case "simple" =>
          ColumnDef.Simple(GraftDataType.fromName(req(n, "datatype").asText()),
            req(n, "nullable").asBoolean(), okp, codec)
        case "agg" =>
          ColumnDef.WithAggregation(GraftDataType.fromName(req(n, "datatype").asText()),
            AggregationMethod.fromName(req(n, "agg").asText()),
            req(n, "nullable").asBoolean(), okp, codec)
        case other => fail(s"unknown column kind: $other")
      }
      cols += (cname -> cdef)
    }
    CompactedTableSchema(name, resolutions, cols, engine,
      req(root, "use_compaction").asBoolean(), tempRes, tempPart, h3Part,
      partBy, defaultCodec).validated
  }
}

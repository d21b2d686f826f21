package graft.store

import java.nio.file.Files

import org.apache.hadoop.fs.Path
import org.apache.parquet.hadoop.ParquetFileReader
import org.apache.parquet.hadoop.util.HadoopInputFile
import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.SparkTestSession
import graft.h3.H3
import graft.schema.{AggregationMethod => Agg, ColumnCodec, GraftDataType => T, _}

/** The schema's declared codec must reach the parquet footers (the
  * reference's default is ZSTD(6); specialty ClickHouse codecs fall back
  * to snappy — documented loss). */
class CodecSpec extends AnyFunSuite with Matchers with SparkTestSession {

  private def writeStore(name: String, codec: Option[ColumnCodec]): String = {
    val root = Files.createTempDirectory("graft_codec_").toString
    val s = CellStore(spark, root)
    val cells = H3.toChildren(H3.fromParts(20, 5, Seq(0, 0, 0, 0, 0)), 7)
    val rows = cells.map(c => Row(c, 1L))
    val input = spark.createDataFrame(
      spark.sparkContext.parallelize(rows.toIndexedSeq, 2),
      StructType(Seq(
        StructField("h3index", LongType, false),
        StructField("v", LongType, false))))
    val b = CompactedTableSchema.builder(name)
      .h3BaseResolutions(Seq(7)).useCompaction(false)
      .addAggregatedColumn("v", T.Int64, Agg.Max)
    codec.foreach(b.defaultCodec)
    s.insert(name, input, createSchema = Some(b.build()))
    root
  }

  private def footerCodec(root: String, name: String): String = {
    def walk(f: java.io.File): Seq[java.io.File] = {
      val kids = Option(f.listFiles()).getOrElse(Array.empty).toSeq
      kids.filter(k => k.isFile && k.getName.endsWith(".parquet")) ++
        kids.filter(_.isDirectory).flatMap(walk)
    }
    val file = walk(new java.io.File(s"$root/$name/data")).head
    val rd = ParquetFileReader.open(HadoopInputFile.fromPath(
      new Path(file.getPath), spark.sessionState.newHadoopConf()))
    try rd.getFooter.getBlocks.get(0).getColumns.get(0).getCodec.toString
    finally rd.close()
  }

  test("default schema codec ZSTD(6) lands as parquet zstd") {
    val root = writeStore("codec_default", None)
    footerCodec(root, "codec_default") shouldBe "ZSTD"
  }

  test("a ClickHouse specialty codec falls back to snappy") {
    val root = writeStore("codec_gorilla", Some(ColumnCodec.Gorilla))
    footerCodec(root, "codec_gorilla") shouldBe "SNAPPY"
  }
}

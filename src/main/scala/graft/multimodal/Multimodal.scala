package graft.multimodal

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/**
 * Multimodal column support for training-data pipelines: image/audio/video
 * payloads ride as opaque `binary` columns with a typed metadata struct,
 * processed per-partition (never collected to the driver).
 *
 * The actual byte decoding (JPEG/PNG/WAV codecs) is STUBBED — the container
 * has no imaging libraries — with a clearly-marked deterministic fake
 * ([[decodeStub]]). Everything around the stub is real and tested: the
 * schema convention, the mapPartitions batch shape, partition-preserving
 * feature extraction, deterministic resize/frame-sampling on raw bytes.
 *
 * Scale notes: all operators here are narrow (no shuffle); binary payloads
 * stream through the vectorized parquet reader partition-by-partition. At
 * 100 TB the only knob that matters is `spark.sql.files.maxPartitionBytes`
 * to bound per-task payload memory; nothing in this module accumulates
 * unbounded state.
 */
object Multimodal {

  /** Metadata struct convention for media columns. */
  val mediaMetaType: StructType = StructType(Seq(
    StructField("mime", StringType, nullable = false),
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false),
    StructField("channels", IntegerType, nullable = false)))

  /** Build a demo media table from the documents table: payload = UTF-8
    * bytes of the text (a deterministic opaque blob), mime by doc_id. */
  def synthesizeMediaTable(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id"),
      encode(col("text"), "UTF-8").as("content"),
      element_at(array(lit("image/png"), lit("image/jpeg"), lit("audio/wav")),
        (pmod(col("doc_id"), lit(3)) + 1).cast("int")).as("mime"))

  /**
   * STUB decode — deterministic fake. A real implementation decodes the
   * codec headers (e.g. javax.imageio / libjpeg via JNI); this fake derives
   * plausible metadata purely from payload length so pipelines are testable
   * offline:
   *   width = 16 + len mod 64, height = 16 + (len/64) mod 64,
   *   channels = 1 + len mod 3.
   */
  def decodeStub(content: Column, mime: Column): Column = {
    val len = length(content)
    struct(
      mime.as("mime"),
      (lit(16) + pmod(len, lit(64))).cast("int").as("width"),
      (lit(16) + pmod(len.cast("long") / 64, lit(64))).cast("int").as("height"),
      (lit(1) + pmod(len, lit(3))).cast("int").as("channels"))
  }

  /** Byte-histogram feature vector (16 buckets, L1-normalized) extracted
    * per partition — the real plumbing a CNN/CLIP featurizer would use
    * (iterator-in/iterator-out, no driver round-trip, no UDF serialization
    * of whole rows). */
  def withByteHistogram(df: DataFrame, binaryCol: String, bins: Int = 16): DataFrame = {
    val schema = df.schema.add(StructField("features", ArrayType(FloatType, containsNull = false)))
    val binIdx = df.schema.fieldIndex(binaryCol)
    val rdd = df.rdd.mapPartitions { it =>
      it.map { row =>
        val bytes = row.getAs[Array[Byte]](binIdx)
        val hist = new Array[Float](bins)
        if (bytes != null && bytes.length > 0) {
          var i = 0
          while (i < bytes.length) {
            hist(((bytes(i) & 0xFF) * bins) / 256) += 1f
            i += 1
          }
          var b = 0
          while (b < bins) { hist(b) /= bytes.length; b += 1 }
        }
        Row.fromSeq(row.toSeq :+ hist.toSeq)
      }
    }
    df.sparkSession.createDataFrame(rdd, schema)
  }

  /** 64-bit average-hash ("aHash") perceptual signature over the payload
    * bytes, as two 32-bit halves (`ahash_hi` = blocks 32..63, `ahash_lo` =
    * blocks 0..31) so engines without unsigned 64-bit arithmetic stay
    * exact. The payload is cut into 64 byte blocks (byte i belongs to
    * block i*64/len); bit b is set iff block b's mean byte value strictly
    * exceeds the whole-payload mean, compared in INTEGERS
    * (blockSum * len > totalSum * blockCount) so no float rounding can
    * diverge between engines. A real pHash would DCT the decoded pixels;
    * over the stub decode the block-mean signature exercises the same
    * pipeline shape — narrow, partition-local, no shuffle, no driver
    * round-trip — and feeds the same banded Hamming join downstream. */
  def withAverageHash(df: DataFrame, binaryCol: String): DataFrame = {
    val schema = df.schema
      .add(StructField("ahash_hi", LongType, nullable = false))
      .add(StructField("ahash_lo", LongType, nullable = false))
    val binIdx = df.schema.fieldIndex(binaryCol)
    val rdd = df.rdd.mapPartitions { it =>
      it.map { row =>
        val bytes = row.getAs[Array[Byte]](binIdx)
        var hi = 0L
        var lo = 0L
        if (bytes != null && bytes.length > 0) {
          val n = bytes.length
          val sums = new Array[Long](64)
          val cnts = new Array[Long](64)
          var total = 0L
          var i = 0
          while (i < n) {
            val b = ((i.toLong * 64) / n).toInt
            val v = (bytes(i) & 0xFF).toLong
            sums(b) += v; cnts(b) += 1; total += v
            i += 1
          }
          var blk = 0
          while (blk < 64) {
            if (sums(blk) * n > total * cnts(blk)) {
              if (blk < 32) lo |= 1L << blk else hi |= 1L << (blk - 32)
            }
            blk += 1
          }
        }
        Row.fromSeq(row.toSeq :+ hi :+ lo)
      }
    }
    df.sparkSession.createDataFrame(rdd, schema)
  }

  /** Deterministic byte "resize": keep every ceil(len/target)-th byte so the
    * payload shrinks to <= target bytes (stand-in for image rescale). */
  def resizeStub(content: Column, targetBytes: Int): Column = {
    val len = length(content)
    val step = greatest(ceil(len.cast("double") / targetBytes).cast("int"), lit(1))
    // positions 1, 1+step, 1+2*step ... (substr is 1-based on binary too)
    aggregate(
      sequence(lit(1), len, step),
      lit(Array.emptyByteArray),
      (acc, i) => concat(acc, content.substr(i, lit(1))))
  }

  /** Frame sampling stub: split the payload into `numFrames` equal chunks
    * ("frames") and emit every `stride`-th one as (frame_idx, frame_bytes). */
  def sampleFrames(df: DataFrame, binaryCol: String, numFrames: Int, stride: Int): DataFrame = {
    val len = length(col(binaryCol))
    val frameLen = greatest((len / numFrames).cast("int"), lit(1))
    val frames = transform(
      filter(sequence(lit(0), lit(numFrames - 1)), i => pmod(i, lit(stride)) === 0),
      i => struct(i.cast("int").as("frame_idx"),
        col(binaryCol).substr(i * frameLen + 1, frameLen).as("frame_bytes")))
    df.withColumn("frame", explode(frames))
      .withColumn("frame_idx", col("frame.frame_idx"))
      .withColumn("frame_bytes", col("frame.frame_bytes"))
      .drop("frame")
  }
}

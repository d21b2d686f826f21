package graft.multimodal

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/**
 * Multimodal column support for training-data pipelines: image/audio
 * payloads ride as opaque `binary` columns and are decoded with REAL
 * JDK-built-in codecs — `javax.imageio` (PNG, BMP) for images and
 * `javax.sound.sampled` (PCM WAV) for audio. No external jars: both live in
 * the `java.desktop` module every JDK ships. The one genuinely absent codec
 * family offline is compressed VIDEO (H.264/VP9 need native libs); the
 * video-shaped operator (frame sampling) therefore runs over decoded image
 * pixel-row bands, which exercises the identical plumbing — binary in,
 * per-frame slices out, nothing ever collected to the driver.
 *
 * Fixtures are deterministic synthetic media: a seeded integer pixel
 * lattice ([[pixelValue]]) encoded THROUGH the real codec, so a decode gate
 * is a true roundtrip — the DuckDB oracle recomputes the lattice
 * relationally, and only a correct encoder+decoder pair can reproduce it
 * (the d33 pattern: exact integer inputs on both sides). A third,
 * pure-Python PNG/BMP/WAV reader cross-checks the actual encoded bytes in
 * tools/independent_check.py.
 *
 * Scale notes: synthesis and decode are narrow mapPartitions passes (no
 * shuffle); payloads stream through the vectorized parquet reader
 * partition-by-partition and NEVER transit a shuffle or the driver. At
 * 100 TB the only knob is `spark.sql.files.maxPartitionBytes` to bound
 * per-task payload memory; decoded pixel arrays live only inside the
 * featurizer task. ImageIO's stream disk-cache is disabled (byte-array
 * streams; a shared temp-dir cache would serialize 32 executor threads).
 */
object Multimodal {
  ImageIOInit.ensure()

  // ---------------------------------------------------------------------
  // Deterministic fixture geometry (mirrored in the DuckDB oracles and in
  // tools/independent_check.py — all integer arithmetic):
  //   group = doc_id / 3, copy = doc_id % 3   (groups of 3 for near-dup)
  //   w = 8 + group % 9, h = 8 + (group / 9) % 9
  //   format by group % 3: 0 -> PNG gray (1 channel), 1 -> PNG RGB,
  //                        2 -> BMP RGB (3 channels)
  //   sample i (row-major, channel-minor: i = (y*w + x)*c + ch):
  //     v = (group*131 + i*31 + (i*i mod 251)*5 + perturb) mod 256
  //     perturb = 40 iff copy == 2 and i mod 7 == 0 (third copy is a
  //     NEAR-duplicate; copies 0 and 1 are exact duplicates)
  // ---------------------------------------------------------------------

  def imgGroup(docId: Long): Long = docId / 3
  def imgWidth(group: Long): Int = (8 + group % 9).toInt
  def imgHeight(group: Long): Int = (8 + (group / 9) % 9).toInt
  def imgChannels(group: Long): Int = if (group % 3 == 0) 1 else 3
  def imgMime(group: Long): String =
    if (group % 3 == 2) "image/bmp" else "image/png"

  /** The lattice: sample value at flat index i for document docId. */
  def pixelValue(docId: Long, i: Int): Int = {
    val group = imgGroup(docId)
    val perturb = if (docId % 3 == 2 && i % 7 == 0) 40L else 0L
    ((group * 131L + i * 31L + (i.toLong * i % 251L) * 5L + perturb) % 256L).toInt
  }

  /** Deterministic audio fixture: unsigned 8-bit PCM at 8000 Hz, with the
    * image fixture's planted-copy geometry so the AUDIO modality carries
    * its own near-duplicate structure (m8/m6) — groups of FOUR (vs the
    * image fixture's three) so audio evidence crosses image-group
    * boundaries and can merge clusters the other modalities keep apart:
    *   group = doc_id / 4, copy = doc_id % 4
    *   channels = 1 + group % 2, frames = 64 + (group*7) % 129
    *   sample u (interleaved, u = frame*channels + ch, N = frames*channels):
    *     s = (group*173 + u*37 + (u*u mod 127)*3 + perturb) mod 256
    *   copies 0,1: perturb 0  — byte-identical WAVs (exact duplicates)
    *   copy 2: perturb 40 iff u*64/N == 0 — only the FIRST of the 64
    *     signature windows is touched, so few aHash bits flip (NEAR-dup)
    *   copy 3: perturb 80 iff u >= N/2 — the whole second half shifts, so
    *     roughly half the signature flips (FAR: outside the hamming<=3 cut)
    */
  val AudioRate = 8000
  def audioGroup(docId: Long): Long = docId / 4
  def audioChannels(docId: Long): Int = (1 + audioGroup(docId) % 2).toInt
  def audioFrames(docId: Long): Int = (64 + (audioGroup(docId) * 7) % 129).toInt
  def audioSample(docId: Long, u: Int): Int = {
    val n = audioFrames(docId) * audioChannels(docId)
    val perturb = (docId % 4) match {
      case 2 if u * 64 / n == 0 => 40L
      case 3 if u >= n / 2      => 80L
      case _                    => 0L
    }
    ((audioGroup(docId) * 173L + u * 37L + (u.toLong * u % 127L) * 3L
      + perturb) % 256L).toInt
  }

  /** Build the media table — REAL encoded image bytes per document:
    * (doc_id, mime, content). The pixel lattice is generated, loaded into a
    * BufferedImage, and pushed through the real `javax.imageio` encoder in
    * a partition-local pass (pure function of doc_id — partitioning cannot
    * change the bytes' meaning, though PNG/BMP byte streams themselves are
    * only decoder-canonical, which is why no gate ever hashes the ENCODED
    * bytes: gates hash decoded samples). */
  def synthesizeImageTable(docs: DataFrame): DataFrame = {
    val schema = StructType(Seq(
      StructField("doc_id", LongType, nullable = false),
      StructField("mime", StringType, nullable = false),
      StructField("content", BinaryType, nullable = false)))
    val rdd = docs.select(col("doc_id")).rdd.mapPartitions { it =>
      ImageIOInit.ensure() // executor-local too, not just the driver JVM
      it.map { r =>
        val id = r.getLong(0)
        Row(id, imgMime(imgGroup(id)), encodeImage(id))
      }
    }
    docs.sparkSession.createDataFrame(rdd, schema)
  }

  /** Generate + encode one document's image (executor-side). */
  private def encodeImage(docId: Long): Array[Byte] = {
    val group = imgGroup(docId)
    val (w, h, c) = (imgWidth(group), imgHeight(group), imgChannels(group))
    val imgType = if (c == 1) java.awt.image.BufferedImage.TYPE_BYTE_GRAY
                  else java.awt.image.BufferedImage.TYPE_3BYTE_BGR
    val img = new java.awt.image.BufferedImage(w, h, imgType)
    val raster = img.getRaster
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        var ch = 0
        while (ch < c) {
          raster.setSample(x, y, ch, pixelValue(docId, (y * w + x) * c + ch))
          ch += 1
        }
        x += 1
      }
      y += 1
    }
    // direct SPI writer + Disposer-free stream: ImageIO.write would walk
    // the writer registry AND construct a MemoryCacheImageOutputStream
    // (one JVM-global Disposer lock acquisition) per encoded document
    val writer = (if (imgMime(group) == "image/bmp") bmpWriterSpi
                  else pngWriterSpi).createWriterInstance()
    val ios = new ByteArrayImageOutputStream
    writer.setOutput(ios)
    writer.write(img)
    writer.dispose()
    ios.toByteArray
  }

  /** REAL image decode: `javax.imageio.ImageIO.read` over the binary
    * column, emitting decoded width/height/channels, the full sample array
    * (row-major, channel-minor — the layout every downstream featurizer
    * indexes), and a 16-bin sample-value histogram (bin = v/16) computed in
    * the same partition-local pass. Raster samples are read back through
    * `Raster.getSample` (logical band order, R=0/G=1/B=2), NOT
    * `getRGB` — the gray->sRGB ColorModel conversion in getRGB is lossy for
    * TYPE_BYTE_GRAY. Narrow pass: iterator-in/iterator-out, no shuffle, no
    * driver round-trip; decoded arrays exist only inside the task. */
  def decodeImage(df: DataFrame, binaryCol: String): DataFrame = {
    val schema = df.schema
      .add(StructField("width", IntegerType, nullable = false))
      .add(StructField("height", IntegerType, nullable = false))
      .add(StructField("channels", IntegerType, nullable = false))
      .add(StructField("px", ArrayType(IntegerType, containsNull = false), nullable = false))
      .add(StructField("hist", ArrayType(LongType, containsNull = false), nullable = false))
    val binIdx = df.schema.fieldIndex(binaryCol)
    val rdd = df.rdd.mapPartitions { it =>
      ImageIOInit.ensure() // executor-local too, not just the driver JVM
      it.map { row =>
        val bytes = row.getAs[Array[Byte]](binIdx)
        val img = readStill(bytes)
        val (w, h) = (img.getWidth, img.getHeight)
        val raster = img.getRaster
        val c = raster.getNumBands
        val px = new Array[Int](w * h * c)
        val hist = new Array[Long](16)
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            var ch = 0
            while (ch < c) {
              val v = raster.getSample(x, y, ch)
              px((y * w + x) * c + ch) = v
              hist(v / 16) += 1L
              ch += 1
            }
            x += 1
          }
          y += 1
        }
        Row.fromSeq(row.toSeq :+ w :+ h :+ c :+ px.toSeq :+ hist.toSeq)
      }
    }
    df.sparkSession.createDataFrame(rdd, schema)
  }

  /** Per-frame integer checksums emitted FROM the image decode pass — m2's
    * operator shape with the re-walk removed: "frames" are `nBands`
    * horizontal row bands of the decoded image, every `every`-th kept, and
    * each kept frame's (pixel count, sample sum, position-weighted sum) is
    * computed straight off the decoded Raster inside the same
    * mapPartitions task. The round-9 form materialized the full px array
    * into Rows and re-walked it with interpreted `aggregate`/`zip_with`
    * lambdas — the repo's own A/B puts interpreted HOFs at ~10x a codegen'd
    * or JVM-loop form, and m2's 17.0 s at 300x was attributed to exactly
    * that. Here pixel arrays never become Rows at all; skipped bands are
    * never even read. flatMap: one input row -> one row per kept frame
    * (doc_id, frame_idx, frame_px, frame_sum, frame_wsum). */
  def imageFrameChecksums(df: DataFrame, binaryCol: String,
      nBands: Int = 8, every: Int = 3): DataFrame = {
    val schema = StructType(Seq(
      StructField("doc_id", LongType, nullable = false),
      StructField("frame_idx", IntegerType, nullable = false),
      StructField("frame_px", IntegerType, nullable = false),
      StructField("frame_sum", LongType, nullable = false),
      StructField("frame_wsum", LongType, nullable = false)))
    val binIdx = df.schema.fieldIndex(binaryCol)
    val idIdx = df.schema.fieldIndex("doc_id")
    val rdd = df.rdd.mapPartitions { it =>
      ImageIOInit.ensure()
      it.flatMap { row =>
        val docId = row.getLong(idIdx)
        val bytes = row.getAs[Array[Byte]](binIdx)
        val img = readStill(bytes)
        val (w, h) = (img.getWidth, img.getHeight)
        val raster = img.getRaster
        val c = raster.getNumBands
        (0 until nBands).iterator.filter(_ % every == 0).map { k =>
          val lo = k * h / nBands
          val hi = (k + 1) * h / nBands
          var sum = 0L
          var wsum = 0L
          var j = 1L // 1-based position within the frame
          var y = lo
          while (y < hi) {
            var x = 0
            while (x < w) {
              var ch = 0
              while (ch < c) {
                val v = raster.getSample(x, y, ch).toLong
                sum += v; wsum += v * j; j += 1
                ch += 1
              }
              x += 1
            }
            y += 1
          }
          Row(docId, k, (hi - lo) * w * c, sum, wsum)
        }
      }
    }
    df.sparkSession.createDataFrame(rdd, schema)
  }

  /** 64-bit average-hash over REAL decoded pixels, as two 32-bit halves
    * (`ahash_hi` = blocks 32..63) so engines without unsigned 64-bit math
    * stay exact. Classic aHash geometry: gray = integer BT.601 luma
    * ((299R + 587G + 114B)/1000; identity for 1-channel), the image cut
    * into an 8x8 block grid (block of (x,y) = (y*8/h)*8 + x*8/w), bit b set
    * iff block b's mean luma strictly exceeds the whole-image mean,
    * compared in INTEGERS (blockSum * w*h > totalSum * blockCount) so no
    * float rounding can diverge between engines. Narrow, partition-local,
    * no shuffle — the banded Hamming join downstream shuffles only
    * (band, bucket, id, two longs), never pixels. Expects [[decodeImage]]'s
    * px/width/height/channels columns. */
  def withImageAHash(df: DataFrame): DataFrame = {
    val schema = df.schema
      .add(StructField("ahash_hi", LongType, nullable = false))
      .add(StructField("ahash_lo", LongType, nullable = false))
    val (wi, hi_, ci, pi) = (df.schema.fieldIndex("width"),
      df.schema.fieldIndex("height"), df.schema.fieldIndex("channels"),
      df.schema.fieldIndex("px"))
    val rdd = df.rdd.mapPartitions { it =>
      it.map { row =>
        val w = row.getInt(wi); val h = row.getInt(hi_); val c = row.getInt(ci)
        val px = row.getAs[scala.collection.Seq[Int]](pi)
        val sums = new Array[Long](64)
        val cnts = new Array[Long](64)
        var total = 0L
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            val base = (y * w + x) * c
            val g = if (c == 1) px(base).toLong
              else (299L * px(base) + 587L * px(base + 1) + 114L * px(base + 2)) / 1000L
            val blk = (y * 8 / h) * 8 + (x * 8 / w)
            sums(blk) += g; cnts(blk) += 1; total += g
            x += 1
          }
          y += 1
        }
        val n = w.toLong * h
        var hi = 0L; var lo = 0L; var blk = 0
        while (blk < 64) {
          if (cnts(blk) > 0 && sums(blk) * n > total * cnts(blk)) {
            if (blk < 32) lo |= 1L << blk else hi |= 1L << (blk - 32)
          }
          blk += 1
        }
        Row.fromSeq(row.toSeq :+ hi :+ lo)
      }
    }
    df.sparkSession.createDataFrame(rdd, schema)
  }

  // ---------------------------------------------------------------------
  // Animated GIF fixture (m7) — TRUE multi-frame container decode: a real
  // container with a per-frame LZW-compressed raster AND per-frame timing
  // (GraphicControlExtension delay), written and read through the JDK's
  // built-in GIF codec. This is the video-shaped operator promoted from
  // m2's pixel-row bands to an actual frame sequence; the remaining
  // genuinely-absent codec family narrows to INTER-FRAME-compressed video
  // (H.264/VP9 — native libs). Geometry (mirrored in the DuckDB oracle
  // and tools/independent_check.py, all integer arithmetic):
  //   frames  n = 2 + doc_id % 4
  //   w = 8 + doc_id % 7, h = 8 + (doc_id / 7) % 7   (1 channel: gray)
  //   delay of frame f (centiseconds) = 4 + (doc_id + f) % 10
  //   sample i (= y*w + x) of frame f:
  //     v = (doc_id*101 + f*61 + i*31 + (i*i mod 251)*5) mod 256
  // Pixels are PALETTE INDICES into an identity grayscale palette
  // (entry i = (i,i,i)), so the LZW roundtrip is lossless; decode reads
  // the COLOR (IndexColorModel.getRed), not the raw index, so a
  // palette-permuting encoder could not silently break the lattice.
  // ---------------------------------------------------------------------

  def gifFrames(docId: Long): Int = (2 + docId % 4).toInt
  def gifWidth(docId: Long): Int = (8 + docId % 7).toInt
  def gifHeight(docId: Long): Int = (8 + (docId / 7) % 7).toInt
  def gifDelayCs(docId: Long, f: Int): Int = (4 + (docId + f) % 10).toInt
  def gifPixel(docId: Long, f: Int, i: Int): Int =
    ((docId * 101L + f * 61L + i * 31L + (i.toLong * i % 251L) * 5L) % 256L).toInt

  /** Identity grayscale palette: index i -> (i, i, i). */
  private lazy val grayPalette: java.awt.image.IndexColorModel = {
    val g = Array.tabulate(256)(_.toByte)
    new java.awt.image.IndexColorModel(8, 256, g, g, g)
  }

  /** GIF writer/reader SPIs resolved ONCE per JVM (the m4 lesson: per-row
    * registry walks convoy 32 executor threads on shared registry state;
    * SPI instances are stateless factories — createWriterInstance /
    * createReaderInstance per row is lock-free). */
  private lazy val gifWriterSpi: javax.imageio.spi.ImageWriterSpi = {
    val it = javax.imageio.ImageIO.getImageWritersByFormatName("gif")
    require(it.hasNext, "no GIF ImageWriter on this JVM")
    it.next().getOriginatingProvider
  }
  private lazy val gifReaderSpi: javax.imageio.spi.ImageReaderSpi = {
    val it = javax.imageio.ImageIO.getImageReadersByFormatName("gif")
    require(it.hasNext, "no GIF ImageReader on this JVM")
    it.next().getOriginatingProvider
  }
  private lazy val pngReaderSpi: javax.imageio.spi.ImageReaderSpi = {
    val it = javax.imageio.ImageIO.getImageReadersByFormatName("png")
    require(it.hasNext, "no PNG ImageReader on this JVM")
    it.next().getOriginatingProvider
  }
  private lazy val bmpReaderSpi: javax.imageio.spi.ImageReaderSpi = {
    val it = javax.imageio.ImageIO.getImageReadersByFormatName("bmp")
    require(it.hasNext, "no BMP ImageReader on this JVM")
    it.next().getOriginatingProvider
  }
  private lazy val pngWriterSpi: javax.imageio.spi.ImageWriterSpi = {
    val it = javax.imageio.ImageIO.getImageWritersByFormatName("png")
    require(it.hasNext, "no PNG ImageWriter on this JVM")
    it.next().getOriginatingProvider
  }
  private lazy val bmpWriterSpi: javax.imageio.spi.ImageWriterSpi = {
    val it = javax.imageio.ImageIO.getImageWritersByFormatName("bmp")
    require(it.hasNext, "no BMP ImageWriter on this JVM")
    it.next().getOriginatingProvider
  }

  /** Decode one still image (PNG or BMP, sniffed by magic) through a
    * per-JVM SPI reader and a Disposer-free input stream — the lock-free
    * replacement for `ImageIO.read(InputStream)`, which walks the reader
    * registry AND takes the JVM-global Disposer monitor once per call
    * (the m9 decode convoy; see [[ByteArrayImageInputStream]]). */
  private def readStill(bytes: Array[Byte]): java.awt.image.BufferedImage = {
    val spi =
      if (bytes.length > 1 && bytes(0) == 0x89.toByte && bytes(1) == 'P'.toByte)
        pngReaderSpi
      else if (bytes.length > 1 && bytes(0) == 'B'.toByte && bytes(1) == 'M'.toByte)
        bmpReaderSpi
      else sys.error("readStill: payload is neither PNG nor BMP by magic")
    val iis = new ByteArrayImageInputStream(bytes)
    val reader = spi.createReaderInstance()
    try {
      reader.setInput(iis, true, true)
      reader.read(0)
    } finally { reader.dispose(); iis.close() }
  }

  /** Build the animated-GIF table: (doc_id, mime, content) with REAL
    * multi-frame GIF bytes per document (narrow pass, same shape as
    * [[synthesizeImageTable]]). */
  def synthesizeGifTable(docs: DataFrame): DataFrame = {
    val schema = StructType(Seq(
      StructField("doc_id", LongType, nullable = false),
      StructField("mime", StringType, nullable = false),
      StructField("content", BinaryType, nullable = false)))
    val rdd = docs.select(col("doc_id")).rdd.mapPartitions { it =>
      ImageIOInit.ensure()
      it.map { r =>
        val id = r.getLong(0)
        Row(id, "image/gif", encodeGif(id))
      }
    }
    docs.sparkSession.createDataFrame(rdd, schema)
  }

  /** Encode one document's frame sequence through the real GIF writer:
    * prepareWriteSequence / writeToSequence with a per-frame
    * GraphicControlExtension carrying the fixture delay. */
  private def encodeGif(docId: Long): Array[Byte] = {
    val (w, h, n) = (gifWidth(docId), gifHeight(docId), gifFrames(docId))
    val ios = new ByteArrayImageOutputStream
    val writer = gifWriterSpi.createWriterInstance()
    writer.setOutput(ios)
    writer.prepareWriteSequence(null)
    var f = 0
    while (f < n) {
      val img = new java.awt.image.BufferedImage(
        w, h, java.awt.image.BufferedImage.TYPE_BYTE_INDEXED, grayPalette)
      val raster = img.getRaster
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          raster.setSample(x, y, 0, gifPixel(docId, f, y * w + x))
          x += 1
        }
        y += 1
      }
      val meta = writer.getDefaultImageMetadata(
        new javax.imageio.ImageTypeSpecifier(img), null)
      val fmt = meta.getNativeMetadataFormatName // javax_imageio_gif_image_1.0
      val root = meta.getAsTree(fmt)
        .asInstanceOf[javax.imageio.metadata.IIOMetadataNode]
      // drop any default GraphicControlExtension, then append ours (the
      // native format allows at most one); pin interlace OFF — the JDK
      // writer interlaces by default, and sequential row order is what the
      // pure-Python checker and the lattice position-weighting assume
      var child = root.getFirstChild
      while (child != null) {
        val next = child.getNextSibling
        if (child.getNodeName == "GraphicControlExtension") root.removeChild(child)
        if (child.getNodeName == "ImageDescriptor")
          child.asInstanceOf[javax.imageio.metadata.IIOMetadataNode]
            .setAttribute("interlaceFlag", "FALSE")
        child = next
      }
      val gce = new javax.imageio.metadata.IIOMetadataNode("GraphicControlExtension")
      gce.setAttribute("disposalMethod", "none")
      gce.setAttribute("userInputFlag", "FALSE")
      gce.setAttribute("transparentColorFlag", "FALSE")
      gce.setAttribute("delayTime", gifDelayCs(docId, f).toString)
      gce.setAttribute("transparentColorIndex", "0")
      root.appendChild(gce)
      meta.setFromTree(fmt, root)
      writer.writeToSequence(new javax.imageio.IIOImage(img, null, meta), null)
      f += 1
    }
    writer.endWriteSequence()
    writer.dispose()
    val out = ios.toByteArray
    ios.close()
    out
  }

  /** REAL multi-frame container decode: `ImageReader.getNumImages` +
    * per-frame `read(i)` + per-frame metadata (the GraphicControlExtension
    * delay) — the operator a video-ingest pipeline runs per payload. One
    * input row -> one row per frame with integer checksums computed in the
    * same decode loop ([[imageFrameChecksums]]'s fused shape): frame pixel
    * count, gray-value sum, and a position-weighted sum pinning sample
    * order. Gray values are read through the frame's OWN IndexColorModel
    * (palette -> color), so the check survives any index permutation the
    * encoder might choose. Narrow pass; frames never leave the task. */
  def decodeGifFrames(df: DataFrame, binaryCol: String): DataFrame = {
    val schema = StructType(Seq(
      StructField("doc_id", LongType, nullable = false),
      StructField("n_frames", IntegerType, nullable = false),
      StructField("frame_idx", IntegerType, nullable = false),
      StructField("width", IntegerType, nullable = false),
      StructField("height", IntegerType, nullable = false),
      StructField("delay_cs", IntegerType, nullable = false),
      StructField("frame_sum", LongType, nullable = false),
      StructField("frame_wsum", LongType, nullable = false)))
    val binIdx = df.schema.fieldIndex(binaryCol)
    val idIdx = df.schema.fieldIndex("doc_id")
    val rdd = df.rdd.mapPartitions { it =>
      ImageIOInit.ensure()
      it.flatMap { row =>
        val docId = row.getLong(idIdx)
        val bytes = row.getAs[Array[Byte]](binIdx)
        val iis = new ByteArrayImageInputStream(bytes)
        val reader = gifReaderSpi.createReaderInstance()
        reader.setInput(iis)
        val n = reader.getNumImages(true)
        val out = (0 until n).map { f =>
          val img = reader.read(f)
          val icm = img.getColorModel match {
            case m: java.awt.image.IndexColorModel => m
            case m => sys.error(s"GIF frame decoded to non-indexed model $m")
          }
          val (w, h) = (img.getWidth, img.getHeight)
          val raster = img.getRaster
          var sum = 0L
          var wsum = 0L
          var j = 1L
          var y = 0
          while (y < h) {
            var x = 0
            while (x < w) {
              val v = icm.getRed(raster.getSample(x, y, 0)).toLong
              sum += v; wsum += v * j; j += 1
              x += 1
            }
            y += 1
          }
          val tree = reader.getImageMetadata(f)
            .getAsTree("javax_imageio_gif_image_1.0")
          var delay = -1
          var node = tree.getFirstChild
          while (node != null) {
            if (node.getNodeName == "GraphicControlExtension")
              delay = node.getAttributes.getNamedItem("delayTime")
                .getNodeValue.toInt
            node = node.getNextSibling
          }
          require(delay >= 0, s"GIF frame $f of doc $docId carries no " +
            "GraphicControlExtension delay")
          Row(docId, n, f, w, h, delay, sum, wsum)
        }
        reader.dispose()
        out
      }
    }
    df.sparkSession.createDataFrame(rdd, schema)
  }

  // ---------------------------------------------------------------------
  // Multi-page TIFF fixture (m9) — the SECOND true multi-frame container
  // family: a real TIFF with one IFD (directory entry) per page, each IFD
  // carrying its OWN geometry, pixel data ZLib(deflate)-compressed. The
  // DECODE — the operator a media pipeline actually runs per payload —
  // goes through the JDK's built-in TIFF plugin (ImageIO, JDK 9+); the
  // fixture ENCODE is a hand-written baseline container (see encodeTiff
  // for the measured reason). Geometry (mirrored in the DuckDB oracle and
  // tools/independent_check.py, all integer arithmetic):
  //   pages   n = 2 + doc_id % 3
  //   page p: w = 8 + (doc_id + 5*p) % 7, h = 8 + (doc_id / 7 + 3*p) % 7
  //     (PER-PAGE dims: a decoder that walks the IFD chain but reuses
  //     page 0's geometry cannot hash-match)
  //   sample i (= y*w + x) of page p:
  //     v = (doc_id*97 + p*53 + i*31 + (i*i mod 251)*5) mod 256
  // Gray 8-bit (PhotometricInterpretation BlackIsZero) — the roundtrip is
  // lossless by construction (deflate); JPEG-in-TIFF is deliberately NOT
  // used (lossy IDCT breaks bit-exact oracles).
  // ---------------------------------------------------------------------

  def tiffPages(docId: Long): Int = (2 + docId % 3).toInt
  def tiffWidth(docId: Long, p: Int): Int = (8 + (docId + 5L * p) % 7).toInt
  def tiffHeight(docId: Long, p: Int): Int =
    (8 + (docId / 7 + 3L * p) % 7).toInt
  def tiffPixel(docId: Long, p: Int, i: Int): Int =
    ((docId * 97L + p * 53L + i * 31L + (i.toLong * i % 251L) * 5L) % 256L).toInt

  /** TIFF reader SPI resolved ONCE per JVM (the m4/m7 convoy lesson:
    * registry walks serialize executor threads; SPI instances are
    * stateless factories). The ENCODER is hand-written ([[encodeTiff]]) —
    * no writer SPI needed. */
  private lazy val tiffReaderSpi: javax.imageio.spi.ImageReaderSpi = {
    val it = javax.imageio.ImageIO.getImageReadersByFormatName("tiff")
    require(it.hasNext, "no TIFF ImageReader on this JVM (JDK 9+ ships one)")
    it.next().getOriginatingProvider
  }

  /** Build the multi-page TIFF table: (doc_id, mime, content) with
    * standard baseline multi-IFD TIFF bytes per document (narrow pass;
    * hand-written container, real-JDK-decoded — see [[encodeTiff]]). */
  def synthesizeTiffTable(docs: DataFrame): DataFrame = {
    val schema = StructType(Seq(
      StructField("doc_id", LongType, nullable = false),
      StructField("mime", StringType, nullable = false),
      StructField("content", BinaryType, nullable = false)))
    val rdd = docs.select(col("doc_id")).rdd.mapPartitions { it =>
      ImageIOInit.ensure()
      it.map { r =>
        val id = r.getLong(0)
        Row(id, "image/tiff", encodeTiff(id))
      }
    }
    docs.sparkSession.createDataFrame(rdd, schema)
  }

  /** Encode one document's page sequence as a baseline multi-IFD TIFF —
    * HAND-WRITTEN container bytes (little-endian header, one IFD per page
    * with its own geometry, one ZLib/deflate strip per page via
    * `java.util.zip.Deflater`), NOT the JDK's TIFFImageWriter. The JDK
    * writer measured ~200 ms per small multi-page document single-threaded
    * (its per-page metadata machinery; the GIF writer is ~1.5 ms) — at the
    * 300x decade that is hours of fixture synthesis for an operator whose
    * product surface is the DECODE. The decode path stays the real JDK
    * ImageIO TIFF reader; the bytes here are a fully standard baseline
    * TIFF (tags 256/257/258/259=8/262/273/277/278/279), so the roundtrip
    * claim is unchanged — three independent implementations (this writer,
    * the JDK reader, the pure-Python walker) must agree on every sample,
    * and a container-layout mistake here fails BOTH decoders. Strips are
    * PackBits (tag 259 = 32773, the TIFF 6.0 BASELINE codec, packets
    * restarted per row as the spec requires; encoded bytes are
    * bit-deterministic, but no gate ever hashes ENCODED bytes — the m5
    * rule — gates hash decoded samples). The round-11 fixture used
    * ZLib/deflate strips, and that choice was a measured scale bug in the
    * DECODER'S JVM: the JDK's TIFFDeflateDecompressor constructs a NATIVE
    * `java.util.zip.Inflater` per `read(page)` and never `end()`s it,
    * leaving millions of native zlib streams to the JVM's single
    * Common-Cleaner thread — the 100x decade's decode pass degraded from
    * 39.7 s (first pass) to 322 s (later passes, same JVM) with every
    * executor thread in `Inflater.init` and the Cleaner pegged in
    * `Inflater.end` (thread-dump-attributed; the same backlog
    * retro-explains round-11's "warm above cold" m9 row that was
    * blamed on host steal). PackBits decodes in pure Java with zero
    * native allocation, so the JVM no longer ages with pages decoded. */
  private def encodeTiff(docId: Long): Array[Byte] = {
    val n = tiffPages(docId)
    val bos = new java.io.ByteArrayOutputStream()
    def w16(v: Int): Unit = { bos.write(v & 0xFF); bos.write((v >> 8) & 0xFF) }
    def w32(v: Int): Unit = { w16(v & 0xFFFF); w16((v >>> 16) & 0xFFFF) }
    // header: "II" little-endian, magic 42, first-IFD offset patched below
    bos.write('I'); bos.write('I'); w16(42)
    // strips first (so IFD offsets are known), IFD chain after
    val strips = (0 until n).map { p =>
      val (w, h) = (tiffWidth(docId, p), tiffHeight(docId, p))
      val raw = new Array[Byte](w * h)
      var i = 0
      while (i < raw.length) { raw(i) = tiffPixel(docId, p, i).toByte; i += 1 }
      val sb = new java.io.ByteArrayOutputStream()
      var r = 0
      while (r < h) { packBitsRow(raw, r * w, w, sb); r += 1 }
      sb.toByteArray
    }
    val stripOff = new Array[Int](n)
    w32(0) // first-IFD offset placeholder (patched at the end)
    (0 until n).foreach { p =>
      stripOff(p) = bos.size()
      bos.write(strips(p))
      if (bos.size() % 2 == 1) bos.write(0) // IFDs must be word-aligned
    }
    val firstIfd = bos.size()
    (0 until n).foreach { p =>
      val (w, h) = (tiffWidth(docId, p), tiffHeight(docId, p))
      def entry(tag: Int, typ: Int, value: Int): Unit = {
        w16(tag); w16(typ); w32(1)
        if (typ == 3) { w16(value); w16(0) } else w32(value)
      }
      w16(9) // entry count
      entry(256, 3, w)                 // ImageWidth
      entry(257, 3, h)                 // ImageLength
      entry(258, 3, 8)                 // BitsPerSample
      entry(259, 3, 32773)             // Compression: PackBits (baseline)
      entry(262, 3, 1)                 // Photometric: BlackIsZero
      entry(273, 4, stripOff(p))       // StripOffsets
      entry(277, 3, 1)                 // SamplesPerPixel
      entry(278, 3, h)                 // RowsPerStrip (one strip per page)
      entry(279, 4, strips(p).length)  // StripByteCounts
      // next-IFD pointer: the next IFD starts right after these 4 bytes
      val next = if (p == n - 1) 0 else bos.size() + 4
      w32(next)
    }
    val out = bos.toByteArray
    // patch the first-IFD offset (bytes 4..7, little-endian)
    out(4) = (firstIfd & 0xFF).toByte
    out(5) = ((firstIfd >> 8) & 0xFF).toByte
    out(6) = ((firstIfd >> 16) & 0xFF).toByte
    out(7) = ((firstIfd >> 24) & 0xFF).toByte
    out
  }

  /** PackBits-encode one pixel row (TIFF 6.0 §9: control byte 0..127 =
    * copy next count+1 literals; 129..255 = repeat next byte 257-count
    * times; packets never straddle a row boundary — the spec's
    * per-row-restart rule). Greedy: emit a run packet for any repeat of
    * length >= 2, literal packets otherwise. */
  private def packBitsRow(buf: Array[Byte], off: Int, len: Int,
      out: java.io.ByteArrayOutputStream): Unit = {
    val end = off + len
    var i = off
    while (i < end) {
      var j = i
      while (j + 1 < end && buf(j + 1) == buf(j) && (j - i) < 127) j += 1
      val run = j - i + 1
      if (run >= 2) {
        out.write(257 - run) // -(run-1) as unsigned
        out.write(buf(i))
        i = j + 1
      } else {
        var k = i + 1 // literal stretch: stop at a >=2 repeat or 128 bytes
        while (k < end && (k - i) < 128 &&
            !(k + 1 < end && buf(k + 1) == buf(k))) k += 1
        out.write(k - i - 1)
        out.write(buf, i, k - i)
        i = k
      }
    }
  }

  /** REAL multi-page container decode: `ImageReader.getNumImages` + per-IFD
    * `read(p)` — [[decodeGifFrames]]'s operator shape on the second
    * container family. One input row -> one row per page, with the page's
    * OWN decoded geometry and integer checksums (gray sum +
    * position-weighted sum pinning sample order) computed in the decode
    * loop. Narrow pass; pages never leave the task. */
  def decodeTiffPages(df: DataFrame, binaryCol: String): DataFrame = {
    val schema = StructType(Seq(
      StructField("doc_id", LongType, nullable = false),
      StructField("n_pages", IntegerType, nullable = false),
      StructField("page_idx", IntegerType, nullable = false),
      StructField("width", IntegerType, nullable = false),
      StructField("height", IntegerType, nullable = false),
      StructField("page_sum", LongType, nullable = false),
      StructField("page_wsum", LongType, nullable = false)))
    val binIdx = df.schema.fieldIndex(binaryCol)
    val idIdx = df.schema.fieldIndex("doc_id")
    val rdd = df.rdd.mapPartitions { it =>
      ImageIOInit.ensure()
      it.flatMap { row =>
        val docId = row.getLong(idIdx)
        val bytes = row.getAs[Array[Byte]](binIdx)
        val iis = new ByteArrayImageInputStream(bytes)
        val reader = tiffReaderSpi.createReaderInstance()
        // ignoreMetadata = true: unlike the GIF decode (which must parse
        // per-frame GraphicControlExtension timing), the TIFF page walk
        // needs no IIOMetadata — and the JDK TIFF reader's per-read
        // metadata materialization is most of its per-page cost
        reader.setInput(iis, false, true)
        val n = reader.getNumImages(true)
        val out = (0 until n).map { p =>
          val img = reader.read(p)
          val (w, h) = (img.getWidth, img.getHeight)
          val raster = img.getRaster
          require(raster.getNumBands == 1,
            s"TIFF page decoded to ${raster.getNumBands} bands, expected gray")
          var sum = 0L
          var wsum = 0L
          var j = 1L
          var y = 0
          while (y < h) {
            var x = 0
            while (x < w) {
              val v = raster.getSample(x, y, 0).toLong
              sum += v; wsum += v * j; j += 1
              x += 1
            }
            y += 1
          }
          Row(docId, n, p, w, h, sum, wsum)
        }
        reader.dispose()
        out
      }
    }
    df.sparkSession.createDataFrame(rdd, schema)
  }

  /** Build the audio table — REAL PCM WAV bytes per document:
    * (doc_id, mime, content), written through `javax.sound.sampled`
    * (unsigned 8-bit PCM, the WAV-native 8-bit convention). */
  def synthesizeAudioTable(docs: DataFrame): DataFrame = {
    val schema = StructType(Seq(
      StructField("doc_id", LongType, nullable = false),
      StructField("mime", StringType, nullable = false),
      StructField("content", BinaryType, nullable = false)))
    val rdd = docs.select(col("doc_id")).rdd.mapPartitions { it =>
      it.map { r =>
        val id = r.getLong(0)
        Row(id, "audio/wav", encodeWav(id))
      }
    }
    docs.sparkSession.createDataFrame(rdd, schema)
  }

  /** WAV reader/writer SPIs resolved ONCE per JVM. `AudioSystem.write` /
    * `getAudioInputStream` take a CLASS-LEVEL monitor in the JDK provider
    * registry (com.sun.media.sound.JSSecurityManager.getProviders) on
    * EVERY call, serializing all executor threads — the 10x decade
    * measured m4 at 31.8 s vs 1.3 s at 1x (24x for 10x data) before this,
    * with every worker BLOCKED on that monitor in the thread dump. The
    * provider instances themselves are stateless; one ServiceLoader pass
    * per JVM makes encode/decode lock-free. */
  private lazy val wavWriter: javax.sound.sampled.spi.AudioFileWriter = {
    import scala.jdk.CollectionConverters._
    java.util.ServiceLoader
      .load(classOf[javax.sound.sampled.spi.AudioFileWriter])
      .iterator().asScala
      .find(_.isFileTypeSupported(javax.sound.sampled.AudioFileFormat.Type.WAVE))
      .getOrElse(sys.error("no WAVE AudioFileWriter provider on this JVM"))
  }
  /** The ONE provider that actually parses WAV, probe-selected once per
    * JVM against a self-generated header. Iterating ALL providers per row
    * re-introduces the convoy through a side door: SoftMidiAudioFileReader
    * (earlier in ServiceLoader order) calls MidiSystem.getSequence on
    * every rejection — the same JSSecurityManager class lock (second
    * thread dump of the 10x decade run: all workers blocked under
    * MidiSystem.getMidiFileReaders). */
  private lazy val wavReader: javax.sound.sampled.spi.AudioFileReader = {
    import scala.jdk.CollectionConverters._
    val probe = encodeWav(0L)
    java.util.ServiceLoader
      .load(classOf[javax.sound.sampled.spi.AudioFileReader])
      .iterator().asScala
      .find { r =>
        try { r.getAudioInputStream(new java.io.ByteArrayInputStream(probe)); true }
        catch { case _: Exception => false }
      }
      .getOrElse(sys.error("no AudioFileReader provider parses WAV on this JVM"))
  }

  private def encodeWav(docId: Long): Array[Byte] = {
    val ch = audioChannels(docId)
    val nf = audioFrames(docId)
    val pcm = new Array[Byte](nf * ch)
    var u = 0
    while (u < pcm.length) { pcm(u) = audioSample(docId, u).toByte; u += 1 }
    val fmt = new javax.sound.sampled.AudioFormat(
      javax.sound.sampled.AudioFormat.Encoding.PCM_UNSIGNED,
      AudioRate.toFloat, 8, ch, ch, AudioRate.toFloat, false)
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(pcm), fmt, nf.toLong)
    val bos = new java.io.ByteArrayOutputStream()
    wavWriter.write(ais, javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
    bos.toByteArray
  }

  /** REAL WAV decode via `javax.sound.sampled.AudioSystem`: parses the
    * container (format chunk -> channels/rate/bits, data chunk -> frames)
    * and streams the PCM samples out as integers. Same narrow shape as
    * [[decodeImage]]. */
  /** Container metadata + integer sample checksums emitted FROM the audio
    * decode pass — m4's output shape with the re-walk removed (the image
    * analogue is [[imageFrameChecksums]]): sum and position-weighted sum
    * are accumulated in the same loop that unpacks the PCM bytes, so the
    * sample array is never materialized into a Row and re-walked with
    * interpreted `aggregate`/`zip_with` lambdas. The weighted sum pins the
    * interleaved sample ORDER (channel swap / frame drop cannot match). */
  def decodeAudioChecksums(df: DataFrame, binaryCol: String): DataFrame = {
    val schema = StructType(Seq(
      StructField("doc_id", LongType, nullable = false),
      StructField("n_channels", IntegerType, nullable = false),
      StructField("sample_rate", IntegerType, nullable = false),
      StructField("n_frames", LongType, nullable = false),
      StructField("sample_sum", LongType, nullable = false),
      StructField("sample_wsum", LongType, nullable = false)))
    val binIdx = df.schema.fieldIndex(binaryCol)
    val idIdx = df.schema.fieldIndex("doc_id")
    val rdd = df.rdd.mapPartitions { it =>
      it.map { row =>
        val bytes = row.getAs[Array[Byte]](binIdx)
        // direct single-provider SPI call — see wavReader's convoy notes
        val ais = wavReader.getAudioInputStream(
          new java.io.ByteArrayInputStream(bytes))
        val fmt = ais.getFormat
        require(fmt.getSampleSizeInBits == 8,
          s"audio gate expects 8-bit PCM, got ${fmt.getSampleSizeInBits}")
        val pcm = ais.readAllBytes()
        var sum = 0L
        var wsum = 0L
        var u = 0
        while (u < pcm.length) {
          val v = (pcm(u) & 0xFF).toLong
          sum += v; wsum += v * (u + 1)
          u += 1
        }
        Row(row.getLong(idIdx), fmt.getChannels, fmt.getSampleRate.toInt,
          ais.getFrameLength, sum, wsum)
      }
    }
    df.sparkSession.createDataFrame(rdd, schema)
  }

  /** 64-bit "audio aHash" over REAL decoded PCM, as two 32-bit halves
    * (`asig_hi` = windows 32..63) — the audio analogue of
    * [[withImageAHash]]: the interleaved sample stream is cut into 64
    * contiguous windows (window of sample u = u*64/N, sizes differing by
    * at most one), bit k set iff window k's mean strictly exceeds the
    * whole-clip mean, compared in INTEGERS (windowSum * N > totalSum *
    * windowCount) so no float rounding can diverge between engines. A
    * localized edit moves only the windows it touches (plus the global
    * mean slightly), so near-identical clips land within a small Hamming
    * distance — the property m8's banded join exploits. Computed INSIDE
    * the WAV decode loop (the fused m4 shape): samples are walked once,
    * never materialized into Rows; output is (doc_id, asig_hi, asig_lo),
    * ~24 B/row, safe to memoize. */
  def audioSignatures(df: DataFrame, binaryCol: String): DataFrame = {
    val schema = StructType(Seq(
      StructField("doc_id", LongType, nullable = false),
      StructField("asig_hi", LongType, nullable = false),
      StructField("asig_lo", LongType, nullable = false)))
    val binIdx = df.schema.fieldIndex(binaryCol)
    val idIdx = df.schema.fieldIndex("doc_id")
    val rdd = df.rdd.mapPartitions { it =>
      it.map { row =>
        val (hi, lo) = signatureOfWav(row.getAs[Array[Byte]](binIdx))
        Row(row.getLong(idIdx), hi, lo)
      }
    }
    df.sparkSession.createDataFrame(rdd, schema)
  }

  /** One clip's signature, WAV bytes in: real container decode (the same
    * single-provider SPI path) + the windowed-energy hash in one loop. */
  def signatureOfWav(bytes: Array[Byte]): (Long, Long) = {
    // direct single-provider SPI call — see wavReader's convoy notes
    val ais = wavReader.getAudioInputStream(
      new java.io.ByteArrayInputStream(bytes))
    require(ais.getFormat.getSampleSizeInBits == 8,
      s"audio gate expects 8-bit PCM, got ${ais.getFormat.getSampleSizeInBits}")
    val pcm = ais.readAllBytes()
    val n = pcm.length
    val sums = new Array[Long](64)
    val cnts = new Array[Long](64)
    var total = 0L
    var u = 0
    while (u < n) {
      val v = (pcm(u) & 0xFF).toLong
      val k = (u.toLong * 64 / n).toInt
      sums(k) += v; cnts(k) += 1; total += v
      u += 1
    }
    var hi = 0L; var lo = 0L; var k = 0
    while (k < 64) {
      if (cnts(k) > 0 && sums(k) * n > total * cnts(k)) {
        if (k < 32) lo |= 1L << k else hi |= 1L << (k - 32)
      }
      k += 1
    }
    (hi, lo)
  }

  /** Synthesize + sign one document (the full fixture codec roundtrip) —
    * the per-row body of the keyed-state streaming backend's typed map,
    * where a streaming Dataset cannot drop to RDD mapPartitions. */
  def audioSignatureFor(docId: Long): (Long, Long) =
    signatureOfWav(encodeWav(docId))

  def decodeAudio(df: DataFrame, binaryCol: String): DataFrame = {
    val schema = df.schema
      .add(StructField("n_channels", IntegerType, nullable = false))
      .add(StructField("sample_rate", IntegerType, nullable = false))
      .add(StructField("n_frames", LongType, nullable = false))
      .add(StructField("samples", ArrayType(IntegerType, containsNull = false), nullable = false))
    val binIdx = df.schema.fieldIndex(binaryCol)
    val rdd = df.rdd.mapPartitions { it =>
      it.map { row =>
        val bytes = row.getAs[Array[Byte]](binIdx)
        // direct single-provider SPI call — see wavReader's convoy notes
        val ais = wavReader.getAudioInputStream(
          new java.io.ByteArrayInputStream(bytes))
        val fmt = ais.getFormat
        require(fmt.getSampleSizeInBits == 8,
          s"audio gate expects 8-bit PCM, got ${fmt.getSampleSizeInBits}")
        val pcm = ais.readAllBytes()
        val samples = new Array[Int](pcm.length)
        var u = 0
        while (u < pcm.length) { samples(u) = pcm(u) & 0xFF; u += 1 }
        Row.fromSeq(row.toSeq :+ fmt.getChannels :+ fmt.getSampleRate.toInt :+
          ais.getFrameLength :+ samples.toSeq)
      }
    }
    df.sparkSession.createDataFrame(rdd, schema)
  }
}

/** Array-backed [[javax.imageio.stream.ImageInputStream]] that never
  * touches `sun.java2d.Disposer`: the JDK's
  * `MemoryCacheImageInputStream` registers its cache with the Disposer in
  * its CONSTRUCTOR, under a JVM-GLOBAL monitor — one lock acquisition per
  * decoded document, which convoys all 32 executor threads exactly like
  * the audio SPI-registry lock did (m4's lesson). Measured before this
  * class existed: the m9 100x decode pass ran 39.7 s cold but 322 s warm
  * (thread dumps showed every worker BLOCKED on `Disposer.add`; the same
  * convoy retro-explains round-11's "warm above cold" 300x row that was
  * misattributed to host steal). The payload is already a byte array, so
  * the stream is trivial: positions delegate to
  * [[javax.imageio.stream.ImageInputStreamImpl]], whose constructor
  * registers nothing. */
private[multimodal] final class ByteArrayImageInputStream(buf: Array[Byte])
    extends javax.imageio.stream.ImageInputStreamImpl {
  override def read(): Int = {
    checkClosed(); bitOffset = 0
    if (streamPos >= buf.length) -1
    else { val v = buf(streamPos.toInt) & 0xFF; streamPos += 1; v }
  }
  override def read(b: Array[Byte], off: Int, len: Int): Int = {
    checkClosed(); bitOffset = 0
    if (streamPos >= buf.length) -1
    else {
      val n = math.min(len, buf.length - streamPos.toInt)
      System.arraycopy(buf, streamPos.toInt, b, off, n)
      streamPos += n; n
    }
  }
  override def length(): Long = buf.length.toLong
  override def isCached: Boolean = true
  override def isCachedMemory: Boolean = true
}

/** Growable-array [[javax.imageio.stream.ImageOutputStream]] — the encode
  * twin of [[ByteArrayImageInputStream]] (`MemoryCacheImageOutputStream`
  * takes the same Disposer lock per constructed stream, i.e. once per
  * ENCODED document in the media memo builds). Supports the seek-back
  * header patching the PNG/GIF writers do (writes at any position grow
  * the logical length monotonically). */
private[multimodal] final class ByteArrayImageOutputStream
    extends javax.imageio.stream.ImageOutputStreamImpl {
  private var buf = new Array[Byte](4096)
  private var len = 0
  private def ensure(cap: Int): Unit = if (cap > buf.length) {
    var n = buf.length
    while (n < cap) n <<= 1
    buf = java.util.Arrays.copyOf(buf, n)
  }
  override def write(b: Int): Unit = {
    checkClosed(); flushBits()
    ensure(streamPos.toInt + 1)
    buf(streamPos.toInt) = b.toByte
    streamPos += 1
    if (streamPos > len) len = streamPos.toInt
  }
  override def write(b: Array[Byte], off: Int, l: Int): Unit = {
    checkClosed(); flushBits()
    ensure(streamPos.toInt + l)
    System.arraycopy(b, off, buf, streamPos.toInt, l)
    streamPos += l
    if (streamPos > len) len = streamPos.toInt
  }
  override def read(): Int = {
    checkClosed(); bitOffset = 0
    if (streamPos >= len) -1
    else { val v = buf(streamPos.toInt) & 0xFF; streamPos += 1; v }
  }
  override def read(b: Array[Byte], off: Int, l: Int): Int = {
    checkClosed(); bitOffset = 0
    if (streamPos >= len) -1
    else {
      val n = math.min(l, len - streamPos.toInt)
      System.arraycopy(buf, streamPos.toInt, b, off, n)
      streamPos += n; n
    }
  }
  override def length(): Long = len.toLong
  def toByteArray: Array[Byte] = java.util.Arrays.copyOf(buf, len)
}

/** One-time executor/driver-local ImageIO configuration: disable the
  * stream disk cache (payloads arrive as byte arrays; a shared temp-dir
  * cache file per read would serialize the 32 executor threads on disk). */
private[multimodal] object ImageIOInit {
  private lazy val done: Unit = {
    javax.imageio.ImageIO.setUseCache(false)
  }
  def ensure(): Unit = done
}

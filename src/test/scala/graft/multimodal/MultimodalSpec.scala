package graft.multimodal

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.SparkTestSession

class MultimodalSpec extends AnyFunSuite with Matchers with SparkTestSession {

  // doc_ids chosen to cover every format/copy combination: image groups
  // 0..3 (PNG gray, PNG RGB, BMP RGB, PNG gray again) x copies 0/1/2, and
  // audio groups 0..2 (1ch/2ch/1ch) x copies 0/1/2/3 — the offset strides
  // (3 vs 4) are what the m6 audio-only-merge assertion exercises
  private val ids: Seq[Long] = (0L until 12L)

  private lazy val docs = {
    import spark.implicits._
    ids.map(id => (id, s"text $id")).toDF("doc_id", "text")
  }

  private lazy val mediaRows =
    Multimodal.synthesizeImageTable(docs).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[String]("mime"), r.getAs[Array[Byte]]("content"))).toMap

  test("image synthesis: real container magic bytes per declared mime") {
    mediaRows.size shouldBe ids.size
    mediaRows.foreach { case (id, (mime, bytes)) =>
      mime shouldBe Multimodal.imgMime(Multimodal.imgGroup(id))
      if (mime == "image/png")
        bytes.take(8) shouldBe Array(0x89, 'P', 'N', 'G', 0x0D, 0x0A, 0x1A, 0x0A).map(_.toByte)
      else
        bytes.take(2) shouldBe Array('B'.toByte, 'M'.toByte)
    }
  }

  test("decodeImage: ImageIO roundtrip recovers the exact pixel lattice") {
    val out = Multimodal.decodeImage(Multimodal.synthesizeImageTable(docs), "content")
      .select("doc_id", "width", "height", "channels", "px").collect()
    out.length shouldBe ids.size
    out.foreach { r =>
      val id = r.getLong(0)
      val group = Multimodal.imgGroup(id)
      r.getInt(1) shouldBe Multimodal.imgWidth(group)
      r.getInt(2) shouldBe Multimodal.imgHeight(group)
      r.getInt(3) shouldBe Multimodal.imgChannels(group)
      val px = r.getSeq[Int](4)
      px.length shouldBe r.getInt(1) * r.getInt(2) * r.getInt(3)
      // THE roundtrip assertion: decoded sample i == generated sample i,
      // for every sample, all three container formats
      px.zipWithIndex.foreach { case (v, i) =>
        withClue(s"doc $id sample $i: ") { v shouldBe Multimodal.pixelValue(id, i) }
      }
    }
  }

  test("decodeImage: histogram counts decoded sample values (bin = v/16)") {
    val out = Multimodal.decodeImage(Multimodal.synthesizeImageTable(docs), "content")
      .select("doc_id", "px", "hist").collect()
    out.foreach { r =>
      val px = r.getSeq[Int](1)
      val hist = r.getSeq[Long](2)
      hist.length shouldBe 16
      hist.sum shouldBe px.length.toLong
      val expected = px.groupBy(_ / 16).view.mapValues(_.size.toLong).toMap
      (0 until 16).foreach(b => hist(b) shouldBe expected.getOrElse(b, 0L))
    }
  }

  test("withImageAHash: integer luma/block signature; exact copies collide") {
    val sig = Multimodal.withImageAHash(
        Multimodal.decodeImage(Multimodal.synthesizeImageTable(docs), "content"))
      .select("doc_id", "ahash_hi", "ahash_lo").collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    sig.values.foreach { case (hi, lo) =>
      hi should (be >= 0L and be < (1L << 32))
      lo should (be >= 0L and be < (1L << 32))
    }
    // copies 0 and 1 of each group are byte-identical images
    Seq(0L, 3L, 6L, 9L).foreach(g => sig(g) shouldBe sig(g + 1))
    // independent scalar recomputation for one RGB doc (id 4: group 1, PNG RGB)
    val id = 4L
    val group = Multimodal.imgGroup(id)
    val (w, h, c) = (Multimodal.imgWidth(group), Multimodal.imgHeight(group),
      Multimodal.imgChannels(group))
    val sums = new Array[Long](64); val cnts = new Array[Long](64); var tot = 0L
    for (y <- 0 until h; x <- 0 until w) {
      val base = (y * w + x) * c
      val g = if (c == 1) Multimodal.pixelValue(id, base).toLong
        else (299L * Multimodal.pixelValue(id, base) +
          587L * Multimodal.pixelValue(id, base + 1) +
          114L * Multimodal.pixelValue(id, base + 2)) / 1000L
      val blk = (y * 8 / h) * 8 + (x * 8 / w)
      sums(blk) += g; cnts(blk) += 1; tot += g
    }
    var hi = 0L; var lo = 0L
    (0 until 64).foreach { blk =>
      if (cnts(blk) > 0 && sums(blk) * (w.toLong * h) > tot * cnts(blk)) {
        if (blk < 32) lo |= 1L << blk else hi |= 1L << (blk - 32)
      }
    }
    sig(id) shouldBe ((hi, lo))
  }

  test("banded Hamming join is lossless at T<=3 (pigeonhole over 4x16 bands)") {
    // all-pairs ground truth from the signatures vs the gate's banded join
    val sigs = Multimodal.withImageAHash(
        Multimodal.decodeImage(Multimodal.synthesizeImageTable(docs), "content"))
      .select("doc_id", "ahash_hi", "ahash_lo").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val truth = (for {
      (a, ha, la) <- sigs; (b, hb, lb) <- sigs if a < b
      d = java.lang.Long.bitCount(ha ^ hb) + java.lang.Long.bitCount(la ^ lb)
      if d <= 3
    } yield (a, b)).toSet
    truth should not be empty // copies 0/1 guarantee distance-0 pairs
    // the band cut is lossless: every true pair shares an intact band
    val bands = sigs.flatMap { case (id, hi2, lo2) =>
      Seq((0, lo2 & 0xFFFFL), (1, (lo2 >> 16) & 0xFFFFL),
        (2, hi2 & 0xFFFFL), (3, (hi2 >> 16) & 0xFFFFL)).map { case (bd, bk) => ((bd, bk), id) }
    }
    val candidates = bands.groupBy(_._1).values.flatMap { grp =>
      val is = grp.map(_._2).toSeq
      for (a <- is; b <- is if a < b) yield (a, b)
    }.toSet
    truth.subsetOf(candidates) shouldBe true
    // and the GATE (star-shaped banded join, t2's production shape) returns
    // exactly the bucket-representative pairs within the threshold
    val sigMap = sigs.map { case (id, h, l) => id -> (h, l) }.toMap
    val starPairs: Set[(Long, Long)] = bands.groupBy(_._1).values.flatMap { grp =>
      val is = grp.map(_._2).toSeq
      val rep = is.min
      is.filter(_ > rep).map(m => (rep, m))
    }.toSet
    val starTruth = starPairs.filter { case (a, b) =>
      val ((ha, la), (hb, lb)) = (sigMap(a), sigMap(b))
      java.lang.Long.bitCount(ha ^ hb) + java.lang.Long.bitCount(la ^ lb) <= 3
    }
    val gate = graft.PipelineQueries.m3PhashNearDup(spark, mediaDir).collect()
      .map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"))).toSet
    gate shouldBe starTruth
    // every exact-duplicate doc is still assigned to a survivor: copies 0/1
    // are byte-identical, so the later copy must appear as some rep's doc_b
    Seq(1L, 4L, 7L, 10L).foreach(c => gate.map(_._2) should contain(c))
  }

  // m3PhashNearDup needs a docs parquet dir; point it at a temp fixture
  private lazy val mediaDir: String = {
    val dir = graft.util.TempDirs.create("graft_mm_spec_")
    docs.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  test("audio signatures: integer window signature; exact copies collide; near copy is close") {
    val sig = Multimodal.audioSignatures(
        Multimodal.synthesizeAudioTable(docs), "content")
      .select("doc_id", "asig_hi", "asig_lo").collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    sig.values.foreach { case (hi, lo) =>
      hi should (be >= 0L and be < (1L << 32))
      lo should (be >= 0L and be < (1L << 32))
    }
    // copies 0 and 1 of each audio group are byte-identical WAVs
    Seq(0L, 4L, 8L).foreach(g => sig(g) shouldBe sig(g + 1))
    // independent scalar recomputation for one 2-channel doc (id 4: group 1)
    val id = 4L
    val n = Multimodal.audioFrames(id) * Multimodal.audioChannels(id)
    val sums = new Array[Long](64); val cnts = new Array[Long](64); var tot = 0L
    (0 until n).foreach { u =>
      val v = Multimodal.audioSample(id, u).toLong
      val k = (u.toLong * 64 / n).toInt
      sums(k) += v; cnts(k) += 1; tot += v
    }
    var hi = 0L; var lo = 0L
    (0 until 64).foreach { k =>
      if (cnts(k) > 0 && sums(k) * n > tot * cnts(k)) {
        if (k < 32) lo |= 1L << k else hi |= 1L << (k - 32)
      }
    }
    sig(id) shouldBe ((hi, lo))
    // planted geometry: the first-window perturbation (copy 2) moves FEW
    // bits; the half-clip shift (copy 3) moves MANY (outside the T=3 cut)
    def ham(a: (Long, Long), b: (Long, Long)): Int =
      java.lang.Long.bitCount(a._1 ^ b._1) + java.lang.Long.bitCount(a._2 ^ b._2)
    Seq(0L, 4L, 8L).foreach { g =>
      withClue(s"group ${g / 4} near copy: ") { ham(sig(g), sig(g + 2)) should be <= 3 }
      withClue(s"group ${g / 4} far copy: ") { ham(sig(g), sig(g + 3)) should be > 3 }
    }
  }

  test("m8: star-shaped banded audio join == brute-force star truth; pigeonhole lossless") {
    val sigs = Multimodal.audioSignatures(
        Multimodal.synthesizeAudioTable(docs), "content")
      .select("doc_id", "asig_hi", "asig_lo").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val truth = (for {
      (a, ha, la) <- sigs; (b, hb, lb) <- sigs if a < b
      d = java.lang.Long.bitCount(ha ^ hb) + java.lang.Long.bitCount(la ^ lb)
      if d <= 3
    } yield (a, b)).toSet
    truth should not be empty // copies 0/1 guarantee distance-0 pairs
    val bands = sigs.flatMap { case (id, hi2, lo2) =>
      Seq((0, lo2 & 0xFFFFL), (1, (lo2 >> 16) & 0xFFFFL),
        (2, hi2 & 0xFFFFL), (3, (hi2 >> 16) & 0xFFFFL)).map { case (bd, bk) => ((bd, bk), id) }
    }
    // pigeonhole: every true pair (hamming <= 3 over 4 bands) shares a band
    val candidates = bands.groupBy(_._1).values.flatMap { grp =>
      val is = grp.map(_._2).toSeq
      for (a <- is; b <- is if a < b) yield (a, b)
    }.toSet
    truth.subsetOf(candidates) shouldBe true
    // the gate returns exactly the bucket-representative pairs in the cut
    val sigMap = sigs.map { case (id, h, l) => id -> (h, l) }.toMap
    val starPairs: Set[(Long, Long)] = bands.groupBy(_._1).values.flatMap { grp =>
      val is = grp.map(_._2).toSeq
      val rep = is.min
      is.filter(_ > rep).map(m => (rep, m))
    }.toSet
    val starTruth = starPairs.filter { case (a, b) =>
      val ((ha, la), (hb, lb)) = (sigMap(a), sigMap(b))
      java.lang.Long.bitCount(ha ^ hb) + java.lang.Long.bitCount(la ^ lb) <= 3
    }
    val gate = graft.PipelineQueries.m8AudioNearDup(spark, mediaDir).collect()
      .map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"))).toSet
    gate shouldBe starTruth
    // every exact-duplicate clip is assigned to a survivor
    Seq(1L, 5L, 9L).foreach(c => gate.map(_._2) should contain(c))
  }

  test("m6: cross-modal components == independent union-find over all three pair sets") {
    val tEdges = graft.PipelineQueries.t2MinhashLshPairs(spark, mediaDir)
      .collect().map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b")))
    val iEdges = graft.PipelineQueries.m3PhashNearDup(spark, mediaDir)
      .collect().map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b")))
    val aEdges = graft.PipelineQueries.m8AudioNearDup(spark, mediaDir)
      .collect().map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b")))
    iEdges should not be empty // the planted image copies guarantee edges
    aEdges should not be empty // the planted audio copies guarantee edges
    // independent union-find over the UNION
    val parent = scala.collection.mutable.Map(ids.map(i => i -> i): _*)
    def find(x: Long): Long =
      if (parent(x) == x) x else { val r = find(parent(x)); parent(x) = r; r }
    (tEdges ++ iEdges ++ aEdges).foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val label = ids.map(i => i -> find(i)).toMap
    val sizes = label.values.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val expected = ids.map(i =>
      (i, label(i), sizes(label(i)), i == label(i))).toSet
    val got = graft.PipelineQueries.m6CrossModalDedup(spark, mediaDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getBoolean(3))).toSet
    got shouldBe expected
    // cross-modal value: at least one multi-member cluster exists that the
    // text edges alone would not produce (fixture texts are all distinct)
    def closure(edges: Seq[(Long, Long)]): Map[Long, Long] = {
      val p2 = scala.collection.mutable.Map(ids.map(i => i -> i): _*)
      def f2(x: Long): Long = if (p2(x) == x) x else { val r = f2(p2(x)); p2(x) = r; r }
      edges.foreach { case (a, b) =>
        val (ra, rb) = (f2(a), f2(b)); if (ra != rb) p2(math.max(ra, rb)) = math.min(ra, rb)
      }
      ids.map(i => i -> f2(i)).toMap
    }
    val textOnly = closure(tEdges)
    ids.count(i => label(i) != i) should be > ids.count(i => textOnly(i) != i)
    // AUDIO-only merge: audio groups of FOUR cross image groups of THREE —
    // docs 8 and 9 are exact audio copies (group 2, copies 0/1) but live in
    // different image groups ({6,7,8} vs {9,10,11}) and have distinct
    // texts, so only the audio leg links them
    val textImage = closure(tEdges ++ iEdges)
    textImage(8L) should not be textImage(9L)
    label(8L) shouldBe label(9L)
  }

  test("imageFrameChecksums: fused decode-pass checksums == lattice recompute") {
    val out = Multimodal.imageFrameChecksums(
        Multimodal.synthesizeImageTable(docs), "content").collect()
      .map(r => (r.getLong(0), r.getInt(1)) ->
        (r.getInt(2), r.getLong(3), r.getLong(4))).toMap
    out.size shouldBe ids.size * 3 // frames 0, 3, 6 of 8 bands
    ids.foreach { id =>
      val group = Multimodal.imgGroup(id)
      val (w, h, c) = (Multimodal.imgWidth(group), Multimodal.imgHeight(group),
        Multimodal.imgChannels(group))
      Seq(0, 3, 6).foreach { k =>
        val (lo, hi) = (k * h / 8, (k + 1) * h / 8)
        val vals = (lo * w * c until hi * w * c).map(Multimodal.pixelValue(id, _))
        val expected = (vals.length,
          vals.map(_.toLong).sum,
          vals.zipWithIndex.map { case (v, j) => v.toLong * (j + 1) }.sum)
        withClue(s"doc $id frame $k: ") { out((id, k)) shouldBe expected }
      }
    }
  }

  test("decodeAudioChecksums: fused decode-pass checksums == lattice recompute") {
    val out = Multimodal.decodeAudioChecksums(
        Multimodal.synthesizeAudioTable(docs), "content").collect()
      .map(r => r.getLong(0) ->
        (r.getInt(1), r.getInt(2), r.getLong(3), r.getLong(4), r.getLong(5))).toMap
    out.size shouldBe ids.size
    ids.foreach { id =>
      val n = Multimodal.audioFrames(id) * Multimodal.audioChannels(id)
      val vals = (0 until n).map(Multimodal.audioSample(id, _))
      val expected = (Multimodal.audioChannels(id), Multimodal.AudioRate,
        Multimodal.audioFrames(id).toLong,
        vals.map(_.toLong).sum,
        vals.zipWithIndex.map { case (v, u) => v.toLong * (u + 1) }.sum)
      withClue(s"doc $id: ") { out(id) shouldBe expected }
    }
  }

  test("GIF: multi-frame container roundtrip recovers frames, delays, lattice") {
    val rows = Multimodal.decodeGifFrames(
        Multimodal.synthesizeGifTable(docs), "content").collect()
    // one row per (doc, frame); frame counts vary 2..5 by doc_id % 4
    rows.length shouldBe ids.map(Multimodal.gifFrames(_)).sum
    ids.map(Multimodal.gifFrames(_)).toSet shouldBe Set(2, 3, 4, 5)
    rows.foreach { r =>
      val (id, n, f) = (r.getLong(0), r.getInt(1), r.getInt(2))
      val (w, h) = (r.getInt(3), r.getInt(4))
      n shouldBe Multimodal.gifFrames(id)
      w shouldBe Multimodal.gifWidth(id)
      h shouldBe Multimodal.gifHeight(id)
      // per-frame TIMING parsed from the container's GCE block
      r.getInt(5) shouldBe Multimodal.gifDelayCs(id, f)
      val vals = (0 until w * h).map(Multimodal.gifPixel(id, f, _))
      withClue(s"doc $id frame $f: ") {
        r.getLong(6) shouldBe vals.map(_.toLong).sum
        r.getLong(7) shouldBe
          vals.zipWithIndex.map { case (v, j) => v.toLong * (j + 1) }.sum
      }
    }
    // container sanity: GIF magic + trailer on the raw bytes
    val bytes = Multimodal.synthesizeGifTable(docs).collect()
      .map(r => r.getAs[Array[Byte]]("content"))
    bytes.foreach { b =>
      new String(b.take(6), "US-ASCII") shouldBe "GIF89a"
      b.last shouldBe 0x3B.toByte // GIF trailer
    }
  }

  test("audio: WAV roundtrip recovers channels, rate, frames, samples") {
    val out = Multimodal.decodeAudio(Multimodal.synthesizeAudioTable(docs), "content")
      .select("doc_id", "n_channels", "sample_rate", "n_frames", "samples").collect()
    out.length shouldBe ids.size
    out.foreach { r =>
      val id = r.getLong(0)
      r.getInt(1) shouldBe Multimodal.audioChannels(id)
      r.getInt(2) shouldBe Multimodal.AudioRate
      r.getLong(3) shouldBe Multimodal.audioFrames(id).toLong
      val samples = r.getSeq[Int](4)
      samples.length shouldBe Multimodal.audioFrames(id) * Multimodal.audioChannels(id)
      samples.zipWithIndex.foreach { case (s, u) =>
        withClue(s"doc $id sample $u: ") { s shouldBe Multimodal.audioSample(id, u) }
      }
    }
  }

  test("TIFF: multi-page container roundtrip recovers per-page geometry + lattice") {
    val rows = Multimodal.decodeTiffPages(
        Multimodal.synthesizeTiffTable(docs), "content").collect()
    // one row per (doc, page); page counts vary 2..4 by doc_id % 3
    rows.length shouldBe ids.map(Multimodal.tiffPages(_)).sum
    ids.map(Multimodal.tiffPages(_)).toSet shouldBe Set(2, 3, 4)
    // the fixture's point: pages of ONE document differ in geometry, so a
    // decoder that reuses page 0's IFD cannot pass (pin it on the data)
    ids.exists { id =>
      (0 until Multimodal.tiffPages(id)).map(p =>
        (Multimodal.tiffWidth(id, p), Multimodal.tiffHeight(id, p))).distinct.size > 1
    } shouldBe true
    rows.foreach { r =>
      val (id, n, p) = (r.getLong(0), r.getInt(1), r.getInt(2))
      val (w, h) = (r.getInt(3), r.getInt(4))
      n shouldBe Multimodal.tiffPages(id)
      w shouldBe Multimodal.tiffWidth(id, p)
      h shouldBe Multimodal.tiffHeight(id, p)
      val vals = (0 until w * h).map(Multimodal.tiffPixel(id, p, _))
      withClue(s"doc $id page $p: ") {
        r.getLong(5) shouldBe vals.map(_.toLong).sum
        r.getLong(6) shouldBe
          vals.zipWithIndex.map { case (v, j) => v.toLong * (j + 1) }.sum
      }
    }
    // container sanity: TIFF byte-order mark + magic 42 on the raw bytes
    val bytes = Multimodal.synthesizeTiffTable(docs).collect()
      .map(r => r.getAs[Array[Byte]]("content"))
    bytes.foreach { b =>
      val bom = new String(b.take(2), "US-ASCII")
      Set("II", "MM") should contain(bom)
      val magic = if (bom == "II") (b(2) & 0xFF) | ((b(3) & 0xFF) << 8)
                  else ((b(2) & 0xFF) << 8) | (b(3) & 0xFF)
      magic shouldBe 42
    }
  }

  test("audioSignatureFor (keyed-backend per-doc path) == audioSignatures (batch path)") {
    val batch = Multimodal.audioSignatures(
        Multimodal.synthesizeAudioTable(docs), "content").collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    ids.foreach { id =>
      withClue(s"doc $id: ") {
        Multimodal.audioSignatureFor(id) shouldBe batch(id)
      }
    }
  }
}

package graft.insert

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.SparkTestSession
import graft.h3.H3
import graft.h3.expr.functions._

/** Property tests for compaction (SURVEY §7.5.2 — the reference had a
  * historical compaction bug, CHANGES.md:30-31, so these are mandatory):
  * uncompact(compact(x)) == x on cell sets; partial sibling sets and
  * differing values must NOT merge; pentagons merge at 6. */
class CompactionSpec extends AnyFunSuite with Matchers with SparkTestSession {

  private val hexRes3 = H3.fromParts(20, 3, Seq(0, 0, 0))

  private def df(cells: Seq[Long], values: Seq[Int]) =
    spark.createDataFrame(
      spark.sparkContext.parallelize(cells.zip(values).map { case (c, v) => Row(c, v) }, 4),
      StructType(Seq(StructField("h3index", LongType, false),
        StructField("v", IntegerType, false))))

  test("complete uniform subtree compacts to the root; uncompact restores it") {
    val cells = H3.toChildren(hexRes3, 6).toSeq // 343 cells
    val d = df(cells, Seq.fill(cells.length)(7))
    val compacted = Compaction.compact(d)
    compacted.count() shouldBe 1
    val root = compacted.head()
    root.getLong(0) shouldBe hexRes3
    root.getInt(1) shouldBe 7

    val restored = Compaction.uncompact(compacted, 6)
    restored.count() shouldBe 343
    restored.select("h3index").collect().map(_.getLong(0)).toSet shouldBe cells.toSet
    restored.select("v").distinct().head().getInt(0) shouldBe 7
  }

  test("differing values block merging") {
    val cells = H3.toChildren(hexRes3, 4).toSeq // 7 siblings
    val d = df(cells, 1 +: Seq.fill(6)(2)) // one child differs
    Compaction.compact(d).count() shouldBe 7
  }

  test("partial sibling set does not merge") {
    val cells = H3.toChildren(hexRes3, 4).toSeq.drop(1) // 6 of 7
    val d = df(cells, Seq.fill(6)(1))
    Compaction.compact(d).count() shouldBe 6
  }

  test("pentagon parent merges at 6 children") {
    val pentagon = H3.fromParts(4, 2, Seq(0, 0)) // pentagon chain
    H3.isPentagon(pentagon) shouldBe true
    val kids = H3.toChildren(pentagon, 3).toSeq
    kids.length shouldBe 6
    val d = df(kids, Seq.fill(6)(9))
    val compacted = Compaction.compact(d)
    compacted.count() shouldBe 1
    compacted.head().getLong(0) shouldBe pentagon
  }

  test("mixed-resolution input compacts recursively (already-compacted cells join sibling sets)") {
    // 6 children at res 4 + the 7 res-5 children of the 7th -> all merge to hexRes3
    val sibs = H3.toChildren(hexRes3, 4).toSeq
    val fine = H3.toChildren(sibs.head, 5).toSeq
    val cells = sibs.drop(1) ++ fine
    val d = df(cells, Seq.fill(cells.length)(3))
    val compacted = Compaction.compact(d)
    compacted.count() shouldBe 1
    compacted.head().getLong(0) shouldBe hexRes3
  }

  test("uncompactRestricted returns exactly the requested descendants, no explosion") {
    import spark.implicits._
    // one res-0 cell, request 5 specific res-8 descendants
    val res0 = H3.fromParts(20, 0, Nil)
    val d = df(Seq(res0), Seq(42))
    val wanted = H3.toChildren(H3.fromParts(20, 7, Seq(0, 1, 2, 3, 0, 1, 2)), 8).take(5).toSeq
    val out = Compaction.uncompactRestricted(d, 8, wanted.toDF("cell")).collect()
    out.length shouldBe 5
    out.map(_.getLong(0)).toSet shouldBe wanted.toSet
    out.map(_.getInt(1)).toSet shouldBe Set(42)
  }

  test("uncompactCoarseToProbes: nested probes do not duplicate output cells") {
    import spark.implicits._
    val c2 = H3.fromParts(20, 2, Seq(1, 1))
    val d = df(Seq(c2), Seq(1))
    // the res-2 probe covers everything the res-4 probe covers
    val probes = Seq(c2, H3.centerChild(c2, 4)).toDF("cell")
    val out = Compaction.uncompactCoarseToProbes(d, 4, probes).collect()
    out.length shouldBe 49
    out.map(_.getLong(0)).distinct.length shouldBe 49
    out.map(_.getInt(1)).toSet shouldBe Set(1)
  }

  test("uncompactCoarseToProbes: fine probes select only their subtree cells") {
    import spark.implicits._
    val c2 = H3.fromParts(20, 2, Seq(1, 1))
    val d = df(Seq(c2), Seq(1))
    val wanted = Seq(H3.centerChild(c2, 4), H3.toChildren(c2, 3).last)
    val out = Compaction.uncompactCoarseToProbes(d, 4, wanted.toDF("cell")).collect()
    // the res-4 probe yields itself; the res-3 probe yields its 7 children
    out.map(_.getLong(0)).toSet shouldBe
      (Set(H3.centerChild(c2, 4)) ++ H3.toChildren(H3.toChildren(c2, 3).last, 4))
    out.length shouldBe 8
  }

  test("one-pass (includeTargetRes) == fine pass-through UNION coarse uncompaction") {
    import spark.implicits._
    // store mixing resolutions: a res-2 compacted cell, a res-3 compacted
    // cell, rows AT the target res 4 (one probe-covered, one not), and an
    // unrelated res-2 cell no probe touches
    val c2 = H3.fromParts(20, 2, Seq(1, 1))
    val c3 = H3.toChildren(c2, 3).last
    val fineIn = H3.centerChild(c2, 4)
    val fineOut = H3.fromParts(21, 4, Seq(2, 2, 2, 2)) // outside every probe
    val other2 = H3.fromParts(22, 2, Seq(0, 3))
    val rows = df(Seq(c2, c3, fineIn, fineOut, other2), Seq(1, 2, 3, 4, 5))
    // single-res probe set (res 3): covers c2's subtree partially, c3
    // exactly, fineIn via its res-3 parent
    val probeCells = Seq(H3.toParent(fineIn, 3), c3)
    val probes = probeCells.toDF("cell")

    val onePass = Compaction.uncompactCoarseToProbes(rows, 4, probes,
        knownProbeRes = Some(Seq(3)), includeTargetRes = true)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).sorted
    // the two-pass form the one-pass replaces: target-res rows that match
    // a probe ancestor pass through; coarser rows take the probe join
    val fine = rows.where(h3_get_resolution(col("h3index")) === 4)
      .where(h3_to_parent(col("h3index"), lit(3)).isin(probeCells: _*))
    val coarse = rows.where(h3_get_resolution(col("h3index")) < 4)
    val twoPass = fine.unionByName(
        Compaction.uncompactCoarseToProbes(coarse, 4, probes,
          knownProbeRes = Some(Seq(3))))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).sorted
    onePass shouldBe twoPass
    // sanity on content: fineIn survives with its own value, fineOut and
    // other2 are gone, c2/c3 expand only under the probes
    onePass.map(_._2).toSet shouldBe Set(1, 2, 3)
    onePass.count(_._2 == 3) shouldBe 1
    // the driver-side probe relation (small driver-known sets) is
    // bit-identical to the Column form
    val onePassLocal = Compaction.uncompactCoarseToProbes(rows, 4, probes,
        knownProbeRes = Some(Seq(3)), includeTargetRes = true,
        driverCells = Some(probeCells))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).sorted
    onePassLocal shouldBe onePass
  }

  test("uncompactRestricted mixes stored resolutions correctly") {
    import spark.implicits._
    // stored: one cell at res 2 (value 1) and one unrelated at res 4 (value 2)
    val c2 = H3.fromParts(20, 2, Seq(1, 1))
    val c4 = H3.fromParts(21, 4, Seq(2, 2, 2, 2))
    val d = df(Seq(c2, c4), Seq(1, 2))
    val wantedUnderC2 = H3.centerChild(c2, 4)
    val out = Compaction.uncompactRestricted(d, 4, Seq(wantedUnderC2, c4).toDF("cell"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    out shouldBe Map(wantedUnderC2 -> 1, c4 -> 2)
  }
}

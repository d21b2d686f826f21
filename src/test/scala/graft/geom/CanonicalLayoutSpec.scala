package graft.geom

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.h3.H3

/** Layout-injection contract (round-3 verdict #5): placement flows only
  * through [[BaseCellLayout]], the reference's geo anchor pattern holds
  * under ANY layout, and an INJECTED canonical layout is validated against
  * public libh3 vectors from an optional classpath file — absent offline,
  * that check cancels cleanly instead of embedding half-remembered
  * constants. Vector file format (one per line, tab-separated):
  * `latDeg lngDeg res expectedCellHex`, values from the public libh3
  * `latLngToCell`. */
class CanonicalLayoutSpec extends AnyFunSuite with Matchers {

  test("reference anchor shape: geoToH3 -> children arrayJoin is 7^3 valid cells") {
    // test_connection.py:39-49: arrayJoin(h3ToChildren(geoToH3(12.0, 20.0, 5), 8))
    // must produce exactly 7^3 distinct valid res-8 cells — true in any
    // self-consistent layout, pinned here so a layout swap cannot break it
    val c5 = Geo.latLngToCell(12.0, 20.0, 5)
    H3.isValidCell(c5) shouldBe true
    H3.getResolution(c5) shouldBe 5
    val kids = H3.toChildren(c5, 8).toSeq
    kids should have size 343
    kids.distinct should have size 343
    all(kids.map(H3.isValidCell)) shouldBe true
  }

  test("any layout: 122 finite pairwise-distinct centers, round-trip intact") {
    val centers = (0 until H3.NumBaseCells).map(Geo.layout.center)
    all(centers.map(c => c._1.isFinite && c._2.isFinite)) shouldBe true
    centers.distinct should have size H3.NumBaseCells
    for (bc <- Seq(0, 20, 61, 121); res <- Seq(3, 6)) {
      val cell = H3.centerChild(H3.fromParts(bc, 0, Nil), res)
      val (lat, lng) = Geo.cellToLatLng(cell)
      Geo.latLngToCell(lat, lng, res) shouldBe cell
    }
  }

  test("injected layout matches public libh3 vectors (cancels on the offline default)") {
    val in = getClass.getResourceAsStream("/canonical_geo_vectors.tsv")
    assume(in != null, "no /canonical_geo_vectors.tsv on the test classpath — " +
      "running the documented self-consistent FibonacciLayout; drop the file " +
      "in src/test/resources alongside a canonical BaseCellLayout to enable")
    val lines = try scala.io.Source.fromInputStream(in, "UTF-8").getLines()
      .map(_.trim).filter(l => l.nonEmpty && !l.startsWith("#")).toSeq
    finally in.close()
    lines should not be empty
    lines.foreach { l =>
      val Array(lat, lng, res, hex) = l.split("\\t")
      withClue(s"latLngToCell($lat, $lng, $res): ") {
        Geo.latLngToCell(lat.toDouble, lng.toDouble, res.toInt) shouldBe
          java.lang.Long.parseUnsignedLong(hex.stripPrefix("0x"), 16)
      }
    }
  }
}

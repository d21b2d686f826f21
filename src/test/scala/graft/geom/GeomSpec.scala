package graft.geom

import org.locationtech.jts.geom.{Coordinate, GeometryFactory}
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.h3.H3
import Ijk._

/** Properties of the IJK algebra, grid traversal and the (self-consistent)
  * geo layer — ported from the reference's geometry tests
  * (`geom/border_cells.rs:103-145`, `examples/basic.rs` grid_disk usage). */
class GeomSpec extends AnyFunSuite with Matchers {
  private val factory = new GeometryFactory()
  private val hexBase = 20 // hexagon base cell

  test("IJK: digit path round-trips through local IJK at several resolutions") {
    val rnd = new scala.util.Random(7)
    (1 to 200).foreach { _ =>
      val res = 1 + rnd.nextInt(8)
      val digits = Seq.fill(res)(rnd.nextInt(7))
      val cell = H3.fromParts(hexBase, res, digits)
      val ijk = cellToLocalIjk(cell)
      localIjkToCell(hexBase, res, ijk) shouldBe Some(cell)
    }
  }

  test("IJK: center cell is origin; unit digits are distance 1") {
    cellToLocalIjk(H3.centerChild(H3.fromParts(hexBase, 0, Nil), 1)) shouldBe CoordIJK(0, 0, 0)
    (1 to 6).foreach { d =>
      val c = H3.fromParts(hexBase, 1, Seq(d))
      hexDistance(cellToLocalIjk(c), CoordIJK(0, 0, 0)) shouldBe 1
    }
  }

  test("gridPathCells: length = distance + 1, consecutive cells adjacent, endpoints exact") {
    val rnd = new scala.util.Random(11)
    val origin = H3.centerChild(H3.fromParts(hexBase, 0, Nil), 6)
    val disk = Grid.gridDisk(origin, 8).filter(c => H3.getBaseCell(c) == hexBase)
    (1 to 60).foreach { _ =>
      val a = disk(rnd.nextInt(disk.length))
      val b = disk(rnd.nextInt(disk.length))
      val path = Grid.gridPathCells(a, b).get
      path.head shouldBe a
      path.last shouldBe b
      path.length shouldBe Grid.gridDistance(a, b).get + 1
      path.distinct.length shouldBe path.length
      path.sliding(2).filter(_.length == 2).foreach { case Seq(x, y) =>
        Grid.gridDistance(x, y).get shouldBe 1
      }
    }
  }

  test("gridPathCells: degenerate and cross-base contracts") {
    val origin = H3.centerChild(H3.fromParts(hexBase, 0, Nil), 6)
    Grid.gridPathCells(origin, origin) shouldBe Some(Seq(origin))
    val otherBase = H3.centerChild(H3.fromParts(25, 0, Nil), 6)
    Grid.gridPathCells(origin, otherBase) shouldBe None
    val coarser = H3.centerChild(H3.fromParts(hexBase, 0, Nil), 5)
    Grid.gridPathCells(origin, coarser) shouldBe None
  }

  test("gridDisk: interior disk has 3k^2+3k+1 cells, ring sizes 6k") {
    // center-child chain at res 6 is deep inside the base cell span
    val origin = H3.centerChild(H3.fromParts(hexBase, 0, Nil), 6)
    Grid.gridDisk(origin, 0) shouldBe Seq(origin)
    (1 to 10).foreach { k =>
      val disk = Grid.gridDisk(origin, k)
      disk.length shouldBe (3 * k * k + 3 * k + 1)
      disk.distinct.length shouldBe disk.length
      disk.foreach(c => H3.isValidCell(c) shouldBe true)
      Grid.gridRing(origin, k).length shouldBe 6 * k
    }
  }

  test("gridDisk: canonical public k-ring test vector (h3 docs, SF res-9 cell)") {
    // kRing('8928308280fffff', 1) from the public H3 documentation — all 7
    // members share base cell 20, so this pins the class II/III aperture
    // parity of the in-base-cell algebra against canonical libh3.
    val origin = java.lang.Long.parseLong("8928308280fffff", 16)
    val expected = Set(
      "8928308280fffff", "8928308280bffff", "89283082807ffff",
      "89283082877ffff", "89283082803ffff", "89283082873ffff",
      "8928308283bffff").map(java.lang.Long.parseLong(_, 16))
    Grid.gridDisk(origin, 1).toSet shouldBe expected
  }

  test("gridDisk at a base-cell border is complete (cross-border fallback, no dropped neighbors)") {
    // a cell hugging the base-cell origin corner: digit path of all K digits
    val border = H3.fromParts(hexBase, 5, Seq(1, 1, 1, 1, 1))
    (1 to 3).foreach { k =>
      val disk = Grid.gridDisk(border, k)
      val full = 3 * k * k + 3 * k + 1
      // round 1 dropped ALL boundary-crossing offsets; the geometric fallback
      // fills the ring back to the full hexagon count, modulo at most ~k
      // seam collapses (two offsets rounding to one cell across the
      // non-aligned neighbor lattice)
      disk.length should be >= full - k
      disk.length should be <= full
      disk.foreach(c => H3.isValidCell(c) shouldBe true)
    }
  }

  test("gridDisk: all cells within distance k of the origin") {
    val origin = H3.centerChild(H3.fromParts(hexBase, 0, Nil), 5)
    val disk = Grid.gridDisk(origin, 3)
    disk.foreach { c =>
      Grid.gridDistance(origin, c).get should be <= 3
    }
  }

  test("geo: cellToLatLng/latLngToCell round-trip on random interior cells") {
    val rnd = new scala.util.Random(11)
    var checked = 0
    (1 to 300).foreach { _ =>
      val res = 1 + rnd.nextInt(7)
      val digits = Seq.fill(res)(rnd.nextInt(7))
      val cell = H3.fromParts(hexBase + rnd.nextInt(30), res, digits)
      if (H3.isValidCell(cell)) {
        val (lat, lng) = Geo.cellToLatLng(cell)
        Geo.latLngToCell(lat, lng, res) shouldBe cell
        checked += 1
      }
    }
    checked should be > 200
  }

  test("geo: nearby points land in the same or adjacent cells, never far away") {
    val (lat, lng) = Geo.cellToLatLng(H3.centerChild(H3.fromParts(hexBase, 0, Nil), 5))
    val c0 = Geo.latLngToCell(lat, lng, 5)
    val eps = math.toDegrees(Geo.unitAt(5)) * 0.1
    val c1 = Geo.latLngToCell(lat + eps, lng + eps, 5)
    Grid.gridDistance(c0, c1).getOrElse(99) should be <= 1
  }

  test("polyfill: rectangle around a cell center contains that cell; border subset of fill (border_cells.rs:103-145)") {
    val center = H3.centerChild(H3.fromParts(hexBase, 0, Nil), 5)
    val (clat, clng) = Geo.cellToLatLng(center)
    val d = math.toDegrees(Geo.unitAt(5)) * 6
    val shell = factory.createPolygon(Array(
      new Coordinate(clng - d, clat - d), new Coordinate(clng + d, clat - d),
      new Coordinate(clng + d, clat + d), new Coordinate(clng - d, clat + d),
      new Coordinate(clng - d, clat - d)))
    val filled = Geo.polyfill(shell, 5)
    filled should contain(center)
    filled.length should be > 100 // reference asserts >100 for its rect

    val border = Geo.borderCells(shell, 5)
    border.length should be > 0
    // border cells are a subset of the filled cells (reference assertion)
    (border.toSet -- filled.toSet) shouldBe empty
    border.length should be < filled.length

    // a wider border strip covers at least the narrower one (monotone in width)
    val border2 = Geo.borderCells(shell, 5, width = 2)
    (border.toSet -- border2.toSet) shouldBe empty
    border2.length should be >= border.length
    (border2.toSet -- filled.toSet) shouldBe empty
  }

  test("polyfill: polygon smaller than one cell still produces cells (G1 exterior-ring rule)") {
    val center = H3.centerChild(H3.fromParts(hexBase, 0, Nil), 4)
    val (clat, clng) = Geo.cellToLatLng(center)
    val d = math.toDegrees(Geo.unitAt(4)) * 0.01
    val tiny = factory.createPolygon(Array(
      new Coordinate(clng - d, clat - d), new Coordinate(clng + d, clat - d),
      new Coordinate(clng + d, clat + d), new Coordinate(clng - d, clat + d),
      new Coordinate(clng - d, clat - d)))
    Geo.polyfill(tiny, 4).length should be > 0
  }

  test("polyfill: a hole excludes its interior cells; the donut is shell minus hole-interior") {
    val center = H3.centerChild(H3.fromParts(hexBase, 0, Nil), 5)
    val (clat, clng) = Geo.cellToLatLng(center)
    val d = math.toDegrees(Geo.unitAt(5)) * 8
    def ring(r: Double) = factory.createLinearRing(Array(
      new Coordinate(clng - r, clat - r), new Coordinate(clng + r, clat - r),
      new Coordinate(clng + r, clat + r), new Coordinate(clng - r, clat + r),
      new Coordinate(clng - r, clat - r)))
    val solid = factory.createPolygon(ring(d))
    val donut = factory.createPolygon(ring(d), Array(ring(d * 0.4)))
    val solidCells = Geo.polyfill(solid, 5).toSet
    val donutCells = Geo.polyfill(donut, 5).toSet
    donutCells should not contain center // hole interior excluded
    solidCells should contain(center)
    donutCells.subsetOf(solidCells) shouldBe true
    donutCells.size should be < solidCells.size
  }

  test("polyfill: every MultiPolygon part is covered, including a sub-cell island") {
    val centerA = H3.centerChild(H3.fromParts(hexBase, 0, Nil), 4)
    val (alat, alng) = Geo.cellToLatLng(centerA)
    val big = math.toDegrees(Geo.unitAt(4)) * 5
    val tinyOff = big * 4 // island far outside the big part's envelope
    def box(clng: Double, clat: Double, r: Double) = factory.createPolygon(Array(
      new Coordinate(clng - r, clat - r), new Coordinate(clng + r, clat - r),
      new Coordinate(clng + r, clat + r), new Coordinate(clng - r, clat + r),
      new Coordinate(clng - r, clat - r)))
    val island = box(alng + tinyOff, alat + tinyOff, big * 0.005)
    val mp = factory.createMultiPolygon(Array(box(alng, alat, big), island))
    val cells = Geo.polyfill(mp, 4).toSet
    cells should contain(centerA)
    // the sub-cell island contributes its boundary cell(s) — previously
    // dropped because only the first Polygon's exterior ring was walked
    val islandCells = Geo.polyfill(island, 4).toSet
    islandCells should not be empty
    islandCells.subsetOf(cells) shouldBe true
  }
}

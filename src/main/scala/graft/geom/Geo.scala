package graft.geom

import org.locationtech.jts.geom.{Coordinate, Geometry, GeometryFactory, Polygon}

import graft.h3.H3
import Ijk._

/**
 * Geographic layer: cell <-> lat/lng, polygon coverage ("polyfill", G1),
 * border cells (G3) — SURVEY §2.8 / F5.
 *
 * IMPORTANT — SELF-CONSISTENT PLACEMENT, CANONICAL ALGEBRA: the canonical H3
 * geo placement needs the icosahedron face/base-cell data tables of the H3
 * core library (faceCenterGeo, faceAxesAzRadsCII, baseCellData,
 * faceIjkBaseCells), which are not available in this offline environment and
 * cannot be reproduced verifiably from memory (SURVEY §7.5.1) — embedding
 * half-remembered constants would make "canonical" silently false. This
 * layer therefore replaces the icosahedron with a deterministic
 * Fibonacci-lattice layout of the 122 base cells and an
 * azimuthal-equidistant tangent plane per base cell. The aperture-7 lattice
 * WITHIN a base cell is exact canonical math ([[Ijk]], class II/III parity
 * pinned against the public libh3 k-ring vector in GeomSpec), so index math,
 * traversal and compaction are canonical; only absolute lat/lng placement is
 * frame-shifted vs libh3. All round-trip properties hold (geoToCell inverts
 * cellToLatLng; polyfill covers exactly the cells whose centers lie inside)
 * and are gate-checked (GeoQueries g1/g2). Placement is consumed ONLY
 * through [[BaseCellLayout]] ([[FibonacciLayout]] default) — installing
 * canonical tables via [[setLayout]] is the single drop-in point if the
 * data ever becomes available; no algebra changes.
 */
object Geo {
  private val factory = new GeometryFactory()

  /** Spacing (radians of arc) between adjacent res-0 cell centers. */
  val Res0Unit: Double = 0.32
  private val Sqrt7 = math.sqrt(7.0)

  @volatile private var layoutRef: BaseCellLayout = FibonacciLayout

  /** The active base-cell placement. */
  def layout: BaseCellLayout = layoutRef

  /** Install a placement (e.g. validated canonical tables). Process-wide;
    * intended for startup/test wiring, not per-query switching — cells
    * indexed under one layout place differently under another. */
  def setLayout(l: BaseCellLayout): Unit = layoutRef = l

  /** Plane coords of `bc`'s lattice -> (latRad, lngRad): undo the layout's
    * lattice rotation, then the azimuthal-equidistant inverse. */
  private[geom] def planeToGeo(bc: Int, x: Double, y: Double): (Double, Double) = {
    val a = layout.azimuth(bc)
    val (rx, ry) =
      if (a == 0.0) (x, y)
      else (x * math.cos(a) - y * math.sin(a), x * math.sin(a) + y * math.cos(a))
    azeqInverse(layout.center(bc), rx, ry)
  }

  /** (latRad, lngRad) -> plane coords in `bc`'s lattice frame. */
  private[geom] def geoToPlane(bc: Int, lat: Double, lng: Double): (Double, Double) = {
    val (x, y) = azeqForward(layout.center(bc), lat, lng)
    val a = layout.azimuth(bc)
    if (a == 0.0) (x, y)
    else (x * math.cos(-a) - y * math.sin(-a), x * math.sin(-a) + y * math.cos(-a))
  }

  /** Grid-step length (radians) at a resolution. */
  def unitAt(res: Int): Double = Res0Unit / math.pow(Sqrt7, res)

  // -------------------------------------------------- tangent-plane math

  /** Azimuthal equidistant forward: (lat,lng) -> (x,y) on the tangent plane
    * at `center`, both in radians; distances preserved from the center. */
  private[geom] def azeqForward(center: (Double, Double), lat: Double, lng: Double): (Double, Double) = {
    val (f0, l0) = center
    val dl = lng - l0
    val cosC = math.sin(f0) * math.sin(lat) + math.cos(f0) * math.cos(lat) * math.cos(dl)
    val c = math.acos(math.max(-1.0, math.min(1.0, cosC)))
    if (c < 1e-12) (0.0, 0.0)
    else {
      val az = math.atan2(
        math.cos(lat) * math.sin(dl),
        math.cos(f0) * math.sin(lat) - math.sin(f0) * math.cos(lat) * math.cos(dl))
      (c * math.sin(az), c * math.cos(az))
    }
  }

  /** Azimuthal equidistant inverse. */
  private[geom] def azeqInverse(center: (Double, Double), x: Double, y: Double): (Double, Double) = {
    val (f0, l0) = center
    val c = math.hypot(x, y)
    if (c < 1e-12) return (f0, l0)
    val az = math.atan2(x, y)
    val lat = math.asin(math.sin(f0) * math.cos(c) + math.cos(f0) * math.sin(c) * math.cos(az))
    val lng = l0 + math.atan2(
      math.sin(az) * math.sin(c) * math.cos(f0),
      math.cos(c) - math.sin(f0) * math.sin(lat))
    (lat, ((lng + 3 * math.Pi) % (2 * math.Pi)) - math.Pi)
  }

  /** Hex lattice: ijk -> 2D (x,y) in grid units. */
  private[geom] def ijkToHex2d(c: CoordIJK): (Double, Double) = {
    val (ai, aj) = c.axial
    (ai - 0.5 * aj, aj * math.sqrt(3.0) / 2.0)
  }

  /** 2D -> nearest ijk via cube rounding. */
  private[geom] def hex2dToIjk(x: Double, y: Double): CoordIJK = {
    val aj = y / (math.sqrt(3.0) / 2.0)
    val ai = x + 0.5 * aj
    // cube round (q=ai, r=aj, s=-ai-aj)
    val (q, r, s) = (ai, aj, -ai - aj)
    var (rq, rr, rs) = (math.round(q).toInt, math.round(r).toInt, math.round(s).toInt)
    val (dq, dr, ds) = (math.abs(rq - q), math.abs(rr - r), math.abs(rs - s))
    if (dq > dr && dq > ds) rq = -rr - rs
    else if (dr > ds) rr = -rq - rs
    CoordIJK(rq, rr, 0).normalized
  }

  // ------------------------------------------------------------ cell <-> geo

  /** Cell center in degrees: (lat, lng). */
  def cellToLatLng(cell: Long): (Double, Double) = {
    val res = H3.getResolution(cell)
    val bc = H3.getBaseCell(cell)
    val (hx, hy) = ijkToHex2d(cellToLocalIjk(cell))
    val u = unitAt(res)
    val (lat, lng) = planeToGeo(bc, hx * u, hy * u)
    (math.toDegrees(lat), math.toDegrees(lng))
  }

  /** Point (degrees) -> containing cell at `res` (F5 geoToH3). Deterministic:
    * tries the nearest base-cell planes in order; falls back to the nearest
    * base cell's center child if no lattice region accepts the point. */
  def latLngToCell(latDeg: Double, lngDeg: Double, res: Int): Long = {
    require(res >= 0 && res <= H3.MaxRes)
    val lat = math.toRadians(latDeg)
    val lng = math.toRadians(lngDeg)
    val nearest = Array.tabulate(H3.NumBaseCells) { b =>
        val (f, l) = layout.center(b)
        val d = math.sin(f) * math.sin(lat) + math.cos(f) * math.cos(lat) * math.cos(lng - l)
        (b, -d) // descending cos distance
      }
      .sortBy(_._2)
      .map(_._1)
    val u = unitAt(res)
    // collect a candidate cell per nearby base-cell plane and keep the one
    // whose center is nearest the query point — first-accept would break the
    // cellToLatLng round-trip for cells whose own base center is not the
    // globally nearest one.
    val candidates = nearest.take(12).flatMap { bc =>
      val (x, y) = geoToPlane(bc, lat, lng)
      val ijk = hex2dToIjk(x / u, y / u)
      localIjkToCell(bc, res, ijk)
    }
    if (candidates.isEmpty) H3.centerChild(H3.fromParts(nearest.head, 0, Nil), res)
    else candidates.minBy { cell =>
      val (clat, clng) = cellToLatLng(cell)
      val (cf, cl) = (math.toRadians(clat), math.toRadians(clng))
      -(math.sin(cf) * math.sin(lat) + math.cos(cf) * math.cos(lat) * math.cos(lng - cl))
    }
  }

  // ---------------------------------------------------------------- polyfill

  /** G1 polyfill: all cells at `res` whose center lies inside the geometry,
    * plus the cells of the (densified) exterior ring so that polygons smaller
    * than one cell still produce output (reference `traversal.rs:131-162`).
    * Geometry coordinates are (lng, lat) degrees (GeoJSON axis order). */
  def polyfill(geom: Geometry, res: Int): Seq[Long] = {
    val u = unitAt(res)
    val stepDeg = math.toDegrees(u) * 0.5
    val env = geom.getEnvelopeInternal
    val cells = scala.collection.mutable.LinkedHashSet.empty[Long]

    // interior: sample the envelope at half-cell spacing, keep cells whose
    // center is contained
    var lat = env.getMinY
    while (lat <= env.getMaxY + stepDeg) {
      val lngStep = stepDeg / math.max(0.1, math.cos(math.toRadians(lat)))
      var lng = env.getMinX
      while (lng <= env.getMaxX + lngStep) {
        val cell = latLngToCell(lat, lng, res)
        if (!cells.contains(cell)) {
          val (clat, clng) = cellToLatLng(cell)
          if (geom.contains(factory.createPoint(new Coordinate(clng, clat)))) cells += cell
        }
        lng += lngStep
      }
      lat += stepDeg
    }

    // exterior ring cells (boundary coverage for tiny polygons) — walk EVERY
    // polygonal part: a MultiPolygon's small islands would otherwise be
    // silently dropped when no interior sample lands inside them. Hole
    // (interior) rings are deliberately NOT walked: their boundary cells'
    // centers lie outside the polygon and must stay excluded.
    def exteriorRings(g: Geometry): Seq[org.locationtech.jts.geom.LineString] =
      g match {
        case p: Polygon => Seq(p.getExteriorRing)
        case m: org.locationtech.jts.geom.GeometryCollection =>
          (0 until m.getNumGeometries).flatMap(i => exteriorRings(m.getGeometryN(i)))
        case _ => Seq.empty
      }
    exteriorRings(geom).foreach { ring =>
      val densified = org.locationtech.jts.densify.Densifier.densify(ring, stepDeg)
      densified.getCoordinates.foreach { c =>
        cells += latLngToCell(c.y, c.x, res)
      }
    }
    cells.toSeq.sorted
  }

  /** G3 border cells: cells within ~`width` cells of the polygon's exterior
    * ring (reference `geom/border_cells.rs:15-77`: inward offset by
    * 1.5*cell_radius*width, densify, polyfill the strip). JTS negative
    * buffer replaces the reference's cavalier_contours parallel_offset. */
  def borderCells(polygon: Polygon, res: Int, width: Int = 1): Seq[Long] = {
    require(width >= 1)
    val cellRadiusDeg = math.toDegrees(unitAt(res)) / math.sqrt(3.0)
    val inner = polygon.buffer(-1.5 * cellRadiusDeg * width)
    val strip = if (inner.isEmpty) polygon else polygon.difference(inner)
    polyfill(strip match {
      case p: Polygon => p
      case g => g.convexHull() match {
        case p: Polygon => p
        case _ => polygon
      }
    }, res)
  }
}

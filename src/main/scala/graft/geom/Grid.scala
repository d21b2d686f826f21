package graft.geom

import graft.h3.H3
import Ijk._

/**
 * Grid-traversal operators over local IJK coordinates: [[gridDisk]] (k-ring),
 * [[gridRing]], hex [[gridDistance]] — the G4 surface of SURVEY §2.8
 * (reference `traversal.rs:403-418` uses grid_disk for traversal-cell
 * buffering).
 *
 * Navigation is exact canonical aperture-7 algebra within one base cell's
 * span ([[Ijk]], class II/III parity matching h3 core — pinned by the public
 * k-ring test vector in GridSpec). Offsets that leave the base cell (an
 * icosahedron face/base-cell boundary crossing in canonical H3) are resolved
 * GEOMETRICALLY: the offset's position on the origin base cell's tangent
 * plane is mapped back to lat/lng and re-resolved to a cell, so disks at
 * base-cell borders are complete area coverage instead of silently thinner
 * (the round-1 behavior dropped them). Because the base-cell placement layer
 * is the documented self-consistent lattice ([[Geo]]), cross-border members
 * are geometric nearest cells in that frame, not canonical libh3 indexes.
 */
object Grid {

  /** Cells within grid distance k of origin (the k-ring/disk). Origin-first,
    * then by (distance, cell). Boundary-crossing offsets resolve through the
    * geometric fallback — never dropped. */
  def gridDisk(origin: Long, k: Int): Seq[Long] = {
    require(k >= 0)
    if (k == 0) return Seq(origin)
    val res = H3.getResolution(origin)
    val bc = H3.getBaseCell(origin)
    val o = cellToLocalIjk(origin)
    val u = Geo.unitAt(res)
    // min distance per cell: the geometric fallback can map two offsets to
    // the same neighbor cell across a lattice seam
    val best = scala.collection.mutable.LinkedHashMap.empty[Long, Int]
    // enumerate the [-k,k]^2 axial square and keep offsets within H3 hex
    // distance k. NOTE the H3 IJK axial neighbor set is {±I, ±J, +I+J,
    // -I-J}: (1,-1) is a DIAGONAL (distance 2), so the standard cube-metric
    // rhombus is wrong here; the normalized-max metric is authoritative.
    var dx = -k
    while (dx <= k) {
      var dy = -k
      while (dy <= k) {
        val ijk = (o + CoordIJK(dx, dy, 0)).normalized
        val dist = hexDistance(o, ijk)
        if (dist <= k) {
          val cell = localIjkToCell(bc, res, ijk).getOrElse {
            val (hx, hy) = Geo.ijkToHex2d(ijk)
            val (lat, lng) = Geo.planeToGeo(bc, hx * u, hy * u)
            Geo.latLngToCell(math.toDegrees(lat), math.toDegrees(lng), res)
          }
          if (best.get(cell).forall(_ > dist)) best(cell) = dist
        }
        dy += 1
      }
      dx += 1
    }
    best.toSeq.sortBy { case (c, d) => (d, c) }.map(_._1)
  }

  /** Just the ring at exactly distance k. */
  def gridRing(origin: Long, k: Int): Seq[Long] = {
    val diskK = gridDisk(origin, k).toSet
    val diskK1 = if (k == 0) Set.empty[Long] else gridDisk(origin, k - 1).toSet
    (diskK -- diskK1).toSeq.sorted
  }

  /** Hex grid distance between two cells of the same resolution and base
    * cell; None when they live under different base cells (exact cross-base
    * distance needs the canonical base-cell neighbor tables; use the
    * geometric disk for coverage instead). */
  def gridDistance(a: Long, b: Long): Option[Int] = {
    if (H3.getResolution(a) != H3.getResolution(b)) return None
    if (H3.getBaseCell(a) != H3.getBaseCell(b)) return None
    Some(hexDistance(cellToLocalIjk(a), cellToLocalIjk(b)))
  }

  /** Minimal grid line from `a` to `b` inclusive — canonical
    * `gridPathCells` cube-space lerp + round (h3 core localij.c): convert
    * both local IJK coords to cube axes (`ijkToCube`: i' = -i + k,
    * j' = j - k, k' = -i' - j'), lerp in 1/d steps, round to the nearest
    * cube triple (fixing the axis with the largest rounding error so the
    * x+y+z=0 invariant holds), map back (`cubeToIjk`: i = -x, j = y,
    * normalize). Same-res same-base-cell contract as [[gridDistance]];
    * None otherwise. Length is always gridDistance+1. */
  def gridPathCells(a: Long, b: Long): Option[Seq[Long]] = {
    if (H3.getResolution(a) != H3.getResolution(b)) return None
    if (H3.getBaseCell(a) != H3.getBaseCell(b)) return None
    val res = H3.getResolution(a)
    val bc = H3.getBaseCell(a)
    val ca = cellToLocalIjk(a)
    val cb = cellToLocalIjk(b)
    val d = hexDistance(ca, cb)
    def cube(c: CoordIJK): (Double, Double, Double) = {
      val x = -c.i + c.k; val y = c.j - c.k
      (x.toDouble, y.toDouble, (-x - y).toDouble)
    }
    val (ax, ay, az) = cube(ca)
    val (bx, by, bz) = cube(cb)
    val out = Vector.newBuilder[Long]
    var n = 0
    while (n <= d) {
      val t = if (d == 0) 0.0 else n.toDouble / d
      val x = ax + (bx - ax) * t; val y = ay + (by - ay) * t; val z = az + (bz - az) * t
      // C round (half-AWAY-FROM-ZERO, what h3 core's cubeRound compiles to),
      // not Java's half-up: they differ on negative .5 ties (-0.5 -> -1 vs 0)
      def cround(v: Double): Int =
        (if (v < 0) -math.round(-v) else math.round(v)).toInt
      var ri = cround(x); var rj = cround(y); var rk = cround(z)
      val di = math.abs(ri - x); val dj = math.abs(rj - y); val dk = math.abs(rk - z)
      if (di > dj && di > dk) ri = -rj - rk
      else if (dj > dk) rj = -ri - rk
      else rk = -ri - rj
      val ijk = CoordIJK(-ri, rj, 0).normalized
      localIjkToCell(bc, res, ijk) match {
        case Some(cell) => out += cell
        case None => return None // lerp strayed outside the base cell's span
      }
      n += 1
    }
    Some(out.result())
  }
}

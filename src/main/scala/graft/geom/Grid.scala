package graft.geom

import graft.h3.H3
import Ijk._

/**
 * Grid-traversal operators over local IJK coordinates: [[gridDisk]] (k-ring),
 * [[gridRing]], hex [[gridDistance]] — the G4 surface of SURVEY §2.8
 * (reference `traversal.rs:403-418` uses grid_disk for traversal-cell
 * buffering).
 *
 * LIMITATION (documented): navigation is exact within one base cell's
 * aperture-7 span. Neighbors that would cross into another base cell (an
 * icosahedron face/base-cell boundary crossing in canonical H3) are DROPPED
 * rather than wrapped — the canonical wrap requires the icosahedron base-cell
 * neighbor tables, which are not available offline. Disks that stay interior
 * to a base cell are bit-exact with canonical H3.
 */
object Grid {

  /** Cells within grid distance k of origin (the k-ring/disk). Origin-first,
    * then by (distance, cell). Boundary-crossing neighbors are dropped. */
  def gridDisk(origin: Long, k: Int): Seq[Long] = {
    require(k >= 0)
    if (k == 0) return Seq(origin)
    val res = H3.getResolution(origin)
    val bc = H3.getBaseCell(origin)
    val o = cellToLocalIjk(origin)
    val out = scala.collection.mutable.ArrayBuffer.empty[(Int, Long)]
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
          localIjkToCell(bc, res, ijk).foreach { cell => out += ((dist, cell)) }
        }
        dy += 1
      }
      dx += 1
    }
    out.sortBy { case (d, c) => (d, c) }.map(_._2).toSeq
  }

  /** Just the ring at exactly distance k. */
  def gridRing(origin: Long, k: Int): Seq[Long] = {
    val diskK = gridDisk(origin, k).toSet
    val diskK1 = if (k == 0) Set.empty[Long] else gridDisk(origin, k - 1).toSet
    (diskK -- diskK1).toSeq.sorted
  }

  /** Hex grid distance between two cells of the same resolution and base
    * cell; None when they live under different base cells (would require the
    * canonical neighbor tables). */
  def gridDistance(a: Long, b: Long): Option[Int] = {
    if (H3.getResolution(a) != H3.getResolution(b)) return None
    if (H3.getBaseCell(a) != H3.getBaseCell(b)) return None
    Some(hexDistance(cellToLocalIjk(a), cellToLocalIjk(b)))
  }
}

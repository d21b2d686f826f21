package graft.geom

import graft.h3.H3

/**
 * Aperture-7 hexagonal IJK coordinate math — the canonical H3 in-face
 * algebra (h3geo.org/docs/core-library/coordsystems): digit<->unit-vector
 * mapping, normalization, class II/III down/up aperture-7 transforms, cube
 * rounding and hex distance. This is exact, public hex-grid mathematics and
 * the foundation for local-IJK cell navigation ([[Grid.gridDisk]]) and the
 * geo layer.
 */
object Ijk {
  final case class CoordIJK(i: Int, j: Int, k: Int) {
    def +(o: CoordIJK): CoordIJK = CoordIJK(i + o.i, j + o.j, k + o.k)
    def -(o: CoordIJK): CoordIJK = CoordIJK(i - o.i, j - o.j, k - o.k)
    def normalized: CoordIJK = {
      var (a, b, c) = (i, j, k)
      if (a < 0) { b -= a; c -= a; a = 0 }
      if (b < 0) { a -= b; c -= b; b = 0 }
      if (c < 0) { a -= c; b -= c; c = 0 }
      val m = math.min(a, math.min(b, c))
      CoordIJK(a - m, b - m, c - m)
    }
    /** axial coordinates (i-k, j-k) */
    def axial: (Int, Int) = (i - k, j - k)
  }

  /** Unit vectors per direction digit 0..6 (center, K, J, JK, I, IK, IJ). */
  val UnitVecs: Array[CoordIJK] = Array(
    CoordIJK(0, 0, 0), CoordIJK(0, 0, 1), CoordIJK(0, 1, 0), CoordIJK(0, 1, 1),
    CoordIJK(1, 0, 0), CoordIJK(1, 0, 1), CoordIJK(1, 1, 0))

  def digitOf(v: CoordIJK): Int = {
    val n = v.normalized
    UnitVecs.indexWhere(u => u == n)
  }

  /** A resolution is Class III when odd (canonical H3). */
  def isClassIII(res: Int): Boolean = (res & 1) == 1

  // canonical aperture-7 matrices: new = i*iVec + j*jVec + k*kVec
  private def mul(c: CoordIJK, iv: (Int, Int, Int), jv: (Int, Int, Int), kv: (Int, Int, Int)): CoordIJK =
    CoordIJK(
      c.i * iv._1 + c.j * jv._1 + c.k * kv._1,
      c.i * iv._2 + c.j * jv._2 + c.k * kv._2,
      c.i * iv._3 + c.j * jv._3 + c.k * kv._3).normalized

  /** Class II (clockwise) down-aperture — canonical `_downAp7r`
    * (iVec (3,1,0), jVec (0,3,1), kVec (1,0,3)), applied at EVEN child
    * resolutions like h3 core `_h3ToFaceIjkWithInitializedFijk`. */
  def downAp7II(c: CoordIJK): CoordIJK =
    mul(c, (3, 1, 0), (0, 3, 1), (1, 0, 3))

  /** Class III (counter-clockwise) down-aperture — canonical `_downAp7`
    * (iVec (3,0,1), jVec (1,3,0), kVec (0,1,3)), applied at ODD child
    * resolutions. */
  def downAp7III(c: CoordIJK): CoordIJK =
    mul(c, (3, 0, 1), (1, 3, 0), (0, 1, 3))

  /** Inverse apertures with cube rounding (canonical _upAp7r / _upAp7). */
  def upAp7II(c: CoordIJK): CoordIJK = {
    val (ai, aj) = (c.i - c.k, c.j - c.k)
    val i = math.round((2 * ai + aj) / 7.0).toInt
    val j = math.round((3 * aj - ai) / 7.0).toInt
    CoordIJK(i, j, 0).normalized
  }
  def upAp7III(c: CoordIJK): CoordIJK = {
    val (ai, aj) = (c.i - c.k, c.j - c.k)
    val i = math.round((3 * ai - aj) / 7.0).toInt
    val j = math.round((ai + 2 * aj) / 7.0).toInt
    CoordIJK(i, j, 0).normalized
  }

  /** Local IJK of a cell relative to its base cell's res-0 center: walk the
    * digit path down the apertures (canonical _h3ToFaceIjk without the
    * icosahedron face wrapping). */
  def cellToLocalIjk(h: Long): CoordIJK = {
    val res = H3.getResolution(h)
    var c = CoordIJK(0, 0, 0)
    var r = 1
    while (r <= res) {
      c = if (isClassIII(r)) downAp7III(c) else downAp7II(c)
      c = (c + UnitVecs(H3.getDigit(h, r))).normalized
      r += 1
    }
    c
  }

  /** Inverse: local IJK at `res` under `baseCell` -> cell index. Digits are
    * recovered top-down by rounding through the inverse apertures
    * (canonical _faceIjkToH3). Returns None if the coordinate does not
    * normalize into a valid digit path (e.g. outside the base cell's span or
    * the deleted pentagon subsequence). */
  def localIjkToCell(baseCell: Int, res: Int, ijk: CoordIJK): Option[Long] = {
    val digits = new Array[Int](res)
    var c = ijk
    var r = res
    while (r >= 1) {
      val parent = if (isClassIII(r)) upAp7III(c) else upAp7II(c)
      val center = if (isClassIII(r)) downAp7III(parent) else downAp7II(parent)
      val d = digitOf(c - center)
      if (d < 0) return None
      digits(r - 1) = d
      c = parent
      r -= 1
    }
    if (c.normalized != CoordIJK(0, 0, 0)) return None // outside this base cell
    val cell = H3.fromParts(baseCell, res, digits.toIndexedSeq)
    if (H3.isValidCell(cell)) Some(cell) else None
  }

  /** Hex grid distance between two local IJK coordinates (cube metric). */
  def hexDistance(a: CoordIJK, b: CoordIJK): Int = {
    val d = (a - b).normalized
    math.max(d.i, math.max(d.j, d.k))
  }
}

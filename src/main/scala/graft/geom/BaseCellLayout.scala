package graft.geom

import graft.h3.H3

/**
 * The ABSOLUTE placement of the 122 res-0 base cells on the sphere — the
 * single injection point separating the (canonical) in-base-cell aperture-7
 * algebra from the (environment-limited) face/base-cell data tables.
 *
 * The canonical H3 placement derives from the icosahedron tables of the H3
 * core library (faceCenterGeo, faceAxesAzRadsCII, baseCellData — inherited
 * by the reference via h3ron, `traversal.rs:131-162`), which cannot be
 * reproduced verifiably offline (the face-0 azimuth is an arbitrary
 * measured constant, not derivable). Rather than embed half-remembered
 * numbers, [[Geo]] defaults to the deterministic [[FibonacciLayout]] and
 * consumes placement ONLY through this trait: the day canonical tables can
 * be brought in and validated, the swap is one object implementing
 * `center` + `azimuth` — no algebra, traversal, or storage code changes.
 * `CanonicalLayoutSpec` validates any injected layout against public libh3
 * anchor vectors (from an optional resource file) and skips cleanly when
 * running the default.
 */
trait BaseCellLayout {

  /** Center of base cell `bc` as (latRadians, lngRadians). */
  def center(bc: Int): (Double, Double)

  /** Counter-clockwise rotation (radians) of `bc`'s hex lattice relative
    * to the north axis of the azimuthal-equidistant plane at its center —
    * canonical tables carry a per-face azimuth; the default lattice is
    * unrotated. */
  def azimuth(bc: Int): Double = 0.0
}

/** Deterministic self-consistent default: the 122 base-cell centers on a
  * Fibonacci sphere lattice (even spacing, no data tables), lattices
  * unrotated. All round-trip and coverage properties of [[Geo]] hold in
  * this frame; only absolute lat/lng placement differs from libh3. */
object FibonacciLayout extends BaseCellLayout {
  private val GoldenAngle = math.Pi * (3.0 - math.sqrt(5.0))

  private val centers: Array[(Double, Double)] = Array.tabulate(H3.NumBaseCells) { b =>
    val z = 1.0 - 2.0 * (b + 0.5) / H3.NumBaseCells
    val lat = math.asin(z)
    val lng = {
      val l = (b * GoldenAngle) % (2 * math.Pi)
      if (l > math.Pi) l - 2 * math.Pi else l
    }
    (lat, lng)
  }

  override def center(bc: Int): (Double, Double) = centers(bc)
}

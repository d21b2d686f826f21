package graft.h3

/**
 * Pure-Scala H3 cell-index math (no external deps), implemented from the
 * public H3 index bit-layout specification (h3geo.org/docs/core-library/h3Indexing).
 *
 * Only *index* math lives here — parent/children/resolution/base-cell/validity.
 * This is the complete algebra needed by the tableset engine: the reference
 * engine (dlr-eoc/ukis-h3cellstore) relies on the equivalent ClickHouse
 * builtins `h3ToParent` / `h3GetResolution` / `h3GetBaseCell` /
 * `h3ToChildren` (see reference `compacted_tables/insert.rs:393-517`,
 * `schema/partitioning.rs:98-130`). Geographic math (cell↔lat/lng, polyfill,
 * gridDisk) is layered separately in `graft.geom`.
 *
 * Bit layout of a cell index (64 bits, MSB first):
 *   1 bit  reserved (0)
 *   4 bits mode (1 = cell)
 *   3 bits reserved (0)
 *   4 bits resolution (0..15)
 *   7 bits base cell (0..121)
 *   15 x 3 bits per-resolution digits (0..6; unused digits = 7)
 *
 * H3 indexes never set the sign bit, so they are safely carried in Spark
 * `LongType` (reference stores them as ClickHouse UInt64).
 */
object H3 {
  final val MaxRes = 15
  final val NumBaseCells = 122

  private final val ModeOffset = 59
  private final val ResOffset = 52
  private final val BaseCellOffset = 45
  private final val PerDigitBits = 3
  private final val DigitMask = 7L
  private final val ModeCell = 1L

  /** Base-cell numbers that are pentagons (12 of the 122, public H3 table). */
  private final val PentagonBaseCells: Array[Boolean] = {
    val a = new Array[Boolean](NumBaseCells)
    for (b <- Array(4, 14, 24, 38, 49, 58, 63, 72, 83, 97, 107, 117)) a(b) = true
    a
  }

  @inline def digitShift(res: Int): Int = (MaxRes - res) * PerDigitBits

  @inline def getResolution(h: Long): Int = ((h >>> ResOffset) & 0xFL).toInt

  @inline def getBaseCell(h: Long): Int = ((h >>> BaseCellOffset) & 0x7FL).toInt

  @inline def getDigit(h: Long, res: Int): Int =
    ((h >>> digitShift(res)) & DigitMask).toInt

  def isPentagonBaseCell(bc: Int): Boolean =
    bc >= 0 && bc < NumBaseCells && PentagonBaseCells(bc)

  /** First non-zero digit of the index, or 0 if all digits are zero
    * (i.e. the cell is a center-child chain of its base cell). */
  def leadingNonZeroDigit(h: Long): Int = {
    val res = getResolution(h)
    var r = 1
    while (r <= res) {
      val d = getDigit(h, r)
      if (d != 0) return d
      r += 1
    }
    0
  }

  /** A cell is a pentagon iff its base cell is a pentagon and every digit is
    * the center digit (0). */
  def isPentagon(h: Long): Boolean =
    isPentagonBaseCell(getBaseCell(h)) && leadingNonZeroDigit(h) == 0

  /** Full cell-index validation, matching the semantics of the reference's
    * mandatory h3index column check (SURVEY P5; reference `utils.rs:9-20`). */
  def isValidCell(h: Long): Boolean = {
    if (h < 0) return false // reserved high bit must be 0
    if (((h >>> ModeOffset) & 0xFL) != ModeCell) return false
    if (((h >>> 56) & 0x7L) != 0L) return false // reserved mode bits
    val res = getResolution(h)
    val bc = getBaseCell(h)
    if (bc >= NumBaseCells) return false
    val bcIsPentagon = PentagonBaseCells(bc)
    var seenNonZero = false
    var r = 1
    while (r <= res) {
      val d = getDigit(h, r)
      if (d == 7) return false
      if (d == 1 && bcIsPentagon && !seenNonZero) return false // deleted K axis
      if (d != 0) seenNonZero = true
      r += 1
    }
    r = res + 1
    while (r <= MaxRes) {
      if (getDigit(h, r) != 7) return false
      r += 1
    }
    true
  }

  /** Coarsen a cell to `parentRes`. Pure bit math: truncate the resolution
    * field and set all finer digits to 7. Mirrors ClickHouse `h3ToParent`
    * used by the reference rollup (`insert.rs:495-500`). */
  def toParent(h: Long, parentRes: Int): Long = {
    val res = getResolution(h)
    require(parentRes >= 0 && parentRes <= res,
      s"parentRes $parentRes out of range for cell at res $res")
    if (parentRes == res) h
    else
      (h & ~(0xFL << ResOffset)) |
        (parentRes.toLong << ResOffset) |
        ((1L << digitShift(parentRes)) - 1)
  }

  /** toParent without argument validation, for hot expression paths.
    * Returns the input unchanged when parentRes >= cell res. */
  @inline def toParentUnsafe(h: Long, parentRes: Int): Long = {
    if (parentRes >= getResolution(h)) h
    else
      (h & ~(0xFL << ResOffset)) |
        (parentRes.toLong << ResOffset) |
        ((1L << digitShift(parentRes)) - 1)
  }

  /** Numeric [min, max] envelope (inclusive) containing EVERY descendant of
    * `h` at `childRes` — and possibly invalid digit combinations in between
    * (a superset, never an exact enumeration). In the index layout the
    * digits `res(h)+1..childRes` are the only varying bits (digits beyond
    * childRes stay 7, the resolution field is fixed at childRes), so the
    * all-zeros and all-sixes fillings bound the set numerically. This is
    * what makes h3index-sorted parquet row groups SKIPPABLE for probe
    * queries: the envelope is a plain range predicate on the raw column. */
  def descendantRange(h: Long, childRes: Int): (Long, Long) = {
    val res = getResolution(h)
    require(childRes >= res && childRes <= MaxRes,
      s"childRes $childRes out of range for cell at res $res")
    val clear = ((1L << digitShift(res)) - 1) & ~((1L << digitShift(childRes)) - 1)
    val lo = (h & ~(0xFL << ResOffset) & ~clear) | (childRes.toLong << ResOffset)
    var sixes = 0L
    var k = 0
    while (k < childRes - res) { sixes |= 6L << (digitShift(childRes) + 3 * k); k += 1 }
    (lo, lo | sixes)
  }

  /** EXACT numeric preimage of `toParentUnsafe(x, res(p)) == p` as inclusive
    * [lo, hi] ranges over ALL 64-bit inputs — valid cells AND garbage longs
    * alike (toParentUnsafe is pure bit math, so garbage inputs can still
    * land on `p`; an inferred scan predicate must admit them or it changes
    * query results on unvalidated data).
    *
    * Derivation: toParentUnsafe keeps every bit of x above digitShift(r)
    * except the resolution field (replaced by r) and forces the bits below
    * to 1s. So x maps to p iff (a) x == p exactly (the res-field <= r
    * pass-through can only hit p itself, since p carries res field r), or
    * (b) x's res field is some rho > r and all other bits above
    * digitShift(r) equal p's — i.e. one contiguous block of width
    * 2^digitShift(r) per rho, because the resolution field (bits 52-55)
    * sits ABOVE the base cell + digit bits. The ranges are disjoint and
    * ascending. One parent at res r yields 1 + (15 - r) ranges. */
  def parentPreimageRanges(p: Long, parentRes: Int): Seq[(Long, Long)] = {
    require(parentRes >= 0 && parentRes <= MaxRes, s"res $parentRes out of range")
    val mask = (1L << digitShift(parentRes)) - 1
    val prefix = p & ~(0xFL << ResOffset) & ~mask
    (p, p) +: (parentRes + 1 to MaxRes).map { rho =>
      val lo = prefix | (rho.toLong << ResOffset)
      (lo, lo | mask)
    }
  }

  /** Child of `h` one resolution finer, taking direction digit `d` (0..6). */
  @inline private def makeChild(h: Long, childRes: Int, d: Int): Long = {
    val sh = digitShift(childRes)
    (h & ~(0xFL << ResOffset) & ~(DigitMask << sh)) |
      (childRes.toLong << ResOffset) |
      (d.toLong << sh)
  }

  /** Center child at `childRes`: all new digits 0. */
  def centerChild(h: Long, childRes: Int): Long = {
    val res = getResolution(h)
    require(childRes >= res && childRes <= MaxRes)
    var c = h
    var r = res
    while (r < childRes) { c = makeChild(c, r + 1, 0); r += 1 }
    c
  }

  /** Number of children of `h` at `childRes` — pentagon-aware.
    * Hexagon: 7^d. Pentagon: 1 + 5 * (7^d - 1) / 6 (the pentagon's center
    * child is again a pentagon with 6 children). Mirrors ClickHouse
    * `length(h3ToChildren(...))` in the reference (`insert.rs:391-401`). */
  def childrenCount(h: Long, childRes: Int): Long = {
    val res = getResolution(h)
    require(childRes >= res && childRes <= MaxRes,
      s"childRes $childRes out of range for cell at res $res")
    val d = childRes - res
    if (!isPentagon(h)) pow7(d)
    else 1L + 5L * (pow7(d) - 1L) / 6L
  }

  @inline def pow7(d: Int): Long = {
    var p = 1L
    var i = 0
    while (i < d) { p *= 7L; i += 1 }
    p
  }

  /** Enumerate all children of `h` at `childRes` (pentagon-aware: the K-axis
    * subtree under a pentagon center chain does not exist). Order: depth-first
    * by digit. */
  def toChildren(h: Long, childRes: Int): Array[Long] = {
    val res = getResolution(h)
    require(childRes >= res && childRes <= MaxRes,
      s"childRes $childRes out of range for cell at res $res")
    val count = childrenCount(h, childRes)
    // guard BEFORE allocation: 7^12+ children overflows Int and would
    // otherwise request a negative-size array
    require(count <= Int.MaxValue,
      s"toChildren would produce $count cells (res $res -> $childRes); enumerate stepwise instead")
    val out = new Array[Long](count.toInt)
    var n = 0
    def rec(cell: Long, r: Int): Unit = {
      if (r == childRes) { out(n) = cell; n += 1 }
      else {
        val pent = isPentagon(cell)
        var d = 0
        while (d <= 6) {
          if (!(pent && d == 1)) rec(makeChild(cell, r + 1, d), r + 1)
          d += 1
        }
      }
    }
    rec(h, res)
    out
  }

  /** Is `child` contained in (equal to or a descendant of) `parent`? */
  def isAncestorOf(parent: Long, child: Long): Boolean = {
    val pr = getResolution(parent)
    val cr = getResolution(child)
    pr <= cr && toParentUnsafe(child, pr) == parent
  }

  /** Construct a cell index from parts — used by tests and by the
    * deterministic index construction in the correctness oracles.
    * Digits beyond `res` are set to 7. No pentagon/K-axis validation. */
  def fromParts(baseCell: Int, res: Int, digits: Seq[Int]): Long = {
    require(baseCell >= 0 && baseCell < NumBaseCells)
    require(res >= 0 && res <= MaxRes && digits.length == res)
    var h = (ModeCell << ModeOffset) |
      (res.toLong << ResOffset) |
      (baseCell.toLong << BaseCellOffset)
    var r = 1
    while (r <= MaxRes) {
      val d = if (r <= res) digits(r - 1).toLong else DigitMask
      h |= d << digitShift(r)
      r += 1
    }
    h
  }
}

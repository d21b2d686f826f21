package graft.h3

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen

/** Generators for structurally valid H3 cells (respecting the deleted
  * K-axis rule under pentagon center chains). */
object H3Gen {
  val hexBaseCells: Seq[Int] =
    (0 until H3.NumBaseCells).filterNot(H3.isPentagonBaseCell)
  val pentBaseCells: Seq[Int] =
    (0 until H3.NumBaseCells).filter(H3.isPentagonBaseCell)

  def cellAt(res: Int, pentagonOk: Boolean = true): Gen[Long] = for {
    bc <- if (pentagonOk) Gen.choose(0, H3.NumBaseCells - 1)
          else Gen.oneOf(hexBaseCells)
    rawDigits <- Gen.listOfN(res, Gen.choose(0, 6))
  } yield {
    // fix up the deleted K axis: under a pentagon, the first non-zero digit
    // must not be 1
    val digits =
      if (!H3.isPentagonBaseCell(bc)) rawDigits
      else {
        var seen = false
        rawDigits.map { d =>
          val fixed = if (!seen && d == 1) 2 else d
          if (fixed != 0) seen = true
          fixed
        }
      }
    H3.fromParts(bc, res, digits)
  }

  val anyCell: Gen[Long] = Gen.choose(0, 15).flatMap(cellAt(_))
}

class H3Spec extends AnyFunSuite with graft.PropHelper {
  import H3Gen._

  // A couple of well-known public example indexes (H3 documentation):
  // 0x85283473fffffff is the res-5 cell used throughout h3geo.org docs.
  val DocCellRes5 = 0x85283473fffffffL

  test("known cell: resolution / validity / digits") {
    assert(H3.isValidCell(DocCellRes5))
    assert(H3.getResolution(DocCellRes5) == 5)
    // digits 6..15 must read as 7
    (6 to 15).foreach(r => assert(H3.getDigit(DocCellRes5, r) == 7))
  }

  test("res 0 cell round trip via fromParts") {
    val c = H3.fromParts(20, 0, Nil)
    assert(H3.isValidCell(c))
    assert(H3.getResolution(c) == 0)
    assert(H3.getBaseCell(c) == 20)
  }

  test("generated cells are valid") {
    forAll(anyCell) { h => assert(H3.isValidCell(h)) }
  }

  test("invalid: high bit set, wrong mode, digit 7 below res") {
    forAll(anyCell) { h =>
      assert(!H3.isValidCell(h | (1L << 63)))
      assert(!H3.isValidCell(h & ~(0xFL << 59))) // mode 0
    }
    // digit set to 7 below res
    val c = H3.fromParts(10, 3, Seq(1, 2, 3))
    val broken = c | (7L << H3.digitShift(2))
    assert(!H3.isValidCell(broken))
    // unused digit not 7
    val broken2 = c & ~(7L << H3.digitShift(9))
    assert(!H3.isValidCell(broken2))
    // base cell out of range (125 >= 122)
    val c2 = H3.fromParts(121, 2, Seq(0, 0))
    assert(!H3.isValidCell((c2 & ~(0x7FL << 45)) | (125L << 45)))
  }

  test("pentagon: K-axis child of a pentagon chain is invalid") {
    val pent = H3.fromParts(4, 0, Nil)
    assert(H3.isPentagon(pent))
    val kChild = H3.fromParts(4, 1, Seq(1))
    assert(!H3.isValidCell(kChild))
    val okChild = H3.fromParts(4, 1, Seq(2))
    assert(H3.isValidCell(okChild) && !H3.isPentagon(okChild))
    val centerChild = H3.fromParts(4, 1, Seq(0))
    assert(H3.isValidCell(centerChild) && H3.isPentagon(centerChild))
    // once a non-zero digit appeared, digit 1 is fine again
    val deeper = H3.fromParts(4, 3, Seq(2, 1, 1))
    assert(H3.isValidCell(deeper))
  }

  test("toParent: parent of child is the original cell") {
    forAll(Gen.choose(0, 14).flatMap(r => cellAt(r).map((_, r)))) {
      case (h, r) =>
        val children = H3.toChildren(h, math.min(r + 2, 15))
        children.foreach { c =>
          assert(H3.toParent(c, r) == h)
          assert(H3.isValidCell(c))
        }
    }
  }

  test("toParent at same res is identity; digits above parentRes become 7") {
    forAll(anyCell) { h =>
      val r = H3.getResolution(h)
      assert(H3.toParent(h, r) == h)
      if (r > 0) {
        val p = H3.toParent(h, r - 1)
        assert(H3.getResolution(p) == r - 1)
        assert(H3.getDigit(p, r) == 7)
        assert(H3.isValidCell(p))
      }
    }
  }

  test("childrenCount matches enumeration, hexagons and pentagons") {
    val hexCell = H3.fromParts(20, 1, Seq(3))
    assert(H3.childrenCount(hexCell, 3) == 49)
    assert(H3.toChildren(hexCell, 3).length == 49)

    val pent = H3.fromParts(4, 0, Nil)
    assert(H3.childrenCount(pent, 1) == 6)
    assert(H3.toChildren(pent, 1).length == 6)
    assert(H3.childrenCount(pent, 2) == 41)
    val g2 = H3.toChildren(pent, 2)
    assert(g2.length == 41)
    assert(g2.distinct.length == 41)
    g2.foreach(c => assert(H3.isValidCell(c)))
  }

  test("toChildren: distinct, valid, correct res, all descend from parent") {
    forAll(Gen.choose(0, 13).flatMap(r => cellAt(r).map((_, r)))) {
      case (h, r) =>
        val cr = math.min(r + 2, 15)
        val kids = H3.toChildren(h, cr)
        assert(kids.length == H3.childrenCount(h, cr))
        assert(kids.distinct.length == kids.length)
        kids.foreach { c =>
          assert(H3.getResolution(c) == cr)
          assert(H3.isAncestorOf(h, c))
        }
    }
  }

  test("descendantRange bounds every child; nothing outside descends") {
    forAll(Gen.choose(0, 13).flatMap(r => cellAt(r).map((_, r)))) {
      case (h, r) =>
        val cr = math.min(r + 2, 15)
        val (lo, hi) = H3.descendantRange(h, cr)
        // every enumerated descendant falls inside the envelope
        H3.toChildren(h, cr).foreach { c => assert(lo <= c && c <= hi) }
        // the envelope at the cell's own res is the cell itself
        assert(H3.descendantRange(h, r) == ((h, h)))
        // boundary values carry the child resolution and descend from h
        assert(H3.getResolution(lo) == cr && H3.isAncestorOf(h, lo))
        assert(H3.getResolution(hi) == cr)
    }
  }

  test("centerChild keeps pentagon-ness") {
    val pent = H3.fromParts(14, 0, Nil)
    val cc = H3.centerChild(pent, 4)
    assert(H3.isPentagon(cc))
    assert(H3.getResolution(cc) == 4)
    val hex = H3.fromParts(20, 0, Nil)
    assert(!H3.isPentagon(H3.centerChild(hex, 4)))
  }

  test("fromParts digit round trip") {
    val digits = Seq(0, 1, 2, 3, 4, 5, 6)
    val c = H3.fromParts(33, 7, digits)
    (1 to 7).foreach(r => assert(H3.getDigit(c, r) == digits(r - 1)))
    assert(H3.getBaseCell(c) == 33)
    assert(H3.isValidCell(c))
  }

  test("res-15 cells: no sign surprises") {
    forAll(cellAt(15)) { h =>
      assert(h > 0)
      assert(H3.getResolution(h) == 15)
      assert(H3.toParent(h, 0) > 0)
    }
  }
}

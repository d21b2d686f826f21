package graft

import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Minimal deterministic property-check helper (the scalatestplus bridge is
  * not available in the offline dependency cache). */
trait PropHelper {
  def forAll[A](gen: Gen[A], n: Int = 200)(f: A => Unit): Unit = {
    var i = 0
    while (i < n) {
      val a = gen.pureApply(Gen.Parameters.default, Seed(42L + i), retries = 1000)
      try f(a)
      catch {
        case e: Throwable =>
          throw new AssertionError(s"property failed for sample #$i: $a", e)
      }
      i += 1
    }
  }
}

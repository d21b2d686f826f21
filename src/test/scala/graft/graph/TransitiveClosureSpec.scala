package graft.graph

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.SparkTestSession

/** Property coverage for the semi-naive reachability closure beyond the
  * fixtures in Round4GatesSpec: random DAGs against an in-memory BFS
  * reference, plus edge shapes (empty, self-contained components,
  * duplicate edges, diamond fan-in). */
class TransitiveClosureSpec extends AnyFunSuite with Matchers with SparkTestSession {

  /** In-memory reference: BFS from every vertex. */
  private def bruteClosure(edges: Seq[(Long, Long)]): Set[(Long, Long)] = {
    val adj = edges.groupBy(_._1).map { case (s, es) => s -> es.map(_._2).toSet }
    val verts = edges.flatMap(e => Seq(e._1, e._2)).distinct
    verts.flatMap { v =>
      var seen = Set.empty[Long]
      var frontier = adj.getOrElse(v, Set.empty)
      while (frontier.nonEmpty) {
        seen ++= frontier
        frontier = frontier.flatMap(adj.getOrElse(_, Set.empty)) -- seen
      }
      seen.map(v -> _)
    }.toSet
  }

  private def sparkClosure(edges: Seq[(Long, Long)]): Set[(Long, Long)] = {
    import spark.implicits._
    TransitiveClosure.closure(edges.toDF("src", "dst"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
  }

  test("property: closure equals per-vertex BFS on seeded random ascending DAGs") {
    val rng = new scala.util.Random(7)
    for (trial <- 1 to 5) {
      val n = 10 + rng.nextInt(30)
      val edges = (1 to n * 2).map { _ =>
        val a = rng.nextInt(n); val b = a + 1 + rng.nextInt(n - a + 1)
        (a.toLong, b.toLong)
      }.distinct
      withClue(s"trial $trial (n=$n, ${edges.size} edges): ") {
        sparkClosure(edges) shouldBe bruteClosure(edges)
      }
    }
  }

  test("duplicate edges collapse; disjoint components never cross") {
    val edges = Seq((1L, 2L), (1L, 2L), (2L, 3L), (10L, 11L), (11L, 12L))
    val out = sparkClosure(edges)
    out shouldBe Set((1L, 2L), (2L, 3L), (1L, 3L), (10L, 11L), (11L, 12L), (10L, 12L))
  }

  test("empty edge set yields an empty closure") {
    import spark.implicits._
    TransitiveClosure.closure(
      Seq.empty[(Long, Long)].toDF("src", "dst")).count() shouldBe 0L
  }

  test("cyclic input saturates and terminates (no ascending-DAG assumption needed)") {
    // 1 -> 2 -> 3 -> 1: every ordered pair of distinct vertices is
    // reachable, plus each vertex reaches itself around the cycle
    val out = sparkClosure(Seq((1L, 2L), (2L, 3L), (3L, 1L)))
    out shouldBe (for (a <- 1L to 3L; b <- 1L to 3L) yield (a, b)).toSet
  }
}

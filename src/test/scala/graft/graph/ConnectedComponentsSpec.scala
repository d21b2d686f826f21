package graft.graph

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.SparkTestSession

/** Connected components vs a driver-side union-find referee on random
  * graphs, plus shape properties (isolated vertices, chains, stars). */
class ConnectedComponentsSpec extends AnyFunSuite with Matchers with SparkTestSession {

  /** Driver-side union-find: expected (id -> min id in component). */
  private def referee(n: Long, edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val parent = scala.collection.mutable.Map[Long, Long]((0L until n).map(i => i -> i): _*)
    def find(x: Long): Long = { if (parent(x) != x) parent(x) = find(parent(x)); parent(x) }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b)); if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    (0L until n).map(i => i -> find(i)).toMap
  }

  private def runCc(n: Long, edges: Seq[(Long, Long)]): Map[Long, Long] = {
    import spark.implicits._
    val verts = spark.range(n).select(col("id"))
    val e = edges.toDF("src", "dst")
    ConnectedComponents.run(verts, e).collect()
      .map(r => r.getAs[Long]("id") -> r.getAs[Long]("label")).toMap
  }

  test("random graph matches union-find referee") {
    val rnd = new scala.util.Random(42)
    val n = 200L
    val edges = Seq.fill(120)((rnd.nextLong(n).abs % n, rnd.nextLong(n).abs % n))
      .filter { case (a, b) => a != b }
    runCc(n, edges) shouldBe referee(n, edges)
  }

  test("isolated vertices keep their own label; a chain collapses to its min") {
    // chain 10-11-...-19 has diameter 9 — exercises multi-round convergence
    val chain = (10L until 19L).map(i => (i, i + 1))
    val got = runCc(30, chain)
    (0L until 10L).foreach(i => got(i) shouldBe i)
    (10L until 20L).foreach(i => got(i) shouldBe 10L)
    (20L until 30L).foreach(i => got(i) shouldBe i)
  }

  test("star graphs (the dedup-verification shape) converge and label by representative") {
    val star = (1L until 50L).map(i => (0L, i)) ++ (60L until 70L).map(i => (55L, i))
    val got = runCc(80, star)
    (0L until 50L).foreach(i => got(i) shouldBe 0L)
    got(55L) shouldBe 55L
    (60L until 70L).foreach(i => got(i) shouldBe 55L)
  }

  test("overlapping buckets merge transitively (a-b, b-c => one cluster)") {
    val got = runCc(6, Seq((0L, 3L), (3L, 5L), (1L, 2L)))
    got(0L) shouldBe 0L; got(3L) shouldBe 0L; got(5L) shouldBe 0L
    got(1L) shouldBe 1L; got(2L) shouldBe 1L; got(4L) shouldBe 4L
  }
}

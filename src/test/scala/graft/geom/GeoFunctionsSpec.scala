package graft.geom

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.SparkTestSession

/** Distributed geo Column API + SQL registration — the reference's own geo
  * anchor shape: `SELECT geoToH3(52.26, 8.05, 5)` through the SQL surface
  * (test_connection.py:38-46). */
class GeoFunctionsSpec extends AnyFunSuite with Matchers with SparkTestSession {

  test("Column API matches the driver-side Geo implementation per row") {
    import spark.implicits._
    val pts = Seq((52.26, 8.05), (0.0, 0.0), (-45.5, 170.2), (48.13, 11.58))
    val got = pts.toDF("lat", "lng")
      .withColumn("cell", GeoFunctions.latlng_to_cell(col("lat"), col("lng"), lit(5)))
      .withColumn("clat", GeoFunctions.cell_to_lat(col("cell")))
      .withColumn("clng", GeoFunctions.cell_to_lng(col("cell")))
      .collect()
    got.foreach { r =>
      val expected = Geo.latLngToCell(r.getDouble(0), r.getDouble(1), 5)
      r.getAs[Long]("cell") shouldBe expected
      val (lat, lng) = Geo.cellToLatLng(expected)
      r.getAs[Double]("clat") shouldBe lat +- 1e-12
      r.getAs[Double]("clng") shouldBe lng +- 1e-12
    }
  }

  test("h3_grid_disk Column + SQL: full disk per row, matches Grid.gridDisk") {
    import spark.implicits._
    GeoFunctions.register(spark)
    val origin = java.lang.Long.parseLong("8928308280fffff", 16)
    val viaColumn = Seq(origin).toDF("cell")
      .select(explode(GeoFunctions.h3_grid_disk(col("cell"), lit(1))).as("n"))
      .collect().map(_.getLong(0)).toSet
    viaColumn shouldBe Grid.gridDisk(origin, 1).toSet
    val viaSql = spark.sql(s"SELECT explode(h3_grid_disk(${origin}L, 1)) AS n")
      .collect().map(_.getLong(0)).toSet
    viaSql shouldBe viaColumn
  }

  test("h3_grid_ring / h3_grid_distance: Column + SQL match Grid, NULL on no path") {
    import spark.implicits._
    graft.Graft.register(spark)
    val origin = graft.h3.H3.fromParts(20, 5, Seq(2, 3, 4, 5, 6))
    val ring2 = Grid.gridRing(origin, 2)
    val gotRing = Seq(origin).toDF("c")
      .select(GeoFunctions.h3_grid_ring(col("c"), lit(2)).as("r"))
      .head().getSeq[Long](0)
    gotRing should contain theSameElementsAs ring2
    val neighbor = ring2.head
    val viaSql = spark.sql(
      s"SELECT h3_grid_distance(${origin}L, ${neighbor}L) AS d").head()
    viaSql.getInt(0) shouldBe Grid.gridDistance(origin, neighbor).get
    // cells at different resolutions: no grid path -> SQL NULL
    val parent = graft.h3.H3.toParent(origin, 3)
    spark.sql(s"SELECT h3_grid_distance(${origin}L, ${parent}L) AS d")
      .head().isNullAt(0) shouldBe true
  }

  test("SQL surface: h3_grid_path matches Grid.gridPathCells, NULL cross-base") {
    graft.Graft.register(spark)
    val origin = graft.h3.H3.fromParts(20, 5, Seq(2, 3, 4, 5, 6))
    val target = Grid.gridRing(origin, 3)
      .filter(c => graft.h3.H3.getBaseCell(c) == 20).head
    val got = spark.sql(s"SELECT h3_grid_path(${origin}L, ${target}L) AS p")
      .head().getSeq[Long](0)
    got shouldBe Grid.gridPathCells(origin, target).get
    got.length shouldBe 4 // distance 3 -> 4 cells
    val otherBase = graft.h3.H3.fromParts(25, 5, Seq(0, 0, 0, 0, 0))
    spark.sql(s"SELECT h3_grid_path(${origin}L, ${otherBase}L) AS p")
      .head().isNullAt(0) shouldBe true
  }

  test("SQL surface: latlng_to_cell(52.26, 8.05, 5) arrayJoin-style anchor") {
    GeoFunctions.register(spark)
    val cell = spark.sql("SELECT latlng_to_cell(52.26, 8.05, 5) AS c")
      .head().getLong(0)
    cell shouldBe Geo.latLngToCell(52.26, 8.05, 5)
    // round-trip through SQL: re-resolving the center lands on the same cell
    val rt = spark.sql(
      s"SELECT latlng_to_cell(cell_to_lat($cell), cell_to_lng($cell), 5) AS c")
      .head().getLong(0)
    rt shouldBe cell
  }
}

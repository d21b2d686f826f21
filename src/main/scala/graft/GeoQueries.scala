package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.geom.{Geo, GeoFunctions}

/**
 * Geo-layer correctness gate (F5/G1): cell<->lat/lng round-trips and polygon
 * coverage, hash-matched against PRECOMPUTED fixed vectors (the reference's
 * own geo anchor is the same shape: a fixed `geoToH3(52.26, 8.05, 5)` probe,
 * `test_connection.py:38-46`).
 *
 * The oracle side is a literal table: DuckDB cannot re-derive the placement
 * (it is this library's algorithm), so the gate pins (a) the implementation
 * against regression — any change to the lattice, aperture parity, or
 * rounding shows up as a hash mismatch — and (b) the round-trip invariant
 * latLngToCell(cellToLatLng(c), res) == c, which the Spark side computes
 * per row and the oracle asserts as a constant TRUE column.
 *
 * g1 points: 64 deterministic globe-spread (lat, lng) pairs,
 * lat = ((i*37 mod 64)/63)*120-60, lng = ((i*53 mod 64)/63)*340-170, res 5.
 * g2 polygon: the triangle (6 48, 10.5 48.5, 8 52.3) at res 4.
 */
object GeoQueries {

  private val g1Expected: Seq[(Int, Long)] = Seq(
    (0, 602991447116873727L), (1, 600683358535548927L), (2, 602497188722900991L),
    (3, 600202322198396927L), (4, 602018937672040447L), (5, 599712174088126463L),
    (6, 601249915187757055L), (7, 602778663699611647L), (8, 600287430196592639L),
    (9, 602595737821249535L), (10, 599811498428071935L), (11, 601633838019379199L),
    (12, 599303277095419903L), (13, 600869093322522623L), (14, 602673661412900863L),
    (15, 600632417002192895L), (16, 602184218751008767L), (17, 599697353229729791L),
    (18, 601697706330554367L), (19, 599394526896848895L), (20, 601195366955614207L),
    (21, 602286082490367999L), (22, 600255045069438975L), (23, 601818896349003775L),
    (24, 599489583113043967L), (25, 601302696040857599L), (26, 602867263506219007L),
    (27, 600834748616540159L), (28, 602648070924009471L), (29, 599858954595467263L),
    (30, 601882773250113535L), (31, 599379361367326719L), (32, 600921916051554303L),
    (33, 602757060014112767L), (34, 600440084071710719L), (35, 601991963129937919L),
    (36, 599939875000549375L), (37, 601497484618891263L), (38, 599464517683904511L),
    (39, 600526863885926399L), (40, 602841681607262207L), (41, 600040748749946879L),
    (42, 602331439492497407L), (43, 599544634930102271L), (44, 601386176246448127L),
    (45, 602919761965219839L), (46, 600887806495031295L), (47, 602443228901277695L),
    (48, 600104651420860415L), (49, 601935367272136703L), (50, 599451209727737855L),
    (51, 601471366922764287L), (52, 602813848071700479L), (53, 600232517965971455L),
    (54, 602527253493972991L), (55, 599738277825609727L), (56, 601550236480962559L),
    (57, 599518666484088831L), (58, 601054629467258879L), (59, 602625969022304255L),
    (60, 600562048258015231L), (61, 602130090351919103L), (62, 599627471964340223L),
    (63, 601182562584363007L))

  /** 64 fixed points -> cell at res 5 + round-trip invariant, fully
    * distributed (UDF per row over spark.range). */
  def g1GeoRoundtrip(spark: SparkSession, dir: String): DataFrame = {
    val lat = (pmod(col("id") * 37, lit(64)) / 63.0) * 120.0 - 60.0
    val lng = (pmod(col("id") * 53, lit(64)) / 63.0) * 340.0 - 170.0
    val df = spark.range(64)
      .withColumn("cell", GeoFunctions.latlng_to_cell(lat, lng, lit(5)))
    df.withColumn("rt_ok",
        GeoFunctions.latlng_to_cell(
          GeoFunctions.cell_to_lat(col("cell")),
          GeoFunctions.cell_to_lng(col("cell")), lit(5)) === col("cell"))
      .select(col("id").as("i"), col("cell"), col("rt_ok"))
      .orderBy(col("i"))
  }

  /** Triangle polyfill at res 4 (fixed polygon, precomputed coverage). */
  def g2Polyfill(spark: SparkSession, dir: String): DataFrame = {
    val factory = new org.locationtech.jts.geom.GeometryFactory()
    val tri = factory.createPolygon(Array(
      new org.locationtech.jts.geom.Coordinate(6.0, 48.0),
      new org.locationtech.jts.geom.Coordinate(10.5, 48.5),
      new org.locationtech.jts.geom.Coordinate(8.0, 52.3),
      new org.locationtech.jts.geom.Coordinate(6.0, 48.0)))
    import spark.implicits._
    Geo.polyfill(tri, 4).toDF("cell").orderBy(col("cell"))
  }

  private val g2Expected: Seq[Long] = Seq(
    594756634379550719L, 595214031216705535L, 595240574114594815L,
    595240608474333183L, 595240848992501759L, 595240883352240127L,
    595241519007399935L, 595241527597334527L, 595241536187269119L,
    595241544777203711L, 595241553367138303L, 595241561957072895L,
    595241570547007487L, 595241587726876671L, 595241596316811263L,
    595241604906745855L, 595241613496680447L, 595241622086615039L,
    595241630676549631L, 595241639266484223L, 595241656446353407L,
    595241690806091775L, 595241699396026367L, 595241707985960959L,
    595241725165830143L, 595241733755764735L, 595241759525568511L,
    595241768115503103L, 595241776705437695L, 595241793885306879L,
    595241802475241471L, 595241811065176063L, 595241819655110655L,
    595241828245045247L, 595241836834979839L, 595241845424914431L,
    595241862604783615L, 595241871194718207L, 595241879784652799L,
    595241888374587391L, 595241896964521983L, 595241905554456575L,
    595241914144391167L, 595241931324260351L, 595241939914194943L,
    595241948504129535L, 595241957094064127L, 595241965683998719L,
    595241974273933311L, 595241982863867903L, 595242481080074239L,
    595242498259943423L, 595242515439812607L, 595242532619681791L,
    595243812519935999L, 595243924189085695L, 595243932779020287L,
    595243941368954879L, 595243949958889471L, 595243967138758655L)

  /** G3 border cells over the same triangle as g2, at widths 1 and 2 — the
    * reference's border_cells (geom/border_cells.rs:15-77): cells within
    * ~width cells of the exterior ring, via JTS inward offset + strip
    * polyfill. Pinned like g1/g2 to precomputed vectors; the suite's
    * structural invariants (subset-of-polyfill, monotone in width) are
    * spec-asserted in GeomSpec. */
  def g3BorderCells(spark: SparkSession, dir: String): DataFrame = {
    val factory = new org.locationtech.jts.geom.GeometryFactory()
    val tri = factory.createPolygon(Array(
      new org.locationtech.jts.geom.Coordinate(6.0, 48.0),
      new org.locationtech.jts.geom.Coordinate(10.5, 48.5),
      new org.locationtech.jts.geom.Coordinate(8.0, 52.3),
      new org.locationtech.jts.geom.Coordinate(6.0, 48.0)))
    import spark.implicits._
    Seq(1, 2).flatMap(w => Geo.borderCells(tri, 4, w).map(c => (w, c)))
      .toDF("width", "cell").orderBy(col("width"), col("cell"))
  }

  private val g3Expected: Map[Int, Seq[Long]] = Map(
    1 -> Seq(594756634379550719L, 595214031216705535L, 595240574114594815L,
      595240608474333183L, 595240848992501759L, 595240883352240127L,
      595241544777203711L, 595241587726876671L, 595241596316811263L,
      595241622086615039L, 595241630676549631L, 595241656446353407L,
      595241690806091775L, 595241699396026367L, 595241707985960959L,
      595241725165830143L, 595241733755764735L, 595241759525568511L,
      595241768115503103L, 595241776705437695L, 595241828245045247L,
      595241845424914431L, 595241871194718207L, 595241905554456575L,
      595241948504129535L, 595241957094064127L, 595242481080074239L,
      595242498259943423L, 595242515439812607L, 595242532619681791L,
      595243812519935999L, 595243924189085695L, 595243932779020287L,
      595243941368954879L, 595243967138758655L),
    2 -> Seq(594756634379550719L, 595214031216705535L, 595240574114594815L,
      595240608474333183L, 595240848992501759L, 595240883352240127L,
      595241536187269119L, 595241544777203711L, 595241587726876671L,
      595241596316811263L, 595241613496680447L, 595241622086615039L,
      595241630676549631L, 595241639266484223L, 595241656446353407L,
      595241690806091775L, 595241699396026367L, 595241707985960959L,
      595241725165830143L, 595241733755764735L, 595241759525568511L,
      595241768115503103L, 595241776705437695L, 595241793885306879L,
      595241811065176063L, 595241828245045247L, 595241836834979839L,
      595241845424914431L, 595241862604783615L, 595241871194718207L,
      595241888374587391L, 595241896964521983L, 595241905554456575L,
      595241939914194943L, 595241948504129535L, 595241957094064127L,
      595241965683998719L, 595242481080074239L, 595242498259943423L,
      595242515439812607L, 595242532619681791L, 595243812519935999L,
      595243924189085695L, 595243932779020287L, 595243941368954879L,
      595243949958889471L, 595243967138758655L))

  /** G4 gridDisk gated against the PUBLIC libh3 k-ring vector
    * (kRing('8928308280fffff', 1) from the h3 documentation) — unlike
    * g1-g3's self-derived anchors this oracle is INDEPENDENT of the
    * implementation, so it pins the in-base aperture parity end to end
    * through the SQL surface (h3_grid_disk UDF + the codegen'd
    * h3_grid_distance expression). */
  private val g4Origin = java.lang.Long.parseLong("8928308280fffff", 16)
  private val g4Members = Seq(
    "8928308280fffff", "8928308280bffff", "89283082807ffff",
    "89283082877ffff", "89283082803ffff", "89283082873ffff",
    "8928308283bffff").map(java.lang.Long.parseLong(_, 16))

  def g4GridDisk(spark: SparkSession, dir: String): DataFrame =
    spark.range(1)
      .select(explode(GeoFunctions.h3_grid_disk(lit(g4Origin), lit(1))).as("cell"))
      .select(col("cell"),
        GeoFunctions.h3_grid_distance(lit(g4Origin), col("cell")).as("dist"))
      .orderBy(col("cell"))

  val oracles: Map[String, String] = Map(
    "g4_grid_disk" -> {
      val rows = g4Members
        .map(c => s"($c::BIGINT, ${if (c == g4Origin) 0 else 1})").mkString(", ")
      s"SELECT cell, dist FROM (VALUES $rows) t(cell, dist) ORDER BY cell"
    },
    "g1_geo_roundtrip" -> {
      val rows = g1Expected.map { case (i, c) => s"($i::BIGINT, $c::BIGINT, TRUE)" }.mkString(", ")
      s"SELECT i, cell, rt_ok FROM (VALUES $rows) t(i, cell, rt_ok) ORDER BY i"
    },
    "g2_polyfill" -> {
      val rows = g2Expected.map(c => s"($c::BIGINT)").mkString(", ")
      s"SELECT cell FROM (VALUES $rows) t(cell) ORDER BY cell"
    },
    "g3_border_cells" -> {
      val rows = (for ((w, cs) <- g3Expected.toSeq.sortBy(_._1); c <- cs)
        yield s"($w, $c::BIGINT)").mkString(", ")
      s"SELECT width, cell FROM (VALUES $rows) t(width, cell) ORDER BY width, cell"
    }
  )

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "g1_geo_roundtrip" -> g1GeoRoundtrip,
    "g4_grid_disk" -> g4GridDisk,
    "g2_polyfill" -> g2Polyfill,
    "g3_border_cells" -> g3BorderCells
  )
}

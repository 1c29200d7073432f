package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.GeoFunctions
import graft.functions.GeoFunctions._
import graft.geo.Geo
import graft.sources.GeoJson

/** FULL-SCALE golden replay (SURVEY §5 golden end-to-end): rebuild the
  * reference's cleaned 108-feature layer from its raw 130-feature layer
  * + the real scraped CSV + the real pipeline config (_targets.R
  * operator/inactive/merge lists — configuration data, re-keyed here),
  * running entirely through engine operators. PLSS-patch geometries
  * (an ArcGIS fetch in the reference) come from the golden layer as
  * fixtures, standing in for the isolated network source.
  *
  * Geometry equality vs the golden output uses symmetric-difference
  * area (JTS vs GEOS unions may node intersection points differently;
  * topology must still agree).
  */
class FullReplaySpec extends SparkSpec {

  private val rawPath = "/root/reference/service-areas-raw.geojson"
  private val goldenPath = "/root/reference/service-areas.geojson"
  private def available: Boolean =
    java.nio.file.Files.isReadable(java.nio.file.Paths.get(rawPath))

  private lazy val replayed: DataFrame = {
    GeoFunctions.registerAll(spark)
    graft.pipeline.AlaskaReplay.cleanedLayer(spark)
  }

  test("replayed cleaned layer has exactly the golden certificate set") {
    assume(available)
    val got = replayed.select("certificate_number")
      .collect().map(_.getDouble(0).toInt).toSet
    val expected = GeoJson.read(spark, goldenPath)
      .select("certificate_number").collect().map(_.getLong(0).toInt).toSet
    assert(got === expected)
    assert(got.size === 108)
  }

  test("every replayed geometry topologically matches the golden layer") {
    assume(available)
    val golden = GeoJson.read(spark, goldenPath)
      .select(col("certificate_number").cast("double"), col("geometry"))
      .collect()
      .map(r => r.getDouble(0).toInt -> r.getAs[Array[Byte]]("geometry"))
      .toMap
    val rows = replayed.select("certificate_number", "geometry").collect()
    var checked = 0
    rows.foreach { r =>
      val cert = r.getDouble(0).toInt
      val mine = Geo.fromWkb(r.getAs[Array[Byte]]("geometry"))
      val gold = Geo.fromWkb(golden(cert))
      val denom = math.max(gold.getArea, 1e-12)
      val sym = mine.symDifference(gold).getArea / denom
      assert(sym < 1e-6,
        s"cert $cert geometry mismatch: relative symdiff area $sym")
      checked += 1
    }
    assert(checked === 108)
  }

  test("merged AVEC (169) geometry strictly grew vs its raw geometry") {
    assume(available)
    val raw169 = Geo.fromWkb(GeoJson.read(spark, rawPath)
      .filter(col("certificate_number") === 169)
      .select("geometry").head().getAs[Array[Byte]](0))
    val merged169 = Geo.fromWkb(replayed
      .filter(col("certificate_number") === 169.0)
      .select("geometry").head().getAs[Array[Byte]](0))
    assert(merged169.getArea > raw169.getArea,
      "acquisitions must add area to AVEC")
  }
}

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

  // _targets.R:65-156 (operator subsidiaries / inactive certificates)
  private val operatorIds =
    Seq(785, 549, 573, 780, 640, 749, 521, 760, 742, 345, 520, 735, 710)
  private val inactiveIds = Seq(59, 71, 91, 121, 523)
  // _targets.R:196-209: acquirer <- acquired
  private val merges = Seq(169 -> 61, 169 -> 285, 169 -> 688, 169 -> 407,
    169 -> 43, 169 -> 729, 8 -> 121)
  // _targets.R:213-233: geometry replaced/created from PLSS descriptions
  private val plssCerts = Seq(635, 412, 365, 395, 289, 741, 765, 767)

  private lazy val replayed: DataFrame = {
    GeoFunctions.registerAll(spark)
    import spark.implicits._
    val raw = GeoJson.read(spark, rawPath)
      .withColumn("certificate_number",
        col("certificate_number").cast("double"))
    val golden = GeoJson.read(spark, goldenPath)

    // 1. PLSS patch source (fixture for the ArcGIS fetch): replace the
    //    4 wrong geometries, create the 4 missing certs
    val plssGeoms = golden
      .filter(col("certificate_number").isin(plssCerts: _*))
      .select(col("certificate_number").cast("double"), col("geometry"))
    val csv = spark.read.option("header", "true")
      .option("inferSchema", "true")
      .csv("/root/reference/rca_electric_certificates_2025-12-11.csv")
    // geometry set = raw geometries, PLSS replacements/creations applied.
    // NOTE: merges run on the GEOMETRY set before any status filtering —
    // acquired certificates are Inactive in the CSV, but their KML
    // geometry still folds into the acquirer (the reference merges the
    // KML set, then inner-joins cleaned metadata, R/functions.R:421-476)
    val geoms = raw.select(col("certificate_number"), col("geometry"))
      .filter(!col("certificate_number").isin(plssCerts: _*))
      .unionByName(plssGeoms)

    // 2. merge acquired utilities into acquirers — distributed form:
    //    map to target cert, group-union
    val mapping = merges.map { case (to, from) =>
      (from.toDouble, to.toDouble)
    }.toDF("from_cert", "to_cert")
    val merged = geoms
      .join(broadcast(mapping),
        col("certificate_number") === col("from_cert"), "left")
      .withColumn("target",
        coalesce(col("to_cert"), col("certificate_number")))
      .groupBy(col("target").as("certificate_number"))
      .agg(st_union_agg(col("geometry")).as("geometry"))

    // 3. clean: active consumer-serving utilities only
    //    (R/functions.R:194-228); inner join drops acquired rows
    val activeCerts = csv
      .select(col("certificate_number").cast("double"), col("entity"),
        col("certificate_name"), col("certificate_status"))
      .filter(col("certificate_status") === "Active" &&
        !col("certificate_number").isin(operatorIds.map(_.toDouble): _*) &&
        !col("certificate_number").isin(inactiveIds.map(_.toDouble): _*))
    merged.join(broadcast(activeCerts), Seq("certificate_number"))
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

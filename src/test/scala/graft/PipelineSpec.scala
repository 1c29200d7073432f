package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.functions.{DateFunctions, GeoFunctions}
import graft.functions.GeoFunctions._
import graft.geo.Geo
import graft.pipeline.{ServiceAreas, StageCache}
import graft.sources.GeoJson

/** End-to-end reference-parity pipeline test (SURVEY §3 E2, §5 golden
  * plan): fixtures cover every KML quirk the reference hand-patches —
  * invalid ring, multi-Placemark cert, HTML-entity description,
  * two-digit year, blank chronology date, merge patch with version gate,
  * operator/inactive exclusion.
  */
class PipelineSpec extends SparkSpec {

  private val res = "src/test/resources/alaska"
  private val cfg = ServiceAreas.Config(
    operatorIds = Seq(785.0),
    inactiveExtraIds = Seq(121.0),
    mergePatches = Seq(ServiceAreas.MergePatch(169.0, 61.0)),
    expectedKmlDates = Map(61.0 -> "3/15/2010"))

  private lazy val outDir =
    Files.createTempDirectory("svc-areas").toString
  private lazy val published = {
    DateFunctions.registerAll(spark)
    GeoFunctions.registerAll(spark)
    ServiceAreas.run(spark, s"$res/certificates.csv", s"$res/chronology.csv",
      s"$res/kml/*.kml", cfg, outDir,
      Files.createTempDirectory("stage-cache").toString)
  }

  test("cleaned layer: expected certificate set after filters + merge") {
    val certs = published.select("certificate_number")
      .collect().map(_.getInt(0)).sorted
    // 61 merged into 169; 785 operator-excluded; 121 inactive-extra;
    // 18.1 Inactive; 50 has no KML; blank row dropped.
    assert(certs.sameElements(Array(10, 99, 100, 169)))
  }

  test("certificate_number downcast to int (A5 conditional cast)") {
    assert(published.schema("certificate_number").dataType.typeName
      === "integer")
  }

  test("invalid bowtie geometry is made valid") {
    val g10 = Geo.fromWkb(published
      .filter(col("certificate_number") === 10)
      .select("geometry").head().getAs[Array[Byte]](0))
    assert(g10.isValid)
    assert(g10.getArea > 0)
  }

  test("multi-placemark cert collects both parts without dissolving") {
    val g100 = Geo.fromWkb(published
      .filter(col("certificate_number") === 100)
      .select("geometry").head().getAs[Array[Byte]](0))
    assert(g100.getNumGeometries === 2)
    assert(math.abs(g100.getArea - 2.0) < 1e-9)
  }

  test("merge patch unions acquired cert 61 into 169 (version-gated)") {
    val g169 = Geo.fromWkb(published
      .filter(col("certificate_number") === 169)
      .select("geometry").head().getAs[Array[Byte]](0))
    // two disjoint 1-deg² squares → dissolved union keeps both, area 2
    assert(math.abs(g169.getArea - 2.0) < 1e-9)
    assert(!published.select("certificate_number").collect()
      .exists(_.getInt(0) == 61), "acquired cert must disappear")
  }

  test("sync status: up_to_date / outdated / unknown all exercised") {
    val status = published
      .select("certificate_number", "geometry_cert_sync_status")
      .collect().map(r => r.getInt(0) -> r.getString(1)).toMap
    assert(status(99) === "up_to_date")  // KML 5/20/15 == last change
    assert(status(100) === "outdated")   // KML 6/01/2012 < 7/4/2020 change
    assert(status(10) === "unknown")     // no date in KML description
  }

  test("sync_warning surfaces the reference's impossible-state warn " +
      "branches (R/functions.R:287-304)") {
    import spark.implicits._
    def d(s: String): java.sql.Date = java.sql.Date.valueOf(s)
    // (cert, last ANY event, last AREA event, kml date) per state
    val enriched = Seq(
      // consistent, current: chronology newer than KML, no area change after
      (1.0, Option(d("2020-01-01")), Option(d("2019-01-01")), "E1"),
      // consistent, outdated: area change after the KML date
      (2.0, Option(d("2021-06-01")), Option(d("2021-06-01")), "E2"),
      // WARN chronology_missing_entry: KML newer than the whole chronology
      (3.0, Option(d("2015-01-01")), Option(d("2015-01-01")), "E3"),
      // WARN no_chronology_entries: KML date but zero chronology rows
      (4.0, None, None, "E4"),
      // consistent: chronology has NO area-changing entries → TRUE (the
      // reference's nrow(newer)==0 path), not unknown
      (5.0, Option(d("2020-01-01")), None, "E5"))
      .toDF("certificate_number", "certificate_last_update_date",
        "last_area_change_date", "entity")
      .withColumn("certificate_name", col("entity"))
      .withColumn("cpcn_url", lit("u"))
      .withColumn("certificate_granted_year", lit(2000))
      .withColumn("certificate_last_update_order", lit("o"))
      .withColumn("certificate_last_update_type", lit("t"))
    val geo = Seq(
      (1.0, Option(d("2019-06-01"))), (2.0, Option(d("2020-01-01"))),
      (3.0, Option(d("2016-01-01"))), (4.0, Option(d("2016-01-01"))),
      (5.0, Option(d("2019-01-01"))))
      .toDF("certificate_number", "geometry_last_update")
      .withColumn("geometry", lit("g"))
    val out = ServiceAreas.publishLayer(enriched, geo)
      .select("certificate_number", "geometry_cert_sync_status",
        "sync_warning")
      .collect()
      .map(r => r.getDouble(0) -> (r.getString(1), Option(r.getString(2))))
      .toMap
    assert(out(1.0) === ("up_to_date", None))
    assert(out(2.0) === ("outdated", None))
    assert(out(3.0) === ("unknown", Some("chronology_missing_entry")))
    assert(out(4.0) === ("unknown", Some("no_chronology_entries")))
    assert(out(5.0) === ("up_to_date", None))
  }

  test("deregulated events excluded from area-change currency check") {
    // cert 100's latest event is Deregulated 8/1/2021 but last *area
    // change* is 7/4/2020; last_update_type surfaces the raw latest.
    val r = published.filter(col("certificate_number") === 100).head()
    assert(r.getAs[String]("certificate_last_update_type") === "Deregulated")
  }

  test("two-digit years pivot around 63 and blank date hits sentinel") {
    val r169 = published.filter(col("certificate_number") === 169).head()
    assert(r169.getAs[Int]("certificate_granted_year") === 1976)
    val r10 = published.filter(col("certificate_number") === 10).head()
    assert(r10.getAs[Int]("certificate_granted_year") === 1900) // sentinel
    val r10last = r10.getAs[java.sql.Date]("certificate_last_update_date")
    assert(r10last.toString === "1999-06-30") // 6/30/99 → 1999
  }

  test("KML description strict 3-field split + alt-name rule " +
      "(incl. HTML-wrapped variant)") {
    val certsDf = spark.read.option("header", "true")
      .option("inferSchema", "true").csv(s"$res/certificates.csv")
    val cleaned = ServiceAreas.cleanCertificates(certsDf, cfg)
    val withKml = ServiceAreas.splitKmlDescription(
      cleaned.join(
        ServiceAreas.kmlDescriptions(spark, s"$res/kml/*.kml"),
        Seq("certificate_number"), "left"))
    val rows = withKml.select("certificate_number", "alt_name",
      "kml_utility_type", "kml_most_recent_update_included",
      "kml_most_recent_update_date").collect()
      .map(r => r.getDouble(0) -> r).toMap

    // name matches certificate_name → alt_name suppressed
    assert(rows(10.0).isNullAt(1))
    assert(rows(10.0).getString(2) === "Electric")
    assert(rows(10.0).isNullAt(4), "no date in chronology text")
    // differing KML-granted name surfaces as alt_name
    assert(rows(100.0).getString(1) === "TEST UTILITY HUNDRED, INC.")
    assert(rows(100.0).getAs[java.sql.Date](4).toString === "2012-06-01")
    // HTML-wrapped description: windowed + unescaped, then split;
    // 2-digit year pivots
    assert(rows(99.0).isNullAt(1))
    assert(rows(99.0).getString(3).contains("Service Area Change"))
    assert(rows(99.0).getAs[java.sql.Date](4).toString === "2015-05-20")
    // no KML at all → all fields null, no error
    assert(rows(50.0).isNullAt(1) && rows(50.0).isNullAt(4))
  }

  test("1-digit day in chronology text yields no date (reference NA " +
      "parity, R/functions.R:364)") {
    import spark.implicits._
    val desc = "Granted to: X CO<br><br>Utility Type: Electric" +
      "<br><br>CHRONOLOGY: U-12-045(3) Amended 6/1/2012<br>"
    val row = ServiceAreas.splitKmlDescription(
      Seq((1.0, "X CO", desc))
        .toDF("certificate_number", "certificate_name", "kml_desc_field"))
      .select("kml_most_recent_update_included",
        "kml_most_recent_update_date")
      .head()
    assert(row.getString(0).contains("6/1/2012"))
    assert(row.isNullAt(1), "1-digit day must not parse (reference NA)")
  }

  test("strict split raises on a non-matching description") {
    import spark.implicits._
    val bad = Seq((1.0, "SOME NAME", "Totally unexpected text"))
      .toDF("certificate_number", "certificate_name", "kml_desc_field")
    val e = intercept[Exception] {
      ServiceAreas.splitKmlDescription(bad).collect()
    }
    assert((e.getMessage + e.toString).contains("Granted-to pattern") ||
      Option(e.getCause).exists(_.getMessage.contains("Granted-to")))
  }

  test("published geojson files exist and parse back") {
    published.count() // force run
    val cleaned = GeoJson.read(spark, s"$outDir/service-areas.geojson")
    assert(cleaned.count() === 4)
    val raw = GeoJson.read(spark, s"$outDir/service-areas-raw.geojson")
    // raw keeps operator 785 + unmerged 61 (6 KML certs inner-join CSV)
    assert(raw.count() === 6)
  }

  test("stage cache memoizes: second run recomputes nothing cached") {
    val cacheDir = Files.createTempDirectory("cache2").toString
    val cache = new StageCache(spark, cacheDir)
    def one = cache.stage("s1", "v1", Seq(s"$res/certificates.csv")) {
      spark.read.option("header", "true").csv(s"$res/certificates.csv")
    }
    one.count()
    assert(cache.computeCount === 1)
    one.count()
    assert(cache.computeCount === 1, "second call must hit the checkpoint")
    // changing code version invalidates
    cache.stage("s1", "v2", Seq(s"$res/certificates.csv")) {
      spark.read.option("header", "true").csv(s"$res/certificates.csv")
    }.count()
    assert(cache.computeCount === 2)
  }
}

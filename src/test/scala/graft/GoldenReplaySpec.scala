package graft

import org.apache.spark.sql.functions._
import graft.functions.GeoFunctions
import graft.functions.GeoFunctions._
import graft.sources.GeoJson

/** Golden replay against the reference's committed published layers
  * (SURVEY §5 mechanism 4: the repo's GeoJSON outputs are its de-facto
  * golden files). The files are read as DATA through our GeoJSON source
  * — proving the engine ingests the real published artifact, honors its
  * property contract (about.qmd:30-42), and reproduces its documented
  * invariants.
  */
class GoldenReplaySpec extends SparkSpec {

  private val golden = "/root/reference/service-areas.geojson"
  private val goldenRaw = "/root/reference/service-areas-raw.geojson"

  private def available: Boolean =
    java.nio.file.Files.isReadable(java.nio.file.Paths.get(golden))

  test("cleaned layer: 108 features, all MultiPolygon, schema contract") {
    assume(available)
    GeoFunctions.registerAll(spark)
    val df = GeoJson.read(spark, golden)
    assert(df.count() === 108)
    val expectedCols = Seq("certificate_number", "entity",
      "certificate_name", "certificate_url", "certificate_granted_year",
      "certificate_last_update_date", "certificate_last_update_order",
      "certificate_last_update_type", "geometry_last_update",
      "geometry_is_current", "geometry_cert_sync_status")
    expectedCols.foreach(c => assert(df.columns.contains(c),
      s"missing property $c"))
    val types = df
      .select(st_asGeoJson(col("geometry")).as("gj"))
      .collect().map(_.getString(0))
    assert(types.forall(_.contains("\"MultiPolygon\"")))
  }

  test("sync status profile matches the published 88/12/8 split") {
    assume(available)
    val counts = GeoJson.read(spark, golden)
      .groupBy("geometry_cert_sync_status").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts("up_to_date") === 88)
    assert(counts("outdated") === 12)
    assert(counts("unknown") === 8)
  }

  test("granted years within documented 1900..2017 range, sentinel present") {
    assume(available)
    val years = GeoJson.read(spark, golden)
      .select("certificate_granted_year")
      .collect().map(_.getLong(0))
    assert(years.min === 1900) // missing-date sentinel
    assert(years.max <= 2017)
  }

  test("raw layer has 130 features; every geometry decodes and is valid-area") {
    assume(available)
    GeoFunctions.registerAll(spark)
    val raw = GeoJson.read(spark, goldenRaw)
    assert(raw.count() === 130)
    val areas = raw.select(st_area(col("geometry")).as("a"))
      .collect().map(_.getDouble(0))
    assert(areas.forall(_ >= 0))
    assert(areas.count(_ > 0) > 120) // all but degenerate few
  }

  test("largest service area question (README.md:7) answerable") {
    assume(available)
    GeoFunctions.registerAll(spark)
    val top = GeoJson.read(spark, golden)
      .select(col("entity"), col("certificate_number"),
        st_area(col("geometry")).as("area_deg2"))
      .orderBy(col("area_deg2").desc)
      .limit(3).collect()
    assert(top.length === 3)
    assert(top.head.getAs[Double]("area_deg2") > 0)
  }

  test("overlap question (README.md:6): ST_Intersects self-join with " +
      "bbox prefilter finds the overlapping service areas") {
    assume(available)
    GeoFunctions.registerAll(spark)
    val areas = GeoJson.read(spark, golden)
      .select(col("certificate_number").as("cert"),
        col("geometry").as("g"))
    // bbox prefilter via envelope intersection BEFORE the exact JTS
    // predicate — the pair count an O(n²) exact pass would pay shrinks
    // to envelope-overlapping candidates (the SpatialFilterRewrite
    // shape, applied to a self-join)
    val a = areas.toDF("cert_a", "ga")
    val b = areas.toDF("cert_b", "gb")
    val pairs = a.join(b, col("cert_a") < col("cert_b") &&
        st_intersects(st_envelope(col("ga")), st_envelope(col("gb"))) &&
        st_intersects(col("ga"), col("gb")))
      .select("cert_a", "cert_b")
      .collect().map(r => (r.getLong(0), r.getLong(1))).sorted
    // The reference's motivating question: YES, service areas overlap.
    assert(pairs.nonEmpty, "expected overlapping service areas")
    // pin the count and spot-pin the smallest pair for regression
    info(s"${pairs.length} overlapping pairs; first=${pairs.headOption}")
    assertGoldenRows("geo", "overlap_pairs",
      pairs.map { case (x, y) => s"$x,$y" }.toSeq)
  }

  test("g08 area extremes (README.md:7): largest/smallest utility by " +
      "geodesic km², golden-pinned, planar ranking shown for the delta") {
    assume(available)
    val rows = graft.queries.GeoOps.queries("g08_area_extremes")(spark, sf)
      .collect()
    assert(rows.length === 2)
    val largest = rows.find(_.getString(0) == "largest").get
    val smallest = rows.find(_.getString(0) == "smallest").get
    assert(largest.getDouble(3) > smallest.getDouble(3),
      "largest must exceed smallest in km²")
    // the deg²→km² scale is latitude-dependent (cos(lat)): the two
    // picks' km²-per-deg² ratios must differ — the concrete evidence
    // that a planar deg² ranking is not a ground-truth area ranking
    val ratioL = largest.getDouble(3) / largest.getDouble(4)
    val ratioS = smallest.getDouble(3) / smallest.getDouble(4)
    assert(math.abs(ratioL - ratioS) / ratioL > 0.001,
      s"expected latitude-dependent scale: $ratioL vs $ratioS")
    assertGoldenRows("geo", "g08_area_extremes",
      rows.map(_.mkString(",")).toSeq)
  }

  test("point-in-polygon lookup (README.md:8): Fairbanks → GVEA") {
    assume(available)
    GeoFunctions.registerAll(spark)
    // Fairbanks, AK ≈ (-147.7164, 64.8378); the reference's map answers
    // GVEA (certificate 13) for this click.
    val hit = GeoJson.read(spark, golden)
      .filter(st_contains(col("geometry"),
        st_point(lit(-147.7164), lit(64.8378))))
      .select("entity").collect().map(_.getString(0))
    assert(hit.nonEmpty, "no utility found for Fairbanks")
    assert(hit.contains("GVEA"), s"expected GVEA, got ${hit.mkString(",")}")
  }
}

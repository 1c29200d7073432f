package graft.pipeline

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.locationtech.jts.geom.{Geometry, LineString, MultiPolygon, Polygon}
import graft.geo.Geo
import graft.sources.Fetch

/** PLSS-description geometry patches (reference format_plss_patches +
  * save_plss_patches, R/functions.R:382-418 and _targets.R:211-240):
  * certificates whose RCA KML is missing or wrong get their service
  * area reconstructed from hardcoded Public Land Survey System codes
  * via the Alaska DNR ArcGIS REST API — per-cert OR-joined MTRS query,
  * `f=geojson` fetch, dissolve, and a `{cert}-servicearea-plss-fix.kml`
  * patch file that the KML scan's grouped patch-dedup filter (P9) then
  * prefers over the original. Fetching goes through [[Fetch.Fetcher]]
  * (zero-egress: tests use fixtures); the version gate mirrors the
  * merge-patch gate — patch only when the original KML's date matches
  * the expected snapshot, else a placeholder records the skip.
  */
object PlssPatch {

  val DefaultQueryBase: String =
    "https://arcgis.dnr.alaska.gov/arcgis/rest/services/OpenData/" +
      "ReferenceGrid_PLSSgridUnclipped/MapServer/1/query"

  /** Distributed query-string build (the A2 ordered string-agg): one
    * `(MTRS = 'c1') OR (MTRS = 'c2') …` clause per certificate from the
    * exploded PLSS-code list (array order preserved via posexplode).
    */
  def queryStrings(patches: DataFrame): DataFrame =
    patches
      .select(col("cert"),
        posexplode(col("corrected_plss_description"))
          .as(Seq("pos", "code")))
      .withColumn("term",
        concat(lit("(MTRS = '"), col("code"), lit("')")))
      .groupBy("cert")
      .agg(concat_ws(" OR ",
        array_sort(collect_list(struct(col("pos"), col("term"))))
          .getField("term")).as("query_string"))

  /** The reference's query URL (R/functions.R:393-396). */
  def queryUrl(queryString: String,
      base: String = DefaultQueryBase): String =
    s"$base?where=${Fetch.urlEncode(queryString)}" +
      "&returnGeometry=true&f=geojson"

  /** Every feature geometry in an ArcGIS `f=geojson` query RESPONSE.
    * CONTRACT: this is a fast scanner for that specific producer only —
    * it balanced-brace-scans from each `"geometry"` token, which is
    * sound because ArcGIS responses carry flat attribute properties
    * (no nested objects, no `"geometry"` as a property name or string
    * value, no braces inside strings). For arbitrary GeoJSON use
    * [[graft.sources.GeoJson]]'s recursive-descent parser instead
    * (ADVICE r02).
    */
  def featureGeometries(json: String): Seq[Geometry] = {
    val marker = "\"geometry\""
    val out = scala.collection.mutable.ArrayBuffer[Geometry]()
    var idx = json.indexOf(marker)
    while (idx >= 0) {
      val start = json.indexOf('{', idx + marker.length)
      val colon = json.indexOf(':', idx + marker.length)
      // only treat it as a member if ':' precedes the brace
      if (start >= 0 && colon >= 0 && colon < start) {
        var depth = 0
        var i = start
        var end = -1
        while (end < 0 && i < json.length) {
          json.charAt(i) match {
            case '{' => depth += 1
            case '}' => depth -= 1; if (depth == 0) end = i
            case _ =>
          }
          i += 1
        }
        if (end > start) out += Geo.fromGeoJson(json.substring(start, end + 1))
      }
      idx = json.indexOf(marker, idx + marker.length)
    }
    out.toSeq
  }

  /** Minimal single-placemark KML writer (enough for the patch files
    * our own KML source re-reads): Polygon and MultiPolygon with holes,
    * 2-D coordinates.
    */
  def writePlacemarkKml(g: Geometry, name: String, description: String,
      path: Path): Unit = {
    def ring(l: LineString): String =
      l.getCoordinates.map(c =>
        s"${Geo.formatGdal(c.x)},${Geo.formatGdal(c.y)}").mkString(" ")
    def polygon(p: Polygon): String = {
      val outer = "<outerBoundaryIs><LinearRing><coordinates>" +
        ring(p.getExteriorRing) +
        "</coordinates></LinearRing></outerBoundaryIs>"
      val inner = (0 until p.getNumInteriorRing).map(i =>
        "<innerBoundaryIs><LinearRing><coordinates>" +
          ring(p.getInteriorRingN(i)) +
          "</coordinates></LinearRing></innerBoundaryIs>").mkString
      s"<Polygon>$outer$inner</Polygon>"
    }
    val body = g match {
      case p: Polygon => polygon(p)
      case mp: MultiPolygon =>
        "<MultiGeometry>" + (0 until mp.getNumGeometries).map(i =>
          polygon(mp.getGeometryN(i).asInstanceOf[Polygon])).mkString +
          "</MultiGeometry>"
      case other => throw new IllegalArgumentException(
        s"KML patch writer handles polygonal geometry only, got " +
          other.getGeometryType)
    }
    val xml =
      s"""<?xml version="1.0" encoding="UTF-8"?>
         |<kml xmlns="http://www.opengis.net/kml/2.2"><Document><Placemark>
         |<name>${xmlEscape(name)}</name>
         |<description>${xmlEscape(description)}</description>
         |$body
         |</Placemark></Document></kml>
         |""".stripMargin
    if (path.getParent != null) Files.createDirectories(path.getParent)
    Files.write(path, xml.getBytes(StandardCharsets.UTF_8))
  }

  private def xmlEscape(s: String): String = s
    .replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")

  /** Fetch + dissolve + save one certificate's patch
    * (save_plss_patches, R/functions.R:399-418), version-gated: applies
    * only when the original KML's date equals the expected snapshot (or
    * no expectation is recorded); otherwise writes a
    * `{cert}-patch-failed.txt` placeholder and keeps the original.
    */
  def savePatch(fetcher: Fetch.Fetcher, cert: String, url: String,
      expectedKmlDate: Option[String], actualKmlDate: Option[String],
      dataDir: Path): Path = {
    val gateOk = expectedKmlDate.forall(e => actualKmlDate.contains(e))
    if (gateOk) {
      val resp = fetcher.get(url)
      val dissolved = Geo.unionAll(featureGeometries(resp.body))
      val out = dataDir.resolve(s"$cert-servicearea-plss-fix.kml")
      Files.deleteIfExists(out) // st_write_or_overwrite semantics
      writePlacemarkKml(dissolved, s"Certificate No. $cert (PLSS patch)",
        "Reconstructed from PLSS description", out)
      out
    } else {
      val ph = dataDir.resolve("missing-placeholder")
      Files.createDirectories(ph)
      val p = ph.resolve(s"$cert-patch-failed.txt")
      if (!Files.exists(p)) Files.createFile(p)
      p
    }
  }
}

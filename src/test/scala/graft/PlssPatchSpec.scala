package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.pipeline.PlssPatch
import graft.sources.{Fetch, Kml}

/** PLSS patch stage (reference R/functions.R:382-418): query-string
  * build, URL shape, GeoJSON FeatureCollection parse, dissolve, KML
  * patch write (readable by our own KML source), and the version gate.
  */
class PlssPatchSpec extends SparkSpec {

  test("query strings OR-join the PLSS codes per cert, in order") {
    import spark.implicits._
    val patches = Seq(
      ("635", Seq("F002N010W", "F002N011W")),
      ("412", Seq("S001S002E")))
      .toDF("cert", "corrected_plss_description")
    val qs = PlssPatch.queryStrings(patches).collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(qs("635") ===
      "(MTRS = 'F002N010W') OR (MTRS = 'F002N011W')")
    assert(qs("412") === "(MTRS = 'S001S002E')")
    val url = PlssPatch.queryUrl(qs("412"))
    assert(url.startsWith(
      "https://arcgis.dnr.alaska.gov/arcgis/rest/services/OpenData/"))
    // R URLencode(reserved = FALSE) byte semantics: space -> %20,
    // parens/quotes/equals left as-is (NOT java.net.URLEncoder's form)
    assert(url.contains("where=(MTRS%20=%20'S001S002E')"))
    assert(url.endsWith("&returnGeometry=true&f=geojson"))
  }

  private val collection =
    """{ "type": "FeatureCollection", "features": [
      |{ "type": "Feature", "properties": { "MTRS": "A" },
      |  "geometry": { "type": "Polygon", "coordinates":
      |    [ [ [ 0.0, 0.0 ], [ 1.0, 0.0 ], [ 1.0, 1.0 ], [ 0.0, 1.0 ],
      |        [ 0.0, 0.0 ] ] ] } },
      |{ "type": "Feature", "properties": { "MTRS": "B" },
      |  "geometry": { "type": "Polygon", "coordinates":
      |    [ [ [ 1.0, 0.0 ], [ 2.0, 0.0 ], [ 2.0, 1.0 ], [ 1.0, 1.0 ],
      |        [ 1.0, 0.0 ] ] ] } }
      |] }""".stripMargin

  test("feature parse + dissolve + KML patch round-trips through our " +
      "KML source") {
    val geoms = PlssPatch.featureGeometries(collection)
    assert(geoms.length === 2)
    val dir = Files.createTempDirectory("plss")
    val fetcher = new Fetch.Fetcher {
      override def get(url: String, cookies: Map[String, String]) =
        Fetch.Response(200, collection)
      override def postForm(url: String, fields: Seq[(String, String)],
          cookies: Map[String, String]) = ???
      override def download(url: String) = ???
    }
    val out = PlssPatch.savePatch(fetcher, "635", "http://x.test/q",
      expectedKmlDate = Some("3/15/2010"),
      actualKmlDate = Some("3/15/2010"), dataDir = dir)
    assert(out.getFileName.toString === "635-servicearea-plss-fix.kml")
    // our own KML source reads the patch back; the two adjacent squares
    // dissolved into one polygon of area 2
    val feats = Kml.parseFeatures(Files.readString(out))
    assert(feats.length === 1)
    val g = graft.geo.Geo.fromWkb(feats.head.geometry)
    assert(g.getGeometryType === "Polygon")
    assert(math.abs(g.getArea - 2.0) < 1e-9)
  }

  test("version gate mismatch writes a placeholder, not a patch") {
    val dir = Files.createTempDirectory("plss-gate")
    val fetcher = new Fetch.Fetcher {
      override def get(url: String, cookies: Map[String, String]) =
        fail("gate must prevent any fetch")
      override def postForm(url: String, fields: Seq[(String, String)],
          cookies: Map[String, String]) = ???
      override def download(url: String) = ???
    }
    val out = PlssPatch.savePatch(fetcher, "635", "http://x.test/q",
      expectedKmlDate = Some("3/15/2010"),
      actualKmlDate = Some("1/1/2009"), dataDir = dir)
    assert(out.getFileName.toString === "635-patch-failed.txt")
    assert(out.getParent.getFileName.toString === "missing-placeholder")
  }
}

package graft

import java.nio.charset.StandardCharsets
import java.nio.file.Files
import graft.sources.{CsvSink, Fetch, RcaIngest}

/** Fetch layer (S1/S2/S7/S8) against recorded fixtures: the scrape
  * session flow, the >200 pagination guard, grid → DataFrame mapping
  * with link joins and cleanup, idempotent downloads with
  * missing-placeholders, the chronology snapshot sink, and the S9
  * date-stamped CSV sink.
  */
class FetchSpec extends SparkSpec {

  private val home = "https://example.test/RCAWeb/home.aspx"
  private val search = "https://example.test/RCAWeb/search.aspx"
  private val action = "https://example.test/RCAWeb/results.aspx"

  private def searchPage(count: Int): String =
    s"""<html><body>
       |<span class="count">$count Records Found</span>
       |<form action="$action" method="post">
       |<input type="hidden" name="__VIEWSTATE" value="vs123"/>
       |<input type="hidden" name="${RcaIngest.PageSizeField}" value="20"/>
       |</form></body></html>""".stripMargin

  private val gridPage =
    """<html><body><table class="RCAGrid">
      |<tr><td>Search Results</td></tr>
      |<tr><td>Certificate Number</td><td>Entity</td>
      |  <td>Certificate Status</td></tr>
      |<tr><td><a href="https://example.test/cert?id=101">101</a></td>
      |  <td><a href="https://example.test/entity?id=9">Acme Power</a></td>
      |  <td>Active</td></tr>
      |<tr><td><a href="https://example.test/cert?id=101">101</a></td>
      |  <td><a href="https://example.test/entity?id=9">Acme Power</a></td>
      |  <td>Active</td></tr>
      |<tr><td><a href="https://example.test/cert?id=">18.1</a></td>
      |  <td><a href="https://example.test/entity?id=4">Frac Co</a></td>
      |  <td>Revoked</td></tr>
      |<tr><td>Totals</td><td></td><td></td></tr>
      |<tr><td><a href="https://example.test/pager?id=2">Next</a></td>
      |  <td></td><td></td></tr>
      |</table></body></html>""".stripMargin

  test("form bodies escape reserved characters; query URLs keep them " +
      "(R URLencode parity)") {
    // base64-ish VIEWSTATE material: '+'/'='/'&' must be escaped in a
    // POST body or the k=v structure corrupts...
    assert(graft.sources.Fetch.formEncode("ab+cd==&x") === "ab%2Bcd%3D%3D%26x")
    // ...while the R-parity URL encoding keeps reserved characters and
    // writes spaces as %20
    assert(graft.sources.Fetch.urlEncode("(MTRS = 'A+B')") ===
      "(MTRS%20=%20'A+B')")
  }

  private class MapFetcher(
      getPages: Map[String, Fetch.Response],
      postPages: Map[String, Fetch.Response],
      files: Map[String, Array[Byte]] = Map.empty)
      extends Fetch.Fetcher {
    var lastPostFields: Seq[(String, String)] = Seq.empty
    var lastPostCookies: Map[String, String] = Map.empty
    var downloadCount = 0
    var getCount = 0
    override def get(url: String, cookies: Map[String, String])
        : Fetch.Response = { getCount += 1; getPages(url) }
    override def postForm(url: String, fields: Seq[(String, String)],
        cookies: Map[String, String]): Fetch.Response = {
      lastPostFields = fields; lastPostCookies = cookies
      postPages(url)
    }
    override def download(url: String): Array[Byte] = {
      downloadCount += 1; files(url)
    }
  }

  test("certificate-list scrape: session, page-size POST, link join, " +
      "dedup, numeric filter") {
    val f = new MapFetcher(
      getPages = Map(
        home -> Fetch.Response(200, "<html/>",
          Map("ASP.NET_SessionId" -> "sess42", "other" -> "x")),
        search -> Fetch.Response(200, searchPage(4))),
      postPages = Map(action -> Fetch.Response(200, gridPage)))
    val df = new RcaIngest(f, home, search).fetchCertificateList(spark)

    // form POST carried the session cookie and the 200-per-page override
    assert(f.lastPostCookies === Map("ASP.NET_SessionId" -> "sess42"))
    assert(f.lastPostFields.contains(RcaIngest.PageSizeField -> "200"))
    assert(f.lastPostFields.contains("__VIEWSTATE" -> "vs123"))

    assert(df.columns.toSeq === Seq("certificate_number", "entity",
      "certificate_status", "cpcn_url", "entity_url"))
    val rows = df.collect()
    // dup cert 101 dropped (keep-first), 18.1 kept (numeric), trailer +
    // pager rows sliced off
    assert(rows.map(_.getDouble(0)).toSeq === Seq(101.0, 18.1))
    val r101 = rows.find(_.getDouble(0) == 101.0).get
    assert(r101.getAs[String]("cpcn_url") ===
      "https://example.test/cert?id=101")
    assert(r101.getAs[String]("entity_url") ===
      "https://example.test/entity?id=9")
    // 18.1's cpcn anchor ends "?id=" → filtered → NA → ""
    val r181 = rows.find(_.getDouble(0) == 18.1).get
    assert(r181.getAs[String]("cpcn_url") === "")
  }

  test("certificate-list scrape enforces the >200 pagination guard") {
    val f = new MapFetcher(
      getPages = Map(
        home -> Fetch.Response(200, "<html/>",
          Map("ASP.NET_SessionId" -> "s")),
        search -> Fetch.Response(200, searchPage(480))),
      postPages = Map.empty)
    val e = intercept[IllegalStateException] {
      new RcaIngest(f, home, search).fetchCertificateList(spark)
    }
    assert(e.getMessage.contains("480"))
    assert(e.getMessage.contains("unimplemented"))
  }

  test("KML download is idempotent and creates missing-placeholders") {
    val dir = Files.createTempDirectory("fetch-dl")
    val certUrl = "https://example.test/cert?id=101"
    val kmlUrl = "https://example.test/ViewFile.aspx?doc=k1"
    val certPage =
      s"""<html><a id="ctl_KMLDoc" href="$kmlUrl">KML</a></html>"""
    val f = new MapFetcher(
      getPages = Map(certUrl -> Fetch.Response(200, certPage)),
      postPages = Map.empty,
      files = Map(kmlUrl -> "<kml/>".getBytes(StandardCharsets.UTF_8)))
    val ingest = new RcaIngest(f, home, search)

    val p1 = ingest.downloadKml(certUrl, "101", dir)
    assert(p1.getFileName.toString === "101-servicearea.kml")
    assert(new String(Files.readAllBytes(p1), StandardCharsets.UTF_8)
      === "<kml/>")
    assert(f.downloadCount === 1)
    // second call: skip-if-exists, no network at all
    val p2 = ingest.downloadKml(certUrl, "101", dir)
    assert(p2 === p1 && f.downloadCount === 1 && f.getCount === 1)

    // a cert page without the KMLDoc link → placeholder, not an error
    val bare = "https://example.test/cert?id=102"
    val f2 = new MapFetcher(
      getPages = Map(bare -> Fetch.Response(200, "<html/>")),
      postPages = Map.empty)
    val p3 = new RcaIngest(f2, home, search).downloadKml(bare, "102", dir)
    assert(p3.toString.contains("missing-placeholder"))
    assert(p3.getFileName.toString === "102-kml-MISSING.txt")
  }

  test("chronology snapshot sink writes HTML on success, placeholder " +
      "on failure") {
    val dir = Files.createTempDirectory("fetch-chron")
    val certUrl = "https://example.test/cert?id=101"
    val postUrl = "https://example.test/cert-post.aspx"
    val certPage =
      s"""<html><form action="$postUrl">
         |<input name="__EVENTTARGET" value=""/>
         |<input name="__VIEWSTATE" value="v"/></form></html>""".stripMargin
    val chronPage =
      """<html><a class="activePortalTabLink" id="x_TabLink1">Chronology
        |</a><table class="RCAGrid"><tr><td>Order 1</td></tr></table>
        |</html>""".stripMargin
    val f = new MapFetcher(
      getPages = Map(certUrl -> Fetch.Response(200, certPage)),
      postPages = Map(postUrl -> Fetch.Response(200, chronPage)))
    val ingest = new RcaIngest(f, home, search)

    val p = ingest.downloadChronology(certUrl, "101", dir)
    assert(p.getFileName.toString === "101-certificate-chronology.html")
    assert(f.lastPostFields.contains(
      "__EVENTTARGET" -> RcaIngest.ChronologyTabTarget))
    assert(new String(Files.readAllBytes(p), StandardCharsets.UTF_8)
      .contains("Order 1"))

    // tab switch failed (no active-tab marker) → placeholder
    val f2 = new MapFetcher(
      getPages = Map(certUrl -> Fetch.Response(200, certPage)),
      postPages = Map(postUrl -> Fetch.Response(200, "<html/>")))
    val p2 = new RcaIngest(f2, home, search)
      .downloadChronology(certUrl, "999", dir)
    assert(p2.getFileName.toString === "999-chronology-MISSING.txt")
  }

  test("scrape output round-trips through the date-stamped CSV sink") {
    val f = new MapFetcher(
      getPages = Map(
        home -> Fetch.Response(200, "<html/>",
          Map("ASP.NET_SessionId" -> "s")),
        search -> Fetch.Response(200, searchPage(4))),
      postPages = Map(action -> Fetch.Response(200, gridPage)))
    val df = new RcaIngest(f, home, search).fetchCertificateList(spark)
    val dir = Files.createTempDirectory("csv-sink")
    val date = java.time.LocalDate.of(2025, 12, 11)
    val out = CsvSink.writeDateStamped(df, dir,
      "rca_electric_certificates", date)
    assert(out.getFileName.toString ===
      "rca_electric_certificates_2025-12-11.csv")
    val lines = Files.readAllLines(out)
    assert(lines.get(0) ===
      "certificate_number,entity,certificate_status,cpcn_url,entity_url")
    assert(lines.size === 3)
    // idempotent overwrite: writing again replaces, not duplicates
    val out2 = CsvSink.writeDateStamped(df, dir,
      "rca_electric_certificates", date)
    assert(out2 === out)
    val names = { val s = Files.list(dir)
      try s.toArray.map(_.toString).toSeq finally s.close() }
    assert(names.size === 1)
  }

  test("HtmlTable.read fails loudly on header mismatch across files") {
    val dir = Files.createTempDirectory("html-hdr")
    def page(cols: Seq[String]): String =
      "<table class=\"RCAGrid\">" +
        s"<tr>${cols.map(c => s"<td>$c</td>").mkString}</tr>" +
        "<tr><td>1</td><td>2</td></tr></table>"
    Files.write(dir.resolve("a.html"),
      page(Seq("Col A", "Col B")).getBytes(StandardCharsets.UTF_8))
    Files.write(dir.resolve("b.html"),
      page(Seq("Col A", "DIFFERENT")).getBytes(StandardCharsets.UTF_8))
    val e = intercept[Exception] {
      graft.sources.HtmlTable
        .read(spark, s"$dir/*.html", Some("RCAGrid")).collect()
    }
    assert(e.getMessage != null)
    val msg = Option(e.getMessage).getOrElse("") +
      Option(e.getCause).map(_.getMessage).getOrElse("")
    assert(msg.contains("header mismatch") ||
      e.toString.contains("header mismatch"))
  }
}

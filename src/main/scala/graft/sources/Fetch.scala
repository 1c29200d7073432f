package graft.sources

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path}
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

/** Driver-side HTTP ingest layer (reference S1/S2/S7/S8): the scrape
  * session (R/functions.R:1-20), certificate-list scan with the >200
  * pagination guard (R/functions.R:23-75), and the idempotent
  * KML/PDF/chronology download + HTML snapshot sinks
  * (R/functions.R:84-164).
  *
  * Ingest is deliberately DRIVER-side, not a distributed operator: the
  * certificate list is ≤200 rows and the remote host wants politeness,
  * so the reference's per-certificate fan-out maps to a small driver
  * loop whose RESULTS enter Spark via `spark.createDataFrame` /
  * file scans (SURVEY §2.1 S1). All network access goes through the
  * [[Fetcher]] interface: the environment is zero-egress, so tests and
  * replays run a recorded-fixture implementation while [[HttpFetcher]]
  * is the production binding.
  */
object Fetch {

  /** One HTTP exchange as the scraper sees it. */
  case class Response(status: Int, body: String,
      cookies: Map[String, String] = Map.empty)

  /** Minimal HTTP surface the reference pipeline needs. */
  trait Fetcher {
    def get(url: String, cookies: Map[String, String] = Map.empty)
        : Response
    def postForm(url: String, fields: Seq[(String, String)],
        cookies: Map[String, String]): Response
    /** Binary download (S7). Returns the payload. */
    def download(url: String): Array[Byte]
  }

  /** Production binding over java.net.http — compiles against the JDK
    * only; unused in tests (zero-egress environment).
    */
  final class HttpFetcher extends Fetcher {
    private val client = java.net.http.HttpClient.newBuilder()
      .followRedirects(java.net.http.HttpClient.Redirect.NORMAL)
      .build()

    private def cookieHeader(cookies: Map[String, String]): String =
      cookies.map { case (k, v) => s"$k=$v" }.mkString("; ")

    private def parseSetCookies(
        resp: java.net.http.HttpResponse[String]): Map[String, String] =
      resp.headers().allValues("set-cookie").toArray.toSeq.flatMap { v =>
        v.toString.split(";", 2).headOption.flatMap { kv =>
          kv.split("=", 2) match {
            case Array(k, value) => Some(k.trim -> value.trim)
            case _ => None
          }
        }
      }.toMap

    override def get(url: String, cookies: Map[String, String])
        : Response = {
      val b = java.net.http.HttpRequest.newBuilder(java.net.URI.create(url))
      if (cookies.nonEmpty) b.header("Cookie", cookieHeader(cookies))
      val resp = client.send(b.GET().build(),
        java.net.http.HttpResponse.BodyHandlers.ofString())
      Response(resp.statusCode(), resp.body(), parseSetCookies(resp))
    }

    override def postForm(url: String, fields: Seq[(String, String)],
        cookies: Map[String, String]): Response = {
      val body = fields.map { case (k, v) =>
        formEncode(k) + "=" + formEncode(v)
      }.mkString("&")
      val b = java.net.http.HttpRequest.newBuilder(java.net.URI.create(url))
        .header("Content-Type", "application/x-www-form-urlencoded")
      if (cookies.nonEmpty) b.header("Cookie", cookieHeader(cookies))
      val resp = client.send(
        b.POST(java.net.http.HttpRequest.BodyPublishers.ofString(body))
          .build(),
        java.net.http.HttpResponse.BodyHandlers.ofString())
      Response(resp.statusCode(), resp.body(), parseSetCookies(resp))
    }

    override def download(url: String): Array[Byte] = {
      val resp = client.send(
        java.net.http.HttpRequest.newBuilder(java.net.URI.create(url))
          .GET().build(),
        java.net.http.HttpResponse.BodyHandlers.ofByteArray())
      resp.body()
    }
  }

  /** application/x-www-form-urlencoded encoding for POST BODIES: every
    * reserved character ('&', '=', '+', base64 VIEWSTATE bytes...) must
    * be escaped or it corrupts the k=v structure — NOT interchangeable
    * with [[urlEncode]], whose R semantics deliberately keep reserved
    * characters for URL query strings.
    */
  def formEncode(s: String): String =
    java.net.URLEncoder.encode(s, StandardCharsets.UTF_8)

  /** R `URLencode(reserved = FALSE)` equivalent (R/functions.R:394):
    * keeps unreserved AND reserved characters, percent-encodes the rest
    * byte-wise with uppercase hex (space → %20). java.net.URLEncoder is
    * NOT byte-compatible (space → '+', parens/quotes/equals encoded),
    * which would diverge from any reference-recorded query URL
    * (ADVICE r02). For POST bodies use [[formEncode]].
    */
  def urlEncode(s: String): String = {
    val keep = "ABCDEFGHIJKLMNOPQRSTUVWXYZ" +
      "abcdefghijklmnopqrstuvwxyz0123456789._~-" + "][!$&'()*+,;=:/?@#"
    s.getBytes(StandardCharsets.UTF_8).map { b =>
      val c = (b & 0xff).toChar
      if (keep.indexOf(c) >= 0) c.toString else f"%%${b & 0xff}%02X"
    }.mkString
  }

  // --- HTML micro-helpers over the constrained ASP.NET markup ---

  private val inputRe =
    ("(?is)<input\\b[^>]*>").r
  private val attrRe = (name: String) =>
    ("(?is)\\b" + name + "\\s*=\\s*[\"']([^\"']*)[\"']").r
  private val formRe = "(?is)<form\\b[^>]*>".r
  private val anchorRe = "(?is)<a\\b[^>]*>(.*?)</a>".r
  private val tagRe = "(?s)<[^>]*>".r

  private def attr(tag: String, name: String): Option[String] =
    attrRe(name).findFirstMatchIn(tag).map(_.group(1))

  /** All form input fields (name → value) plus the form action — the
    * rvest html_form equivalent for the single-form RCA pages.
    */
  def formFields(html: String): (Option[String], Seq[(String, String)]) = {
    val action = formRe.findFirstIn(html).flatMap(attr(_, "action"))
    val fields = inputRe.findAllIn(html).toSeq.flatMap { tag =>
      attr(tag, "name").map(n => n -> attr(tag, "value").getOrElse(""))
    }
    (action, fields)
  }

  /** First anchor matching href-contains + id-ends-with (the
    * `a[href*='ViewFile.aspx'][id$='KMLDoc']` selectors,
    * R/functions.R:96-98,128-130), returning its href.
    */
  def findLink(html: String, hrefContains: String, idEndsWith: String)
      : Option[String] =
    anchorRe.findAllMatchIn(html).map(_.group(0)).collectFirst {
      case a if attr(a, "href").exists(_.contains(hrefContains)) &&
        attr(a, "id").exists(_.endsWith(idEndsWith)) =>
        attr(a, "href").get
    }

  /** Whether an anchor with the given class and id suffix exists
    * (`a.activePortalTabLink[id$='TabLink1']`, R/functions.R:155).
    */
  def hasLinkWithClass(html: String, className: String,
      idEndsWith: String): Boolean =
    anchorRe.findAllMatchIn(html).map(_.group(0)).exists { a =>
      attr(a, "class").exists(_.split("\\s+").contains(className)) &&
        attr(a, "id").exists(_.endsWith(idEndsWith))
    }

  /** All (text, href) anchor pairs inside table cells — the reference's
    * `html_nodes(xpath = "//td/a")` link harvest (R/functions.R:44-47).
    */
  def anchors(html: String): Seq[(String, String)] =
    anchorRe.findAllMatchIn(html).flatMap { m =>
      attr(m.group(0), "href").map { href =>
        HtmlTable.unescape(tagRe.replaceAllIn(m.group(1), " "))
          .replaceAll("\\s+", " ").trim -> href
      }
    }.toSeq

  /** Text of the first element with the given class (the `.count`
    * certificate-count read, R/functions.R:31-35).
    */
  def elementTextByClass(html: String, className: String)
      : Option[String] = {
    val re = ("(?is)<([a-z0-9]+)\\b[^>]*class\\s*=\\s*[\"'][^\"']*\\b" +
      java.util.regex.Pattern.quote(className) +
      "\\b[^\"']*[\"'][^>]*>(.*?)</\\1>").r
    re.findFirstMatchIn(html)
      .map(m => tagRe.replaceAllIn(m.group(2), " ")
        .replaceAll("\\s+", " ").trim)
  }
}

/** The certificate-list scrape (S1/S2) and per-certificate download
  * stages (S7/S8), parameterized by [[Fetch.Fetcher]]. URLs default to
  * the reference's; fixtures override them in tests.
  */
class RcaIngest(fetcher: Fetch.Fetcher,
    homeUrl: String = RcaIngest.DefaultHomeUrl,
    searchUrl: String = RcaIngest.DefaultSearchUrl) {
  import Fetch._

  /** Scrape the certificate list into a DataFrame (reference
    * fetch_certificates_list, R/functions.R:23-75): session → search →
    * count guard → 200-per-page POST → grid parse → link join →
    * dedup/clean. Driver-side by design; the ≤200-row result enters
    * Spark via createDataFrame.
    */
  def fetchCertificateList(spark: SparkSession): DataFrame = {
    val home = fetcher.get(homeUrl)
    val session = home.cookies
    val search = fetcher.get(searchUrl, session)

    val count = elementTextByClass(search.body, "count")
      .flatMap("""\d+""".r.findFirstIn(_)).map(_.toInt)
      .getOrElse(throw new IllegalStateException(
        "certificate count element not found"))
    // Pagination guard (R/functions.R:36-38): requesting 200/page only
    // covers one page; more certificates would silently truncate.
    if (count > 200)
      throw new IllegalStateException(
        s"$count electric certificates listed; paginating more than " +
          "200 is unimplemented")

    // The reference ASSIGNS the page-size field into the form list
    // (field_values[[name]] <- value, R/functions.R:40-44), which ADDS
    // it when the parsed form lacks the dropdown — mirror that instead
    // of only overriding an existing field, else a form variant without
    // it would silently POST the default page size and truncate
    // (ADVICE r02).
    val (action, fields) = formFields(search.body)
    val postFields =
      if (fields.exists(_._1 == RcaIngest.PageSizeField))
        fields.map {
          case (n, _) if n == RcaIngest.PageSizeField => n -> "200"
          case kv => kv
        }
      else fields :+ (RcaIngest.PageSizeField -> "200")
    val grid = fetcher.postForm(action.getOrElse(searchUrl), postFields,
      session.filter(_._1 == "ASP.NET_SessionId"))

    val table = HtmlTable.parseTable(grid.body, Some("RCAGrid"))
    require(table.nonEmpty, "RCAGrid table not found in search response")
    // header = row 2 (R table[2,]), data = slice(-(1:2), -nrow(table))
    val header = table(1).map(HtmlTable.normalizeHeader)
    val data = table.slice(2, table.length - 1)
    val certIdx = header.indexOf("certificate_number")
    val entityIdx = header.indexOf("entity")
    require(certIdx >= 0 && entityIdx >= 0,
      s"expected certificate_number and entity in header $header")

    // distinct(text, .keep_all) + drop empty-id links (R/functions.R:48-51)
    val links = anchors(grid.body)
      .foldLeft(Vector.empty[(String, String)]) { (acc, kv) =>
        if (acc.exists(_._1 == kv._1)) acc else acc :+ kv
      }
      .filterNot { case (_, href) => href.matches(".*\\?id=$") }
      .toMap

    // distinct certificate_number keep-first (R/functions.R:57)
    val dedup = data
      .foldLeft(Vector.empty[Seq[String]]) { (acc, row) =>
        if (acc.exists(_.apply(certIdx) == row(certIdx))) acc
        else acc :+ row
      }
      // as.numeric + filter(!is.na) (R/functions.R:62-65)
      .filter(r => r(certIdx).toDoubleOption.isDefined)

    val schema = StructType(
      header.map { h =>
        if (h == "certificate_number") StructField(h, DoubleType)
        else StructField(h, StringType)
      } ++ Seq(StructField("cpcn_url", StringType),
        StructField("entity_url", StringType)))
    val rows = dedup.map { r =>
      val vals: Seq[Any] = header.indices.map { i =>
        if (i == certIdx) r(i).toDouble else r(i)
      } ++ Seq(
        links.getOrElse(r(certIdx), ""), // NA → "" (R/functions.R:67)
        links.getOrElse(r(entityIdx), ""))
      Row.fromSeq(vals)
    }
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows.toSeq, 1), schema)
  }

  /** Idempotent binary download stage (S7, download_certificate_kml
    * R/functions.R:84-111): skip-if-exists; on a missing document link,
    * create a placeholder under missing-placeholder/ and return its
    * path — the same graceful-degradation contract as the reference.
    */
  def downloadDoc(certUrl: String, certNumber: String, dataDir: Path,
      idSuffix: String, outName: String, missingName: String): Path = {
    val out = dataDir.resolve(outName)
    if (Files.exists(out)) return out // skip-if-exists (R:89-91)
    val page = fetcher.get(certUrl)
    findLink(page.body, "ViewFile.aspx", idSuffix) match {
      case Some(url) =>
        Files.createDirectories(dataDir)
        Files.write(out, fetcher.download(url))
        out
      case None =>
        val ph = dataDir.resolve("missing-placeholder")
        Files.createDirectories(ph)
        val p = ph.resolve(missingName)
        if (!Files.exists(p)) Files.createFile(p)
        p
    }
  }

  def downloadKml(certUrl: String, cert: String, dataDir: Path): Path =
    downloadDoc(certUrl, cert, dataDir, "KMLDoc",
      s"$cert-servicearea.kml", s"$cert-kml-MISSING.txt")

  def downloadPdf(certUrl: String, cert: String, dataDir: Path): Path =
    downloadDoc(certUrl, cert, dataDir, "CertDoc",
      s"$cert-certificate.pdf", s"$cert-certificate-pdf-MISSING.txt")

  /** Chronology-tab HTML snapshot sink (S8, R/functions.R:142-164):
    * POST the tab switch, verify the active-tab marker, snapshot the
    * HTML; placeholder on failure. Idempotent like the downloads.
    */
  def downloadChronology(certUrl: String, cert: String, dataDir: Path)
      : Path = {
    val out = dataDir.resolve(s"$cert-certificate-chronology.html")
    if (Files.exists(out)) return out
    val page = fetcher.get(certUrl)
    val (action, fields) = formFields(page.body)
    val postFields = fields.map {
      case ("__EVENTTARGET", _) =>
        "__EVENTTARGET" -> RcaIngest.ChronologyTabTarget
      case kv => kv
    }
    val resp = fetcher.postForm(action.getOrElse(certUrl), postFields,
      page.cookies.filter(_._1 == "ASP.NET_SessionId"))
    if (hasLinkWithClass(resp.body, "activePortalTabLink", "TabLink1")) {
      Files.createDirectories(dataDir)
      Files.write(out, resp.body.getBytes(StandardCharsets.UTF_8))
      out
    } else {
      val ph = dataDir.resolve("missing-placeholder")
      Files.createDirectories(ph)
      val p = ph.resolve(s"$cert-chronology-MISSING.txt")
      if (!Files.exists(p)) Files.createFile(p)
      p
    }
  }
}

object RcaIngest {
  val DefaultHomeUrl = "https://rca.alaska.gov/RCAWeb/home.aspx"
  val DefaultSearchUrl =
    "https://rca.alaska.gov/RCAWeb/RCALibrary/SearchResults.aspx" +
      "?t=cert&p=typesearch&cert=&entity=" +
      "&utiltype=fb3aa508-d4ce-40d9-8e4a-602912321bce"
  /** The page-size dropdown field the reference overrides to 200
    * (R/functions.R:41).
    */
  val PageSizeField =
    "PortalPageControl1:_ctl6:searchResultCert:certGridHeader:" +
      "ddlNumberPerPage"
  /** The chronology tab's postback target (R/functions.R:154). */
  val ChronologyTabTarget =
    "PortalPageControl1$_ctl6$PortalPageControl1$TabLink1"
}

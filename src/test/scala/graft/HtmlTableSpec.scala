package graft

import graft.sources.HtmlTable

/** HTML-table source (reference S2/S6 RCAGrid shape): header
  * normalization, entity unescaping, link extraction, positional slice.
  */
class HtmlTableSpec extends SparkSpec {

  private val rcaGridHtml =
    """<html><body><div>junk before</div>
      |<table class="RCAGrid" border="1">
      |<tr><td colspan="3">Certificates - Search Results</td></tr>
      |<tr><th>Certificate Number</th><th>Entity Name</th>
      |    <th>Certificate Status</th></tr>
      |<tr><td><a href="?id=10">10</a></td>
      |    <td>GOLDEN VALLEY &amp; CO</td><td>Active</td></tr>
      |<tr><td><a href="?id=18.1">18.1</a></td>
      |    <td>O&#39;BRIEN POWER &lt;LLC&gt;</td><td>Inactive</td></tr>
      |<tr><td colspan="3">Page 1 of 1</td></tr>
      |</table>
      |<table class="Other"><tr><td>decoy table</td></tr></table>
      |</body></html>""".stripMargin

  test("parseTable targets the right class and unescapes entities") {
    val rows = HtmlTable.parseTable(rcaGridHtml, Some("RCAGrid"))
    assert(rows.length === 5)
    assert(rows(1) ===
      Seq("Certificate Number", "Entity Name", "Certificate Status"))
    assert(rows(2) === Seq("10", "GOLDEN VALLEY & CO", "Active"))
    assert(rows(3)(1) === "O'BRIEN POWER <LLC>")
  }

  test("rowLinks pulls hrefs per row") {
    val links = HtmlTable.rowLinks(rcaGridHtml, Some("RCAGrid"))
    assert(links(2) === Some("?id=10"))
    assert(links(3) === Some("?id=18.1"))
    assert(links(0) === None)
  }

  test("header normalization matches reference rules") {
    assert(HtmlTable.normalizeHeader("Certificate Number")
      === "certificate_number")
    assert(HtmlTable.normalizeHeader("  Order Date ") === "order_date")
  }

  test("distributed read: header row + trailer slice (P8)") {
    val dir = java.nio.file.Files.createTempDirectory("html")
    java.nio.file.Files.writeString(dir.resolve("grid.html"), rcaGridHtml)
    val df = HtmlTable.read(spark, dir.toString + "/*.html",
      Some("RCAGrid"), headerRow = 1, dropTrailing = 1)
    assert(df.columns.toSeq === Seq("path", "certificate_number",
      "entity_name", "certificate_status"))
    val rows = df.collect()
    assert(rows.length === 2) // banner, header, trailer all sliced away
    assert(rows.map(_.getAs[String]("certificate_number")).sorted
      .sameElements(Array("10", "18.1")))
  }
}

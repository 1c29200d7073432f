package graft

import graft.geo.Geo

/** [[Geo.formatGdal]] must round-trip every coordinate string the
  * reference's GDAL writer ever produced: parse → format == original,
  * across all ~61k distinct coordinate literals in the two published
  * layers. This is what makes the byte-identical golden assertion in
  * FullReplaySpec possible.
  */
class GdalFormatSpec extends org.scalatest.funsuite.AnyFunSuite {

  private val files = Seq(
    "/root/reference/service-areas.geojson",
    "/root/reference/service-areas-raw.geojson")
  private def available = files.forall(f =>
    java.nio.file.Files.isReadable(java.nio.file.Paths.get(f)))

  test("formatGdal round-trips every golden coordinate string") {
    assume(available)
    val numRe = """\[ (-?\d+\.?\d*), (-?\d+\.?\d*) \]""".r
    val nums = files.flatMap { f =>
      val txt = new String(java.nio.file.Files.readAllBytes(
        java.nio.file.Paths.get(f)), "UTF-8")
      numRe.findAllMatchIn(txt).flatMap(m => Seq(m.group(1), m.group(2)))
    }.distinct
    assert(nums.size > 50000, "expected the full coordinate corpus")
    val bad = nums.filter(s => Geo.formatGdal(s.toDouble) != s)
    assert(bad.isEmpty,
      s"${bad.size} coordinate strings failed round-trip; first: " +
        bad.take(5).mkString(", "))
  }

  test("formatGdal is a fixpoint under re-parsing (property)") {
    // GDAL writers are fixpoints: format(parse(format(x))) == format(x).
    // Without this, re-ingesting our own output would drift bytes.
    val rnd = new scala.util.Random(42)
    (0 until 20000).foreach { _ =>
      val v = (rnd.nextDouble() - 0.5) * 360.0
      val once = Geo.formatGdal(v)
      val twice = Geo.formatGdal(once.toDouble)
      assert(twice === once, s"not a fixpoint for $v: $once -> $twice")
      // the formatted value parses back within the formatter's precision
      // contract: 15 decimals, plus the 0/9-run noise cleanup which may
      // round at decimal ~10 (the same trade GDAL makes)
      assert(math.abs(once.toDouble - v) <= 2e-9,
        s"format drifted value: $v -> $once")
    }
  }

  test("formatGdal handles the documented edge shapes") {
    // whole number keeps one decimal (GDAL style)
    assert(Geo.formatGdal(-152.0) === "-152.0")
    assert(Geo.formatGdal(0.0) === "0.0")
    // zero-run truncation, one junk digit
    assert(Geo.formatGdal(71.3709131) === "71.3709131")
    // nine-run round-up, one junk digit
    assert(Geo.formatGdal(61.9941803) === "61.9941803")
    // 6-run with two junk digits stays untouched (below the 7 threshold)
    assert(Geo.formatGdal(-149.359383799999989) === "-149.359383799999989")
    // 7-run with two junk digits is cleaned
    assert(Geo.formatGdal(-141.189038) === "-141.189038")
  }
}

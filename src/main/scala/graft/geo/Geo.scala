package graft.geo

import org.locationtech.jts.geom._
import org.locationtech.jts.geom.util.GeometryFixer
import org.locationtech.jts.io.{WKBReader, WKBWriter, WKTReader, WKTWriter}
import org.locationtech.jts.operation.union.UnaryUnionOp
import scala.jdk.CollectionConverters._

/** Pure JTS geometry kernel (no Spark dependency — unit-testable first,
  * SURVEY §7.1 module 1). Geometries travel through the engine as 2-D WKB
  * byte arrays (BinaryType columns); every Catalyst expression in
  * `graft.functions.GeoFunctions` delegates here.
  *
  * Reference semantics mirrored (file:line into /root/reference):
  *  - make-valid on ingest: R/functions.R:182,468
  *  - collect-without-dissolve (`st_combine`): R/functions.R:183-184,471
  *  - dissolving union (`st_union`): R/functions.R:406,431
  *  - Z/M dropped (2-D forced): R/functions.R:429
  */
object Geo {

  val factory = new GeometryFactory(new PrecisionModel(), 4326)

  // WKBReader/Writer are not thread-safe — thread-local instances.
  private val wkbReader = ThreadLocal.withInitial(() => new WKBReader(factory))
  private val wkbWriter =
    ThreadLocal.withInitial(() => new WKBWriter(2)) // force 2-D
  private val wktReader = ThreadLocal.withInitial(() => new WKTReader(factory))
  private val wktWriter = ThreadLocal.withInitial(() => new WKTWriter(2))

  def toWkb(g: Geometry): Array[Byte] = wkbWriter.get.write(g)
  def fromWkb(b: Array[Byte]): Geometry = wkbReader.get.read(b)

  // Per-thread identity-keyed memo of the last TWO decodes: a constant
  // geometry argument (folded literal) arrives as the SAME byte array
  // reference on every row of a task, so predicates against a fixed
  // polygon skip re-parsing WKB per row. Two slots so a binary
  // expression alternating sides (e.g. st_distance_sphere(lit, col))
  // doesn't thrash the constant side out of the cache.
  private final class DecodeCache {
    var k1: Array[Byte] = _; var v1: Geometry = _
    var k2: Array[Byte] = _; var v2: Geometry = _
  }
  private val lastDecode =
    ThreadLocal.withInitial(() => new DecodeCache)
  def fromWkbCached(b: Array[Byte]): Geometry = {
    val c = lastDecode.get
    if (c.k1 eq b) c.v1
    else if (c.k2 eq b) { // promote to slot 1
      val g = c.v2
      c.k2 = c.k1; c.v2 = c.v1; c.k1 = b; c.v1 = g
      g
    } else {
      val g = fromWkb(b)
      c.k2 = c.k1; c.v2 = c.v1; c.k1 = b; c.v1 = g
      g
    }
  }

  // Same trick for JTS prepared geometries: point-in-polygon against a
  // repeated polygon gets the indexed (interval-tree) predicate path —
  // the standard spatial-join inner loop.
  private val lastPrepared = new ThreadLocal[
    (Array[Byte], org.locationtech.jts.geom.prep.PreparedGeometry)]
  def preparedCached(b: Array[Byte])
      : org.locationtech.jts.geom.prep.PreparedGeometry = {
    val last = lastPrepared.get
    if (last != null && (last._1 eq b)) last._2
    else {
      val p = org.locationtech.jts.geom.prep.PreparedGeometryFactory
        .prepare(fromWkb(b))
      lastPrepared.set((b, p))
      p
    }
  }
  def toWkt(g: Geometry): String = wktWriter.get.write(g)
  def fromWkt(s: String): Geometry = wktReader.get.read(s)

  def point(lon: Double, lat: Double): Geometry =
    factory.createPoint(new Coordinate(lon, lat))

  /** JTS GeometryFixer — repairs self-intersections etc. (reference
    * `st_make_valid`). Valid input passes through untouched.
    */
  def makeValid(g: Geometry): Geometry =
    if (g.isValid) g else GeometryFixer.fix(g)

  /** Collect WITHOUT dissolving — reference `st_combine`
    * (R/functions.R:471 comment makes the distinction explicit). Same-type
    * inputs produce a Multi*; mixed inputs a GeometryCollection.
    */
  def collect(gs: Seq[Geometry]): Geometry = {
    val flat = gs.filter(g => g != null && !g.isEmpty)
    if (flat.isEmpty) factory.createGeometryCollection()
    else if (flat.forall(_.isInstanceOf[Polygon]))
      factory.createMultiPolygon(flat.map(_.asInstanceOf[Polygon]).toArray)
    else if (flat.forall(_.isInstanceOf[Point]))
      factory.createMultiPoint(flat.map(_.asInstanceOf[Point]).toArray)
    else if (flat.forall(_.isInstanceOf[LineString]))
      factory.createMultiLineString(
        flat.map(_.asInstanceOf[LineString]).toArray)
    else factory.createGeometryCollection(flat.toArray)
  }

  /** Dissolving union over a set — reference `st_union(collection)`. */
  def unionAll(gs: Seq[Geometry]): Geometry = {
    val flat = gs.filter(g => g != null && !g.isEmpty)
    if (flat.isEmpty) factory.createGeometryCollection()
    // singleton: union is the identity — skipping UnaryUnionOp avoids a
    // useless re-noding pass AND preserves the input coordinate
    // sequence exactly (pass-through features stay byte-stable through
    // the sink; also what the reference does — it only unions the
    // merge-patch pairs)
    else if (flat.lengthCompare(1) == 0) flat.head
    else UnaryUnionOp.union(flat.asJavaCollection)
  }

  /** Any polygonal geometry → MultiPolygon (published-layer contract:
    * all 108 reference features are MultiPolygon).
    */
  def toMultiPolygon(g: Geometry): Geometry = g match {
    case mp: MultiPolygon => mp
    case p: Polygon => factory.createMultiPolygon(Array(p))
    case gc: GeometryCollection =>
      val polys = (0 until gc.getNumGeometries).map(gc.getGeometryN).flatMap {
        case p: Polygon => Seq(p)
        case mp: MultiPolygon =>
          (0 until mp.getNumGeometries)
            .map(mp.getGeometryN(_).asInstanceOf[Polygon])
        case _ => Seq.empty
      }
      factory.createMultiPolygon(polys.toArray)
    case other => throw new IllegalArgumentException(
      s"not polygonal: ${other.getGeometryType}")
  }

  /** Great-circle (haversine) distance in km between two lon/lat
    * points on the authalic sphere.
    */
  def haversineKm(lon1: Double, lat1: Double, lon2: Double,
      lat2: Double): Double = {
    val dLat = math.toRadians(lat2 - lat1)
    val dLon = math.toRadians(lon2 - lon1)
    val a = math.pow(math.sin(dLat / 2), 2) +
      math.cos(math.toRadians(lat1)) * math.cos(math.toRadians(lat2)) *
        math.pow(math.sin(dLon / 2), 2)
    2 * EarthAuthalicRadiusKm * math.asin(math.min(1.0, math.sqrt(a)))
  }

  /** Geodesic (spherical) polygon area in km² — the v2 answer to the
    * "largest service area" question (SURVEY §7.4: planar degrees² is
    * the documented v1 semantics; CRS84 degrees distort with latitude).
    * Spherical-excess formula on the WGS84 authalic sphere; holes
    * subtract, multi-parts sum.
    */
  val EarthAuthalicRadiusKm = 6371.0072
  def sphericalAreaKm2(g: Geometry): Double = g match {
    case p: Polygon =>
      val outer = ringSphericalArea(p.getExteriorRing.getCoordinates)
      val holes = (0 until p.getNumInteriorRing)
        .map(i => ringSphericalArea(p.getInteriorRingN(i).getCoordinates))
        .sum
      outer - holes
    case gc: GeometryCollection =>
      (0 until gc.getNumGeometries)
        .map(i => sphericalAreaKm2(gc.getGeometryN(i))).sum
    case _ => 0.0
  }

  /** Absolute spherical area of one ring (l'Huilier via the shoelace-on-
    * sphere formula, Chamberlain & Duquette, JPL 2007).
    */
  private def ringSphericalArea(cs: Array[Coordinate]): Double = {
    if (cs.length < 4) return 0.0
    var total = 0.0
    var i = 0
    val n = cs.length - 1 // closed ring: last == first
    while (i < n) {
      val p1 = cs(i); val p2 = cs((i + 1) % n)
      total += math.toRadians(p2.x - p1.x) *
        (2 + math.sin(math.toRadians(p1.y)) +
          math.sin(math.toRadians(p2.y)))
      i += 1
    }
    math.abs(total) * EarthAuthalicRadiusKm * EarthAuthalicRadiusKm / 2.0
  }

  // --- GeoJSON (hand-rolled: no jackson-datatype-jts on classpath) ---

  private def coordJson(c: Coordinate): String = s"[${c.x},${c.y}]"

  private def ringJson(r: LineString): String =
    r.getCoordinates.map(coordJson).mkString("[", ",", "]")

  private def polygonRings(p: Polygon): String = {
    val rings = Seq(p.getExteriorRing) ++
      (0 until p.getNumInteriorRing).map(p.getInteriorRingN)
    rings.map(ringJson).mkString("[", ",", "]")
  }

  def toGeoJson(g: Geometry): String = g match {
    case p: Point =>
      s"""{"type":"Point","coordinates":${coordJson(p.getCoordinate)}}"""
    case l: LineString =>
      s"""{"type":"LineString","coordinates":${ringJson(l)}}"""
    case p: Polygon =>
      s"""{"type":"Polygon","coordinates":${polygonRings(p)}}"""
    case mp: MultiPolygon =>
      val polys = (0 until mp.getNumGeometries)
        .map(i => polygonRings(mp.getGeometryN(i).asInstanceOf[Polygon]))
      s"""{"type":"MultiPolygon","coordinates":${
        polys.mkString("[", ",", "]")}}"""
    case mp: MultiPoint =>
      val pts = mp.getCoordinates.map(coordJson)
      s"""{"type":"MultiPoint","coordinates":${pts.mkString("[", ",", "]")}}"""
    case ml: MultiLineString =>
      // must precede GeometryCollection: JTS Multi* extend it
      val lines = (0 until ml.getNumGeometries)
        .map(i => ringJson(ml.getGeometryN(i).asInstanceOf[LineString]))
      s"""{"type":"MultiLineString","coordinates":${
        lines.mkString("[", ",", "]")}}"""
    case gc: GeometryCollection =>
      val geoms = (0 until gc.getNumGeometries).map(i =>
        toGeoJson(gc.getGeometryN(i)))
      s"""{"type":"GeometryCollection","geometries":${
        geoms.mkString("[", ",", "]")}}"""
    case other => throw new IllegalArgumentException(
      s"unsupported: ${other.getGeometryType}")
  }

  /** GDAL/OGR-compatible coordinate formatting (the reference's st_write
    * GeoJSON output): `%.15f`, then OGRFormatDouble's representation-
    * noise cleanup — a run of ≥5 equal '0'/'9' digits ending one digit
    * before the end (or ≥7 ending two before) is truncated (zeros) or
    * rounded away (nines) — then trailing zeros trimmed, keeping one
    * decimal for whole numbers. Validated against every coordinate
    * string in the reference's two published layers (61k distinct
    * values round-trip byte-identically).
    */
  def formatGdal(v: Double): String = {
    // exact decimal expansion of the binary double, rounded half-even at
    // 15 decimals — C printf("%.15f") semantics. (Java's String.format
    // "%f" pads the SHORTEST repr with zeros instead and drops real
    // digits, e.g. …499999983 → …499999980.)
    var s = new java.math.BigDecimal(v)
      .setScale(15, java.math.RoundingMode.HALF_EVEN).toPlainString
    val dot = s.indexOf('.')

    def cleanup(endIdx: Int, minRun: Int): Option[String] = {
      val c = s.charAt(endIdx)
      if (c != '0' && c != '9') return None
      var j = endIdx
      while (j > dot && s.charAt(j) == c) j -= 1
      val run = endIdx - j
      if (run < minRun || j <= dot) return None
      val head = s.substring(0, j + 1)
      if (c == '0') Some(head)
      else { // round up the digit before the nine-run (with carry)
        val ls = head.toCharArray.toBuffer
        var k = ls.length - 1
        var done = false
        while (k >= 0 && !done) {
          ls(k) match {
            case '.' => k -= 1
            case '-' => ls.insert(k + 1, '1'); done = true
            case '9' => ls(k) = '0'; k -= 1
            case d => ls(k) = (d + 1).toChar; done = true
          }
        }
        if (!done) ls.insert(0, '1')
        Some(ls.mkString)
      }
    }

    cleanup(s.length - 2, 5).orElse(cleanup(s.length - 3, 7))
      .foreach(r => s = r)
    if (s.contains('.')) {
      s = s.reverse.dropWhile(_ == '0').reverse
      if (s.endsWith(".")) s = s + "0" // GDAL keeps x.0 for integers
    }
    s
  }

  private def coordGdal(c: Coordinate): String =
    s"[ ${formatGdal(c.x)}, ${formatGdal(c.y)} ]"

  private def ringGdal(l: LineString): String =
    l.getCoordinates.map(coordGdal).mkString("[ ", ", ", " ]")

  private def polygonRingsGdal(p: Polygon): String = {
    val rings = Seq(p.getExteriorRing) ++
      (0 until p.getNumInteriorRing).map(p.getInteriorRingN)
    rings.map(ringGdal).mkString("[ ", ", ", " ]")
  }

  /** GDAL-style spaced GeoJSON geometry serialization — byte-compatible
    * with the reference's published layers (space after every bracket
    * and comma, `{ "type": "...", "coordinates": ... }` member layout).
    */
  def toGeoJsonGdal(g: Geometry): String = g match {
    case p: Point =>
      s"""{ "type": "Point", "coordinates": ${coordGdal(p.getCoordinate)} }"""
    case l: LineString =>
      s"""{ "type": "LineString", "coordinates": ${ringGdal(l)} }"""
    case p: Polygon =>
      s"""{ "type": "Polygon", "coordinates": ${polygonRingsGdal(p)} }"""
    case mp: MultiPolygon =>
      val polys = (0 until mp.getNumGeometries)
        .map(i => polygonRingsGdal(mp.getGeometryN(i).asInstanceOf[Polygon]))
      s"""{ "type": "MultiPolygon", "coordinates": ${
        polys.mkString("[ ", ", ", " ]")} }"""
    case ml: MultiLineString =>
      val lines = (0 until ml.getNumGeometries)
        .map(i => ringGdal(ml.getGeometryN(i).asInstanceOf[LineString]))
      s"""{ "type": "MultiLineString", "coordinates": ${
        lines.mkString("[ ", ", ", " ]")} }"""
    case mp: MultiPoint =>
      val pts = mp.getCoordinates.map(coordGdal)
      s"""{ "type": "MultiPoint", "coordinates": ${
        pts.mkString("[ ", ", ", " ]")} }"""
    case other => throw new IllegalArgumentException(
      s"unsupported for GDAL-style output: ${other.getGeometryType}")
  }

  /** Minimal recursive-descent GeoJSON geometry parser (numbers, arrays,
    * strings only — geometry objects have no exotic JSON).
    */
  def fromGeoJson(json: String): Geometry = {
    val typeRe = """"type"\s*:\s*"(\w+)"""".r
    val gtype = typeRe.findFirstMatchIn(json).map(_.group(1)).getOrElse(
      throw new IllegalArgumentException("no type in GeoJSON"))
    if (gtype == "GeometryCollection") {
      val inner = json.substring(json.indexOf("\"geometries\""))
      // split top-level objects inside the geometries array
      val start = inner.indexOf('[')
      var depth = 0; var objStart = -1
      val parts = scala.collection.mutable.ArrayBuffer[String]()
      var i = start
      var objDepth = 0
      while (i < inner.length && depth >= 0) {
        inner(i) match {
          case '[' => depth += 1
          case ']' => depth -= 1; if (depth == 0) i = inner.length
          case '{' =>
            if (objDepth == 0) objStart = i
            objDepth += 1
          case '}' =>
            objDepth -= 1
            if (objDepth == 0) parts += inner.substring(objStart, i + 1)
          case _ =>
        }
        i += 1
      }
      return factory.createGeometryCollection(
        parts.map(fromGeoJson).toArray)
    }
    val coordStart = json.indexOf("\"coordinates\"")
    val arr = json.substring(json.indexOf('[', coordStart))
    val (parsed, _) = parseArray(arr, 0)
    gtype match {
      case "Point" =>
        val c = parsed.asInstanceOf[Seq[Double]]
        point(c.head, c(1))
      case "LineString" =>
        factory.createLineString(coords(parsed))
      case "Polygon" => polygonFrom(parsed)
      case "MultiPoint" =>
        factory.createMultiPoint(
          parsed.asInstanceOf[Seq[Seq[Double]]]
            .map(c => factory.createPoint(new Coordinate(c.head, c(1))))
            .toArray)
      case "MultiLineString" =>
        factory.createMultiLineString(
          parsed.asInstanceOf[Seq[Any]]
            .map(l => factory.createLineString(coords(l))).toArray)
      case "MultiPolygon" =>
        factory.createMultiPolygon(
          parsed.asInstanceOf[Seq[Any]].map(polygonFrom).toArray)
      case other =>
        throw new IllegalArgumentException(s"unsupported type $other")
    }
  }

  private def coords(a: Any): Array[Coordinate] =
    a.asInstanceOf[Seq[Seq[Double]]]
      .map(c => new Coordinate(c.head, c(1))).toArray

  private def polygonFrom(a: Any): Polygon = {
    val rings = a.asInstanceOf[Seq[Any]].map(r =>
      factory.createLinearRing(coords(r)))
    factory.createPolygon(rings.head, rings.tail.toArray)
  }

  /** Parse a JSON array of (numbers | nested arrays) starting at `from`
    * (which must point at '['); returns (value, indexAfter).
    */
  private def parseArray(s: String, from: Int): (Seq[Any], Int) = {
    require(s(from) == '[', s"expected [ at $from")
    val out = scala.collection.mutable.ArrayBuffer[Any]()
    var i = from + 1
    while (i < s.length) {
      s(i) match {
        case '[' =>
          val (v, next) = parseArray(s, i)
          out += v
          i = next
        case ']' => return (out.toSeq, i + 1)
        case c if c == ',' || c.isWhitespace => i += 1
        case _ =>
          var j = i
          while (j < s.length && s(j) != ',' && s(j) != ']') j += 1
          out += s.substring(i, j).trim.toDouble
          i = j
      }
    }
    throw new IllegalArgumentException("unterminated array")
  }
}

package graft

import java.nio.{ByteBuffer, ByteOrder}
import java.nio.file.{Files, Paths}
import org.apache.spark.sql.functions._
import org.locationtech.jts.algorithm.Orientation
import org.locationtech.jts.geom.{Coordinate, Geometry, LinearRing, Polygon}
import graft.geo.Geo
import graft.sources.{GeoJson, Shapefile}

/** Shapefile source: a fixture written by this spec's own minimal
  * writer (ESRI Shapefile Technical Description byte layout) must read
  * back geometry- and attribute-equal to the SAME layer written and
  * read as GeoJSON — the "shapefile twin of a GeoJSON fixture" gate.
  */
class ShapefileSpec extends SparkSpec {

  // --- minimal spec-conformant writer (test-only fixture generator) ---

  private def ringCoords(r: LinearRing, wantCCW: Boolean)
      : Array[Coordinate] = {
    val c = r.getCoordinates
    if (Orientation.isCCW(r.getCoordinateSequence) == wantCCW) c
    else c.reverse
  }

  /** Rings of a polygon record in spec orientation: outer CW, holes
    * CCW.
    */
  private def polygonRings(g: Geometry): Seq[Array[Coordinate]] =
    (0 until g.getNumGeometries).flatMap { i =>
      val p = g.getGeometryN(i).asInstanceOf[Polygon]
      ringCoords(p.getExteriorRing, wantCCW = false) +:
        (0 until p.getNumInteriorRing).map(h =>
          ringCoords(p.getInteriorRingN(h), wantCCW = true))
    }

  private def polygonContent(g: Geometry): Array[Byte] = {
    val rings = polygonRings(g)
    val nPoints = rings.map(_.length).sum
    val buf = ByteBuffer.allocate(4 + 32 + 8 + 4 * rings.length +
      16 * nPoints).order(ByteOrder.LITTLE_ENDIAN)
    val env = g.getEnvelopeInternal
    buf.putInt(5)
    buf.putDouble(env.getMinX).putDouble(env.getMinY)
      .putDouble(env.getMaxX).putDouble(env.getMaxY)
    buf.putInt(rings.length).putInt(nPoints)
    var start = 0
    rings.foreach { r => buf.putInt(start); start += r.length }
    rings.foreach(_.foreach(c =>
      buf.putDouble(c.x).putDouble(c.y)))
    buf.array()
  }

  private def pointContent(g: Geometry): Array[Byte] = {
    val c = g.getCoordinate
    ByteBuffer.allocate(20).order(ByteOrder.LITTLE_ENDIAN)
      .putInt(1).putDouble(c.x).putDouble(c.y).array()
  }

  private def writeShp(path: String, shapeType: Int,
      contents: Seq[Array[Byte]]): Unit = {
    val total = 100 + contents.map(8 + _.length).sum
    val buf = ByteBuffer.allocate(total)
    buf.order(ByteOrder.BIG_ENDIAN)
    buf.putInt(0, 9994)
    buf.putInt(24, total / 2)
    buf.order(ByteOrder.LITTLE_ENDIAN)
    buf.putInt(28, 1000)
    buf.putInt(32, shapeType)
    buf.position(100)
    contents.zipWithIndex.foreach { case (c, i) =>
      buf.order(ByteOrder.BIG_ENDIAN)
      buf.putInt(i + 1).putInt(c.length / 2)
      buf.put(c)
    }
    Files.write(Paths.get(path), buf.array())
  }

  /** dBase III writer: (name, type, length, decimals) + string cells
    * (numerics right-justified, text left-justified, per spec).
    */
  private def writeDbf(path: String,
      fields: Seq[(String, Char, Int, Int)],
      rows: Seq[Seq[String]], deletedFlags: Seq[Boolean] = Nil): Unit = {
    val headerSize = 32 + 32 * fields.length + 1
    val recordSize = 1 + fields.map(_._3).sum
    val buf = ByteBuffer.allocate(headerSize + recordSize * rows.length
      + 1).order(ByteOrder.LITTLE_ENDIAN)
    buf.put(0, 0x03.toByte)
    buf.putInt(4, rows.length)
    buf.putShort(8, headerSize.toShort)
    buf.putShort(10, recordSize.toShort)
    fields.zipWithIndex.foreach { case ((name, t, len, dec), i) =>
      val off = 32 + 32 * i
      name.getBytes("ISO-8859-1").take(10).zipWithIndex
        .foreach { case (b, j) => buf.put(off + j, b) }
      buf.put(off + 11, t.toByte)
      buf.put(off + 16, len.toByte)
      buf.put(off + 17, dec.toByte)
    }
    buf.put(headerSize - 1, 0x0d.toByte)
    buf.position(headerSize)
    rows.zipWithIndex.foreach { case (row, r) =>
      val deleted = deletedFlags.lift(r).getOrElse(false)
      buf.put(if (deleted) 0x2a.toByte else 0x20.toByte)
      fields.zip(row).foreach { case ((_, t, len, _), v) =>
        val cell =
          if (t == 'N' || t == 'F') v.reverse.padTo(len, ' ').reverse
          else v.padTo(len, ' ')
        buf.put(cell.take(len).getBytes("ISO-8859-1"))
      }
    }
    buf.put(0x1a.toByte)
    Files.write(Paths.get(path), buf.array())
  }

  // --- fixture: one simple polygon, one polygon WITH a hole ---

  private def fixtureLayer = {
    val f = Geo.factory
    def ring(pts: (Double, Double)*) = f.createLinearRing(
      pts.map(p => new Coordinate(p._1, p._2)).toArray)
    val simple = f.createPolygon(
      ring((0, 0), (4, 0), (4, 3), (0, 3), (0, 0)))
    val holed = f.createPolygon(
      ring((10, 10), (20, 10), (20, 20), (10, 20), (10, 10)),
      Array(ring((12, 12), (14, 12), (14, 14), (12, 14), (12, 12))))
    Seq((101L, "Anchorage ML&P", 4.5, simple),
      (102L, "Chugach Electric", 9.25, holed))
  }

  private def writeFixture(dir: java.nio.file.Path): String = {
    val shp = dir.resolve("areas.shp").toString
    writeShp(shp, 5, fixtureLayer.map(r => polygonContent(r._4)))
    writeDbf(dir.resolve("areas.dbf").toString,
      Seq(("cert_no", 'N', 8, 0), ("name", 'C', 24, 0),
        ("area_sqmi", 'N', 10, 2)),
      fixtureLayer.map(r => Seq(r._1.toString, r._2, r._3.toString)))
    shp
  }

  test("shapefile read equals the GeoJSON twin of the same layer") {
    import spark.implicits._
    val dir = Files.createTempDirectory("shp")
    val shp = writeFixture(dir)

    // GeoJSON twin: same rows through the existing sink + reader
    val gj = dir.resolve("areas.geojson").toString
    GeoJson.write(
      fixtureLayer.map(r => (r._1, r._2, r._3, Geo.toWkb(r._4)))
        .toDF("cert_no", "name", "area_sqmi", "geometry"),
      "geometry", gj, "areas")

    val viaShp = spark.read.format("shapefile").load(shp)
      .select("cert_no", "name", "area_sqmi", "geometry")
      .collect().sortBy(_.getLong(0))
    val viaGeoJson = GeoJson.readFields(spark, gj,
        Seq("cert_no", "name", "area_sqmi"))
      .select(col("cert_no").cast("long"), col("name"),
        col("area_sqmi").cast("double"), col("geometry"))
      .collect().sortBy(_.getLong(0))

    assert(viaShp.length === 2)
    viaShp.zip(viaGeoJson).foreach { case (s, g) =>
      assert(s.getLong(0) === g.getLong(0))
      assert(s.getString(1) === g.getString(1))
      assert(s.getDouble(2) === g.getDouble(2))
      // byte-identical WKB: same vertices, same ring orientation after
      // JTS normalization
      val gs = Geo.fromWkb(s.getAs[Array[Byte]](3)).norm()
      val gg = Geo.fromWkb(g.getAs[Array[Byte]](3)).norm()
      assert(gs.equalsExact(gg), s"geometry differs: $gs vs $gg")
    }
    // the hole survived ring assembly
    val holed = viaShp.find(_.getLong(0) == 102L).get
    assert(Geo.fromWkb(holed.getAs[Array[Byte]](3))
      .asInstanceOf[Polygon].getNumInteriorRing === 1)
  }

  test("dbf typing, deleted-record skip, and null shapes") {
    val dir = Files.createTempDirectory("shp2")
    val f = Geo.factory
    val shp = dir.resolve("pts.shp").toString
    val nullShape = ByteBuffer.allocate(4)
      .order(ByteOrder.LITTLE_ENDIAN).putInt(0).array()
    writeShp(shp, 1, Seq(
      pointContent(f.createPoint(new Coordinate(-149.9, 61.2))),
      nullShape,
      pointContent(f.createPoint(new Coordinate(-147.7, 64.8)))))
    writeDbf(dir.resolve("pts.dbf").toString,
      Seq(("id", 'N', 4, 0), ("active", 'L', 1, 0)),
      Seq(Seq("1", "T"), Seq("2", "F"), Seq("3", "?")))
    val rows = spark.read.format("shapefile").load(shp)
      .orderBy("id").collect()
    assert(rows.length === 3)
    assert(rows.map(_.getLong(2)).toSeq === Seq(1L, 2L, 3L))
    assert(rows(0).getBoolean(3) === true)
    assert(rows(1).getBoolean(3) === false)
    assert(rows(2).isNullAt(3))
    assert(rows(1).isNullAt(1), "null shape reads as null geometry")
    assert(Geo.fromWkb(rows(0).getAs[Array[Byte]](1)).toText
      === "POINT (-149.9 61.2)")

    // a deleted dbf record is skipped by attribute readers
    writeDbf(dir.resolve("del.dbf").toString,
      Seq(("id", 'N', 4, 0)),
      Seq(Seq("1"), Seq("2"), Seq("3")),
      deletedFlags = Seq(false, true, false))
    val kept = Shapefile.dbfRecords(dir.resolve("del.dbf").toString)
    assert(kept.map(_.head) === Seq(1L, 3L))
  }

  test("column pruning is physical: attr-only reads never open the " +
      ".shp, geometry-only reads never open the .dbf") {
    val dir = Files.createTempDirectory("shpprune")
    val f = Geo.factory
    // valid .dbf next to a GARBAGE .shp: an attribute-only projection
    // must still answer (the .shp is never opened)
    Files.write(dir.resolve("bad.shp"),
      Array.fill[Byte](64)(0x7f.toByte))
    writeDbf(dir.resolve("bad.dbf").toString,
      Seq(("id", 'N', 4, 0)), Seq(Seq("41"), Seq("42")))
    val attrsOnly = spark.read.format("shapefile")
      .load(dir.resolve("bad.shp").toString)
    val prunedPlan = attrsOnly.select("id")
      .queryExecution.executedPlan.toString
    assert(!prunedPlan.contains("geometry"),
      s"geometry must be pruned from the scan:\n$prunedPlan")
    assert(attrsOnly.select("id").collect().map(_.getLong(0)).sorted
      .toSeq === Seq(41L, 42L))
    intercept[org.apache.spark.SparkException] {
      attrsOnly.select("id", "geometry").collect() // now it MUST open it
    }

    // 3-record .shp next to a 1-record .dbf: a geometry-only
    // projection yields 3 rows (count came from the .shp alone)
    val dir2 = Files.createTempDirectory("shpprune2")
    writeShp(dir2.resolve("pts.shp").toString, 1,
      (0 until 3).map(i =>
        pointContent(f.createPoint(new Coordinate(i, i)))))
    writeDbf(dir2.resolve("pts.dbf").toString,
      Seq(("id", 'N', 4, 0)), Seq(Seq("7")))
    val df2 = spark.read.format("shapefile")
      .load(dir2.resolve("pts.shp").toString)
    // (collect, not count: count() prunes every column, which is its
    // own covered path — the header-walk below)
    assert(df2.select("geometry").collect().length === 3)
    assert(df2.select("id").collect().map(_.getLong(0)).toSeq
      === Seq(7L))
    // fully-pruned count(*) walks .shp record headers only
    assert(df2.count() === 3)
  }

  test("sharded directory reads all files in parallel partitions") {
    val dir = Files.createTempDirectory("shpdir")
    val f = Geo.factory
    (0 until 3).foreach { i =>
      writeShp(dir.resolve(s"part$i.shp").toString, 1, Seq(
        pointContent(f.createPoint(new Coordinate(i, i)))))
      writeDbf(dir.resolve(s"part$i.dbf").toString,
        Seq(("id", 'N', 4, 0)), Seq(Seq(i.toString)))
    }
    val df = spark.read.format("shapefile").load(dir.toString)
    assert(df.rdd.getNumPartitions === 3,
      "one input partition per .shp shard")
    assert(df.select("id").collect().map(_.getLong(0)).sorted.toSeq
      === Seq(0L, 1L, 2L))
  }
}

package graft.sources

import java.nio.{ByteBuffer, ByteOrder}
import java.nio.file.{Files, Paths}
import org.locationtech.jts.algorithm.Orientation
import org.locationtech.jts.geom.{Coordinate, Geometry, LinearRing}
import org.apache.spark.sql.types._
import graft.geo.Geo

/** Minimal ESRI shapefile (.shp + .dbf) reader — the BASELINE.json:7
  * north-star "Parquet/shapefiles" ingest format (the reference itself
  * ships KML/GeoJSON; shapefiles are the generalized-engine companion).
  * Format per the public ESRI Shapefile Technical Description (July
  * 1998): .shp is a 100-byte header + [record header BE | shape LE]
  * records; .dbf is dBase III — 32-byte field descriptors + fixed-width
  * ASCII records.
  *
  * Supported shapes: Null (0), Point (1), PolyLine (3), Polygon (5),
  * MultiPoint (8) — the 2D set the reference's layers use. Polygon
  * records assemble rings by the spec's orientation rule (outer rings
  * clockwise, holes counter-clockwise, holes assigned by containment).
  *
  * Scale shape: a .shp file is not splittable (variable-length records,
  * no sync markers), so — like GDAL — the unit of parallelism is the
  * FILE: one InputPartition per .shp, a directory of shards reads fully
  * parallel. Attribute schema comes from the first file's .dbf at
  * planning time; a heterogenous directory is a user error.
  */
object Shapefile {

  case class DbfField(name: String, ftype: Char, length: Int,
      decimals: Int)

  /** Spark type for a dBase field: C→string, N/F→long unless it
    * declares decimals (→double), L→boolean, D (yyyymmdd)→string.
    */
  def sparkType(f: DbfField): DataType = f.ftype match {
    case 'N' | 'F' => if (f.decimals > 0) DoubleType else LongType
    case 'L' => BooleanType
    case _ => StringType
  }

  def dbfPath(shpPath: String): String =
    shpPath.replaceAll("(?i)\\.shp$", ".dbf")

  /** Parse the .dbf field descriptor array (32-byte entries from offset
    * 32 until the 0x0D terminator).
    */
  def dbfFields(path: String): Seq[DbfField] = {
    if (!Files.exists(Paths.get(path))) return Seq.empty
    val bytes = Files.readAllBytes(Paths.get(path))
    val buf = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    val headerSize = buf.getShort(8) & 0xffff
    (32 until headerSize by 32).takeWhile(off => bytes(off) != 0x0d)
      .map { off =>
        val nameEnd = (off until off + 11)
          .find(bytes(_) == 0).getOrElse(off + 11)
        DbfField(
          new String(bytes, off, nameEnd - off, "ISO-8859-1"),
          bytes(off + 11).toChar,
          bytes(off + 16) & 0xff,
          bytes(off + 17) & 0xff)
      }
  }

  /** Read the .dbf records as typed values aligned with [[dbfFields]]
    * (deleted records — flag 0x2A — are skipped, mirroring every
    * shapefile consumer).
    */
  def dbfRecords(path: String): Seq[Array[Any]] = {
    if (!Files.exists(Paths.get(path))) return Seq.empty
    val bytes = Files.readAllBytes(Paths.get(path))
    val buf = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    val nRec = buf.getInt(4)
    val headerSize = buf.getShort(8) & 0xffff
    val recordSize = buf.getShort(10) & 0xffff
    val fields = dbfFields(path)
    (0 until nRec).flatMap { r =>
      val base = headerSize + r * recordSize
      if (base + recordSize > bytes.length || bytes(base) == 0x2a) None
      else {
        var off = base + 1
        Some(fields.map { f =>
          val raw = new String(bytes, off, f.length, "ISO-8859-1").trim
          off += f.length
          parseDbfValue(f, raw)
        }.toArray[Any])
      }
    }
  }

  private def parseDbfValue(f: DbfField, raw: String): Any =
    if (raw.isEmpty) null
    else f.ftype match {
      case 'N' | 'F' =>
        try {
          if (f.decimals > 0) raw.toDouble else raw.toLong
        } catch { case _: NumberFormatException => null }
      case 'L' => raw.head match {
        case 'Y' | 'y' | 'T' | 't' => true
        case 'N' | 'n' | 'F' | 'f' => false
        case _ => null
      }
      case _ => raw
    }

  /** Read the .shp geometries in record order (null shapes → null). */
  def shpGeometries(path: String): Seq[Geometry] = {
    val bytes = Files.readAllBytes(Paths.get(path))
    val be = ByteBuffer.wrap(bytes).order(ByteOrder.BIG_ENDIAN)
    require(be.getInt(0) == 9994, s"not a shapefile (bad magic): $path")
    val fileLen = be.getInt(24).toLong * 2 // 16-bit words → bytes
    val out = scala.collection.mutable.ArrayBuffer[Geometry]()
    var off = 100L
    while (off + 8 <= math.min(fileLen, bytes.length)) {
      val contentWords = be.getInt(off.toInt + 4)
      val content = ByteBuffer.wrap(bytes, off.toInt + 8,
        contentWords * 2).order(ByteOrder.LITTLE_ENDIAN)
      out += parseShape(content)
      off += 8 + contentWords.toLong * 2
    }
    out.toSeq
  }

  private def parseShape(b: ByteBuffer): Geometry = {
    val f = Geo.factory
    def point(): Coordinate = new Coordinate(b.getDouble, b.getDouble)
    b.getInt match {
      case 0 => null
      case 1 => f.createPoint(point())
      case 8 => // MultiPoint: box, numPoints, points
        b.position(b.position() + 32)
        val n = b.getInt
        f.createMultiPoint(
          Array.fill(n)(f.createPoint(point())))
      case t @ (3 | 5) => // PolyLine | Polygon: box, parts, points
        b.position(b.position() + 32)
        val nParts = b.getInt
        val nPoints = b.getInt
        val starts = Array.fill(nParts)(b.getInt)
        val pts = Array.fill(nPoints)(point())
        val parts = starts.indices.map { i =>
          val end = if (i + 1 < nParts) starts(i + 1) else nPoints
          pts.slice(starts(i), end)
        }
        if (t == 3) {
          val lines = parts.map(f.createLineString)
          if (lines.length == 1) lines.head
          else f.createMultiLineString(lines.toArray)
        } else assemblePolygons(parts.map(f.createLinearRing))
      case other =>
        throw new IllegalArgumentException(
          s"unsupported shape type $other (2D point/line/polygon only)")
    }
  }

  /** Spec rule: outer rings are clockwise, holes counter-clockwise;
    * each hole belongs to the outer ring containing it. Files that
    * ignore the rule (all rings one orientation) degrade to
    * every-ring-an-outer, which round-trips simple layers correctly.
    */
  private def assemblePolygons(rings: Seq[LinearRing]): Geometry = {
    val f = Geo.factory
    val (ccw, cw) = rings.partition(r =>
      Orientation.isCCW(r.getCoordinateSequence))
    val (outers, holes) = if (cw.nonEmpty) (cw, ccw) else (ccw, Seq.empty)
    val shells = outers.map(f.createPolygon)
    val polys = outers.zip(shells).map { case (o, shell) =>
      val mine = holes.filter(h =>
        shell.contains(f.createPoint(h.getCoordinateN(0))))
      f.createPolygon(o, mine.toArray)
    }
    if (polys.length == 1) polys.head
    else f.createMultiPolygon(polys.toArray)
  }

  /** Full schema of a shapefile read: provenance path + WKB geometry +
    * the .dbf attribute columns.
    */
  def schemaFor(shpPath: String): StructType =
    StructType(
      StructField("path", StringType, nullable = false) +:
      StructField("geometry", BinaryType, nullable = true) +:
      dbfFields(dbfPath(shpPath)).map(f =>
        StructField(f.name, sparkType(f), nullable = true)))

  /** Record count from the .shp record HEADERS alone — no geometry is
    * parsed. Serves count(*)-style fully-pruned scans.
    */
  def shpRecordCount(path: String): Int = {
    val bytes = Files.readAllBytes(Paths.get(path))
    val be = ByteBuffer.wrap(bytes).order(ByteOrder.BIG_ENDIAN)
    require(be.getInt(0) == 9994, s"not a shapefile (bad magic): $path")
    val fileLen = be.getInt(24).toLong * 2
    var off = 100L
    var n = 0
    while (off + 8 <= math.min(fileLen, bytes.length)) {
      n += 1
      off += 8 + be.getInt(off.toInt + 4).toLong * 2
    }
    n
  }

  /** Column-pruned file read: rows carry ONLY the `required` columns,
    * in their order. The pruning is physical, not cosmetic — with no
    * "geometry" column the .shp records are never parsed (attribute
    * analytics skip all geometry decode), with no attribute columns
    * the .dbf is never opened, and a fully-pruned projection (count *)
    * only walks the .shp record headers. Row count therefore comes
    * from whichever side is read — equal by the format's implicit
    * positional join in any valid shapefile.
    */
  def readFileProjected(shpPath: String,
      required: Seq[String]): Iterator[Array[Any]] = {
    val needGeom = required.contains("geometry")
    val fields = dbfFields(dbfPath(shpPath))
    val attrIdx = fields.map(_.name).zipWithIndex.toMap
    val neededAttrs = required.filter(attrIdx.contains)
    if (!needGeom && neededAttrs.isEmpty && required.forall(_ == "path"))
      return Iterator.fill(shpRecordCount(shpPath))(
        required.map(_ => shpPath: Any).toArray)
    val geoms = if (needGeom) shpGeometries(shpPath) else Seq.empty
    val attrs =
      if (neededAttrs.nonEmpty) dbfRecords(dbfPath(shpPath))
      else Seq.empty
    val n = math.max(geoms.length, attrs.length)
    (0 until n).iterator.map { i =>
      required.map {
        case "path" => shpPath
        case "geometry" =>
          val g = if (i < geoms.length) geoms(i) else null
          if (g == null) null else Geo.toWkb(g)
        case name =>
          if (i < attrs.length) attrs(i)(attrIdx(name)) else null
      }.toArray[Any]
    }
  }
}

package graft.sources

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths, StandardOpenOption}
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.geo.Geo

/** GeoJSON FeatureCollection source + sink (reference S5/S10,
  * R/functions.R:166-171,393-396; output shape `service-areas.geojson`).
  *
  * Reader: distributed — `spark.read.json` parses the FeatureCollection,
  * each feature's geometry sub-document is re-serialized to a JSON string
  * and decoded to WKB map-side. Properties surface as columns.
  *
  * Writer: two modes.
  *  - `write`: distributed serialization of one feature-line per row
  *    (executors do the heavy geometry→JSON work), then a driver-side
  *    assembly of the FeatureCollection envelope with CRS84 header +
  *    overwrite semantics (`st_write_or_overwrite` parity). Single-file
  *    output is inherently a 1-writer step — same as the reference.
  *  - `writePartitioned`: newline-delimited GeoJSON features written by
  *    Spark's text sink for cluster-scale layers (no single-file
  *    bottleneck; readable back by `readFeatureLines`).
  */
object GeoJson {

  /** Read a FeatureCollection file: geometry as WKB + properties.* */
  def read(spark: SparkSession, path: String): DataFrame = {
    val raw = spark.read.option("multiLine", "true").json(path)
    val features = raw.select(explode(col("features")).as("f"))
    val geomJson = to_json(col("f.geometry"))
    val decode = udf { (j: String) => Geo.toWkb(Geo.fromGeoJson(j)) }
    features.select(
      decode(geomJson).as("geometry"),
      col("f.properties.*"))
  }

  /** Lean FeatureCollection reader for one-feature-per-line files (the
    * shape both the reference and our sink emit): no schema-inference
    * pass — named properties are pulled with get_json_object. Line-based
    * text scan → fully distributed and splittable, unlike multiLine
    * JSON which is one record per file.
    */
  def readFields(spark: SparkSession, path: String,
      properties: Seq[String]): DataFrame = {
    val decode = udf { (j: String) =>
      if (j == null || j.isEmpty || j == "null") null
      else Geo.toWkb(Geo.fromGeoJson(j))
    }
    val feature = regexp_replace(trim(col("value")), ",$", "")
    val propCols = properties.map(p =>
      get_json_object(feature, s"$$.properties.$p").as(p))
    spark.read.text(path)
      // match both the reference's spaced style and our sink's compact
      // one-feature-per-line output
      .filter(trim(col("value"))
        .rlike("""^\{\s*"type"\s*:\s*"Feature""""))
      .select(propCols :+
        decode(get_json_object(feature, "$.geometry")).as("geometry"): _*)
  }

  /** Serialize rows to GeoJSON feature strings. `geometryCol` must be
    * WKB binary; all other columns become properties.
    */
  private def featureLines(df: DataFrame, geometryCol: String): DataFrame = {
    val props = df.schema.fieldNames.filterNot(_ == geometryCol)
    val propsStruct = struct(props.toIndexedSeq.map(col): _*)
    val geo = udf { (wkb: Array[Byte]) =>
      if (wkb == null) null else Geo.toGeoJson(Geo.fromWkb(wkb))
    }
    df.select(concat(
      lit("""{"type":"Feature","properties":"""),
      when(propsStruct.isNull, lit("{}")).otherwise(to_json(propsStruct)),
      lit(""","geometry":"""),
      coalesce(geo(col(geometryCol)), lit("null")),
      lit("}")).as("feature"))
  }

  private def writeCollection(lines: Seq[String], path: String,
      name: String): Unit = {
    val sb = new StringBuilder
    sb.append("{\n\"type\": \"FeatureCollection\",\n")
    sb.append(s""""name": "$name",\n""")
    sb.append("\"crs\": { \"type\": \"name\", \"properties\": " +
      "{ \"name\": \"urn:ogc:def:crs:OGC:1.3:CRS84\" } },\n")
    sb.append("\"features\": [\n")
    sb.append(lines.mkString(",\n"))
    sb.append("\n]\n}\n")
    val p = Paths.get(path)
    if (p.getParent != null) Files.createDirectories(p.getParent)
    Files.write(p, sb.toString.getBytes(StandardCharsets.UTF_8),
      StandardOpenOption.CREATE, StandardOpenOption.TRUNCATE_EXISTING)
  }

  /** Overwrite-write a single FeatureCollection file with the CRS84
    * header the reference emits (service-areas.geojson:1-4).
    */
  def write(df: DataFrame, geometryCol: String, path: String,
      name: String): Unit =
    writeCollection(
      featureLines(df, geometryCol).collect().map(_.getString(0)),
      path, name)

  private def jsonEscape(s: String): String = {
    val sb = new StringBuilder
    s.foreach {
      case '"' => sb.append("\\\"")
      case '\\' => sb.append("\\\\")
      case '\n' => sb.append("\\n")
      case '\r' => sb.append("\\r")
      case '\t' => sb.append("\\t")
      case c if c < ' ' => sb.append(f"\\u${c.toInt}%04x")
      case c => sb.append(c)
    }
    sb.toString
  }

  /** GDAL/OGR `st_write`-compatible sink: the reference's exact member
    * spacing, properties in column order, coordinates via
    * [[Geo.formatGdal]] — byte-compatible with the published layers
    * (asserted file-level in FullReplaySpec). Feature lines serialize
    * on executors; the driver only assembles the envelope.
    */
  def writeGdal(df: DataFrame, geometryCol: String, path: String,
      name: String): Unit = {
    val props = df.schema.fields.filterNot(_.name == geometryCol)
    val propNames = props.map(_.name)
    val lineUdf = udf { (r: Row, wkb: Array[Byte]) =>
      val sb = new StringBuilder("""{ "type": "Feature", "properties": { """)
      propNames.zipWithIndex.foreach { case (n, i) =>
        if (i > 0) sb.append(", ")
        sb.append('"').append(n).append("\": ")
        val v = if (r.isNullAt(i)) null else r.get(i)
        v match {
          case null => sb.append("null")
          case b: Boolean => sb.append(b.toString)
          case n2 @ (_: Int | _: Long | _: Short | _: Byte) =>
            sb.append(n2.toString)
          case d: Double => sb.append(Geo.formatGdal(d))
          case f: Float => sb.append(Geo.formatGdal(f.toDouble))
          case other =>
            sb.append('"').append(jsonEscape(other.toString)).append('"')
        }
      }
      sb.append(""" }, "geometry": """)
      sb.append(
        if (wkb == null) "null" else Geo.toGeoJsonGdal(Geo.fromWkb(wkb)))
      sb.append(" }")
      sb.toString
    }
    val lines = df.select(lineUdf(
        struct(propNames.toIndexedSeq.map(col): _*), col(geometryCol))
        .as("feature"))
      .collect().map(_.getString(0))
    writeCollection(lines, path, name)
  }

  /** Cluster-scale sink: newline-delimited features via the text sink. */
  def writePartitioned(df: DataFrame, geometryCol: String,
      dir: String): Unit =
    featureLines(df, geometryCol).write.mode("overwrite").text(dir)

  /** Read back a newline-delimited feature layer. Null geometries (the
    * sink writes `"geometry":null`) come back as null WKB.
    */
  def readFeatureLines(spark: SparkSession, dir: String): DataFrame = {
    val raw = spark.read.text(dir)
    val geomRe = """"geometry":(\{.*\})\}\s*$"""
    val decode = udf { (j: String) =>
      if (j == null || j.isEmpty) null
      else Geo.toWkb(Geo.fromGeoJson(j))
    }
    raw.select(
      decode(regexp_extract(col("value"), geomRe, 1)).as("geometry"),
      get_json_object(col("value"), "$.properties").as("properties_json"))
  }
}

package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions.{call_function, collect_list}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String
import org.locationtech.jts.geom.Geometry
import graft.geo.Geo

/** Geometry functions as native Catalyst expressions over WKB
  * (BinaryType) columns — SURVEY §2.8 geospatial table and §7.3.
  *
  * Design choice (SURVEY §7.4 risk): geometries are plain WKB bytes, not
  * a UserDefinedType — the UDT API is semi-internal on Spark 4.x and WKB
  * keeps every operator portable (parquet-writable, comparable,
  * shuffle-safe) while the expressions type-check BinaryType. All
  * expressions are `CodegenFallback` (the JTS call dominates cost; codegen
  * of the wrapper saves nothing measurable).
  *
  * Aggregates (`st_collect_agg`/`st_union_agg`) compose `collect_list`
  * with a scalar finisher instead of a custom Aggregator: partial-merge
  * machinery comes from Spark's native ImperativeAggregate for free.
  */
object GeoFunctions {

  private def bytes(v: Any): Array[Byte] = v.asInstanceOf[Array[Byte]]
  private def geom(v: Any): Geometry = Geo.fromWkb(bytes(v))

  /** Numeric coercion: with ExpectsInputTypes unavailable on Spark 4
    * (AbstractDataType is private[sql]) no implicit casts are inserted,
    * so SQL decimal/int literals arrive unconverted.
    */
  private def toD(v: Any): Double = v match {
    case d: Double => d
    case dec: Decimal => dec.toDouble
    case n: Number => n.doubleValue()
  }

  abstract class GeoUnary extends UnaryExpression
      with CodegenFallback {
  }

  abstract class GeoBinaryPredicate extends BinaryExpression
      with CodegenFallback {
    override def dataType: DataType = BooleanType
  }

  /** st_point(lon, lat) → WKB point. */
  case class STPoint(left: Expression, right: Expression)
      extends BinaryExpression with CodegenFallback {
    override def dataType: DataType = BinaryType
    override def nullSafeEval(lon: Any, lat: Any): Any =
      Geo.toWkb(Geo.point(toD(lon), toD(lat)))
    override protected def withNewChildrenInternal(
        l: Expression, r: Expression): Expression = copy(l, r)
    override def prettyName: String = "st_point"
  }

  case class STGeomFromText(child: Expression) extends UnaryExpression
      with CodegenFallback {
    override def dataType: DataType = BinaryType
    override def nullSafeEval(v: Any): Any =
      Geo.toWkb(Geo.fromWkt(v.toString))
    override protected def withNewChildInternal(c: Expression): Expression =
      copy(c)
    override def prettyName: String = "st_geomfromtext"
  }

  case class STGeomFromGeoJson(child: Expression) extends UnaryExpression
      with CodegenFallback {
    override def dataType: DataType = BinaryType
    override def nullSafeEval(v: Any): Any =
      Geo.toWkb(Geo.fromGeoJson(v.toString))
    override protected def withNewChildInternal(c: Expression): Expression =
      copy(c)
    override def prettyName: String = "st_geomfromgeojson"
  }

  case class STAsText(child: Expression) extends GeoUnary {
    override def dataType: DataType = StringType
    override def nullSafeEval(v: Any): Any =
      UTF8String.fromString(Geo.toWkt(geom(v)))
    override protected def withNewChildInternal(c: Expression): Expression =
      copy(c)
    override def prettyName: String = "st_astext"
  }

  case class STAsGeoJson(child: Expression) extends GeoUnary {
    override def dataType: DataType = StringType
    override def nullSafeEval(v: Any): Any =
      UTF8String.fromString(Geo.toGeoJson(geom(v)))
    override protected def withNewChildInternal(c: Expression): Expression =
      copy(c)
    override def prettyName: String = "st_asgeojson"
  }

  case class STMakeValid(child: Expression) extends GeoUnary {
    override def dataType: DataType = BinaryType
    override def nullSafeEval(v: Any): Any =
      Geo.toWkb(Geo.makeValid(geom(v)))
    override protected def withNewChildInternal(c: Expression): Expression =
      copy(c)
    override def prettyName: String = "st_makevalid"
  }

  case class STIsValid(child: Expression) extends GeoUnary {
    override def dataType: DataType = BooleanType
    override def nullSafeEval(v: Any): Any = geom(v).isValid
    override protected def withNewChildInternal(c: Expression): Expression =
      copy(c)
    override def prettyName: String = "st_isvalid"
  }

  /** Planar area in squared CRS units (degrees² for CRS84 — documented
    * v1 semantics, SURVEY §7.4).
    */
  case class STArea(child: Expression) extends GeoUnary {
    override def dataType: DataType = DoubleType
    override def nullSafeEval(v: Any): Any = geom(v).getArea
    override protected def withNewChildInternal(c: Expression): Expression =
      copy(c)
    override def prettyName: String = "st_area"
  }

  /** Great-circle distance in km between two point geometries. */
  case class STDistanceSphere(left: Expression, right: Expression)
      extends BinaryExpression with CodegenFallback {
    override def dataType: DataType = DoubleType
    override def nullSafeEval(a: Any, b: Any): Any = {
      val pa = Geo.fromWkbCached(bytes(a)).getCoordinate
      val pb = Geo.fromWkbCached(bytes(b)).getCoordinate
      Geo.haversineKm(pa.x, pa.y, pb.x, pb.y)
    }
    override protected def withNewChildrenInternal(
        l: Expression, r: Expression): Expression = copy(l, r)
    override def prettyName: String = "st_distance_sphere"
  }

  /** Geodesic area in km² (spherical excess on the authalic sphere). */
  case class STAreaSpherical(child: Expression) extends GeoUnary {
    override def dataType: DataType = DoubleType
    override def nullSafeEval(v: Any): Any = Geo.sphericalAreaKm2(geom(v))
    override protected def withNewChildInternal(c: Expression): Expression =
      copy(c)
    override def prettyName: String = "st_area_spherical"
  }

  case class STEnvelope(child: Expression) extends GeoUnary {
    override def dataType: DataType = BinaryType
    override def nullSafeEval(v: Any): Any = Geo.toWkb(geom(v).getEnvelope)
    override protected def withNewChildInternal(c: Expression): Expression =
      copy(c)
    override def prettyName: String = "st_envelope"
  }

  case class STConvexHull(child: Expression) extends GeoUnary {
    override def dataType: DataType = BinaryType
    override def nullSafeEval(v: Any): Any = Geo.toWkb(geom(v).convexHull())
    override protected def withNewChildInternal(c: Expression): Expression =
      copy(c)
    override def prettyName: String = "st_convexhull"
  }

  case class STCentroid(child: Expression) extends GeoUnary {
    override def dataType: DataType = BinaryType
    override def nullSafeEval(v: Any): Any = Geo.toWkb(geom(v).getCentroid)
    override protected def withNewChildInternal(c: Expression): Expression =
      copy(c)
    override def prettyName: String = "st_centroid"
  }

  case class STX(child: Expression) extends GeoUnary {
    override def dataType: DataType = DoubleType
    override def nullSafeEval(v: Any): Any = geom(v).getCoordinate.x
    override protected def withNewChildInternal(c: Expression): Expression =
      copy(c)
    override def prettyName: String = "st_x"
  }

  case class STY(child: Expression) extends GeoUnary {
    override def dataType: DataType = DoubleType
    override def nullSafeEval(v: Any): Any = geom(v).getCoordinate.y
    override protected def withNewChildInternal(c: Expression): Expression =
      copy(c)
    override def prettyName: String = "st_y"
  }

  case class STNumGeometries(child: Expression) extends GeoUnary {
    override def dataType: DataType = IntegerType
    override def nullSafeEval(v: Any): Any = geom(v).getNumGeometries
    override protected def withNewChildInternal(c: Expression): Expression =
      copy(c)
    override def prettyName: String = "st_numgeometries"
  }

  case class STContains(left: Expression, right: Expression)
      extends GeoBinaryPredicate {
    override def nullSafeEval(a: Any, b: Any): Any =
      Geo.preparedCached(bytes(a)).contains(Geo.fromWkbCached(bytes(b)))
    override protected def withNewChildrenInternal(
        l: Expression, r: Expression): Expression = copy(l, r)
    override def prettyName: String = "st_contains"
  }

  /** Evaluation-identical twin of [[STContains]] emitted by the
    * SpatialFilterRewrite optimizer rule — a distinct node so the
    * rewrite doesn't re-match its own output.
    */
  case class STContainsExact(left: Expression, right: Expression)
      extends GeoBinaryPredicate {
    override def nullSafeEval(a: Any, b: Any): Any =
      Geo.preparedCached(bytes(a)).contains(Geo.fromWkbCached(bytes(b)))
    override protected def withNewChildrenInternal(
        l: Expression, r: Expression): Expression = copy(l, r)
    override def prettyName: String = "st_contains_exact"
  }

  case class STIntersects(left: Expression, right: Expression)
      extends GeoBinaryPredicate {
    override def nullSafeEval(a: Any, b: Any): Any =
      Geo.preparedCached(bytes(a)).intersects(Geo.fromWkbCached(bytes(b)))
    override protected def withNewChildrenInternal(
        l: Expression, r: Expression): Expression = copy(l, r)
    override def prettyName: String = "st_intersects"
  }

  case class STWithin(left: Expression, right: Expression)
      extends GeoBinaryPredicate {
    // a within b  ⇔  b contains a; prepare b (the repeated side in a
    // point-in-region query is usually the region).
    override def nullSafeEval(a: Any, b: Any): Any =
      Geo.preparedCached(bytes(b)).contains(Geo.fromWkbCached(bytes(a)))
    override protected def withNewChildrenInternal(
        l: Expression, r: Expression): Expression = copy(l, r)
    override def prettyName: String = "st_within"
  }

  case class STDistance(left: Expression, right: Expression)
      extends BinaryExpression with CodegenFallback {
    override def dataType: DataType = DoubleType
    override def nullSafeEval(a: Any, b: Any): Any =
      geom(a).distance(geom(b))
    override protected def withNewChildrenInternal(
        l: Expression, r: Expression): Expression = copy(l, r)
    override def prettyName: String = "st_distance"
  }

  /** st_union(a, b) — binary dissolve (reference R/functions.R:431). */
  case class STUnion(left: Expression, right: Expression)
      extends BinaryExpression with CodegenFallback {
    override def dataType: DataType = BinaryType
    override def nullSafeEval(a: Any, b: Any): Any =
      Geo.toWkb(geom(a).union(geom(b)))
    override protected def withNewChildrenInternal(
        l: Expression, r: Expression): Expression = copy(l, r)
    override def prettyName: String = "st_union"
  }

  /** st_intersection(a, b) — the overlap geometry (the "do service
    * areas overlap, and WHERE" follow-up to the reference's README
    * question #1).
    */
  case class STIntersection(left: Expression, right: Expression)
      extends BinaryExpression with CodegenFallback {
    override def dataType: DataType = BinaryType
    override def nullSafeEval(a: Any, b: Any): Any =
      Geo.toWkb(geom(a).intersection(geom(b)))
    override protected def withNewChildrenInternal(
        l: Expression, r: Expression): Expression = copy(l, r)
    override def prettyName: String = "st_intersection"
  }

  case class STDifference(left: Expression, right: Expression)
      extends BinaryExpression with CodegenFallback {
    override def dataType: DataType = BinaryType
    override def nullSafeEval(a: Any, b: Any): Any =
      Geo.toWkb(geom(a).difference(geom(b)))
    override protected def withNewChildrenInternal(
        l: Expression, r: Expression): Expression = copy(l, r)
    override def prettyName: String = "st_difference"
  }

  case class STSymDifference(left: Expression, right: Expression)
      extends BinaryExpression with CodegenFallback {
    override def dataType: DataType = BinaryType
    override def nullSafeEval(a: Any, b: Any): Any =
      Geo.toWkb(geom(a).symDifference(geom(b)))
    override protected def withNewChildrenInternal(
        l: Expression, r: Expression): Expression = copy(l, r)
    override def prettyName: String = "st_symdifference"
  }

  /** st_buffer(g, dist) — planar buffer in CRS units (degrees here;
    * same planar-degree contract as st_area, documented in §2.8).
    */
  case class STBuffer(left: Expression, right: Expression)
      extends BinaryExpression with CodegenFallback {
    override def dataType: DataType = BinaryType
    override def nullSafeEval(g: Any, d: Any): Any =
      Geo.toWkb(geom(g).buffer(d.asInstanceOf[Double]))
    override protected def withNewChildrenInternal(
        l: Expression, r: Expression): Expression = copy(l, r)
    override def prettyName: String = "st_buffer"
  }

  /** st_simplify(g, tol) — Douglas-Peucker with topology preservation
    * (TopologyPreservingSimplifier: no self-intersections introduced,
    * the variant a published-layer pipeline wants).
    */
  case class STSimplify(left: Expression, right: Expression)
      extends BinaryExpression with CodegenFallback {
    override def dataType: DataType = BinaryType
    override def nullSafeEval(g: Any, d: Any): Any =
      Geo.toWkb(org.locationtech.jts.simplify.TopologyPreservingSimplifier
        .simplify(geom(g), d.asInstanceOf[Double]))
    override protected def withNewChildrenInternal(
        l: Expression, r: Expression): Expression = copy(l, r)
    override def prettyName: String = "st_simplify"
  }

  case class STLength(child: Expression) extends UnaryExpression
      with CodegenFallback {
    override def dataType: DataType = DoubleType
    override def nullSafeEval(v: Any): Any = geom(v).getLength
    override protected def withNewChildInternal(c: Expression): Expression =
      copy(c)
    override def prettyName: String = "st_length"
  }

  case class STGeometryType(child: Expression) extends UnaryExpression
      with CodegenFallback {
    override def dataType: DataType = StringType
    override def nullSafeEval(v: Any): Any =
      org.apache.spark.unsafe.types.UTF8String
        .fromString(geom(v).getGeometryType)
    override protected def withNewChildInternal(c: Expression): Expression =
      copy(c)
    override def prettyName: String = "st_geometrytype"
  }

  case class STIsEmpty(child: Expression) extends UnaryExpression
      with CodegenFallback {
    override def dataType: DataType = BooleanType
    override def nullSafeEval(v: Any): Any = geom(v).isEmpty
    override protected def withNewChildInternal(c: Expression): Expression =
      copy(c)
    override def prettyName: String = "st_isempty"
  }

  private def wkbArray(v: Any): Seq[Geometry] =
    v.asInstanceOf[ArrayData].toObjectArray(BinaryType)
      .map(e => if (e == null) null else Geo.fromWkb(bytes(e))).toSeq

  /** Finisher over collect_list(wkb): combine WITHOUT dissolve
    * (reference `st_combine`, R/functions.R:471).
    */
  case class STCollectArray(child: Expression) extends UnaryExpression
      with CodegenFallback {
    override def dataType: DataType = BinaryType
    override def nullSafeEval(v: Any): Any =
      Geo.toWkb(Geo.collect(wkbArray(v)))
    override protected def withNewChildInternal(c: Expression): Expression =
      copy(c)
    override def prettyName: String = "st_collect_array"
  }

  /** Finisher over collect_list(wkb): dissolving union
    * (reference `st_union(collection)`, R/functions.R:406).
    */
  case class STUnionArray(child: Expression) extends UnaryExpression
      with CodegenFallback {
    override def dataType: DataType = BinaryType
    override def nullSafeEval(v: Any): Any =
      Geo.toWkb(Geo.unionAll(wkbArray(v)))
    override protected def withNewChildInternal(c: Expression): Expression =
      copy(c)
    override def prettyName: String = "st_union_array"
  }

  /** st_dump — native Catalyst Generator (SURVEY §2.10 UDTF row): one
    * output row per part of a multi-part or collection geometry
    * (single geometries yield one row), with the part index. The
    * generator contract streams rows — no intermediate array is
    * materialized per input row, unlike a collect-to-array + explode.
    */
  case class STDump(child: Expression) extends UnaryExpression
      with org.apache.spark.sql.catalyst.expressions.Generator
      with CodegenFallback {
    override def elementSchema: StructType = StructType(Seq(
      StructField("part_idx", IntegerType, nullable = false),
      StructField("part", BinaryType, nullable = true)))
    override def eval(input: InternalRow): IterableOnce[InternalRow] = {
      val v = child.eval(input)
      if (v == null) Nil
      else {
        val g = geom(v)
        (0 until g.getNumGeometries).map(i =>
          InternalRow(i, Geo.toWkb(g.getGeometryN(i))))
      }
    }
    override protected def withNewChildInternal(c: Expression): Expression =
      copy(c)
    override def prettyName: String = "st_dump"
  }

  private val builders: Map[String, Seq[Expression] => Expression] = Map(
    "st_dump" -> (es => STDump(es.head)),
    "st_point" -> (es => STPoint(es(0), es(1))),
    "st_geomfromtext" -> (es => STGeomFromText(es.head)),
    "st_geomfromgeojson" -> (es => STGeomFromGeoJson(es.head)),
    "st_astext" -> (es => STAsText(es.head)),
    "st_asgeojson" -> (es => STAsGeoJson(es.head)),
    "st_makevalid" -> (es => STMakeValid(es.head)),
    "st_isvalid" -> (es => STIsValid(es.head)),
    "st_area" -> (es => STArea(es.head)),
    "st_area_spherical" -> (es => STAreaSpherical(es.head)),
    "st_distance_sphere" -> (es => STDistanceSphere(es(0), es(1))),
    "st_envelope" -> (es => STEnvelope(es.head)),
    "st_convexhull" -> (es => STConvexHull(es.head)),
    "st_centroid" -> (es => STCentroid(es.head)),
    "st_x" -> (es => STX(es.head)),
    "st_y" -> (es => STY(es.head)),
    "st_numgeometries" -> (es => STNumGeometries(es.head)),
    "st_contains" -> (es => STContains(es(0), es(1))),
    "st_intersects" -> (es => STIntersects(es(0), es(1))),
    "st_within" -> (es => STWithin(es(0), es(1))),
    "st_distance" -> (es => STDistance(es(0), es(1))),
    "st_union" -> (es => STUnion(es(0), es(1))),
    "st_intersection" -> (es => STIntersection(es(0), es(1))),
    "st_difference" -> (es => STDifference(es(0), es(1))),
    "st_symdifference" -> (es => STSymDifference(es(0), es(1))),
    "st_buffer" -> (es => STBuffer(es(0), es(1))),
    "st_simplify" -> (es => STSimplify(es(0), es(1))),
    "st_length" -> (es => STLength(es.head)),
    "st_geometrytype" -> (es => STGeometryType(es.head)),
    "st_isempty" -> (es => STIsEmpty(es.head)),
    "st_collect_array" -> (es => STCollectArray(es.head)),
    "st_union_array" -> (es => STUnionArray(es.head)),
    // native partial-merge aggregate (see GeoAggregates)
    "st_union_agg" -> (es => GeoUnionAgg(es.head)),
  )

  /** Register every ST_ function in the session's FunctionRegistry
    * (idempotent) so both SQL text and the Column API below resolve.
    */
  def registerAll(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    builders.foreach { case (name, b) =>
      // skip when present: re-registration WARNs per call and repeated
      // query invocation would flood the bench stdout tail window
      if (!reg.functionExists(
          org.apache.spark.sql.catalyst.FunctionIdentifier(name)))
        reg.createOrReplaceTempFunction(name, b, "scala_udf")
    }
    graft.plans.SpatialFilterRewrite.install(spark)
  }

  // --- Column API (resolves through the registry via call_function) ---
  def st_point(lon: Column, lat: Column): Column =
    call_function("st_point", lon, lat)
  def st_geomFromText(wkt: Column): Column =
    call_function("st_geomfromtext", wkt)
  def st_geomFromGeoJson(j: Column): Column =
    call_function("st_geomfromgeojson", j)
  def st_asText(g: Column): Column = call_function("st_astext", g)
  def st_asGeoJson(g: Column): Column = call_function("st_asgeojson", g)
  def st_makeValid(g: Column): Column = call_function("st_makevalid", g)
  def st_isValid(g: Column): Column = call_function("st_isvalid", g)
  def st_area(g: Column): Column = call_function("st_area", g)
  def st_area_spherical(g: Column): Column =
    call_function("st_area_spherical", g)
  def st_distance_sphere(a: Column, b: Column): Column =
    call_function("st_distance_sphere", a, b)

  /** Great-circle proximity predicate (ST_DWithin analogue, km). */
  def st_dwithin_km(a: Column, b: Column, km: Double): Column =
    st_distance_sphere(a, b) <= km
  /** Generator: one row per geometry part — use like `explode`. */
  def st_dump(g: Column): Column = call_function("st_dump", g)
  def st_envelope(g: Column): Column = call_function("st_envelope", g)
  def st_convexHull(g: Column): Column = call_function("st_convexhull", g)
  def st_centroid(g: Column): Column = call_function("st_centroid", g)
  def st_x(g: Column): Column = call_function("st_x", g)
  def st_y(g: Column): Column = call_function("st_y", g)
  def st_numGeometries(g: Column): Column =
    call_function("st_numgeometries", g)
  def st_contains(a: Column, b: Column): Column =
    call_function("st_contains", a, b)
  def st_intersects(a: Column, b: Column): Column =
    call_function("st_intersects", a, b)
  def st_within(a: Column, b: Column): Column =
    call_function("st_within", a, b)
  def st_distance(a: Column, b: Column): Column =
    call_function("st_distance", a, b)
  def st_union(a: Column, b: Column): Column =
    call_function("st_union", a, b)
  def st_intersection(a: Column, b: Column): Column =
    call_function("st_intersection", a, b)
  def st_difference(a: Column, b: Column): Column =
    call_function("st_difference", a, b)
  def st_symDifference(a: Column, b: Column): Column =
    call_function("st_symdifference", a, b)
  def st_buffer(g: Column, dist: Column): Column =
    call_function("st_buffer", g, dist)
  def st_simplify(g: Column, tol: Column): Column =
    call_function("st_simplify", g, tol)
  def st_length(g: Column): Column = call_function("st_length", g)
  def st_geometryType(g: Column): Column =
    call_function("st_geometrytype", g)
  def st_isEmpty(g: Column): Column = call_function("st_isempty", g)

  /** Aggregate: collect-without-dissolve per group. */
  def st_collect_agg(g: Column): Column =
    call_function("st_collect_array", collect_list(g))

  /** Aggregate: dissolving union per group — the native
    * TypedImperativeAggregate with map-side cascaded-union compaction
    * ([[GeoUnionAgg]]); `st_union_array(collect_list(g))` remains for
    * the collect-then-finish form.
    */
  def st_union_agg(g: Column): Column =
    call_function("st_union_agg", g)
}

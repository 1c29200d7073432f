package graft

import org.apache.spark.sql.functions._
import graft.functions.GeoFunctions
import graft.functions.GeoFunctions._
import graft.plans.SpatialFilterRewrite

/** The bbox-prefilter optimizer rule: correctness preserved, range
  * conjuncts derived from the polygon envelope reach the parquet scan's
  * pushed filters.
  */
class SpatialRewriteSpec extends SparkSpec {

  test("st_contains filter gains bbox conjuncts pushed into the scan") {
    GeoFunctions.registerAll(spark)
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("pts").toString
    (0 until 1000).map(i => (i.toLong, ((i * 7) % 360) - 180.0 + 0.5,
      ((i * 13) % 180) - 90.0 + 0.5))
      .toDF("id", "lon", "lat")
      .write.mode("overwrite").parquet(dir)
    val pts = spark.read.parquet(dir)
    val tri = st_geomFromText(
      lit("POLYGON ((0 0, 40 0, 20 30, 0 0))"))
    val q = pts.filter(st_contains(tri, st_point(col("lon"), col("lat"))))

    // 1. correctness: equals the unrewritten JTS-only evaluation
    val expected = pts.collect().filter { r =>
      val (lon, lat) = (r.getDouble(1), r.getDouble(2))
      graft.geo.Geo.fromWkt("POLYGON ((0 0, 40 0, 20 30, 0 0))")
        .contains(graft.geo.Geo.point(lon, lat))
    }.map(_.getLong(0)).sorted
    val got = q.select("id").collect().map(_.getLong(0)).sorted
    assert(got.sameElements(expected))
    assert(got.nonEmpty)

    // 2. plan: envelope bounds pushed to the parquet reader
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters"), plan)
    assert(plan.contains("GreaterThanOrEqual(lon,0.0)"),
      s"lon lower bound not pushed:\n$plan")
    assert(plan.contains("LessThanOrEqual(lon,40.0)"),
      s"lon upper bound not pushed:\n$plan")
    assert(plan.contains("GreaterThanOrEqual(lat,0.0)"),
      s"lat lower bound not pushed:\n$plan")
    assert(plan.contains("st_contains_exact"),
      s"exact predicate must remain:\n$plan")
  }

  test("rule is idempotent and skips non-literal polygons") {
    GeoFunctions.registerAll(spark)
    import spark.implicits._
    val df = Seq((1L, "POLYGON ((0 0, 1 0, 1 1, 0 1, 0 0))", 0.5, 0.5))
      .toDF("id", "wkt", "x", "y")
    // polygon is a COLUMN (not foldable) → rule must not fire, query
    // still correct
    val q = df.filter(st_contains(st_geomFromText(col("wkt")),
      st_point(col("x"), col("y"))))
    assert(q.count() === 1)
    val plan = q.queryExecution.optimizedPlan.toString
    assert(!plan.contains("st_contains_exact"),
      s"rule fired on non-literal polygon:\n$plan")
  }
}

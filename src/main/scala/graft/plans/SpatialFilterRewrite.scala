package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.BinaryType
import graft.functions.GeoFunctions.{STContains, STContainsExact, STPoint}
import graft.geo.Geo

/** Optimizer rule (SURVEY §4): `st_contains(<constant polygon>,
  * st_point(x, y))` → bounding-box range prefilter AND the exact test.
  *
  * The range conjuncts are plain comparisons on whatever `x`/`y` are —
  * when they're scan columns, FileSourceStrategy pushes them into the
  * parquet reader (row-group min/max skipping), which is the classic
  * spatial-join accelerator: at 100 TB the bbox eliminates row groups
  * before any geometry is ever decoded, and the (much more expensive)
  * JTS predicate runs only on bbox survivors.
  *
  * The rewrite emits [[STContainsExact]] (evaluation-identical) so the
  * rule is idempotent across optimizer iterations.
  */
object SpatialFilterRewrite extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case STContains(lit @ Literal(wkb: Array[Byte], BinaryType),
          pt @ STPoint(x0, y0)) if x0.deterministic && y0.deterministic =>
        val env = Geo.fromWkb(wkb).getEnvelopeInternal
        // explicit casts: the rule runs post-analysis, so no implicit
        // coercion would fix GreaterThanOrEqual(IntegerType, Double lit)
        val x = if (x0.dataType == org.apache.spark.sql.types.DoubleType)
          x0 else Cast(x0, org.apache.spark.sql.types.DoubleType)
        val y = if (y0.dataType == org.apache.spark.sql.types.DoubleType)
          y0 else Cast(y0, org.apache.spark.sql.types.DoubleType)
        val bbox = And(
          And(GreaterThanOrEqual(x, Literal(env.getMinX)),
            LessThanOrEqual(x, Literal(env.getMaxX))),
          And(GreaterThanOrEqual(y, Literal(env.getMinY)),
            LessThanOrEqual(y, Literal(env.getMaxY))))
        And(bbox, STContainsExact(lit, pt))
    }

  /** Install on a live session (the engine's entry points call this;
    * `extraOptimizations` runs as a final optimizer batch, after
    * constant folding has already collapsed `st_geomfromtext(<lit>)`
    * into the binary literal this rule matches).
    */
  def install(spark: SparkSession): Unit =
    if (!spark.experimental.extraOptimizations.contains(this))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ this
}

/** Builder-time registration (`SparkSession.builder().withExtensions`)
  * for deployments that construct their own sessions.
  */
class GraftExtensions extends (org.apache.spark.sql.SparkSessionExtensions
    => Unit) {
  override def apply(
      e: org.apache.spark.sql.SparkSessionExtensions): Unit =
    e.injectOptimizerRule(_ => SpatialFilterRewrite)
}

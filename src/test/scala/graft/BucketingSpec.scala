package graft

import org.apache.spark.sql.functions._
import graft.operators.Bucketing

/** Bucketed co-located join: same result as the plain join, with no
  * shuffle exchange in the physical plan.
  */
class BucketingSpec extends SparkSpec {

  test("bucketed join runs without Exchange and matches plain join") {
    val li = Tables.lineitem(spark, sf)
      .select("l_orderkey", "l_quantity")
    val o = Tables.orders(spark, sf)
      .select("o_orderkey", "o_totalprice")
      .withColumnRenamed("o_orderkey", "l_orderkey")
    Bucketing.writeBucketed(li, "b_lineitem", "l_orderkey", 8)
    Bucketing.writeBucketed(o, "b_orders", "l_orderkey", 8)

    // force the sort-merge path: at this toy size Spark would broadcast
    // (and rightly so); the bucketed co-location matters when BOTH
    // sides are fact-sized
    val prior = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = Bucketing.bucketedJoin(spark, "b_lineitem", "b_orders",
        "l_orderkey")
      joined.collect() // materialize under AQE for the final plan
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange hashpartitioning"),
        s"bucketed join still shuffles:\n$plan")
      assert(plan.contains("SortMergeJoin"), s"expected SMJ:\n$plan")

      val expected = li.join(o, "l_orderkey").count()
      assert(joined.count() === expected)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prior)
  }
}

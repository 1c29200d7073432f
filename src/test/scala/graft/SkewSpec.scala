package graft

import org.apache.spark.sql.functions._
import graft.operators.Skew
import graft.operators.Skew.AggSpec

/** Salted two-phase aggregation and salted joins: results must equal
  * the unsalted plans on a pathologically skewed key distribution.
  */
class SkewSpec extends SparkSpec {

  private lazy val skewed = {
    import spark.implicits._
    // 90% of rows share key "hot"
    (1 to 10000).map { i =>
      (if (i % 10 == 0) s"cold${i % 97}" else "hot", i.toLong, i * 1.5)
    }.toDF("k", "n", "x").repartition(8)
  }

  test("saltedAggregate equals plain aggregate on skewed keys") {
    val plain = skewed.groupBy("k")
      .agg(sum("x").as("sx"), count("n").as("cn"),
        min("n").as("mn"), max("n").as("mx"))
      .collect().map(r => r.getString(0) ->
        (r.getDouble(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    val salted = Skew.saltedAggregate(skewed, Seq("k"), 16, Seq(
      AggSpec("sum", "x", "sx"), AggSpec("count", "n", "cn"),
      AggSpec("min", "n", "mn"), AggSpec("max", "n", "mx")))
      .collect().map(r => r.getString(0) ->
        (r.getDouble(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(salted.keySet === plain.keySet)
    salted.foreach { case (k, (sx, cn, mn, mx)) =>
      val (psx, pcn, pmn, pmx) = plain(k)
      assert(cn === pcn && mn === pmn && mx === pmx, s"key $k")
      assert(math.abs(sx - psx) < 1e-6 * math.abs(psx), s"key $k sum")
    }
  }

  test("salted phase-1 actually splits the hot key") {
    val phase1Groups = skewed.withColumn("__salt",
      pmod(hash(skewed.columns.map(col): _*), lit(16)))
      .groupBy("k", "__salt").count()
      .filter(col("k") === "hot").count()
    assert(phase1Groups > 8, s"hot key only split into $phase1Groups")
  }

  test("saltedJoin equals plain join") {
    import spark.implicits._
    val dim = (0 to 96).map(i => (s"cold$i", s"payload$i")).toDF("k", "p")
      .union(Seq(("hot", "hotpayload")).toDF("k", "p"))
    val plain = skewed.join(dim, "k").agg(count(lit(1)), sum("n"))
      .head()
    val salted = Skew.saltedJoin(skewed, dim, "k", 16)
      .agg(count(lit(1)), sum("n")).head()
    assert(plain.getLong(0) === salted.getLong(0))
    assert(plain.getLong(1) === salted.getLong(1))
  }

  test("AQE splits a skewed shuffle-join partition at runtime — the " +
      "dynamic remedy next to the static salting, demonstrated on a " +
      "hot-key join with representative thresholds") {
    // `Skew.saltedJoin` is the STATIC remedy (plan-time, works for
    // any join type); this pins the engine's DYNAMIC one: with a hot
    // key holding ~90% of the left side and the size thresholds at
    // laptop-scale equivalents of the defaults, AQE re-plans the
    // sort-merge join mid-query, splitting the oversized partition
    // (SortMergeJoin(skew=true) + an AQEShuffleRead marked skewed)
    // while leaving results identical.
    val conf = spark.conf
    val keys = Seq(
      "spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor")
    val saved = keys.map(k => k -> conf.getOption(k)).toMap
    conf.set(keys(0), "-1")    // shuffle-join regime
    conf.set(keys(1), "64KB")  // scale the 256MB default to test data
    conf.set(keys(2), "32KB")
    conf.set(keys(3), "2")
    try {
      val left = spark.range(300000)
        .select(when(col("id") % 10 < 9, 1L).otherwise(col("id"))
          .as("k"),
          concat(lit("payload-payload-payload-"), col("id"))
            .as("pay"))
      val right = spark.range(1000)
        .select(col("id").as("k"), col("id").as("tag"))
      val df = left.join(right, "k").groupBy("tag")
        .agg(count(lit(1)).as("n"))
      val rows = df.collect()
      // correctness unchanged by the split: hot key 1 joins tag 1,
      // remaining distinct left keys < 1000 join their own tag
      assert(rows.map(_.getAs[Long]("n")).sum ===
        270000L + rows.length - 1)
      val p = df.queryExecution.executedPlan.toString
      assert(p.contains("skew=true"),
        s"AQE did not split the skewed partition:\n$p")
      assert(p.contains("skewed"),
        s"no skewed AQEShuffleRead in the final plan:\n$p")
    } finally saved.foreach { case (k, v) =>
      v.fold(conf.unset(k))(conf.set(k, _))
    }
  }
}

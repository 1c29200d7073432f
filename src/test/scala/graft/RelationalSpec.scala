package graft

import org.apache.spark.sql.functions._
import graft.queries.Relational

/** Semantic invariants for the relational operator surface. The
  * DuckDB-oracle hash compare is the driver's gate; these tests pin the
  * semantics that survive any scale factor.
  */
class RelationalSpec extends SparkSpec {

  test("every query runs and returns rows at sf0.001") {
    Relational.queries.foreach { case (name, fn) =>
      val df = fn(spark, sf)
      assert(df.count() > 0, s"$name returned no rows")
    }
  }

  test("q02 aggregation totals reconcile with raw scan") {
    val total = Tables.lineitem(spark, sf)
      .filter(col("l_shipdate") <= lit("2001-09-01").cast("timestamp"))
      .count()
    val aggd = Relational.q02AggPushdown(spark, sf)
      .agg(sum("count_order")).head().getLong(0)
    assert(total === aggd)
  }

  test("q06 semi + q07 anti partition the customer set w.r.t. same probe") {
    val c = Tables.customer(spark, sf)
    val probe = Tables.orders(spark, sf)
      .filter(col("o_orderdate") < lit("1995-04-01").cast("timestamp"))
      .select("o_custkey")
    val semi = c.join(probe, c("c_custkey") === probe("o_custkey"),
      "left_semi").count()
    val anti = c.join(probe, c("c_custkey") === probe("o_custkey"),
      "left_anti").count()
    assert(semi + anti === c.count())
  }

  test("q08 window top-k returns at most k rows per group, ranked") {
    val df = Relational.q08WindowTopk(spark, sf)
    val bad = df.groupBy("o_custkey").agg(count(lit(1)).as("n"),
      max("rk").as("maxrk"))
      .filter(col("n") > 3 || col("maxrk") > 3)
    assert(bad.isEmpty)
  }

  test("q16 rollup grand-total row equals table count") {
    val all = Relational.q16Rollup(spark, sf)
      .filter(col("returnflag") === "ALL" && col("linestatus") === "ALL")
      .select("n_lines").head().getLong(0)
    assert(all === Tables.lineitem(spark, sf).count())
  }

  test("q19 downcast rule: all lineitem quantities are integral") {
    Relational.q19EveryDowncast(spark, sf).collect()
      .foreach(r => assert(r.getAs[Boolean]("all_integral")))
  }

  test("q22 sessionization: session counts bounded by event counts") {
    Relational.q22Sessionize(spark, sf).collect().foreach { r =>
      assert(r.getAs[Long]("n_sessions") <= r.getAs[Long]("n_events"))
    }
  }

  test("q11 top-k is ordered descending") {
    val prices = Relational.q11TopkOrders(spark, sf)
      .collect().map(_.getAs[Double]("o_totalprice"))
    assert(prices.sameElements(prices.sorted(Ordering[Double].reverse)))
  }

  test("q31 asof semantics: >= match at exact instant, no match before first") {
    val rows = Relational.q31AsofJoin(spark, sf).collect()
    assert(rows.nonEmpty)
    // every matched order must exist and precede-or-equal the event ts
    val ev = Tables.events(spark, sf)
      .select(col("event_id"), unix_micros(col("ts")).as("us")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val ord = Tables.orders(spark, sf)
      .select(col("o_orderkey"),
        unix_micros(col("o_orderdate").cast("timestamp")).as("us"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    rows.foreach { r =>
      val ets = ev(r.getAs[Long]("event_id"))
      val ots = ord(r.getAs[Long]("asof_orderkey"))
      assert(ots <= ets, s"order after event: $ots > $ets")
    }
  }

  test("q33 HLL union estimate within 5% of true weekly distinct") {
    val got = Relational.q33HllSketchUnion(spark, sf).collect()
    assert(got.nonEmpty)
    val truth = Tables.events(spark, sf)
      .withColumn("week", (((dayofyear(col("ts")) - 1) / 7)).cast("int"))
      .groupBy("week").agg(countDistinct("user_id").as("exact"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    got.foreach { r =>
      val est = r.getAs[Long]("approx_users").toDouble
      val exact = truth(r.getAs[Int]("week")).toDouble
      assert(math.abs(est - exact) / exact < 0.05,
        s"week ${r.getInt(0)}: est $est vs exact $exact")
    }
  }

  test("q24 second leg (VERDICT r18 item 3): approx_count_distinct " +
      "sits within its documented error bound of the exact distinct " +
      "on the same frame, at both test SFs") {
    // Spark's default rsd is 0.05; 3σ = 15% relative error. The
    // sketch is deterministic for fixed data, so this either holds
    // or it doesn't — no flake. The golden snapshot stays the
    // byte-level pin; this leg proves the NUMBER is a faithful
    // cardinality estimate, independent of the pinned bytes.
    Seq(sf, "/root/testdata/sf0.01").foreach { d =>
      val rows = Relational.q24ApproxDistinct(spark, d).collect()
      assert(rows.nonEmpty, s"$d: no groups")
      rows.foreach { r =>
        val approx = r.getAs[Long]("approx_parts").toDouble
        val exact = r.getAs[Long]("exact_parts").toDouble
        assert(exact > 0)
        val rel = math.abs(approx - exact) / exact
        assert(rel <= 0.15,
          s"$d ${r.getAs[String]("l_returnflag")}: approx=$approx " +
            s"exact=$exact rel=$rel exceeds 3x rsd(0.05)")
      }
    }
  }

  test("q33 second leg (VERDICT r18 item 3): the engine-private HLL " +
      "union cross-checks against the PORTABLE q38 register pipeline " +
      "on identical inputs — two independent sketch implementations " +
      "agree with the exact weekly distinct and with each other") {
    val m = Relational.Q37Registers
    Seq(sf, "/root/testdata/sf0.01").foreach { d =>
      val q33 = Relational.q33HllSketchUnion(spark, d).collect()
        .map(r => r.getAs[Int]("week") ->
          r.getAs[Long]("approx_users").toDouble).toMap
      val q38 = Relational.q38PortableHllUnion(spark, d).collect()
      assert(q38.nonEmpty && q33.nonEmpty)
      assert(q38.map(_.getAs[Int]("week")).toSet === q33.keySet,
        s"$d: the two pipelines must cover the same weeks")
      q38.foreach { r =>
        val week = r.getAs[Int]("week")
        val exact = r.getAs[Long]("exact_users").toDouble
        val raw = r.getAs[Double]("hll_estimate")
        val portable =
          if (raw <= 2.5 * m && r.getAs[Int]("v_zero") > 0)
            r.getAs[Double]("lc_estimate")
          else raw
        val sketch = q33(week)
        // q33's Datasketches HLL (lgK 12, σ≈1.6%) and q38's m=1024
        // portable registers (σ≈3.3%): each tracks exact within a
        // generous multiple of its own σ, and hence each other
        assert(math.abs(sketch - exact) / exact < 0.05,
          s"$d week $week: spark-HLL $sketch vs exact $exact")
        assert(math.abs(portable - exact) / exact < 0.10,
          s"$d week $week: portable $portable vs exact $exact")
        assert(math.abs(sketch - portable) / exact < 0.12,
          s"$d week $week: spark-HLL $sketch vs portable $portable " +
            "diverge beyond their combined bounds")
      }
    }
  }

  test("q37 portable HLL: the regime-appropriate estimate tracks the " +
      "exact count, registers within bounds") {
    val m = Relational.Q37Registers
    val got = Relational.q37PortableHll(spark, sf).collect()
    assert(got.nonEmpty)
    got.foreach { r =>
      val exact = r.getAs[Long]("exact_parts").toDouble
      val hit = r.getAs[Int]("regs_hit")
      assert(hit > 0 && hit <= m)
      assert(hit + r.getAs[Int]("v_zero") === m)
      // standard HLL regime switch: linear counting when the raw
      // estimate ≤ 2.5m and zero registers remain (the raw estimate is
      // biased high there — that is WHY linear counting exists),
      // otherwise the raw harmonic estimate
      val raw = r.getAs[Double]("hll_estimate")
      val est =
        if (raw <= 2.5 * m && r.getAs[Int]("v_zero") > 0)
          r.getAs[Double]("lc_estimate")
        else raw
      assert(math.abs(est - exact) / exact < 0.05,
        s"regime estimate off: $r")
    }
  }

  test("q38 portable HLL union: merged weekly estimate tracks exact " +
      "weekly distinct") {
    val m = Relational.Q37Registers
    val got = Relational.q38PortableHllUnion(spark, sf).collect()
    assert(got.nonEmpty)
    got.foreach { r =>
      val exact = r.getAs[Long]("exact_users").toDouble
      val raw = r.getAs[Double]("hll_estimate")
      val est =
        if (raw <= 2.5 * m && r.getAs[Int]("v_zero") > 0)
          r.getAs[Double]("lc_estimate")
        else raw
      assert(math.abs(est - exact) / exact < 0.05,
        s"merged estimate off: $r")
    }
  }

  test("q39 histogram quantiles: each estimate is within one bin width " +
      "of the exact percentile; bins cover every row") {
    val binWidth = Relational.Q39RangeCents.toDouble / Relational.Q39Bins
    val exact = Tables.lineitem(spark, sf)
      .groupBy("l_returnflag")
      .agg(expr("percentile(CAST(round(l_extendedprice * 100) AS " +
        "BIGINT), array(0.5, 0.9, 0.99))").as("p"),
        count(lit(1)).as("n"))
      .collect()
      .map(r => r.getString(0) ->
        (r.getSeq[Double](1), r.getLong(2))).toMap
    val got = Relational.q39PortableHistQuantiles(spark, sf).collect()
    assert(got.nonEmpty)
    got.foreach { r =>
      val (ps, n) = exact(r.getAs[String]("l_returnflag"))
      assert(r.getAs[Long]("n_rows") === n,
        "histogram dropped rows — fixed range must cover the domain")
      Seq("p50" -> ps(0), "p90" -> ps(1), "p99" -> ps(2)).foreach {
        case (k, ex) =>
          val lo = r.getAs[Long](s"${k}_lo_cents").toDouble
          assert(ex >= lo - binWidth && ex <= lo + 2 * binWidth,
            s"$k: exact $ex outside the one-bin-slack interval " +
              s"[${lo - binWidth}, ${lo + 2 * binWidth}] around bin " +
              s"[$lo, ${lo + binWidth}] (slack covers the " +
              "interpolating exact percentile landing a neighbor bin)")
      }
    }
  }

  test("q40 histogram merge: two independently-built half-sketches " +
      "merged by bin addition reproduce q39 exactly") {
    val whole = Relational.q39PortableHistQuantiles(spark, sf)
      .collect().map(_.toString).sorted
    val merged = Relational.q40PortableHistMerge(spark, sf)
      .collect().map(_.toString).sorted
    assert(whole.sameElements(merged),
      s"merge ≠ whole:\n${whole.mkString("\n")}\nvs\n" +
        merged.mkString("\n"))
  }

  test("q44 attribution conserves credit: total credit equals the " +
      "number of purchases with at least one prior-24h touch") {
    import org.apache.spark.sql.functions._
    val out = queries.Relational.q44Attribution(spark, sf).collect()
    val totalCredit = out.map(_.getAs[Double]("credit")).sum
    // independent recount of credited conversions (no window math)
    val ev = Tables.events(spark, sf)
    val conv = ev.filter(col("event_type") === "purchase")
      .select(col("event_id").as("conv_id"), col("user_id"),
        col("ts").as("conv_ts"))
    val touch = ev.filter(col("event_type")
        .isin("click", "view", "signup"))
      .select(col("user_id"), col("ts").as("touch_ts"))
    val credited = conv.join(touch, Seq("user_id"))
      .filter(col("touch_ts") < col("conv_ts") &&
        col("touch_ts") >= col("conv_ts") - expr("INTERVAL 24 HOURS"))
      .select("conv_id").distinct().count()
    // each credited conversion distributes exactly 1.0 across its
    // touches; rounding per output row bounds the drift
    assert(math.abs(totalCredit - credited.toDouble) < 0.01,
      s"credit not conserved: $totalCredit vs $credited conversions")
    assert(out.nonEmpty)
  }

  test("q45 rolling actives dominate single-day actives and never " +
      "exceed the user universe") {
    import org.apache.spark.sql.functions._
    val roll = queries.Relational.q45RollingActives(spark, sf).collect()
      .map(r => r.getString(0) -> r.getAs[Long]("active_users")).toMap
    val ev = Tables.events(spark, sf)
    val daily = ev.groupBy(date_format(to_date(col("ts")), "yyyy-MM-dd")
        .as("day"))
      .agg(countDistinct("user_id").as("dau"))
      .collect().map(r => r.getString(0) -> r.getAs[Long]("dau")).toMap
    val universe = ev.select("user_id").distinct().count()
    assert(roll.keySet === daily.keySet,
      "one rolling row per observed event day")
    daily.foreach { case (day, dau) =>
      assert(roll(day) >= dau, s"$day: rolling ${roll(day)} < daily $dau")
      assert(roll(day) <= universe)
    }
  }

  test("st_distance_sphere: Fairbanks to Anchorage ≈ 420 km") {
    graft.functions.GeoFunctions.registerAll(spark)
    val d = spark.sql(
      """SELECT st_distance_sphere(st_point(-147.7164, 64.8378),
        |  st_point(-149.9003, 61.2181)) AS km""".stripMargin)
      .head().getDouble(0)
    assert(d > 400 && d < 440, s"got $d")
    import spark.implicits._
    val near = Seq(("a", -147.7, 64.8), ("b", -149.9, 61.2))
      .toDF("id", "lon", "lat")
      .select(col("id"), graft.functions.GeoFunctions
        .st_point(col("lon"), col("lat")).as("p"))
    val fb = graft.functions.GeoFunctions
      .st_point(lit(-147.7164), lit(64.8378))
    val within = near.filter(graft.functions.GeoFunctions
      .st_dwithin_km(col("p"), fb, 50.0)).collect()
    assert(within.map(_.getString(0)).toSeq === Seq("a"))
  }

  test("sketch estimates (q24 approx-distinct, q33 HLL union) match " +
      "their committed golden snapshots") {
    // sketches are deterministic for fixed data but can't hash-match a
    // DuckDB twin (different sketch impls) — pin the exact outputs as
    // golden artifacts, same pattern as the ANN id snapshots
    assertGoldenRows("sketch", "q24_approx_distinct",
      Relational.q24ApproxDistinct(spark, sf).collect()
        .map(_.toSeq.mkString(",")).toSeq)
    assertGoldenRows("sketch", "q33_hll_sketch_union",
      Relational.q33HllSketchUnion(spark, sf).collect()
        .map(_.toSeq.mkString(",")).toSeq)
  }

  test("q29b approx percentiles track the exact q29 values closely") {
    def byFlag(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => r.getString(0) ->
        (r.getDouble(1), r.getDouble(2), r.getDouble(3))).toMap
    val exact = byFlag(Relational.q29Percentiles(spark, sf))
    val approx = byFlag(Relational.q29bPercentilesApprox(spark, sf))
    assert(exact.keySet === approx.keySet)
    // GK sketch at accuracy 10000: rank error <= n/10000 (< 1 row at
    // this sf) — values should agree within a fraction of a percent
    exact.foreach { case (flag, (m, p90, p25)) =>
      val (am, ap90, ap25) = approx(flag)
      assert(math.abs(am - m) / m < 0.005, s"$flag median: $am vs $m")
      assert(math.abs(ap90 - p90) / p90 < 0.005, s"$flag p90: $ap90 vs $p90")
      assert(math.abs(ap25 - p25) / math.max(p25, 1.0) < 0.05,
        s"$flag p25 qty: $ap25 vs $p25")
    }
  }

  test("broadcast joins actually broadcast (q04 plan)") {
    val plan = Relational.q04BroadcastJoin(spark, sf)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      s"expected BroadcastHashJoin in plan:\n$plan")
  }

  test("q54 shards are exhaustive, disjoint, and reproducible: " +
      "counts add up to the corpus and a re-run serves the identical " +
      "manifest from the memoized artifact") {
    val m1 = Relational.q54ShardShuffle(spark, sf).collect()
    assert(m1.map(_.getInt(0)).toSeq === (0 until Relational.Q54Shards),
      "every shard must be present exactly once")
    val nDocs = Tables.documents(spark, sf).count()
    assert(m1.map(_.getLong(1)).sum === nDocs,
      "shard counts must partition the corpus")
    // reproducibility: the second run hits the StageCache artifact
    // (same seed + same inputs → same key) and must yield the same
    // manifest byte-for-byte
    val m2 = Relational.q54ShardShuffle(spark, sf).collect()
    assert(m1.map(_.toSeq).toSeq === m2.map(_.toSeq).toSeq)
  }
}

package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.TimestampType

/** Pins the events time-domain contract (round-9 incident: the testdata
  * regenerated from TIMESTAMP(NANOS) to TIMESTAMP(MICROS) and the
  * unconditional nanos div-1000 shim silently relocated every event to
  * 1970 — schema still matched, only the oracle caught it). These specs
  * make that failure mode loud: whatever the physical encoding,
  * `Tables.events` and the streamed frame must land in the synthetic
  * corpus's real epoch.
  */
class TablesSpec extends SparkSpec {

  /** Schema-contract tripwire for every driver table: each important
    * column must stay in its TYPE CLASS (integral / fractional /
    * string / temporal / numeric-array). Exact physical types may
    * drift benignly across testdata regenerations (int32→int64,
    * float→double, NTZ→LTZ — the engine adapts); a CLASS flip (the
    * round-9 incident: `ts` arriving integral) is what silently breaks
    * query surfaces, and this test turns that into one precise failure
    * instead of nine cryptic ones.
    */
  test("every table's columns keep their contracted type class") {
    import org.apache.spark.sql.types._
    def cls(t: DataType): String = t match {
      case _: ByteType | _: ShortType | _: IntegerType | _: LongType =>
        "integral"
      case _: FloatType | _: DoubleType | _: DecimalType => "fractional"
      case _: StringType => "string"
      case _: TimestampType | _: TimestampNTZType | _: DateType =>
        "temporal"
      case ArrayType(e, _)
          if cls(e) == "integral" || cls(e) == "fractional" =>
        "numeric-array"
      case other => other.simpleString
    }
    val contract: Map[String, Map[String, String]] = Map(
      "customer" -> Map("c_custkey" -> "integral",
        "c_nationkey" -> "integral", "c_acctbal" -> "fractional",
        "c_name" -> "string", "c_mktsegment" -> "string"),
      "documents" -> Map("doc_id" -> "integral", "text" -> "string",
        "lang" -> "string", "source" -> "string",
        "n_chars" -> "integral"),
      "embeddings" -> Map("vec_id" -> "integral",
        "embedding" -> "numeric-array", "label" -> "integral"),
      "lineitem" -> Map("l_orderkey" -> "integral",
        "l_partkey" -> "integral", "l_suppkey" -> "integral",
        "l_linenumber" -> "integral", "l_quantity" -> "fractional",
        "l_extendedprice" -> "fractional", "l_discount" -> "fractional",
        "l_tax" -> "fractional", "l_returnflag" -> "string",
        "l_linestatus" -> "string", "l_shipdate" -> "temporal"),
      "nation" -> Map("n_nationkey" -> "integral", "n_name" -> "string",
        "n_regionkey" -> "integral"),
      "orders" -> Map("o_orderkey" -> "integral",
        "o_custkey" -> "integral", "o_orderstatus" -> "string",
        "o_totalprice" -> "fractional", "o_orderdate" -> "temporal",
        "o_orderpriority" -> "string"),
      "part" -> Map("p_partkey" -> "integral", "p_name" -> "string",
        "p_brand" -> "string", "p_type" -> "string",
        "p_size" -> "integral", "p_retailprice" -> "fractional"),
      "region" -> Map("r_regionkey" -> "integral",
        "r_name" -> "string"),
      "supplier" -> Map("s_suppkey" -> "integral",
        "s_name" -> "string", "s_nationkey" -> "integral",
        "s_acctbal" -> "fractional"),
      // events goes through the adaptive ingest: whatever the physical
      // encoding, the contracted post-load classes must hold
      "events" -> Map("event_id" -> "integral", "ts" -> "temporal",
        "user_id" -> "integral", "event_type" -> "string",
        "value" -> "fractional", "props" -> "string"))
    val drifts = contract.toSeq.sortBy(_._1).flatMap {
      case (table, cols) =>
        val df =
          if (table == "events") Tables.events(spark, sf)
          else Tables(spark, sf, table)
        val loaded = df.schema.map(f => f.name -> cls(f.dataType)).toMap
        cols.flatMap { case (name, want) =>
          loaded.get(name) match {
            case None => Some(s"$table.$name: MISSING (schema drift)")
            case Some(got) if got != want =>
              Some(s"$table.$name: $got, contract says $want")
            case _ => None
          }
        }
    }
    assert(drifts.isEmpty,
      s"testdata schema drift detected:\n  ${drifts.mkString("\n  ")}")
  }

  test("batch events: ts is TimestampType and lands in the 2024 domain") {
    val ev = Tables.events(spark, sf)
    assert(ev.schema("ts").dataType === TimestampType)
    val r = ev.agg(
      min(col("ts")).cast("string").as("lo"),
      max(col("ts")).cast("string").as("hi")).head()
    val (lo, hi) = (r.getString(0), r.getString(1))
    assert(lo >= "2024-01-01" && lo < "2026-01-01",
      s"min(ts)=$lo — epoch drift: the nanos shim is misapplied")
    assert(hi >= lo && hi < "2026-01-01", s"max(ts)=$hi out of domain")
  }

  test("streamed events: ts matches the batch frame's time domain") {
    val batch = Tables.events(spark, sf)
      .agg(min(col("ts")).cast("string"), max(col("ts")).cast("string"))
      .head()
    val qn = "tables_spec_ts_domain"
    val q = streaming.EventStreams.readEvents(spark, sf)
      .groupBy()
      .agg(min(col("ts")).cast("string").as("lo"),
        max(col("ts")).cast("string").as("hi"))
      .writeStream
      .outputMode(org.apache.spark.sql.streaming.OutputMode.Complete())
      .format("memory").queryName(qn).start()
    try q.processAllAvailable() finally q.stop()
    val s = spark.table(qn).head()
    assert(s.getString(0) === batch.getString(0),
      "streamed min(ts) diverges from batch — stream schema shim drift")
    assert(s.getString(1) === batch.getString(1),
      "streamed max(ts) diverges from batch — stream schema shim drift")
    assert(s.getString(0) >= "2024-01-01",
      s"streamed min(ts)=${s.getString(0)} — epoch drift in stream schema")
  }
}

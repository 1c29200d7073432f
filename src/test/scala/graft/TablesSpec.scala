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

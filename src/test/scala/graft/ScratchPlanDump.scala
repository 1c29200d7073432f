package graft

class ScratchPlanDump extends SparkSpec {
  test("dump q39 formatted plan") {
    val p = SparkEntry.queries("q39_portable_hist_quantiles")(spark, sf)
      .queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    java.nio.file.Files.write(
      java.nio.file.Paths.get("/tmp/q39plan.txt"), p.getBytes)
  }
}

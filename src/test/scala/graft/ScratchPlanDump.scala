package graft

class ScratchPlanDump extends SparkSpec {
  test("dump t24 plan") {
    val p = SparkEntry.queries("t24_span_dedup")(spark, sf)
      .queryExecution.executedPlan.toString
    java.nio.file.Files.write(
      java.nio.file.Paths.get("/tmp/t24plan.txt"), p.getBytes)
  }
}

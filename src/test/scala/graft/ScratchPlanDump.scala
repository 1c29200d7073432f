package graft

class ScratchPlanDump extends SparkSpec {
  test("dump t35 executed plan") {
    val p = SparkEntry.queries("t35_mixture_budget")(spark, sf)
      .queryExecution.executedPlan.toString
    java.nio.file.Files.write(
      java.nio.file.Paths.get("/tmp/t35plan.txt"), p.getBytes)
  }
}

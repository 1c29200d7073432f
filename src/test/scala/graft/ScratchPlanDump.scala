package graft

class ScratchPlanDump extends SparkSpec {
  test("dump q42 executed plan") {
    val p = SparkEntry.queries("q42_retention_cohorts")(spark, sf)
      .queryExecution.executedPlan.toString
    java.nio.file.Files.write(
      java.nio.file.Paths.get("/tmp/q42plan.txt"), p.getBytes)
  }
}

package graft

class ScratchPlanDump extends SparkSpec {
  test("dump t33/t34 executed plans") {
    Seq("t33_snapshot_diff", "t34_quantile_curate").foreach { q =>
      val p = SparkEntry.queries(q)(spark, sf)
        .queryExecution.executedPlan.toString
      java.nio.file.Files.write(
        java.nio.file.Paths.get(s"/tmp/${q.take(3)}plan.txt"), p.getBytes)
    }
  }
}

package graft

import org.apache.spark.sql.SparkSession

/** Dump `.explain("formatted")` for named SparkEntry queries to
  * files (the optimization-round plan receipts under plans/r<N>/).
  * Measurement tooling only — not part of the driver contract.
  *
  * Usage: runMain graft.PlanDump <outDir> <suffix> <q1> [q2 ...]
  * Writes <outDir>/<query>_<suffix>.txt per query. Streaming replays
  * are skipped (their declared frame is a memory-sink readout whose
  * plan says nothing about the replay; their receipts are the
  * StreamProbe traces).
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val outDir = args(0)
    val suffix = args(1)
    val names = args.drop(2)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR",
      "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    val fns = SparkEntry.queries ++ SparkEntry.benchOnly
    names.foreach { n =>
      val df = fns(n)(spark, sfDir)
      val plan = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      java.nio.file.Files.writeString(
        java.nio.file.Paths.get(s"$outDir/${n}_$suffix.txt"), plan)
      println(s"[plandump] wrote $outDir/${n}_$suffix.txt")
    }
    spark.stop()
  }
}

package graft.pipeline

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Targets-style cross-run memoization (SURVEY §4: the reference's
  * signature execution feature — content-hash skip in `_targets/meta`).
  *
  * A stage is keyed by (name, codeVersion, input fingerprint). The
  * fingerprint hashes input file paths + size + mtime — the same cheap
  * proxy `targets` uses before falling back to content hashes. On hit,
  * the stage's Parquet checkpoint is read back; on miss, `compute` runs
  * and is checkpointed. Checkpoints double as shuffle-barrier lineage
  * cuts for long pipelines (at 100 TB a checkpoint is also what makes
  * retry-from-midpoint possible).
  */
class StageCache(spark: SparkSession, dir: String) {

  @volatile var computeCount: Int = 0 // observable for tests

  /** Canonical SHA-256 of a config's key parts — callers pass an
    * explicit, ordered serialization (NOT case-class toString, whose
    * formatting and Map iteration order are unstable across versions
    * and could alias distinct configs via 32-bit hashCode collisions).
    */
  def versionHash(parts: Seq[String]): String = {
    val h = java.security.MessageDigest.getInstance("SHA-256")
    parts.foreach { p => h.update(p.getBytes("UTF-8")); h.update(0.toByte) }
    h.digest().take(8).map("%02x".format(_)).mkString
  }

  private def fingerprint(inputs: Seq[String]): String = {
    val h = java.security.MessageDigest.getInstance("SHA-256")
    inputs.sorted.foreach { p =>
      h.update(p.getBytes("UTF-8"))
      val path = Paths.get(p)
      if (Files.exists(path)) {
        h.update(Files.size(path).toString.getBytes)
        h.update(Files.getLastModifiedTime(path).toMillis.toString.getBytes)
      }
    }
    h.digest().take(8).map("%02x".format(_)).mkString
  }

  def stage(name: String, codeVersion: String, inputs: Seq[String])(
      compute: => DataFrame): DataFrame = {
    val key = s"$name-$codeVersion-${fingerprint(inputs)}"
    val path = s"$dir/$key"
    if (Files.exists(Paths.get(path, "_SUCCESS"))) {
      spark.read.parquet(path)
    } else {
      computeCount += 1
      val df = compute
      df.write.mode("overwrite").parquet(path)
      spark.read.parquet(path)
    }
  }
}

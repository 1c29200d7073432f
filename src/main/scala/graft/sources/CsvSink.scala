package graft.sources

import java.nio.file.{Files, Path, StandardCopyOption}
import org.apache.spark.sql.DataFrame

/** Date-stamped single-file CSV sink (reference S9, write_csv with a
  * `{prefix}_{Sys.Date()}.csv` name, R/functions.R:68-70). Spark's CSV
  * writer emits a directory of parts; this collapses the coalesced
  * single part into one named file — the reference's file contract.
  * Driver-scale outputs only (the certificate list is ≤200 rows); large
  * outputs should keep the native partitioned writer.
  */
object CsvSink {

  def writeDateStamped(df: DataFrame, dir: Path, prefix: String,
      date: java.time.LocalDate = java.time.LocalDate.now()): Path = {
    Files.createDirectories(dir)
    val stage = Files.createTempDirectory(dir, s".$prefix-stage")
    df.coalesce(1).write.mode("overwrite").option("header", "true")
      .csv(stage.toString)
    val part = {
      val s = Files.list(stage)
      try s.filter(p => p.getFileName.toString.startsWith("part-") &&
          p.getFileName.toString.endsWith(".csv"))
        .findFirst().orElseThrow(() =>
          new IllegalStateException(s"no csv part written under $stage"))
      finally s.close()
    }
    val out = dir.resolve(s"${prefix}_$date.csv")
    Files.move(part, out, StandardCopyOption.REPLACE_EXISTING)
    // clean the staging dir (part file already moved out)
    val rest = Files.walk(stage)
    try rest.sorted(java.util.Comparator.reverseOrder())
      .forEach(p => Files.deleteIfExists(p))
    finally rest.close()
    out
  }
}

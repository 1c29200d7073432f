package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Shared local SparkSession for all suites (one JVM-wide session — sbt
  * forks a single test JVM, so getOrCreate dedups across suites).
  */
trait SparkSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSpec.session
  val sf: String = "/root/testdata/sf0.001"

  /** Snapshot-pin deterministic-but-unoracleable outputs (ANN ids,
    * sketch estimates) as committed golden files: a missing file is
    * written on first run (commit it); afterwards rows are asserted
    * verbatim. Regenerate deliberately with -Dgraft.regenGolden=true
    * after an intentional algorithm change.
    */
  def assertGoldenRows(subdir: String, name: String,
      got: Seq[String]): Unit = {
    val dir = java.nio.file.Paths.get(s"src/test/resources/golden/$subdir")
    val path = dir.resolve(s"$name.csv")
    if (sys.props.get("graft.regenGolden").contains("true") ||
        !java.nio.file.Files.exists(path)) {
      java.nio.file.Files.createDirectories(dir)
      java.nio.file.Files.write(path,
        got.mkString("", "\n", "\n").getBytes("UTF-8"))
      info(s"golden $subdir/$name written (${got.size} rows) — commit it")
    } else {
      val want = new String(
        java.nio.file.Files.readAllBytes(path), "UTF-8")
        .split("\n").filter(_.nonEmpty).toSeq
      assert(got === want,
        s"$name rows diverge from the pinned golden file")
    }
  }
}

object SparkSpec {
  lazy val session: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("graft-test")
      .config("spark.sql.shuffle.partitions", "4")
      // full PushedFilters/ReadSchema strings for plan assertions
      .config("spark.sql.maxMetadataStringLength", "10000")
      .config("spark.sql.warehouse.dir",
        java.nio.file.Files.createTempDirectory("graft-wh").toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    s
  }
}

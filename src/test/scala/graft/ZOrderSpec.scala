package graft

import org.apache.spark.sql.functions._
import graft.operators.ZOrder

/** Z-order clustering: curve locality and the measurable layout
  * benefit — per-file bounding boxes shrink by orders of magnitude vs
  * an unclustered write, which is exactly what lets parquet min/max
  * stats skip files under a bbox predicate.
  */
class ZOrderSpec extends SparkSpec {

  test("interleave round-trips bit patterns and preserves ordering locality") {
    assert(ZOrder.interleave(0, 0) === 0L)
    assert(ZOrder.interleave(1, 0) === 1L)
    assert(ZOrder.interleave(0, 1) === 2L)
    assert(ZOrder.interleave(3, 3) === 15L)
    // quadrant property: all points in the SW quadrant sort before any
    // point in the NE quadrant
    val sw = ZOrder.zValue(-90, -45) // qx,qy in lower half
    val ne = ZOrder.zValue(90, 45)
    assert(sw < ne)
  }

  test("z-ordered layout: per-file bboxes far tighter than round-robin") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val pts = (1 to 20000).map { i =>
      (i.toLong, rnd.nextDouble() * 360 - 180, rnd.nextDouble() * 180 - 90)
    }.toDF("id", "lon", "lat")

    def totalBboxArea(path: String): Double =
      spark.read.parquet(path)
        .withColumn("f", input_file_name())
        .groupBy("f")
        .agg((max("lon") - min("lon")).as("w"),
          (max("lat") - min("lat")).as("h"))
        .select(sum(col("w") * col("h"))).head().getDouble(0)

    val zPath = java.nio.file.Files.createTempDirectory("zord").toString
    val rPath = java.nio.file.Files.createTempDirectory("rr").toString
    ZOrder.writeZOrdered(pts, "lon", "lat", zPath, 16)
    pts.repartition(16).write.mode("overwrite").parquet(rPath)

    val zArea = totalBboxArea(zPath)
    val rArea = totalBboxArea(rPath)
    // round-robin files each span ~the whole world (16 * 64800 deg²);
    // z-ordered files tile it (~1 * 64800 total, modulo curve jumps)
    assert(zArea < rArea / 4,
      s"z-order bbox area $zArea not much tighter than random $rArea")

    // row count preserved
    assert(spark.read.parquet(zPath).count() === 20000)
  }
}

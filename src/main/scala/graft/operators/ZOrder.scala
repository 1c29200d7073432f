package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton) clustering for spatial data-skipping: interleave
  * the bits of quantized lon/lat so that sorting by the z-value places
  * spatially-near rows in the same files/row-groups. Parquet min/max
  * stats per file then make bbox predicates skip most of the layout —
  * the lakehouse-standard trick for 100 TB point tables (Delta/Iceberg
  * OPTIMIZE ZORDER does exactly this).
  */
object ZOrder {

  val Bits = 16 // per dimension → 32-bit z-values

  /** Interleave bits of two [0, 2^Bits) ints: x gets even positions. */
  def interleave(x: Int, y: Int): Long = {
    var z = 0L
    var i = 0
    while (i < Bits) {
      z |= ((x >> i) & 1L) << (2 * i)
      z |= ((y >> i) & 1L) << (2 * i + 1)
      i += 1
    }
    z
  }

  def zValue(lon: Double, lat: Double): Long = {
    val scale = (1 << Bits) - 1
    val qx = math.min(scale,
      math.max(0, ((lon + 180.0) / 360.0 * scale).toInt))
    val qy = math.min(scale,
      math.max(0, ((lat + 90.0) / 180.0 * scale).toInt))
    interleave(qx, qy)
  }

  private val zUdf = udf { (lon: Double, lat: Double) => zValue(lon, lat) }

  def zorder(lon: Column, lat: Column): Column = zUdf(lon, lat)

  /** Write a point table clustered by z-value: range partitioning on
    * the z-curve + in-partition sort gives each output file a tight
    * spatial bounding box.
    */
  def writeZOrdered(df: DataFrame, lonCol: String, latCol: String,
      path: String, numFiles: Int): Unit =
    df.withColumn("__z", zorder(col(lonCol), col(latCol)))
      .repartitionByRange(numFiles, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")
      .write.mode("overwrite").parquet(path)
}

package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic sampling for reproducible pipeline runs.
  *
  * `df.sample()` / `sampleBy()` draw from rand(seed) streams that are
  * assigned per-partition — the selected ROWS change whenever the
  * partition layout does (different cluster size, AQE decision, file
  * split), which silently breaks train/eval reproducibility. Hashing
  * a stable key instead gives the same sample on any layout, any
  * cluster, any engine.
  */
object Sampling {

  private val Buckets = 1000000

  /** Keep ~fraction of rows, decided by a stable hash of `key`. */
  def hashSample(df: DataFrame, key: Column, fraction: Double): DataFrame =
    df.filter(pmod(hash(key), lit(Buckets)) <
      (fraction * Buckets).toLong)

  /** Stratified deterministic sampling: per-stratum fractions keyed on
    * a stable id. Strata absent from the map keep defaultFraction.
    */
  def stratifiedHashSample(df: DataFrame, stratum: Column, key: Column,
      fractions: Map[String, Double],
      defaultFraction: Double): DataFrame = {
    val fracCol = fractions.foldLeft(lit(defaultFraction)) {
      case (acc, (value, frac)) =>
        when(stratum === value, lit(frac)).otherwise(acc)
    }
    df.filter(pmod(hash(key), lit(Buckets)) <
      (fracCol * Buckets).cast("long"))
  }

  /** Deterministic train/validation/test split on a stable key:
    * returns the bucket id 0/1/2 per row; same row always lands in the
    * same split regardless of layout.
    */
  def splitColumn(key: Column, trainFrac: Double,
      valFrac: Double): Column = {
    val h = pmod(hash(key), lit(Buckets))
    when(h < (trainFrac * Buckets).toLong, 0)
      .when(h < ((trainFrac + valFrac) * Buckets).toLong, 1)
      .otherwise(2)
  }

  /** SQL-portable stable bucket in [0, 1e6): md5-derived 48-bit hash of
    * the key's string form — the same rows select in ANY engine with
    * md5 (DuckDB twin: `CAST('0x' || substr(md5(CAST(k AS VARCHAR)),
    * 1, 12) AS BIGINT) % 1000000`), where Spark's `hash()` (Murmur3,
    * engine-private seed) cannot cross engines. Used by the oracled
    * split query (t20); [[hashSample]]/[[splitColumn]] stay the cheap
    * codegen'd in-engine path.
    */
  def portableBucket(key: Column): Column =
    pmod(
      conv(substring(md5(key.cast("string").cast("binary")), 1, 12),
        16, 10).cast("long"),
      lit(Buckets))
}

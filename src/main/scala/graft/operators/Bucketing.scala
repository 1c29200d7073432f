package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed-table helpers (builder prompt: "bucketing for co-located
  * joins"; SURVEY §4 join-strategy row). Writing both join sides
  * bucketed+sorted on the join key lets SortMergeJoin run with ZERO
  * exchange — at 100 TB that removes the dominant cost of a recurring
  * fact-fact join, paid once at write time.
  */
object Bucketing {

  /** Persist a DataFrame as a bucketed, sorted parquet table in the
    * session catalog.
    */
  def writeBucketed(df: DataFrame, table: String, key: String,
      buckets: Int): Unit =
    df.write.mode("overwrite").format("parquet")
      .bucketBy(buckets, key).sortBy(key)
      .saveAsTable(table)

  /** Join two same-bucketed tables on their bucket key — shuffle-free
    * when bucket counts match.
    */
  def bucketedJoin(spark: SparkSession, leftTable: String,
      rightTable: String, key: String): DataFrame =
    spark.table(leftTable).join(spark.table(rightTable), key)

  /** Re-register an EXISTING bucketed table after a JVM restart: the
    * in-memory catalog forgets metadata but the warehouse files (with
    * bucket-id file naming) persist, so a CREATE TABLE ... CLUSTERED BY
    * over the old location restores the zero-shuffle join property
    * without rewriting the data — the cross-run half of "pay the
    * bucketing cost once".
    */
  def registerBucketed(spark: SparkSession, table: String,
      schemaDdl: String, key: String, buckets: Int, path: String): Unit =
    spark.sql(
      s"""CREATE TABLE $table ($schemaDdl)
         |USING parquet
         |CLUSTERED BY ($key) SORTED BY ($key) INTO $buckets BUCKETS
         |LOCATION '$path'""".stripMargin)
}

package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode
import org.apache.spark.sql.types._

/** Structured Streaming over the `embeddings` table: ANN index
  * MAINTENANCE (the vector twin of s05's streaming band-index ingest —
  * SURVEY §2.9's "re-run the pipeline on new events" generalized to
  * the similarity-search family).
  */
object VectorStreams {

  private val embSchema = StructType(Seq(
    StructField("vec_id", LongType),
    StructField("embedding", ArrayType(FloatType)),
    StructField("label", IntegerType)))

  /** s12 — streaming IVF+PQ index ingest: embedding batches arrive as
    * files; each batch encodes MAP-SIDE against the FIXED stored model
    * (broadcast; trained once by ensureIvfPqIndex — bench warms it
    * outside the timed loop, as for v09) and appends its narrow
    * (vec_id, cell, codes) rows to the index sink. Model-fixed encode
    * is the production serve shape: quantizers retrain offline, index
    * growth is append-only, so ingest is an embarrassingly parallel
    * stateless map — no watermark, no state store, unbounded corpus.
    *
    * Every row's codes depend only on its own vector and the fixed
    * model, so the union over batches ≡ the batch encode of the whole
    * corpus — which is exactly what the oracle (the v08/v14 integer
    * CTE chain through `enc`) recomputes from scratch in DuckDB.
    */
  def replayIndexIngest(spark: SparkSession, dir: String,
      nBatches: Int = 4): DataFrame = {
    val work = java.nio.file.Files.createTempDirectory("graft-s12")
      .toFile.getAbsolutePath
    // one try around staging AND streaming: a failure in the staging
    // write/move loop must still delete the work dir, not leak it
    // (the memory sink holds the result driver-side, so the work dir
    // is safe to delete before the caller materializes the frame)
    try {
      replayIndexIngestStaged(spark, dir, nBatches, work)
    } finally deleteRecursively(new java.io.File(work))
  }

  private def replayIndexIngestStaged(spark: SparkSession, dir: String,
      nBatches: Int, work: String): DataFrame = {
    val (model, _) = graft.queries.VectorOps.ensureIvfPqIndex(spark, dir)
    val srcDir = s"$work/incoming"
    new java.io.File(srcDir).mkdirs()
    // stage the corpus as nBatches single-file spans, ascending mtimes
    val all = spark.read.schema(embSchema).parquet(s"$dir/embeddings.parquet")
    val t0 = System.currentTimeMillis() - 3600L * 1000
    (0 until nBatches).foreach { i =>
      val stage = s"$work/stage$i"
      all.filter(pmod(col("vec_id"), lit(nBatches)) === i)
        .coalesce(1).write.parquet(stage)
      new java.io.File(stage).listFiles()
        .filter(_.getName.endsWith(".parquet")).headOption
        .foreach { f =>
          val dst = new java.io.File(srcDir, f"b$i%02d.parquet")
          java.nio.file.Files.move(f.toPath, dst.toPath)
          dst.setLastModified(t0 + i * 60000L)
          ()
        }
    }
    val stream = spark.readStream.schema(embSchema)
      .option("maxFilesPerTrigger", 1)
      .parquet(s"$srcDir/b*.parquet")
      .select(col("vec_id"),
        transform(col("embedding"), x => x.cast("double")).as("v"))
    val codesStrUdf = udf { (codes: Array[Byte]) =>
      codes.map(_ & 0xff).mkString(" ")
    }
    val coded = graft.queries.VectorOps.encodeIvfPq(stream, model)
      .select(col("vec_id"), col("cell"),
        codesStrUdf(col("codes")).as("codes_str"))
    val qn = s"stream_index_ingest_${math.abs(dir.hashCode)}"
    val q = coded.writeStream.outputMode(OutputMode.Append())
      .format("memory").queryName(qn).start()
    try q.processAllAvailable()
    finally q.stop()
    spark.table(qn).orderBy("vec_id")
  }

  private def deleteRecursively(f: java.io.File): Unit = {
    Option(f.listFiles()).getOrElse(Array.empty)
      .foreach(deleteRecursively)
    f.delete(); ()
  }
}

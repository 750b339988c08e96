package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, StreamingQuery, Trigger}
import org.apache.spark.sql.types.StructType
import graft.ops.{Sampling, TextAnalysis}

/** Streaming corpus curation: the batch training-data operators
  * composed over a document stream. Every stage is STATELESS
  * (deterministic hash-sample filter, fused token/quality kernel,
  * language-ID kernel), so the pipeline needs no watermark, holds no
  * state, and produces byte-identical results to its batch form — the
  * property the spec asserts. This is the shape of a continuous
  * ingestion pipeline: documents land as parquet, and the curated,
  * annotated subset streams out.
  */
object CurationStreams {

  /** The shared (batch ≡ streaming) curation transform: deterministic
    * sample at `fraction`, quality gate at `minTokens`, annotation
    * with token stats + language.
    */
  def curate(docs: DataFrame, fraction: Double, minTokens: Long): DataFrame =
    Sampling.deterministicSample(docs, "doc_id", fraction)
      .withColumn("_ts", TextAnalysis.tokenStats(col("text")))
      .where(col("_ts.n_tokens") >= minTokens)
      .select(col("doc_id"),
        col("_ts.n_tokens").as("n_tokens"),
        col("_ts.q_distinct_ratio").as("q_distinct_ratio"),
        TextAnalysis.langId(col("text")).as("lang_pred"))

  /** Start the streaming variant from a parquet directory source into
    * a named memory sink.
    */
  def startCurationStream(
      spark: SparkSession, sourceDir: String, queryName: String,
      schema: StructType, fraction: Double = 0.5,
      minTokens: Long = 5): StreamingQuery = {
    val src = spark.readStream.schema(schema).parquet(sourceDir)
    curate(src, fraction, minTokens).writeStream
      .outputMode(OutputMode.Append())
      .format("memory")
      .queryName(queryName)
      .trigger(Trigger.AvailableNow())
      .start()
  }
}

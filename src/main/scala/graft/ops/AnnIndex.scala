package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Cold-start persistence for the ANN serving paths: one parquet
  * directory holding every artifact a fresh session needs to serve
  * top-k WITHOUT retraining or re-encoding —
  *
  *   `<path>/ivf_centroids`  (cent_id, centroid)      — [[Similarity.trainIvfCentroids]]
  *   `<path>/pq_codebooks`   (sub, cent_id, centroid) — [[Similarity.trainPqCodebooks]]
  *   `<path>/pq_codes`       (idCol, codes)           — [[Similarity.pqEncode]]
  *   `<path>/lsh_buckets`    (idCol, bucket)          — [[Similarity.lshBucket]]
  *
  * This generalizes the compiled-in [[PqFixture]] (which proved the
  * train-once/serve-many shape) into a load-from-path API: `build`
  * runs once per index build on the training cluster; serving
  * sessions call the `read*` accessors and the `*From*`/`*Encoded`
  * serving variants. Reloaded indexes serve BIT-IDENTICAL top-k to
  * the in-session artifacts (spec-proven in OpsSpec): doubles and
  * longs round-trip parquet exactly, and every serving path is
  * deterministic given its tables.
  *
  * Scale: the centroid/codebook tables are configuration-sized (k ×
  * dims); pq_codes is m bytes-per-vector scale and lsh_buckets one
  * short string per vector — both orders of magnitude smaller than
  * the float corpus they summarize, and both written as ordinary
  * parquet so a 1000-executor session reads them partitioned.
  */
object AnnIndex {

  /** Train and persist every serving artifact for `corpus`. Returns
    * nothing — the index directory IS the output. Empty corpora
    * write schema-carrying empty tables
    * ([[TableWrite.withSchemaAnchor]], shared with
    * [[Dedup.writeMinhashIndex]]), so a reload never fails schema
    * inference.
    */
  def build(corpus: DataFrame, idCol: String, vecCol: String, path: String,
            dims: Int = 64, ivfK: Int = 256, pqM: Int = 4, pqK: Int = 4,
            planes: Int = 8, iters: Int = 2): Unit = {
    val cent = Similarity.trainIvfCentroids(corpus, idCol, vecCol, ivfK, iters)
    writeTable(cent, s"$path/ivf_centroids")
    val cb = Similarity.trainPqCodebooks(corpus, idCol, vecCol, dims, pqM, pqK, iters)
    writeTable(cb, s"$path/pq_codebooks")
    writeTable(Similarity.pqEncode(
      corpus.select(col(idCol), col(vecCol)), idCol, vecCol, cb), s"$path/pq_codes")
    writeTable(corpus.select(col(idCol),
      Similarity.lshBucket(col(vecCol), planes).as("bucket")), s"$path/lsh_buckets")
  }

  def readIvfCentroids(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(s"$path/ivf_centroids")

  def readPqCodebooks(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(s"$path/pq_codebooks")

  def readPqCodes(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(s"$path/pq_codes")

  def readLshBuckets(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(s"$path/lsh_buckets")

  private def writeTable(df: DataFrame, path: String): Unit =
    TableWrite.withSchemaAnchor(df, path)
}

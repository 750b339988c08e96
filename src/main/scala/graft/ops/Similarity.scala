package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Similarity search over embedding columns (Array[Float]).
  *
  * Two paths, mirroring what a 100 TB vector corpus needs:
  *  - brute-force cosine top-k: the exact baseline — a broadcast of
  *    the (small) query set against a full scan of the corpus; scales
  *    linearly and partitions perfectly.
  *  - LSH-bucketed ANN: random-hyperplane signatures (hyperplane
  *    weights ±1 derived from md5, so both engines and any re-run
  *    derive the identical planes) shrink the candidate set to one
  *    bucket; the refine step is exact cosine within the bucket.
  */
object Similarity {

  /** Cosine similarity between two float-array columns, computed in
    * double precision with left-to-right `aggregate` folds —
    * deterministic summation order on every engine.
    */
  def cosine(a: Column, b: Column): Column = {
    def dot(x: Column, y: Column) =
      aggregate(zip_with(x, y, (p, q) => p.cast("double") * q.cast("double")),
        lit(0.0), (acc, v) => acc + v)
    def norm(x: Column) =
      sqrt(aggregate(x, lit(0.0), (acc, v) => acc + v.cast("double") * v.cast("double")))
    dot(a, b) / (norm(a) * norm(b))
  }

  /** Exact top-k neighbors for each query vector (brute force).
    * `queries` is broadcast — it is the small side by construction.
    */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame,
                     idCol: String, vecCol: String, k: Int = 10,
                     includeSelf: Boolean = false): DataFrame = {
    val c = corpus.select(col(idCol).as("nn_id"), col(vecCol).as("nn_vec"))
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("q_vec"))
    val pairs = c.crossJoin(broadcast(q))
      .where(if (includeSelf) lit(true) else col("nn_id") =!= col("query_id"))
      .withColumn("cosine", cosine(col("q_vec"), col("nn_vec")))
    val w = Window.partitionBy(col("query_id")).orderBy(desc("cosine"), col("nn_id"))
    pairs.withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select("query_id", "rank", "nn_id", "cosine")
  }

  /** Deterministic md5-derived ±1 hyperplane weight for (plane, dim):
    * +1 when the first hex nibble of md5("plane|dim") is even.
    */
  private def planeWeight(plane: Int, dim: Column): Column =
    when(conv(substring(md5(concat_ws("|", lit(plane.toString), dim.cast("string"))), 1, 1), 16, 10)
      .cast("int") % 2 === 0, lit(1.0)).otherwise(lit(-1.0))

  /** Random-hyperplane LSH bucket id (a `planes`-char bit string). */
  def lshBucket(vec: Column, planes: Int = 8): Column = {
    val bits = (0 until planes).map { p =>
      val signedSum = aggregate(
        zip_with(vec, sequence(lit(0), size(vec) - 1),
          (v, i) => v.cast("double") * planeWeight(p, i)),
        lit(0.0), (acc, v) => acc + v)
      when(signedSum >= 0, lit("1")).otherwise(lit("0"))
    }
    concat(bits: _*)
  }

  /** ANN via LSH buckets: exact cosine within the query's bucket.
    * Recall is bucket-limited (the classic LSH trade); bump `planes`
    * down or probe neighbors for higher recall.
    */
  def lshTopK(corpus: DataFrame, queries: DataFrame,
              idCol: String, vecCol: String, k: Int = 10, planes: Int = 8): DataFrame = {
    val c = corpus.select(col(idCol).as("nn_id"), col(vecCol).as("nn_vec"),
      lshBucket(col(vecCol), planes).as("bucket"))
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("q_vec"),
      lshBucket(col(vecCol), planes).as("bucket"))
    val pairs = c.join(broadcast(q), "bucket")
      .where(col("nn_id") =!= col("query_id"))
      .withColumn("cosine", cosine(col("q_vec"), col("nn_vec")))
    val w = Window.partitionBy(col("query_id")).orderBy(desc("cosine"), col("nn_id"))
    pairs.withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select("query_id", "rank", "nn_id", "cosine")
  }
}

package graft.fts

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Full-text index: a per-table term-statistics DataFrame registered
  * as `fts_main_<table>`, replacing DuckDB's FTS extension index
  * (reference: PRAGMA create_fts_index — fts.js:51-68).
  *
  * Schema: (term, id, tf, doclen, df, ndocs, avgdl, idf) — everything
  * BM25 needs, precomputed so a search is a broadcast-able semi-join
  * + group-by instead of a full-corpus scan.
  *
  * Scale: the index build is two shuffles (terms→tf, id→doclen) and a
  * broadcast of the 1-row corpus stats; the index is partitioned by
  * term, so a query's term lookup touches few partitions.
  */
object FtsIndex {

  final val K1 = 1.2
  final val B = 0.75

  /** Tokenizer shared by indexing and query parsing: lowercase, split
    * on non-alphanumeric runs. (DuckDB's FTS defaults additionally
    * apply porter stemming; we keep exact-token semantics and document
    * the divergence — rank order on simple queries matches.)
    */
  def tokenize(s: String): Seq[String] =
    Option(s).getOrElse("").toLowerCase.split("[^a-z0-9]+").toSeq.filter(_.nonEmpty)

  def indexName(table: String): String = s"fts_main_$table"

  def hasIndex(spark: SparkSession, table: String): Boolean =
    spark.catalog.tableExists(indexName(table))

  /** Tables indexed with Porter stemming (query terms must be stemmed
    * the same way at search time).
    */
  private val stemmed = java.util.concurrent.ConcurrentHashMap.newKeySet[String]()

  def isStemmed(table: String): Boolean = stemmed.contains(table)

  /** Build (or rebuild) the FTS index view for `table`, which must
    * expose (id, search_name). `stem = true` applies the Porter
    * stemmer per token — DuckDB FTS's default behavior
    * (PRAGMA create_fts_index stemmer='porter').
    */
  def build(spark: SparkSession, table: String, stem: Boolean = false): DataFrame = {
    val docs = spark.table(table)
      .select(col("id").cast("string").as("id"),
        lower(coalesce(col("search_name"), lit(""))).as("txt"))

    val rawTerms = docs
      .select(col("id"), explode(split(col("txt"), "[^a-z0-9]+")).as("term"))
      .where(length(col("term")) > 0)
    val terms =
      if (stem) rawTerms.withColumn("term",
        graft.functions.TextExpressions.porter_stem(col("term")))
      else rawTerms
    if (stem) stemmed.add(table) else stemmed.remove(table)

    val tf = terms.groupBy("id", "term").agg(count(lit(1)).as("tf"))
    val doclen = terms.groupBy("id").agg(count(lit(1)).as("doclen"))
    val dft = tf.groupBy("term").agg(count(lit(1)).as("df"))
    // exact long sum + single divide (not avg()) → deterministic
    // across partitionings and bit-identical to the DuckDB oracle
    val stats = doclen.agg(
      count(lit(1)).as("ndocs"),
      (sum(col("doclen")).cast("double") / count(lit(1))).as("avgdl"))

    // eagerly materialized via localCheckpoint, not persist(): an FTS
    // index is a long-lived artifact (DuckDB's PRAGMA create_fts_index
    // materializes too), and checkpoint blocks live at the RDD level,
    // so a catalog-cache sweep between queries cannot silently turn
    // every later search into a full index rebuild. On a multi-
    // executor cluster, persist the index to storage (parquet) instead
    // for durability — localCheckpoint trades lineage for speed.
    val index = tf
      .join(doclen, "id")
      .join(dft, "term")
      .crossJoin(broadcast(stats))
      .withColumn("idf",
        log(lit(1.0) + (col("ndocs") - col("df") + lit(0.5)) / (col("df") + lit(0.5))))
      .localCheckpoint(true)

    index.createOrReplaceTempView(indexName(table))
    index
  }

  /** Build only when absent (memoized path for repeated queries over
    * an unchanged table — rebuild explicitly via `build` when the
    * table contents changed).
    */
  def ensure(spark: SparkSession, table: String): Unit =
    if (!hasIndex(spark, table)) { build(spark, table); () }

  def drop(spark: SparkSession, table: String): Unit = {
    stemmed.remove(table)
    if (hasIndex(spark, table)) {
      try spark.table(indexName(table)).unpersist() catch { case _: Exception => () }
      spark.catalog.dropTempView(indexName(table))
    }
  }
}

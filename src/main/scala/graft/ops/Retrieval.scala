package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Hybrid (lexical + dense) retrieval over a document corpus: a
  * self-contained Okapi-BM25 scorer over any (id, text) table, a
  * single-query dense cosine scorer over its embedding table, and
  * their reciprocal-rank fusion — the retrieval shape RAG/data-mining
  * stacks run against a curated corpus (complements fts/Bm25, which
  * implements the reference's indexed two-tier search surface over
  * the geo tables, reference fts.js:70-114).
  *
  * 100 TB design: the term postings are filtered to the query's terms
  * BEFORE any aggregation (a map-side array filter against a literal
  * set), so the only shuffled rows are (matched doc, term) postings;
  * corpus stats (N, avgdl) and per-term document frequencies are
  * one-row / |terms|-row broadcasts; both candidate lists end in a
  * TakeOrderedAndProject (no global sort); the fusion join sees two
  * ≤k-row inputs. Nothing here collects to the driver.
  *
  * Determinism contract: candidate ranks order by the score rounded
  * to 9 dp (then id) — a two-engine summation-order ulp cannot flip a
  * rank, while real score differences survive. RRF terms 1/(K+rank)
  * are single IEEE divisions of exact integers, bit-identical across
  * engines.
  */
object Retrieval {

  /** (id, _score) Okapi-BM25 scores of `terms` for every document
    * matching at least one term. Corpus statistics (doc count, average
    * doc length, per-term document frequency) are computed from `docs`
    * itself, matching what a DuckDB FTS index would hold.
    */
  def bm25Scores(docs: DataFrame, idCol: String, textCol: String,
                 terms: Seq[String], k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    val qs = terms.map(_.toLowerCase).distinct
    require(qs.nonEmpty, "bm25Scores needs at least one query term")
    val termArr = array(qs.map(lit): _*)
    // one narrow per-doc projection (id, doclen, query-term tokens) is
    // pinned and shared by the stats and postings branches — without
    // it each branch re-runs the corpus scan + tokenize (the same
    // recompute the text scorers paid before their class table was
    // materialized once). The term filter runs inside this projection,
    // so non-matching tokens never survive the map side.
    val base = docs.select(col(idCol).as("id"),
      TextAnalysis.tokens(col(textCol)).as("_toks"))
      .select(col("id"), size(col("_toks")).cast("double").as("doclen"),
        filter(col("_toks"), t => array_contains(termArr, t)).as("_qtoks"))
      .localCheckpoint()
    // one-row corpus stats — broadcast, never a shuffle of the corpus
    val stats = base.agg(count(lit(1)).cast("double").as("n_docs"),
      avg(col("doclen")).as("avgdl"))
    val tf = base
      .select(col("id"), col("doclen"), explode(col("_qtoks")).as("term"))
      .groupBy("id", "doclen", "term").agg(count(lit(1)).cast("double").as("tf"))
    // per-term document frequency: ≤ |terms| rows
    val dfT = tf.groupBy("term").agg(count(lit(1)).cast("double").as("df"))
    tf.join(broadcast(dfT), "term")
      .crossJoin(broadcast(stats))
      .withColumn("_w",
        log((col("n_docs") - col("df") + lit(0.5)) / (col("df") + lit(0.5)) + lit(1.0))
          * col("tf") * lit(k1 + 1.0)
          / (col("tf") + lit(k1) * (lit(1.0 - b) + lit(b) * col("doclen") / col("avgdl"))))
      .groupBy("id").agg(sum(col("_w")).as("_score"))
  }

  /** Offline half of streaming BM25 scoring: collapse the corpus
    * statistics a BM25 scorer needs — doc count, average doc length,
    * per-query-term document frequency — into a ONE-ROW model
    * (`bm_terms`/`bm_dfs` term-sorted arrays + `n_docs`/`avgdl`),
    * the same train-offline/score-the-stream pattern as the unigram
    * LM and decontamination models. Bounded by |terms| regardless of
    * corpus size. Terms no document contains are absent (they carry
    * no postings in [[bm25Scores]] either).
    */
  def bm25Model(docs: DataFrame, idCol: String, textCol: String,
                terms: Seq[String]): DataFrame = {
    val qs = terms.map(_.toLowerCase).distinct
    require(qs.nonEmpty, "bm25Model needs at least one query term")
    val termArr = array(qs.map(lit): _*)
    // pinned like bm25Scores' base: stats and the df aggregate are two
    // consumers — without the pin each re-runs the corpus tokenize
    val base = docs.select(TextAnalysis.tokens(col(textCol)).as("_toks"))
      .select(size(col("_toks")).cast("double").as("doclen"),
        array_distinct(filter(col("_toks"), t => array_contains(termArr, t))).as("_qterms"))
      .localCheckpoint()
    val stats = base.agg(count(lit(1)).cast("double").as("n_docs"),
      avg(col("doclen")).as("avgdl"))
    base.select(explode(col("_qterms")).as("term"))
      .groupBy("term").agg(count(lit(1)).cast("double").as("df"))
      .agg(sort_array(collect_list(struct(col("term"), col("df")))).as("_td"))
      .crossJoin(broadcast(stats))
      .select(
        transform(col("_td"), e => e("term")).as("bm_terms"),
        transform(col("_td"), e => e("df")).as("bm_dfs"),
        col("n_docs"), col("avgdl"))
  }

  /** Online half: annotate documents with their BM25 score against a
    * [[bm25Model]] row. The model broadcasts into a stream-static
    * cross join and the per-term tf counting is a per-row expression
    * over the token array — STATELESS, so the same call compiles into
    * an Append-mode streaming plan with no watermark or state store,
    * batch ≡ streaming byte-identically. Annotates, never filters:
    * every row passes through with `_score` (0.0 when no term
    * matches) and `matched`. Scores agree with [[bm25Scores]] to
    * summation-order ulps (the batch form sums postings in shuffle
    * order, this form in term-sorted order).
    */
  def scoreWithBm25Model(docs: DataFrame, model: DataFrame,
                         textCol: String = "text",
                         k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    docs.crossJoin(broadcast(model))
      // materialize the token array ONCE per row: inlining the tokens()
      // expression would re-tokenize inside every per-term filter lambda
      // (T+1 tokenizations per row — subexpression elimination does not
      // reach into HOF lambda bodies)
      .withColumn("_toks", TextAnalysis.tokens(col(textCol)))
      .withColumn("_doclen", size(col("_toks")).cast("double"))
      .withColumn("_score",
        aggregate(zip_with(col("bm_terms"), col("bm_dfs"), (t, d) => struct(t.as("t"), d.as("d"))),
          lit(0.0d), (acc, e) => {
            val tf = size(filter(col("_toks"), x => x === e("t"))).cast("double")
            acc + when(tf > 0,
              log((col("n_docs") - e("d") + lit(0.5)) / (e("d") + lit(0.5)) + lit(1.0))
                * tf * lit(k1 + 1.0)
                / (tf + lit(k1) * (lit(1.0 - b) + lit(b) * col("_doclen") / col("avgdl"))))
              .otherwise(lit(0.0d))
          }))
      .withColumn("matched", col("_score") > 0.0)
      .drop("bm_terms", "bm_dfs", "n_docs", "avgdl", "_toks", "_doclen")
  }

  /** (id, cosine) of every corpus vector against the single query
    * vector in `queryVec` — a map-side scan with a one-row broadcast,
    * ending wherever the caller's ORDER BY/LIMIT puts it.
    *
    * CONTRACT: `queryVec` must hold exactly one row (pre-filter to
    * one id, as every call site here does). A multi-row input is NOT
    * detectable at plan time without an extra job, and the limit(1)
    * that enforces the one-row shape would pick a partition-order-
    * dependent row — so passing several rows is unspecified, not a
    * deterministic "first".
    */
  def cosineScores(emb: DataFrame, idCol: String, vecCol: String,
                   queryVec: DataFrame): DataFrame = {
    // limit(1) picks the row; the global first() aggregate makes the
    // subtree PROVABLY one-row for the plan gate (a bare limit can
    // constant-fold into an unprovable LocalTableScan)
    val q = queryVec.select(col(vecCol).as("_qv")).limit(1)
      .agg(first(col("_qv")).as("_qv"))
      .withColumn("_qn", Similarity.norm(col("_qv")))
    // zero-norm guard: 0/0 would be NaN, and NaN sorts ABOVE every real
    // score in a descending order — a zero (empty/OOV) embedding would
    // hijack rank 1. NULL instead: desc ordering puts nulls last.
    val denom = Similarity.norm(col(vecCol)) * col("_qn")
    emb.crossJoin(broadcast(q))
      .select(col(idCol).as("id"),
        when(denom > 0.0, Similarity.dot(col(vecCol), col("_qv")) / denom)
          .as("cosine"))
  }

  /** Reciprocal-rank-fusion hybrid top-k: BM25 top-k ∪ cosine top-k,
    * fused by Σ 1/(rrfK + rank). Documents appearing in only one list
    * contribute that list's term alone (the standard RRF convention).
    * Returns (id, r_bm25, r_cos, rrf_score) — ranks are NULL for the
    * list a document missed; ties break by id everywhere.
    */
  def hybridTopK(docs: DataFrame, emb: DataFrame, queryTerms: Seq[String],
                 queryVec: DataFrame,
                 docIdCol: String = "doc_id", textCol: String = "text",
                 vecIdCol: String = "vec_id", vecCol: String = "embedding",
                 k: Int = 10, rrfK: Int = 60): DataFrame = {
    // both candidate generators end in TakeOrderedAndProject(k); the
    // k-row re-rank windows below are single-task by construction and
    // bounded by k — not a scale concern
    val bmTop = bm25Scores(docs, docIdCol, textCol, queryTerms)
      .orderBy(round(col("_score"), 9).desc, col("id")).limit(k)
      .withColumn("r_bm25",
        row_number().over(Window.orderBy(round(col("_score"), 9).desc, col("id"))))
      .select(col("id"), col("r_bm25"))
    val cosTop = cosineScores(emb, vecIdCol, vecCol, queryVec)
      .orderBy(round(col("cosine"), 9).desc, col("id")).limit(k)
      .withColumn("r_cos",
        row_number().over(Window.orderBy(round(col("cosine"), 9).desc, col("id"))))
      .select(col("id"), col("r_cos"))
    def rrfTerm(rank: Column): Column =
      coalesce(lit(1.0) / (lit(rrfK).cast("double") + rank.cast("double")), lit(0.0))
    bmTop.join(cosTop, Seq("id"), "full_outer")
      .withColumn("rrf_score", rrfTerm(col("r_bm25")) + rrfTerm(col("r_cos")))
      .orderBy(col("rrf_score").desc, col("id")).limit(k)
  }
}

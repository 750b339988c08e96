package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The composed production ingest step: everything this library's
  * incremental operators exist for, wired in the order a real
  * training-data pipeline runs them on each arriving shard —
  *
  *   1. quality gate — the `pipeline_curate` predicate (token count +
  *      duplicate-word fraction), stateless map work;
  *   2. [[Dedup.dedupExactIncrement]] — exact dups vs everything ever
  *      ingested (digest index);
  *   3. [[Decontaminate.overlapBloom]] — benchmark n-gram leakage
  *      filter through the Bloom candidate stage (exact verdicts, on
  *      the RAW text: eval leakage disqualifies a document whether or
  *      not the leaked passage would also have been span-cut);
  *   4. [[Dedup.dedupIncrement]] — near-dups vs the corpus MinHash
  *      signature index;
  *   5. [[Dedup.removeDuplicateSpansIncrement]] — duplicated
  *      substrings cut against the corpus span-gram index (rewrites
  *      the text).
  *
  * Decontamination runs BEFORE both near-dup and span stages so a
  * rejected document never registers MinHash signatures OR span
  * grams: a contaminated doc must not become a permanent near-dup
  * canonical (a later CLEAN near-variant — the same article minus
  * the leaked passage — must be retained, not dropped against a doc
  * the corpus never admitted), and a passage co-occurring with eval
  * leakage must stay usable in the clean document that carries it
  * later. Both invariants are spec-proven by planted
  * contaminated-donor slices. The one deliberate asymmetry: the
  * EXACT-digest index (stage 2) registers digests before
  * decontamination — safe because a byte-identical copy of a
  * contaminated doc carries the identical leaked grams and is
  * rejected by its own decontamination verdict, never silently
  * dropped against the contaminated canonical.
  *
  * Every cross-shard fact lives in the three parquet indexes, so the
  * step is a pure function of (shard, bench, index state): shards
  * ingest one at a time in id order, each call leaves the indexes
  * ready for the next shard, and a retried shard reproduces its
  * verdicts (each stage's own retry contract — the retried kept set
  * is identical stage by stage, so every index sees the same input
  * again). Each index accumulates the docs that REACH its stage: an
  * exact-dup never registers MinHash signatures (its byte-identical
  * canonical already did — any future match on one matches the
  * other), and the span index describes text the CORPUS actually
  * retains, never text that was rejected. Output:
  * (doc_id, `keyCol`, clean_text, n_tokens) of admitted documents
  * with duplicated spans already cut.
  *
  * Deliberately NOT here: the cumulative token-budget gate — budget
  * is cross-shard mutable state that the STREAMING composition
  * ([[graft.streaming.CurationStreams.curateChain]]) holds in its
  * stateful operator; a per-shard batch budget would silently reset
  * per call.
  *
  * Scale: the shard pays one pass per kernel stage over its own rows
  * plus one equi-join per index; nothing corpus-sized moves — the
  * property each stage proves individually carries through the
  * composition (spec: IngestPipelineSpec plants one leak of every
  * kind across two shards and checks per-doc fates).
  */
object IngestPipeline {

  /** `shingleN` is the MinHash shingle size (near-dup candidate
    * generation); `decontamN` the decontamination n-gram size (eval
    * leakage test) — separate knobs sharing a default, so tuning the
    * leak gram length never silently changes near-dup semantics.
    * `commitTag` (e.g. a streaming batchId) fans out to each stage's
    * index append with a stage suffix, making every index mutation
    * replay-idempotent ([[IndexStore]] tags).
    */
  def ingestShard(shard: DataFrame, bench: DataFrame,
                  digestIndexPath: String, minhashIndexPath: String,
                  spanIndexPath: String,
                  idCol: String = "doc_id", textCol: String = "text",
                  keyCol: String = "source",
                  minTokens: Long = 25, maxDupFrac: Double = 0.55,
                  k: Int = 16, bands: Int = 4, shingleN: Int = 3,
                  threshold: Double = 0.5, spanN: Int = 8,
                  decontamN: Int = 3, decontamMinHits: Int = 2,
                  expectedGrams: Long = 1L << 20,
                  fpp: Double = 0.03,
                  commitTag: Option[String] = None): DataFrame = {
    val spark = shard.sparkSession
    // first-shard convenience: absent indexes initialize empty
    // (schema-anchored), exactly like the streaming starters. An
    // interrupted compaction can no longer masquerade as a missing
    // index: IndexStore compaction commits by manifest, so the index
    // stays present (and readable) through every maintenance crash.
    val none = shard.where(lit(false))
    if (!IndexStore.exists(spark, digestIndexPath))
      Dedup.writeDigestIndex(none, idCol, textCol, digestIndexPath)
    if (!IndexStore.exists(spark, minhashIndexPath))
      Dedup.writeMinhashIndex(none, idCol, textCol, minhashIndexPath, k, shingleN)
    if (!IndexStore.exists(spark, spanIndexPath))
      Dedup.writeSpanGramIndex(none, idCol, textCol, spanIndexPath, spanN)
    val qual = shard
      .withColumn("_r", TextAnalysis.repetitionStats(col(textCol)))
      .where(col("_r.n_tokens") >= minTokens &&
        col("_r.dup_word_frac") <= maxDupFrac)
      .select(col(idCol), col(textCol), col(keyCol))
    val exact = Dedup.dedupExactIncrement(qual, idCol, textCol,
      digestIndexPath, commitTag = commitTag.map(_ + ":digest"))
    // decontamination BEFORE the near-dup stage: a contaminated doc
    // must never register MinHash signatures (scaladoc invariant)
    val clean = Decontaminate.overlapBloom(exact, bench, idCol, textCol,
        decontamN, decontamMinHits, expectedGrams, fpp)
      .where(!col("contaminated"))
      .drop("n_hits", "contaminated")
    // eager pin: the admitted set feeds the span increment (gram pass
    // + cut) AND the key rejoin below — unpinned, each branch would
    // re-run the whole quality/digest/decontam/LSH chain upstream
    val near = Dedup.dedupIncrement(clean, idCol, textCol,
        minhashIndexPath, k, bands, shingleN, threshold,
        commitTag = commitTag.map(_ + ":minhash"))
      .localCheckpoint(true)
    // span cut rewrites the text; carry the key through the rejoin
    Dedup.removeDuplicateSpansIncrement(near, idCol, textCol,
        spanIndexPath, spanN, commitTag = commitTag.map(_ + ":span"))
      .join(near.select(col(idCol).as("doc_id"), col(keyCol)), Seq("doc_id"))
      .select(col("doc_id"), col(keyCol), col("clean_text"),
        col("n_kept").as("n_tokens"))
  }
}

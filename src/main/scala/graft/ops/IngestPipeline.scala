package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The composed production ingest step: everything this library's
  * incremental operators exist for, wired in the order a real
  * training-data pipeline runs them on each arriving shard —
  *
  *   0. (optional) web front door — HTML/boilerplate extraction with
  *      the Gopher-style markup screen ([[TextAnalysis.extractHtmlTable]]:
  *      text share + link density), then URL normalize + URL-level
  *      exact dedup on `norm_url` against a persisted URL index (the
  *      crawl-dedup rule: one canonical URL is ingested once, ever);
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
  *   5. (optional) [[Dedup.removeDuplicateLinesIncrement]] — exact
  *      duplicate LINES cut against the corpus line index (rewrites
  *      the text; the Falcon/RefinedWeb boilerplate killer);
  *   6. [[Dedup.removeDuplicateSpansIncrement]] — duplicated
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
  * Front-door ordering (stage 0): extraction precedes EVERYTHING —
  * every text-keyed stage (quality, digest, MinHash, lines, spans)
  * must see the extracted text, not markup, or boilerplate tags
  * poison every index. URL dedup precedes the quality gate because
  * it needs no text at all (a re-crawl of a known URL is rejected
  * before paying any kernel pass). The LINE cut runs BEFORE span-gram
  * registration (stage 5 before 6) so the span index never learns
  * boilerplate the line rule already kills: a nav header cut at line
  * granularity must not leave its token n-grams behind as permanent
  * span-index entries that would chew legitimate quotations of those
  * words later. MinHash (stage 4) deliberately sees PRE-line-cut
  * text: near-dup identity should match how documents arrive — two
  * crawls of the same page share their boilerplate too, and
  * signatures must agree with the already-indexed corpus generation
  * by generation.
  *
  * Every cross-shard fact lives in the persisted parquet indexes, so
  * the step is a pure function of (shard, bench, index state): shards
  * ingest one at a time in id order, each call leaves the indexes
  * ready for the next shard, and a retried shard reproduces its
  * verdicts (each stage's own retry contract — the retried kept set
  * is identical stage by stage, so every index sees the same input
  * again). Each index accumulates the docs that REACH its stage: an
  * exact-dup never registers MinHash signatures (its byte-identical
  * canonical already did — any future match on one matches the
  * other), the line index describes documents the corpus admitted,
  * and the span index describes text the CORPUS actually retains
  * (post line cut), never text that was rejected. Output:
  * (doc_id, `keyCol`, clean_text, n_tokens) of admitted documents
  * with duplicated lines and spans already cut.
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
  * kind across two shards — including an HTML shell and a
  * boilerplate line — and checks per-doc fates).
  */
object IngestPipeline {

  /** `shingleN` is the MinHash shingle size (near-dup candidate
    * generation); `decontamN` the decontamination n-gram size (eval
    * leakage test) — separate knobs sharing a default, so tuning the
    * leak gram length never silently changes near-dup semantics.
    * `commitTag` (e.g. a streaming batchId) fans out to each stage's
    * index append with a stage suffix, making every index mutation
    * replay-idempotent ([[IndexStore]] tags).
    *
    * The web front door is opt-in per column: `htmlCol` turns on
    * extraction + the markup screen (`minTextShare` /
    * `maxLinkDensity` thresholds) and the extracted text BECOMES
    * `textCol` downstream; `urlCol` + `urlIndexPath` turn on URL
    * normalize + URL-level exact dedup (`publicSuffixes` feeds the
    * data-driven registrable-domain rule; un-parseable URLs never
    * URL-dedup — each gets a per-doc sentinel canonical form).
    * `lineIndexPath` turns on the incremental line cut between the
    * near-dup and span stages.
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
                  commitTag: Option[String] = None,
                  htmlCol: Option[String] = None,
                  minTextShare: Double = 0.05,
                  maxLinkDensity: Double = 0.9,
                  urlCol: Option[String] = None,
                  urlIndexPath: Option[String] = None,
                  publicSuffixes: Option[Set[String]] = None,
                  lineIndexPath: Option[String] = None): DataFrame = {
    require(urlCol.isEmpty == urlIndexPath.isEmpty,
      "urlCol and urlIndexPath enable URL dedup together — pass both or neither")
    val spark = shard.sparkSession
    // first-shard convenience: absent indexes initialize empty
    // (schema-anchored), exactly like the streaming starters. An
    // interrupted compaction can no longer masquerade as a missing
    // index: IndexStore compaction commits by manifest, so the index
    // stays present (and readable) through every maintenance crash.
    val none = shard.where(lit(false))
    // the missing-index inits are independent single-anchor writes to
    // DISJOINT paths — overlap them (r15: the first shard paid one
    // job-latency round per index; Concurrent.inParallel rationale)
    val inits = Seq[Option[() => Unit]](
      if (!IndexStore.exists(spark, digestIndexPath)) Some(() =>
        Dedup.writeDigestIndex(none.withColumn(textCol, lit("")), idCol, textCol,
          digestIndexPath)) else None,
      if (!IndexStore.exists(spark, minhashIndexPath)) Some(() =>
        Dedup.writeMinhashIndex(none.withColumn(textCol, lit("")), idCol, textCol,
          minhashIndexPath, k, shingleN)) else None,
      if (!IndexStore.exists(spark, spanIndexPath)) Some(() =>
        Dedup.writeSpanGramIndex(none.withColumn(textCol, lit("")), idCol, textCol,
          spanIndexPath, spanN)) else None,
      lineIndexPath.collect {
        case lp if !IndexStore.exists(spark, lp) => () =>
          Dedup.writeLineIndex(none.withColumn(textCol, lit("")), idCol, textCol, lp)
      }).flatten
    if (inits.nonEmpty) Concurrent.inParallel(inits: _*)
    // every stage's index append is independent of downstream stage
    // compute (each stage reads only its OWN index, whose manifest
    // snapshot is taken before its append is submitted) — defer them
    // through one barrier and overlap with the rest of the shard's
    // work; awaited before return, so the next shard / the streaming
    // commit observes exactly the sequential run's index state
    val barrier = new AppendBarrier
    // the decontamination Bloom is pure bench-side work (gram
    // checkpoint + sketch collect) — fork it at entry so its two jobs
    // overlap the front door / quality / digest stages instead of
    // serializing between stages 2 and 3 (r15)
    val bloomPrep = Concurrent.forkValue(
      Decontaminate.prepareBloom(bench, textCol, decontamN, expectedGrams, fpp))

    // ── stage 0a: HTML extraction + markup screen ────────────────────
    val extracted = htmlCol match {
      case None => shard
      case Some(hc) =>
        val carried = (Seq(keyCol) ++ urlCol.toSeq).distinct.filterNot(_ == hc)
        TextAnalysis.extractHtmlTable(shard, idCol, hc, carried)
          .where(col("html_text_share") >= minTextShare &&
            col("html_link_density") <= maxLinkDensity)
          .select(Seq(col("doc_id").as(idCol), col("html_text").as(textCol)) ++
            carried.map(col): _*)
    }

    // ── stage 0b: URL normalize + URL-level exact dedup ──────────────
    val urlKept = (urlCol, urlIndexPath) match {
      case (Some(uc), Some(uPath)) =>
        val parts = TextAnalysis.urlParts(coalesce(col(uc), lit("")), publicSuffixes)
        // un-parseable URLs get a per-doc sentinel canonical form so
        // they never collide with each other (norm_url '' would merge
        // every non-URL doc into one dedup group)
        val canon = when(parts.parsed, parts.normUrl)
          .otherwise(concat(lit(" unparsed:"), col(idCol).cast("string")))
        val withUrl = extracted.withColumn("_norm_url", canon)
        if (!IndexStore.exists(spark, uPath))
          Dedup.writeDigestIndex(withUrl.where(lit(false)), idCol, "_norm_url", uPath)
        Dedup.dedupExactIncrement(withUrl, idCol, "_norm_url", uPath,
            commitTag = commitTag.map(_ + ":url"), appendBarrier = Some(barrier))
          .drop("_norm_url")
      case _ => extracted
    }

    // ── stage 1: quality gate ────────────────────────────────────────
    val qual = urlKept
      .withColumn("_r", TextAnalysis.repetitionStats(col(textCol)))
      .where(col("_r.n_tokens") >= minTokens &&
        col("_r.dup_word_frac") <= maxDupFrac)
      .select(col(idCol), col(textCol), col(keyCol))
    // ── stage 2: exact-dup drop vs the digest index ──────────────────
    val exact = Dedup.dedupExactIncrement(qual, idCol, textCol,
      digestIndexPath, commitTag = commitTag.map(_ + ":digest"),
      appendBarrier = Some(barrier))
    // ── stage 3: decontamination BEFORE the near-dup stage: a
    // contaminated doc must never register MinHash signatures
    // (scaladoc invariant)
    val clean = Decontaminate.overlapBloomPrepared(exact, bloomPrep(),
        idCol, textCol, decontamN, decontamMinHits)
      .where(!col("contaminated"))
      .drop("n_hits", "contaminated")
    // eager pin: the admitted set feeds the line/span increments
    // (gram passes + cuts) AND the key rejoin below — unpinned, each
    // branch would re-run the whole front-door/quality/digest/
    // decontam/LSH chain upstream
    // ── stage 4: near-dup drop vs the MinHash index ──────────────────
    val near = Dedup.dedupIncrement(clean, idCol, textCol,
        minhashIndexPath, k, bands, shingleN, threshold,
        commitTag = commitTag.map(_ + ":minhash"),
        appendBarrier = Some(barrier))
      .localCheckpoint(true)
    // ── stage 5 (optional): line cut BEFORE span registration ────────
    val lineClean = lineIndexPath match {
      case None => near
      case Some(lp) =>
        Dedup.removeDuplicateLinesIncrement(near, idCol, textCol, lp,
            commitTag = commitTag.map(_ + ":line"),
            appendBarrier = Some(barrier))
          .select(col("doc_id").as(idCol), col("clean_text").as(textCol))
          // pin: the span increment consumes this twice (gram pass +
          // cut); unpinned it would re-run the line join per consumer
          .localCheckpoint(true)
    }
    // ── stage 6: span cut (rewrites the text); key rejoins below ─────
    val out = Dedup.removeDuplicateSpansIncrement(lineClean, idCol, textCol,
        spanIndexPath, spanN, commitTag = commitTag.map(_ + ":span"),
        appendBarrier = Some(barrier))
      .join(near.select(col(idCol).as("doc_id"), col(keyCol)), Seq("doc_id"))
      .select(col("doc_id"), col(keyCol), col("clean_text"),
        col("n_kept").as("n_tokens"))
    // every deferred index append must be durable before this shard's
    // call returns — the cross-shard sequential contract
    barrier.await()
    out
  }

  /** One index's before/after view from [[maintainIndexes]] — the
    * numbers the streaming artifact records (manifest growth is the
    * thing maintenance exists to bound).
    */
  final case class MaintenanceReport(path: String, family: String,
                                     before: IndexStore.Stats,
                                     compacted: Boolean,
                                     after: IndexStore.Stats) {
    /** Approximate manifest line count (entries + tags + watermarks). */
    def manifestLines(s: IndexStore.Stats): Int =
      s.nDataLeaves + s.nAnchors + s.nTags + s.nTagMarks
  }

  /** One maintenance pass over a set of persisted pipeline indexes —
    * the piece that makes a MONTH-long micro-batch stream viable:
    * without it, every ingest tick appends one file per dirty prefix
    * and one idempotence tag line to each manifest, forever. Per
    * index: checkpoint the tag list ([[IndexStore.retireTags]] with
    * `tagRetention`), then fold dirty prefix groups when the
    * fragmentation crosses `dirtyThreshold` (the family-correct
    * [[IndexStore.compact]] — per-key minima fold for digest/url/
    * span/line, identity for minhash). Results are NEVER changed by
    * maintenance — every family's read path aggregates the same
    * minima the compaction folds.
    *
    * `indexes` pairs each path with its family: `"digest"` (also the
    * URL index — same (digest, min_doc) shape), `"minhash"`,
    * `"span"`, `"line"`. Stats are manifest-only reads; the compact
    * pass touches only dirty prefix directories. Safe to call from a
    * `foreachBatch` tail — the single-writer contract the streaming
    * sinks already hold covers maintenance too.
    */
  def maintainIndexes(spark: SparkSession, indexes: Seq[(String, String)],
                      dirtyThreshold: Double = 0.3,
                      tagRetention: Int = 1024,
                      parts: Int = 32): Seq[MaintenanceReport] =
    indexes.flatMap { case (path, family) =>
      IndexStore.stats(spark, path).map { before =>
        IndexStore.retireTags(spark, path, tagRetention)
        val doCompact = before.dirtyFraction >= dirtyThreshold
        if (doCompact) family match {
          case "digest" => Dedup.compactDigestIndex(spark, path, parts)
          case "minhash" => Dedup.compactMinhashIndex(spark, path, parts)
          case "span" => Dedup.compactSpanGramIndex(spark, path, parts)
          case "line" => Dedup.compactLineIndex(spark, path, parts)
          case other => throw new IllegalArgumentException(
            s"unknown index family '$other' for $path")
        }
        val after = IndexStore.stats(spark, path).getOrElse(before)
        MaintenanceReport(path, family, before, doCompact, after)
      }
    }
}

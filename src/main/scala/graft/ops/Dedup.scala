package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deduplication operators for training-data pipelines: exact,
  * fingerprint, n-gram Jaccard, MinHash+LSH and SimHash.
  *
  * Scale design notes:
  *  - exact/fingerprint dedup is one hash-shuffle on the digest key —
  *    the digest (16 bytes) shuffles, never the document bodies.
  *  - n-gram Jaccard is guarded by a blocking key so the pairwise
  *    stage is per-block, not corpus-wide.
  *  - MinHash+LSH is the corpus-scale path: signatures are fixed-size
  *    (k strings), candidate generation is an equi-join on
  *    (band, band_hash) buckets — a shuffle join on a short key,
  *    never O(n²).
  *  - hashes are md5-derived end-to-end so results are engine-portable
  *    (and DuckDB-oracle-verifiable) — lexicographic min over md5 hex
  *    strings equals numeric min over the 128-bit values.
  */
object Dedup {

  /** Word n-gram shingles (default 3) as an array column. */
  def shingles(text: org.apache.spark.sql.Column, n: Int = 3): org.apache.spark.sql.Column = {
    val toks = TextAnalysis.tokens(text)
    // sliding window via transform over indices
    val idx = sequence(lit(0), greatest(size(toks) - lit(n), lit(0)) - lit(0))
    when(size(toks) >= n,
      array_distinct(transform(sequence(lit(0), size(toks) - lit(n)),
        i => concat_ws(" ", slice(toks, i + 1, lit(n))))))
      .otherwise(array(concat_ws(" ", toks)))
  }

  /** Exact duplicate groups by content digest: (digest, dup_count,
    * canonical_id = min id).
    */
  def exactGroups(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.groupBy(md5(col(textCol)).as("digest"))
      .agg(count(lit(1)).as("dup_count"), min(col(idCol)).as("canonical_id"))
      .where(col("dup_count") > 1)

  /** Fingerprint (normalized-form) duplicate groups. */
  def fingerprintGroups(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.groupBy(TextAnalysis.fingerprint(col(textCol)).as("digest"))
      .agg(count(lit(1)).as("dup_count"), min(col(idCol)).as("canonical_id"))
      .where(col("dup_count") > 1)

  /** Pairwise n-gram Jaccard within blocks: candidates share
    * `blockCols`; emits (id_a, id_b, jaccard) for jaccard ≥ threshold.
    */
  def ngramJaccardPairs(
      df: DataFrame, idCol: String, textCol: String,
      blockCols: Seq[String], n: Int = 3, threshold: Double = 0.5): DataFrame = {
    val withSh = df.select(
      (col(idCol).as("_id") +: blockCols.map(col)) :+ shingles(col(textCol), n).as("_sh"): _*)
    val a = withSh.select((Seq(col("_id").as("id_a"), col("_sh").as("sh_a")) ++ blockCols.map(c => col(c))): _*)
    val b = withSh.select((Seq(col("_id").as("id_b"), col("_sh").as("sh_b")) ++ blockCols.map(c => col(c).as(s"${c}_b"))): _*)
    val joinCond = blockCols.map(c => col(c) === col(s"${c}_b")).reduce(_ && _) && col("id_a") < col("id_b")
    a.join(b, joinCond)
      .withColumn("jaccard",
        size(array_intersect(col("sh_a"), col("sh_b"))).cast("double") /
          size(array_union(col("sh_a"), col("sh_b"))).cast("double"))
      .where(col("jaccard") >= threshold)
      .select("id_a", "id_b", "jaccard")
  }

  /** MinHash signatures: k md5-permutation minima per doc.
    * Returns (id, seed, sig) — one row per signature slot.
    */
  def minhashSignatures(df: DataFrame, idCol: String, textCol: String,
                        k: Int = 16, n: Int = 3): DataFrame = {
    val sh = df.select(col(idCol).as("id"), explode(shingles(col(textCol), n)).as("sh"))
    val seeds = (0 until k)
    sh.select(col("id"),
        explode(array(seeds.map(s =>
          struct(lit(s).as("seed"), md5(concat(lit(s.toString), lit("|"), col("sh"))).as("h"))): _*)).as("sa"))
      .select(col("id"), col("sa.seed").as("seed"), col("sa.h").as("h"))
      .groupBy("id", "seed").agg(min(col("h")).as("sig"))
  }

  /** LSH candidate pairs: signatures split into `bands`, docs sharing
    * any (band, band_hash) bucket become candidates; estimated
    * similarity = matching signature slots / k.
    */
  def minhashLshPairs(df: DataFrame, idCol: String, textCol: String,
                      k: Int = 16, bands: Int = 4, n: Int = 3,
                      threshold: Double = 0.5): DataFrame = {
    val sigs = minhashSignatures(df, idCol, textCol, k, n).cache()
    val rowsPerBand = k / bands
    val bandHashes = sigs
      .withColumn("band", col("seed") / lit(rowsPerBand) cast "int")
      .groupBy("id", "band")
      .agg(md5(concat_ws("", sort_array(collect_list(struct(col("seed"), col("sig"))))
        .getField("sig"))).as("band_hash"))
    val cand = bandHashes.as("x").join(bandHashes.as("y"),
        col("x.band") === col("y.band") && col("x.band_hash") === col("y.band_hash") &&
          col("x.id") < col("y.id"))
      .select(col("x.id").as("id_a"), col("y.id").as("id_b")).distinct()
    // verify candidates by full signature agreement ratio
    val sa = sigs.select(col("id").as("id_a"), col("seed"), col("sig").as("sig_a"))
    val sb = sigs.select(col("id").as("id_b"), col("seed"), col("sig").as("sig_b"))
    cand.join(sa, "id_a").join(sb, Seq("id_b", "seed"))
      .groupBy("id_a", "id_b")
      .agg((sum(when(col("sig_a") === col("sig_b"), 1).otherwise(0)).cast("double") / lit(k))
        .as("est_jaccard"))
      .where(col("est_jaccard") >= threshold)
  }

  /** SimHash fingerprint over tokens (bit-width configurable; 64 by
    * default) as a native Catalyst-friendly column expression chain:
    * per-token md5 bits vote ±tf, sign gives the fingerprint bit.
    */
  def simhash(df: DataFrame, idCol: String, textCol: String, bits: Int = 64): DataFrame = {
    require(bits % 4 == 0 && bits <= 128, "bits must be multiple of 4, ≤ 128")
    val toks = df.select(col(idCol).as("id"), explode(TextAnalysis.tokens(col(textCol))).as("tok"))
    val tf = toks.groupBy("id", "tok").agg(count(lit(1)).as("tf"))
    val hexChars = bits / 4
    val withHash = tf.withColumn("h", substring(md5(col("tok")), 1, hexChars))
    // per-bit vote: explode bit positions, weight by tf
    val bitsDf = withHash.select(col("id"), col("tf"),
        posexplode(split(col("h"), "(?!^)"))) // pos, col = hex char
      .where(length(col("col")) > 0) // split keeps a trailing empty element
      .withColumn("nib", conv(col("col"), 16, 10).cast("int"))
      .select(col("id"), col("tf"), col("pos"),
        explode(array((0 until 4).map(b =>
          struct(lit(b).as("b"), (col("nib").divide(lit(1 << (3 - b))).cast("int") % 2).as("bit"))): _*)).as("bb"))
      .select(col("id"), col("tf"),
        (col("pos") * 4 + col("bb.b")).as("bitpos"),
        when(col("bb.bit") === 1, col("tf")).otherwise(-col("tf")).as("vote"))
    bitsDf.groupBy("id", "bitpos").agg(sum(col("vote")).as("v"))
      .groupBy("id")
      .agg(concat_ws("", sort_array(collect_list(struct(col("bitpos"),
        when(col("v") > 0, lit("1")).otherwise(lit("0")).as("bit")))).getField("bit")).as("simhash"))
  }

  /** Hamming distance between two equal-length bit strings. */
  def hammingDist(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    size(filter(zip_with(split(a, "(?!^)"), split(b, "(?!^)"), (x, y) => x =!= y), d => d))

  /** Embedding-cosine near-duplicate pairs above `threshold`,
    * restricted to a blocking column (e.g. cluster label) when given.
    */
  def embeddingNearDupPairs(df: DataFrame, idCol: String, vecCol: String,
                            threshold: Double, blockCol: Option[String] = None): DataFrame = {
    val base = df.select((Seq(col(idCol).as("_id"), col(vecCol).as("_v")) ++ blockCol.map(col)): _*)
    val a = base.select((Seq(col("_id").as("id_a"), col("_v").as("va")) ++ blockCol.map(c => col(c))): _*)
    val b = base.select((Seq(col("_id").as("id_b"), col("_v").as("vb")) ++ blockCol.map(c => col(c).as(s"${c}_b"))): _*)
    val cond = blockCol.map(c => col(c) === col(s"${c}_b")).getOrElse(lit(true)) &&
      col("id_a") < col("id_b")
    a.join(b, cond)
      .withColumn("cosine", Similarity.cosine(col("va"), col("vb")))
      .where(col("cosine") >= threshold)
      .select("id_a", "id_b", "cosine")
  }
}

package graft.tools

import org.apache.spark.sql.SparkSession

/** One-off artifact: where does a production-merge-count BPE train
  * spend its wall? Runs trainMerges with numMerges=1000 at the given
  * sf dir and prints one JSON line (merges actually landed, wall,
  * wall per merge round). Kept in tools/ as the reproducer for the
  * BASELINE.md round-14 BPE paragraph.
  */
object BpeBench {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master(s"local[${Runtime.getRuntime.availableProcessors()}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.core.Tables.registerAll(spark, sfDir)
    val docs = spark.table("documents")
    docs.count() // warm
    val wc = graft.ops.Bpe.wordCounts(docs, "text").localCheckpoint(true)
    val nWords = wc.count()
    val t0 = System.nanoTime()
    val merges = graft.ops.Bpe.trainMergesFromWordCounts(wc, numMerges = 1000,
      minPairCount = 2L).collect()
    val wall = (System.nanoTime() - t0) / 1e9
    // rounds = aggregate jobs actually run; batching commits >1 merge
    // per round, so rounds <= merges — recover it from the debug env
    // being off by re-deriving: each round re-pins `cur`; we report
    // merges and wall only (rounds visible via GRAFT_BPE_DEBUG)
    println(s"""{"metric":"bpe_1k_train","sf":"$sfDir","n_distinct_words":$nWords,"merges_landed":${merges.length},"wall_sec":${math.round(wall * 1000) / 1000.0},"sec_per_merge":${math.round(wall / math.max(merges.length, 1) * 10000) / 10000.0}}""")
    spark.stop()
  }
}

package graft.ops

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.window.WindowExec
import org.scalatest.funsuite.AnyFunSuite

/** Hot-gram skew stress for span dedup (VERDICT r10 Next #6): at web
  * scale a boilerplate n-gram can appear in half the corpus, and the
  * round-10 formulation (a window partitioned by the gram hash)
  * buffered that gram's whole position list on one task. This suite
  * plants one 8-gram in 50% of documents and proves
  *   1. the plan contains NO window partitioned by the gram hash —
  *      dup-gram detection is a two-level fold (map-side partial
  *      min/max/count per input partition, then a per-gram combine of
  *      ≤ #partitions partial rows) + an equi-join back, so no single
  *      task ever buffers a gram's occurrence list (the only windows
  *      left are the per-document island merges, bounded by doc
  *      length); and
  *   2. the spans are exactly the planted boilerplate positions —
  *      the fold form is result-identical to the window form.
  */
class SpanSkewSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "16")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.session.timeZone", "UTC")
    .getOrCreate()

  private val Phrase = "alpha bravo charlie delta echo foxtrot golf hotel"

  /** 200 docs; even ids carry the shared phrase after 4 unique
    * tokens, odd ids are fully unique. Every non-phrase 8-gram
    * contains a doc-unique token, so cross-doc duplication marks
    * exactly the phrase positions [4, 11] of even docs.
    */
  private def corpus = {
    import spark.implicits._
    (0 until 200).map { i =>
      val uniq = (0 until 4).map(j => s"u${i}x$j").mkString(" ")
      val tail = (0 until 4).map(j => s"t${i}y$j").mkString(" ")
      val text = if (i % 2 == 0) s"$uniq $Phrase $tail" else
        s"$uniq ${(0 until 8).map(j => s"p${i}z$j").mkString(" ")} $tail"
      (i.toLong, text)
    }.toDF("doc_id", "text")
  }

  test("no window is partitioned by the gram hash (two-level fold)") {
    val res = Dedup.duplicateSpans(corpus, "doc_id", "text", n = 8)
    res.collect() // run to the final adaptive plan
    val plan = res.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }
    val ghWindows = plan.collectWithSubqueries { case w: WindowExec => w }
      .filter(_.partitionSpec.exists(_.references.exists(_.name == "gh")))
    assert(ghWindows.isEmpty,
      s"dup-gram detection must not buffer per-gram windows:\n${ghWindows.mkString("\n")}")
  }

  test("a gram in 50% of docs yields exactly the planted spans") {
    val rows = Dedup.duplicateSpans(corpus, "doc_id", "text", n = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .sortBy(_._1)
    val expected = (0 until 200 by 2).map(i => (i.toLong, 4L, 11L, 8L))
    assert(rows.toSeq == expected)
  }

  test("within-doc mode (crossDocOnly=false) still finds the repeats") {
    import spark.implicits._
    // one doc with the phrase twice, one clean doc
    val df = Seq(
      (1L, s"$Phrase mid1 mid2 $Phrase"),
      (2L, (0 until 20).map(j => s"q$j").mkString(" "))
    ).toDF("doc_id", "text")
    val rows = Dedup.duplicateSpans(df, "doc_id", "text", n = 8, crossDocOnly = false)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // the two phrase occurrences: tokens [0,7] and [10,17]
    assert(rows.toSet == Set((1L, 0L, 7L), (1L, 10L, 17L)))
  }
}

package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import scala.util.Random

/** The HTML-extraction kernel: planted-fixture semantics (script/
  * style/comment removal, block-element lines, entity decode,
  * whitespace normalization, anchor link-density counters, malformed
  * input robustness) plus a property fuzz pinning the kernel's text
  * output bit-identical to the declarative regexp-chain reference.
  *
  * Fuzz-domain note: a single left-to-right pass and a global regexp
  * chain genuinely diverge on TWO pathological shapes — a stray '<'
  * that a LATER tag's '>' closes (the kernel reads one junk tag, the
  * chain strips the inner tag first; the kernel's reading is the
  * browser-consistent one) and an unterminated `<!--` (the kernel
  * drops to EOF per the HTML5 parser, the chain keeps the literal
  * text). The generator therefore emits '<' only inside well-formed
  * tag tokens (or as `&lt;` / a document-final unterminated tail) and
  * only terminated comments; both divergences are covered by explicit
  * fixtures below asserting the KERNEL's contracted behavior.
  */
class HtmlExtractSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def extract(html: String): (String, Int, Int) =
    TextExpressions.extractHtmlText(html)

  private def text(html: String): String = extract(html)._1

  test("full page: blocks become lines, script/style/comments vanish, entities decode") {
    val html =
      """<html><head><title>Doc 7</title>
        |<style>p { color: red } li > a { x: 1 }</style>
        |<script>var n = 7; if (n > 2 && n < 9) { document.write("<b>skip</b>"); }</script>
        |</head><body><!-- build 7 -->
        |<h1>alpha &amp; beta</h1>
        |<p>one  two
        |   three</p>
        |<div><p>mid &lt;tag&gt; &#65;&#x42;</p></div>
        |<ul><li>item1</li><li>item2 &nbsp; item3</li></ul>
        |<p>Visit <a href="/d/7">link one</a> now.</p>
        |</body></html>""".stripMargin
    val (txt, link, total) = extract(html)
    assert(txt ==
      Seq("Doc 7", "alpha & beta", "one two three", "mid <tag> AB",
        "item1", "item2 item3", "Visit link one now.").mkString("\n"))
    // anchor text "link one" → 7 non-whitespace chars
    assert(link == 7)
    assert(total == txt.replaceAll("[ \n]", "").length)
  }

  test("anchor region semantics: first closer ends it, nesting doesn't extend it, no closer anchors nothing") {
    // z sits after the FIRST </a> — not anchor text
    assert(extract("<a>x<a>y</a>z</a>w")._2 == 2)
    // opener without closer: nothing counts as anchor text
    assert(extract("<a href=x>alpha beta")._2 == 0)
    // two independent anchors both count
    assert(extract("<a>ab</a> mid <a>cd</a>")._2 == 4)
    // <ab> is not an anchor tag
    assert(extract("<ab>xyz</ab>")._2 == 0)
  }

  test("inline tags separate words, block tags separate lines, blank blocks drop") {
    assert(text("a<b>b</b>c") == "a b c")
    assert(text("a<p></p><p>  </p><p>b</p>") == "a\nb")
    assert(text("<br>x<br>y") == "x\ny")
    assert(text("a<span class='q'>b</span>") == "a b")
    // unknown element: inline
    assert(text("a<widget foo=1>b</widget>") == "a b")
  }

  test("entity decode: amp-last semantics, numeric BMP, unknown/malformed pass through") {
    assert(text("&amp;lt; stays") == "&lt; stays")
    assert(text("x &#955; y &#x3bb; z") == "x λ y λ z")
    assert(text("&unknown; &zz &#; &#xZZ; &") == "&unknown; &zz &#; &#xZZ; &")
    // numeric whitespace collapses like literal whitespace
    assert(text("a&#32;&#32;b&#9;c") == "a b c")
    // entities never create tags
    assert(text("&lt;p&gt;not a block&lt;/p&gt;") == "<p>not a block</p>")
  }

  test("malformed markup never crashes and follows the contracted reading") {
    assert(text("") == "")
    // a stray '<' closed by ANY later '>' is one junk tag (so the
    // whole "< b and c >" region is a separator)
    assert(text("a < b and c > d") == "a d")
    assert(text("a < b <p>c") == "a c")
    // stray '<' with no later '>': literal to EOF
    assert(text("tail <unterminated attr") == "tail <unterminated attr")
    // unterminated comment drops to EOF (HTML5 parser behavior)
    assert(text("a <!-- never closed <p>b") == "a")
    // unterminated script loses only its opener; body stays text
    assert(text("x <script>var y = 1 y2") == "x var y = 1 y2")
    // empty / exotic tags are separators
    assert(text("a<>b</>c<?php ?>d<!DOCTYPE html>e") == "a b c d e")
    // bare '>' is text
    assert(text("5 > 3") == "5 > 3")
  }

  test("extractHtmlTable: screen columns over a corpus, null/empty safe") {
    import spark.implicits._
    val df = Seq(
      (1L, "<p>hello world</p><p>second line</p>"),
      (2L, "<a href=x>all link</a>"),
      (3L, "<script>only script</script>"),
      (4L, "")
    ).toDF("doc_id", "html")
    val out = graft.ops.TextAnalysis.extractHtmlTable(df, "doc_id", "html")
      .orderBy("doc_id").collect()
    assert(out(0).getAs[String]("html_text") == "hello world\nsecond line")
    assert(out(0).getAs[Long]("html_n_lines") == 2L)
    assert(math.abs(out(0).getAs[Double]("html_text_share") -
      23.0 / df.where($"doc_id" === 1L).head().getString(1).length) < 1e-12)
    assert(out(0).getAs[Double]("html_link_density") == 0.0)
    assert(out(1).getAs[Double]("html_link_density") == 1.0)
    assert(out(2).getAs[String]("html_text") == "" &&
      out(2).getAs[Long]("html_n_lines") == 0L &&
      out(2).getAs[Double]("html_link_density") == 0.0)
    assert(out(3).getAs[Double]("html_text_share") == 0.0)
  }

  test("adversarial unterminated-opener pages extract in linear time") {
    // spammy/adversarial markup: tens of thousands of <script> openers
    // with no closer anywhere. Without the per-name no-closer memo the
    // kernel re-scans to EOF per opener — O(n²), ~2×10¹⁰ char compares
    // here (minutes on one row); with it, ONE EOF scan per tag name.
    // The 10 s bound is ~100× the memoized cost — regression, not flake.
    val page = ("<script>" * 50000) + "tail text"
    val t0 = System.nanoTime()
    val (txt, link, tot) = extract(page)
    val ms = (System.nanoTime() - t0) / 1e6
    assert(txt == "tail text" && link == 0 && tot == 8)
    assert(ms < 10000, s"quadratic closer re-scan? $ms ms")
    // memo soundness: successful finds BEFORE the first failure are
    // unaffected (searches advance monotonically; no closer at or
    // after f implies none at any f' >= f)
    assert(text("<script>a</script>x<script>b") == "x b")
    // anchors: one far closer is found once (every opener inside the
    // region skips the search), and openers past the last closer hit
    // the memo — both sides stay linear
    val t1 = System.nanoTime()
    val (_, link2, tot2) = extract(("<a href=q>w " * 30000) + "</a>" + ("<a>z " * 30000))
    val ms2 = (System.nanoTime() - t1) / 1e6
    assert(tot2 == 60000 && link2 == 30000)
    assert(ms2 < 10000, s"quadratic anchor re-scan? $ms2 ms")
  }

  test("extractHtmlTable: NULL html degenerates to the empty row, not mixed NULL/0") {
    import spark.implicits._
    val df = Seq((1L, null.asInstanceOf[String]), (2L, "<p>x</p>"))
      .toDF("doc_id", "html")
    val out = graft.ops.TextAnalysis.extractHtmlTable(df, "doc_id", "html")
      .orderBy("doc_id").collect()
    // the kernel expression is null-intolerant; without the coalesce
    // the row read (NULL text, NULL n_lines, 0.0 share, 0.0 density)
    assert(out(0).getAs[String]("html_text") == "")
    assert(out(0).getAs[Long]("html_n_lines") == 0L)
    assert(out(0).getAs[Double]("html_text_share") == 0.0)
    assert(out(0).getAs[Double]("html_link_density") == 0.0)
    assert(out(1).getAs[String]("html_text") == "x")
  }

  // ── property fuzz vs the declarative regexp chain ──────────────────

  private val words = IndexedSeq("alpha", "beta", "Gamma", "delta9", "x", "Y2",
    "word", "5", "3", "ok")
  private val entities = IndexedSeq("&amp;", "&lt;", "&gt;", "&quot;", "&apos;",
    "&nbsp;", "&#65;", "&#97;", "&#x42;", "&#x7a;", "&", "&zz ", "&unknown;")
  private val inlineTags = IndexedSeq("b", "i", "em", "span", "strong", "widget", "abbr")
  private val blockTags = IndexedSeq("p", "div", "li", "h2", "tr", "blockquote",
    "section", "title")
  private val ws = IndexedSeq(" ", "  ", "\t", "\n", "\r\n", "\f")

  private def genDoc(r: Random): String = {
    val sb = new StringBuilder
    val n = r.nextInt(40)
    (0 until n).foreach { _ =>
      r.nextInt(12) match {
        case 0 => sb.append(ws(r.nextInt(ws.length)))
        case 1 => sb.append(entities(r.nextInt(entities.length)))
        case 2 | 3 =>
          val t = inlineTags(r.nextInt(inlineTags.length))
          sb.append(if (r.nextBoolean()) s"<$t class='c${r.nextInt(3)}'>" else s"</$t>")
        case 4 | 5 =>
          val t = blockTags(r.nextInt(blockTags.length))
          r.nextInt(3) match {
            case 0 => sb.append(s"<$t>")
            case 1 => sb.append(s"</$t>")
            case _ => sb.append(s"</ $t >") // junk tag, NOT a block boundary
          }
        case 6 =>
          sb.append(s"<!-- note ${words(r.nextInt(words.length))} -->")
        case 7 =>
          sb.append(s"<script type='j'>var q = ${r.nextInt(9)}; q = q < 5 && q > 1;</script>")
        case 8 =>
          sb.append(s"<style>p { k: ${r.nextInt(9)} }</style>")
        case 9 =>
          sb.append(s"<a href='/${r.nextInt(9)}'>${words(r.nextInt(words.length))}</a>")
        case _ => sb.append(words(r.nextInt(words.length)))
      }
    }
    if (r.nextInt(8) == 0) sb.append(" <tail unterminated")
    sb.toString
  }

  test("kernel text is bit-identical to the declarative regexp chain on fuzzed markup") {
    import spark.implicits._
    val r = new Random(20260816L)
    val docs = ((0 until 500).map(_ => genDoc(r)) ++ Seq("", " ", "<p>", "&amp;"))
      .zipWithIndex.map { case (h, i) => (i.toLong, h) }
      .toDF("doc_id", "html")
    docs.cache().count()
    val rows = docs.select(col("doc_id"), col("html"),
        graft.ops.TextAnalysis.extractHtml(col("html")).as("k"),
        graft.ops.TextAnalysis.extractHtmlDeclarative(col("html")).as("d"))
      .collect()
    rows.foreach { row =>
      assert(row.getString(2) == row.getString(3),
        s"kernel != declarative for html=<<${row.getString(1)}>>")
    }
  }
}

package graft.ops

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** The URL parse/normalize/domain-screen contract
  * (TextAnalysis.urlTable): planted fixtures for every documented
  * rule — scheme gate, host lowercasing, userinfo and port split,
  * registrable-domain heuristic (two-label, co.uk-style three-label,
  * IPv4, single-label), path depth, tracking-param strip, default
  * ports, fragment drop — plus NULL/non-URL degeneracy. The DuckDB
  * side of the same contract is the `text_url_parse` oracle row's
  * regexp/list CTE chain.
  */
class UrlParseSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def row(url: String): org.apache.spark.sql.Row = {
    import spark.implicits._
    TextAnalysis.urlTable(Seq((1L, url)).toDF("doc_id", "url"), "doc_id", "url")
      .head()
  }

  private def field(url: String, name: String): Any =
    row(url).getAs[Any](name)

  test("full-feature URL: userinfo, port, mixed case, tracking params, fragment") {
    val r = row("HTTPS://User:Pw@WWW.Example.COM:8443/A/b//c?utm_source=x&q=1&gclid=z&r=2#frag")
    assert(r.getAs[String]("scheme") == "https")
    assert(r.getAs[String]("host") == "www.example.com")
    assert(r.getAs[String]("domain") == "example.com")
    assert(r.getAs[String]("port") == "8443")
    assert(r.getAs[Long]("path_depth") == 3L) // empty segment from '//' drops
    assert(r.getAs[Long]("n_params") == 2L)   // q=1, r=2 survive
    assert(r.getAs[String]("norm_url") ==
      "https://www.example.com:8443/A/b//c?q=1&r=2")
  }

  test("registrable-domain heuristic: two-label, co.uk-style, IPv4, single label") {
    assert(field("http://a.b.example.co.uk/x", "domain") == "example.co.uk")
    assert(field("http://deep.sub.example.com/x", "domain") == "example.com")
    assert(field("http://192.168.3.44/x", "domain") == "192.168.3.44")
    assert(field("http://localhost:9000/x", "domain") == "localhost")
    assert(field("http://example.io/x", "domain") == "example.io")
  }

  test("default ports strip from the normal form; explicit ones stay") {
    assert(field("http://ex.com:80/a", "norm_url") == "http://ex.com/a")
    assert(field("https://ex.com:443/a", "norm_url") == "https://ex.com/a")
    assert(field("http://ex.com:443/a", "norm_url") == "http://ex.com:443/a")
    assert(field("ftp://ex.com:21/a", "norm_url") == "ftp://ex.com:21/a")
  }

  test("normalization: empty path roots, fragment drops, tracking-only query drops the '?'") {
    assert(field("http://ex.com", "norm_url") == "http://ex.com/")
    assert(field("http://ex.com#top", "norm_url") == "http://ex.com/")
    assert(field("http://ex.com/p?utm_campaign=a&fbclid=b", "norm_url") == "http://ex.com/p")
    assert(field("http://ex.com/p?utm_campaign=a&fbclid=b", "n_params") == 0L)
    // a non-tracking param whose NAME merely starts with 'ref' +more stays
    assert(field("http://ex.com/p?refresh=1", "n_params") == 1L)
    // bare 'ref' is CONTENT-selecting on many hosts (a branch, a
    // referrer-routed page) — deliberately kept, see TrackingParamPattern
    assert(field("http://ex.com/p?ref=abc", "n_params") == 1L)
    // Java-$ vs RE2-$ divergence guard: with \z anchors a param value
    // ending in '\n' is NOT at end-of-text for `.*` in either engine,
    // so BOTH keep it (Java $ alone would have stripped it Spark-side)
    assert(field("http://ex.com/p?utm_source=x\n", "n_params") == 1L)
  }

  test("data-driven public-suffix list: ne.jp/com.br-class registries resolve correctly") {
    import spark.implicits._
    val psl = Set("com", "org", "jp", "ne.jp", "co.jp", "br", "com.br",
      "uk", "co.uk", "io")
    def dom(url: String): String =
      TextAnalysis.urlTable(Seq((1L, url)).toDF("doc_id", "url"),
        "doc_id", "url", Some(psl)).head().getAs[String]("domain")
    // two-level registries the built-in 7-label heuristic gets WRONG
    assert(dom("http://www.example.ne.jp/x") == "example.ne.jp")
    assert(dom("http://a.b.example.com.br/x") == "example.com.br")
    // plain TLD suffixes still register at two labels
    assert(dom("http://deep.sub.example.com/x") == "example.com")
    assert(dom("http://www.example.co.uk/x") == "example.co.uk")
    // a host that IS a listed suffix passes through
    assert(dom("http://co.uk/") == "co.uk")
    // PSL default rule: unlisted TLD acts as a suffix of its own
    assert(dom("http://a.b.example.zz/x") == "example.zz")
    assert(dom("http://localhost/x") == "localhost")
    // IPv4 wins before any suffix probe
    assert(dom("http://192.168.1.2/x") == "192.168.1.2")
    // longest match wins: 'jp' and 'ne.jp' both listed
    assert(dom("http://example.jp/x") == "example.jp")
  }

  test("publicSuffixSet loader: comments, wildcards, exceptions and case normalize away") {
    import spark.implicits._
    val raw = Seq("// a comment", "COM", "ne.jp", "*.ck", "!www.ck", "  co.uk ", "")
      .toDF("suffix")
    assert(TextAnalysis.publicSuffixSet(raw) == Set("com", "ne.jp", "co.uk"))
    // and it feeds straight into the parse
    val out = TextAnalysis.urlTable(
      Seq((1L, "http://x.y.ne.jp/p")).toDF("doc_id", "url"), "doc_id", "url",
      Some(TextAnalysis.publicSuffixSet(raw))).head()
    assert(out.getAs[String]("domain") == "y.ne.jp")
  }

  test("non-URLs and NULLs degenerate to consistent empty rows") {
    import spark.implicits._
    val out = TextAnalysis.urlTable(
      Seq((1L, "plain words"), (2L, null.asInstanceOf[String]),
        (3L, "mailto:a@b.c"), (4L, "http://ok.com/x"))
        .toDF("doc_id", "url"), "doc_id", "url")
      .orderBy("doc_id").collect()
    Seq(0, 1, 2).foreach { i =>
      assert(out(i).getAs[String]("scheme") == "")
      assert(out(i).getAs[String]("host") == "")
      assert(out(i).getAs[String]("domain") == "")
      assert(out(i).getAs[Long]("path_depth") == 0L)
      assert(out(i).getAs[Long]("n_params") == 0L)
      assert(out(i).getAs[String]("norm_url") == "")
    }
    assert(out(1).getAs[String]("url") == "") // NULL coalesces, never NULL
    assert(out(3).getAs[String]("host") == "ok.com")
  }

  test("norm_url is a fixpoint: parsing the normal form reproduces it") {
    val urls = Seq(
      "https://www.Ex.COM/a/b?utm_source=x&k=v#f",
      "http://u@h.co.uk:80/p",
      "http://192.168.1.2/x?gclid=1",
      "ftp://files.ex.net/pub")
    urls.foreach { u =>
      val n1 = field(u, "norm_url").asInstanceOf[String]
      assert(field(n1, "norm_url") == n1, s"not a fixpoint: $u -> $n1")
    }
  }
}

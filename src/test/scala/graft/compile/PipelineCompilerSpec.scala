package graft.compile

import org.scalatest.funsuite.AnyFunSuite
import PipelineCompiler._

/** Golden tests for the pipeline compiler — a line-for-line port of
  * the reference suite (pipeline.test.js, 227 LoC) adapted to our
  * Spark dialect: backtick identifiers, st_* function names, and the
  * BM25 score-join that replaces `fts_main_<t>.match_bm25`.
  */
class PipelineCompilerSpec extends AnyFunSuite {

  private def node(
      id: String = "p1", nodeType: String = "source", op: String = "",
      table: String = "places_place", key: String = "places/place",
      distance: Option[Double] = None) =
    PipelineNode(id, nodeType, op, table, key, distance)

  private val bldg = node(id = "p2", nodeType = "combine", op = "union",
    table = "buildings_building", key = "buildings/building")

  test("returns empty string for empty nodes") {
    assert(compile(Seq.empty) == "")
  }

  test("returns empty string when no sources exist") {
    assert(compile(Seq(node(nodeType = "combine", op = "intersect", table = "x", key = "x/y"))) == "")
  }

  test("compiles a single source") {
    val sql = compile(Seq(node()))
    assert(sql.contains("FROM `places_place`"))
    assert(sql.contains("'places/place' AS _source"))
    assert(sql.contains("LIMIT 3000"))
    assert(sql.contains("st_asgeojson(geometry) AS geojson"))
  }

  test("compiles two sources with UNION ALL") {
    val sql = compile(Seq(node(), bldg))
    assert(sql.contains("UNION ALL"))
    assert(sql.contains("FROM `places_place`"))
    assert(sql.contains("FROM `buildings_building`"))
  }

  test("applies per-source limit for union-only pipeline") {
    val sql = compile(Seq(node(), bldg), Options(limit = 1000))
    // 1000 / 2 = 500 per source
    assert("""FROM `places_place`\s*\n\s*LIMIT 500""".r.findFirstIn(sql).isDefined)
    assert("""FROM `buildings_building`\s*\n\s*LIMIT 500""".r.findFirstIn(sql).isDefined)
    assert(sql.endsWith("LIMIT 1000"))
  }

  test("does NOT per-source limit when spatial filters exist") {
    val sql = compile(Seq(node(),
      node(id = "p2", nodeType = "combine", op = "intersect",
        table = "buildings_building", key = "buildings/building")), Options(limit = 1000))
    val baseCte = sql.split("matched_0")(0)
    assert("""LIMIT \d+""".r.findAllIn(baseCte).isEmpty)
    assert(sql.endsWith("LIMIT 1000"))
  }

  test("spatial filter runs against full data, not pre-limited base") {
    val sql = compile(Seq(node(),
      node(id = "p2", nodeType = "combine", op = "within",
        table = "buildings_building", key = "buildings/building", distance = Some(300))))
    assert(sql.contains("SELECT base.id FROM base"))
    val basePart = """base AS \(([\s\S]*?)\)\n""".r.findFirstMatchIn(sql).map(_.group(1)).getOrElse("")
    assert("""LIMIT \d+""".r.findFirstIn(basePart).isEmpty)
  }

  test("applies bbox filter") {
    val sql = compile(Seq(node()), Options(bbox = Some((-118.3, -118.2, 34.0, 34.1))))
    assert(sql.contains("centroid_lon >= -118.3"))
    assert(sql.contains("centroid_lon <= -118.2"))
    assert(sql.contains("centroid_lat >= 34"))
    assert(sql.contains("centroid_lat <= 34.1"))
  }

  test("no bbox WHERE clause when bbox is None") {
    val sql = compile(Seq(node()), Options(bbox = None))
    assert(!sql.contains("centroid_lon >="))
  }

  test("uses ILIKE search when no FTS tables provided") {
    val sql = compile(Seq(node()), Options(search = "cafe"))
    assert(sql.contains("ILIKE '%cafe%'"))
    assert(sql.contains("FROM `places_place`\n  WHERE"))
  }

  test("uses BM25 score join when table has FTS") {
    val sql = compile(Seq(node()), Options(search = "cafe", ftsTables = Set("places_place")))
    assert(sql.contains("fts_main_places_place"))
    assert(sql.contains("term IN ('cafe')"))
    assert(!sql.contains("ILIKE"))
  }

  test("mixes FTS and ILIKE across sources") {
    val sql = compile(Seq(node(), bldg),
      Options(search = "tower", ftsTables = Set("places_place")))
    assert(sql.contains("fts_main_places_place"))
    assert(sql.contains("ILIKE '%tower%'"))
  }

  test("escapes single quotes in search") {
    val sql = compile(Seq(node()), Options(search = "o'brien"))
    assert(sql.contains("o''brien"))
    assert(!sql.replace("o''brien", "").contains("o'brien"))
  }

  test("no search clause when search is empty") {
    val sql = compile(Seq(node()), Options(search = ""))
    assert(!sql.contains("ILIKE"))
    assert(!sql.contains("fts_main"))
    assert(!sql.contains("_score"))
    assert(!sql.contains("ORDER BY"))
  }

  test("includes _score column and ORDER BY when searching with FTS") {
    val sql = compile(Seq(node()), Options(search = "cafe", ftsTables = Set("places_place")))
    assert(sql.contains("_score"))
    assert(sql.contains("ORDER BY _score DESC"))
  }

  test("includes _score as NULL for non-FTS search") {
    val sql = compile(Seq(node()), Options(search = "cafe"))
    assert(sql.contains("NULL AS _score"))
    assert(sql.contains("ORDER BY _score DESC"))
  }

  test("compiles intersect spatial filter") {
    val sql = compile(Seq(node(),
      node(id = "p2", nodeType = "combine", op = "intersect",
        table = "buildings_building", key = "buildings/building")))
    assert(sql.contains("matched_0"))
    assert(sql.contains("st_intersects"))
    assert(sql.contains("id IN (SELECT id FROM matched_0)"))
    assert(sql.contains("FROM `buildings_building`")) // auto-included
  }

  test("compiles within spatial filter with distance") {
    val sql = compile(Seq(node(),
      node(id = "p2", nodeType = "combine", op = "within",
        table = "buildings_building", key = "buildings/building", distance = Some(500))))
    assert(sql.contains("st_distance"))
    assert(sql.contains("0.004492")) // 500 / 111320
  }

  test("compiles exclude spatial filter") {
    val sql = compile(Seq(node(),
      node(id = "p2", nodeType = "combine", op = "exclude",
        table = "buildings_building", key = "buildings/building")))
    assert(sql.contains("NOT EXISTS"))
    assert(sql.contains("st_distance"))
    assert(!sql.contains("'buildings/building' AS _source")) // not auto-included
  }

  test("exclude also has no per-source limit (spatial pipeline)") {
    val sql = compile(Seq(node(),
      node(id = "p2", nodeType = "combine", op = "exclude",
        table = "buildings_building", key = "buildings/building")), Options(limit = 1000))
    val basePart = """base AS \(([\s\S]*?)\)\n""".r.findFirstMatchIn(sql).map(_.group(1)).getOrElse("")
    assert("""LIMIT \d+""".r.findFirstIn(basePart).isEmpty)
  }

  test("prevents self-match in spatial filters") {
    val sql = compile(Seq(node(),
      node(id = "p2", nodeType = "combine", op = "within",
        table = "buildings_building", key = "buildings/building")))
    assert(sql.contains("base.id != b.id"))
  }

  test("collects IDs from both sides of spatial relationship") {
    val sql = compile(Seq(node(),
      node(id = "p2", nodeType = "combine", op = "intersect",
        table = "buildings_building", key = "buildings/building")))
    assert(sql.contains("SELECT base.id FROM base"))
    assert(sql.contains("SELECT b.id FROM `buildings_building` b"))
  }

  test("aligns columns across sources with different field counts") {
    val sql = compile(Seq(node(),
      node(id = "p2", nodeType = "combine", op = "union", table = "foo_bar", key = "foo/bar")))
    assert("""NULL AS _f\d""".r.findFirstIn(sql).isDefined)
  }

  test("default distance is 250 m (0.002246 deg)") {
    val sql = compile(Seq(node(),
      node(id = "p2", nodeType = "combine", op = "within",
        table = "buildings_building", key = "buildings/building")))
    assert(sql.contains("0.002246"))
  }

  test("sqlOverride dialect doc: compiled text is Spark-dialect only") {
    // docs/sql-dialect.md documents the DuckDB→Spark deltas for users
    // editing compiled SQL; the compiler must never emit the DuckDB-only
    // constructs from that table's left-hand column
    assert(new java.io.File("docs/sql-dialect.md").isFile,
      "docs/sql-dialect.md (the sqlOverride dialect guide) must exist")
    val sql = compile(Seq(node(),
      node(id = "p2", nodeType = "combine", op = "intersect",
        table = "buildings_building", key = "buildings/building")),
      Options(search = "coffee"))
    Seq("::", "list_transform(", "list_filter(", "string_split_regex(",
        "generate_series(", "epoch_us(", "QUALIFY", "match_bm25").foreach { kw =>
      assert(!sql.contains(kw), s"compiled SQL contains DuckDB-only construct $kw")
    }
    // and malicious node configs stay inside their quoting
    val inj = compile(Seq(node(table = "t`x", key = "k'y")))
    assert(inj.contains("`t``x`") && inj.contains("'k''y' AS _source"))
  }
}

package graft.queries

import org.apache.spark.sql.functions._
import graft.core.Tables

/** Closes the remaining SURVEY §2 inventory lines not already covered
  * by a dedicated query: S2 schema peek, S5 incremental append, S8
  * catalog ops, A4 group-by-source, O4 shortest-name ranking, O8
  * area-ordered rendering sort.
  */
object CoverageQueries {

  /** The DuckDB-dialect override text for `shim_duck_sql` — runnable
    * verbatim by DuckDB, and by Spark after DuckSqlShim.rewrite.
    * (Defined before `queries`, which captures it at object init.)
    */
  val duckOverrideText: String =
    """SELECT doc_id,
      |       (doc_id // 100)::BIGINT AS bucket,
      |       len(toks)::BIGINT AS n_toks,
      |       toks[1] AS first_tok,
      |       array_to_string(toks[2:4], '|') AS toks_2_4,
      |       array_to_string(toks[-2:], '|') AS last_2,
      |       array_to_string(list_slice(toks, 1, 9, 3), '|') AS every_3rd
      |FROM (SELECT doc_id,
      |        list_filter(string_split_regex(lower(text), '[^a-z0-9]+'), t -> t <> '') AS toks
      |      FROM documents) d
      |ORDER BY doc_id
      |LIMIT 200""".stripMargin

  /** DuckDB star-expression text for `shim_columns` — COLUMNS('regex')
    * expansion, which needs the FROM table's schema at rewrite time.
    */
  val duckColumnsText: String =
    """SELECT l_returnflag,
      |       min(COLUMNS('^l_(quantity|extendedprice|discount)'))
      |FROM lineitem
      |GROUP BY l_returnflag
      |ORDER BY l_returnflag""".stripMargin

  /** DuckDB-dialect text for `shim_ordered_aggs` — the ordered-
    * aggregate / product / quantile_disc / format / struct-literal
    * surface, one text for both engines. Composite ORDER BY keys keep
    * first/last deterministic (l_linenumber repeats within an order in
    * the synthetic data, so a bare key would leave ties to engine
    * whim); product stays exact because line numbers are small ints.
    * The `l_orderkey < 1000` prefilter (pushed to the scan) bounds the
    * aggregate to ~1000 groups at every SF without changing the
    * ORDER BY + LIMIT 100 result — this row proves the surface, not
    * aggregate throughput.
    */
  val duckOrderedAggText: String =
    """SELECT l_orderkey,
      |       product(l_linenumber) AS prod_ln,
      |       quantile_disc(l_quantity, 0.5) AS med_qty,
      |       array_to_string(list(l_linenumber ORDER BY l_linenumber DESC), ',') AS ln_desc,
      |       first(l_suppkey ORDER BY l_partkey * 1000000 + l_suppkey) AS first_sup,
      |       last(l_suppkey ORDER BY l_partkey * 1000000 + l_suppkey) AS last_sup,
      |       format('{}:{:d}', l_orderkey, len(list(l_linenumber))) AS tag,
      |       {'k': min(l_suppkey)}.k AS k_echo
      |FROM lineitem
      |WHERE l_orderkey < 1000
      |GROUP BY l_orderkey
      |ORDER BY l_orderkey
      |LIMIT 100""".stripMargin

  val queries: Seq[Q] = Seq(

    // S2: schema peek — footer-only read drives the adaptive
    // projection; emitted as (column_name) rows.
    Q("s2_schema_peek",
      (s, dir) => {
        import s.implicits._
        val cols = s.read.parquet(Tables.path(dir, "lineitem")).schema.fieldNames.toSeq.sorted
        cols.toDF("column_name")
      },
      Some("""SELECT column_name FROM (
             |  SELECT UNNEST(['l_orderkey','l_partkey','l_suppkey','l_linenumber','l_quantity',
             |    'l_extendedprice','l_discount','l_tax','l_returnflag','l_linestatus','l_shipdate']) AS column_name)
             |ORDER BY column_name""".stripMargin)),

    // S5: incremental append with stop-at-limit semantics — two
    // ordered batches unioned, the second truncated to the remaining
    // budget (themes.js:300-347's INSERT ... LIMIT remaining).
    Q("s5_incremental_append",
      (s, dir) => {
        Tables.registerAll(s, dir)
        val limit = 150
        val batch1 = s.table("customer").select(col("c_custkey"), col("c_name"))
          .where(col("c_custkey") <= 100).orderBy(col("c_custkey"))
        val loaded = batch1.count()
        val remaining = (limit - loaded).toInt
        val batch2 = s.table("customer").select(col("c_custkey"), col("c_name"))
          .where(col("c_custkey") > 100).orderBy(col("c_custkey")).limit(remaining)
        batch1.unionByName(batch2).orderBy(col("c_custkey"))
      },
      Some("""SELECT c_custkey, c_name FROM (
             |  SELECT c_custkey, c_name FROM customer WHERE c_custkey <= 100
             |  UNION ALL
             |  (SELECT c_custkey, c_name FROM customer WHERE c_custkey > 100
             |   ORDER BY c_custkey
             |   LIMIT 150 - (SELECT COUNT(*) FROM customer WHERE c_custkey <= 100)))
             |ORDER BY c_custkey""".stripMargin)),

    // S8: catalog listing with system/helper-table filtering.
    Q("s8_catalog_ops",
      (s, dir) => {
        import s.implicits._
        GeoViews.register(s, dir)
        s.range(1).createOrReplaceTempView("_session_probe")
        s.range(1).createOrReplaceTempView("fts_main_probe")
        val user = graft.ingest.Ingest.listUserTables(s)
        s.catalog.dropTempView("_session_probe")
        s.catalog.dropTempView("fts_main_probe")
        user.filter(Set("geo_places", "geo_buildings", "geo_segments")).toDF("table_name")
          .orderBy("table_name")
      },
      Some("""SELECT table_name FROM (
             |  SELECT UNNEST(['geo_buildings','geo_places','geo_segments']) AS table_name)
             |ORDER BY table_name""".stripMargin)),

    // A4: per-source bucketing of a pipeline result.
    Q("a4_group_by_source",
      (s, dir) => {
        GeoViews.register(s, dir)
        val df = graft.compile.PipelineCompiler.run(s,
          Seq(graft.compile.PipelineCompiler.PipelineNode("p1", "source", "", "geo_places", "places/place"),
            graft.compile.PipelineCompiler.PipelineNode("p2", "combine", "union", "geo_buildings", "buildings/building")),
          graft.compile.PipelineCompiler.Options(limit = 50000))
        df.groupBy(col("_source")).agg(count(lit(1)).as("n")).orderBy(col("_source"))
      },
      Some(s"WITH ${GeoViews.oraclePlaces},\n${GeoViews.oracleBuildings}\n" +
        """SELECT _source, COUNT(*) AS n FROM (
          |  SELECT 'places/place' AS _source FROM geo_places
          |  UNION ALL SELECT 'buildings/building' FROM geo_buildings)
          |GROUP BY _source ORDER BY _source""".stripMargin)),

    // O4: ILIKE fallback ranking — shortest search_name first.
    Q("o4_shortest_name_rank",
      (s, dir) => {
        GeoViews.register(s, dir)
        graft.fts.Bm25.ilikeSearch(s, "geo_places", "building", limit = 100)
          .selectExpr("id", "display_name", "CAST(_score AS DOUBLE) AS _score")
      },
      Some(s"WITH ${GeoViews.oraclePlaces}\n" +
        """SELECT id, display_name, CAST(NULL AS DOUBLE) AS _score FROM geo_places
          |WHERE lower(search_name) LIKE '%building%'
          |ORDER BY length(search_name), id LIMIT 100""".stripMargin)),

    // O8: largest-area-first render ordering (z-order painting).
    Q("o8_area_sort",
      (s, dir) => {
        GeoViews.register(s, dir)
        s.sql("""SELECT id, st_area(geometry) AS area FROM geo_buildings
                |ORDER BY area DESC, id LIMIT 100""".stripMargin)
      },
      Some(s"WITH ${GeoViews.oracleBuildings}\n" +
        """SELECT id, (xmax - xmin) * (ymax - ymin) AS area FROM geo_buildings
          |ORDER BY area DESC, id LIMIT 100""".stripMargin)),

    // sqlOverride dialect shim, proven end-to-end: ONE DuckDB-dialect
    // text is both the oracle (DuckDB runs it verbatim) and — through
    // DuckSqlShim + DuckFunctions — the Spark query. Exercises `//`
    // integer division, `::` casts (postfix on parenthesized and call
    // expressions), DuckDB function names (len, list_filter,
    // string_split_regex), and 1-based `[i]` subscripts.
    Q("shim_duck_sql",
      (s, dir) => {
        Tables.registerAll(s, dir)
        s.sql(graft.compile.DuckSqlShim.rewrite(CoverageQueries.duckOverrideText))
      },
      Some(duckOverrideText)),

    // COLUMNS('regex') star expression, proven end-to-end the same
    // way: DuckDB binds the regex against the table natively; the
    // Spark side expands it at rewrite time via the schema resolver
    // (min() replicates per matching column, outputs named after the
    // source columns — both engines' rule).
    Q("shim_columns",
      (s, dir) => {
        Tables.registerAll(s, dir)
        val resolve = (t: String) => scala.util.Try(s.table(t).columns.toSeq).toOption
        s.sql(graft.compile.DuckSqlShim.rewrite(CoverageQueries.duckColumnsText, resolve))
      },
      Some(duckColumnsText)),

    // Ordered-aggregate surface, proven end-to-end the same way: ONE
    // DuckDB-dialect text exercises in-args ORDER BY on list(),
    // first/last -> min_by/max_by, the native product aggregate,
    // quantile_disc's sorted-element composition, fmt-style format()
    // -> printf, and a struct brace literal.
    Q("shim_ordered_aggs",
      (s, dir) => {
        Tables.registerAll(s, dir)
        s.sql(graft.compile.DuckSqlShim.rewrite(CoverageQueries.duckOrderedAggText))
      },
      Some(duckOrderedAggText)),
  )
}

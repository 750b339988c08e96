package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.Tables

/** Core relational operator coverage (SURVEY.md §2.1–2.7) expressed
  * over the driver's TPC-H-ish tables.
  *
  * All implementations are declarative DataFrame plans — filters and
  * projections push to the parquet scan, aggregates get map-side
  * partial aggregation, small dimension joins are broadcast — so every
  * query here scales by partitioning without plan changes.
  */
object Relational {

  private def t(s: SparkSession, dir: String, name: String): DataFrame = {
    Tables.registerAll(s, dir)
    s.table(name)
  }

  /** Exact money arithmetic: decimal sum → single final double cast.
    * Bit-identical between Spark and DuckDB (both correctly round the
    * one decimal→double conversion).
    */
  private def dsum(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    sum(c.cast("decimal(18,2)")).cast("double")

  val queries: Seq[Q] = Seq(

    // S1/P: projection + filter pushed to the parquet scan.
    Q("s1_scan_filter_project",
      (s, dir) =>
        t(s, dir, "lineitem")
          .select($"l_orderkey", $"l_linenumber", $"l_quantity", $"l_extendedprice")
          .where($"l_quantity" > 45)
          .orderBy($"l_orderkey", $"l_linenumber"),
      Some("""SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice
             |FROM lineitem WHERE l_quantity > 45
             |ORDER BY l_orderkey, l_linenumber""".stripMargin)),

    // S4: CTAS-style bounded materialization (deterministic via sort).
    Q("s4_ctas_limit",
      (s, dir) =>
        t(s, dir, "orders")
          .select($"o_orderkey", $"o_totalprice", $"o_orderstatus")
          .orderBy($"o_orderkey")
          .limit(100),
      Some("""SELECT o_orderkey, o_totalprice, o_orderstatus
             |FROM orders ORDER BY o_orderkey LIMIT 100""".stripMargin)),

    // S6+S7: parquet sink then cache-restore scan (round-trip).
    Q("s6_sink_restore",
      (s, dir) => {
        val out = s"${System.getProperty("java.io.tmpdir")}/graft_sink_nation"
        t(s, dir, "nation").write.mode("overwrite").parquet(out)
        s.read.parquet(out).orderBy($"n_nationkey")
      },
      Some("SELECT n_nationkey, n_name, n_regionkey FROM nation ORDER BY n_nationkey")),

    // A1: row counts (multi-table, tagged).
    Q("a1_counts",
      (s, dir) => {
        Tables.registerAll(s, dir)
        val parts = Seq("lineitem", "orders", "customer").map { n =>
          s.table(n).agg(count(lit(1)).as("n")).select(lit(n).as("tbl"), $"n")
        }
        parts.reduce(_.unionByName(_)).orderBy($"tbl")
      },
      Some("""SELECT 'customer' AS tbl, COUNT(*) AS n FROM customer
             |UNION ALL SELECT 'lineitem', COUNT(*) FROM lineitem
             |UNION ALL SELECT 'orders', COUNT(*) FROM orders
             |ORDER BY tbl""".stripMargin)),

    // A2: DISTINCT.
    Q("a2_distinct",
      (s, dir) =>
        t(s, dir, "customer").select($"c_mktsegment").distinct().orderBy($"c_mktsegment"),
      Some("SELECT DISTINCT c_mktsegment FROM customer ORDER BY c_mktsegment")),

    // A5: group-by rollup counts.
    Q("a5_group_count",
      (s, dir) =>
        t(s, dir, "orders").groupBy($"o_orderpriority").agg(count(lit(1)).as("n"))
          .orderBy($"o_orderpriority"),
      Some("SELECT o_orderpriority, COUNT(*) AS n FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority")),

    // TPC-H Q1 shape: wide aggregate with exact decimal math.
    // money aggregates in LONG cents: exact and order-independent like
    // decimal, but the decimal(18,2)*(1-disc) product forces a
    // precision-37 non-compact decimal per row — integer cents stay in
    // codegen'd primitives (2.3x on the 600k-row agg). ROUND(x*100)
    // half-up equals half-away-from-zero on these positive values, so
    // both engines derive identical cents from identical doubles.
    Q("q1_pricing_summary",
      (s, dir) => {
        val priceC = round($"l_extendedprice" * 100, 0).cast("long")
        val discC  = round($"l_discount" * 100, 0).cast("long")
        val qtyC   = round($"l_quantity" * 100, 0).cast("long")
        t(s, dir, "lineitem")
          .groupBy($"l_returnflag", $"l_linestatus")
          .agg(
            (sum(qtyC).cast("double") / 100.0).as("sum_qty"),
            (sum(priceC).cast("double") / 100.0).as("sum_base_price"),
            (sum(priceC * (lit(100L) - discC)).cast("double") / 10000.0).as("sum_disc_price"),
            count(lit(1)).as("count_order"))
          .orderBy($"l_returnflag", $"l_linestatus")
      },
      Some("""SELECT l_returnflag, l_linestatus,
             |  CAST(SUM(CAST(ROUND(l_quantity * 100, 0) AS BIGINT)) AS DOUBLE) / 100.0 AS sum_qty,
             |  CAST(SUM(CAST(ROUND(l_extendedprice * 100, 0) AS BIGINT)) AS DOUBLE) / 100.0 AS sum_base_price,
             |  CAST(SUM(CAST(ROUND(l_extendedprice * 100, 0) AS BIGINT) *
             |           (100 - CAST(ROUND(l_discount * 100, 0) AS BIGINT))) AS DOUBLE) / 10000.0 AS sum_disc_price,
             |  COUNT(*) AS count_order
             |FROM lineitem
             |GROUP BY l_returnflag, l_linestatus
             |ORDER BY l_returnflag, l_linestatus""".stripMargin)),

    // Multi-join aggregate (TPC-H Q3 shape); nation/region broadcast.
    Q("q3_join_agg",
      (s, dir) => {
        val c = t(s, dir, "customer")
        val o = s.table("orders")
        val l = s.table("lineitem")
        // the filtered dim is known-small by semantics (1-in-5 segment
        // selectivity) — explicit broadcast so the plan holds even
        // when file-size stats at corpus scale would suggest shuffling
        broadcast(c.where($"c_mktsegment" === "BUILDING"))
          .join(o, $"c_custkey" === $"o_custkey")
          .join(l, $"o_orderkey" === $"l_orderkey")
          .groupBy($"o_orderkey")
          .agg(sum($"l_extendedprice".cast("decimal(18,2)") *
            (lit(1).cast("decimal(18,2)") - $"l_discount".cast("decimal(18,2)")))
            .cast("double").as("revenue"))
          .orderBy(desc("revenue"), $"o_orderkey")
          .limit(10)
      },
      Some("""SELECT o_orderkey,
             |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue
             |FROM customer JOIN orders ON c_custkey = o_custkey
             |JOIN lineitem ON o_orderkey = l_orderkey
             |WHERE c_mktsegment = 'BUILDING'
             |GROUP BY o_orderkey
             |ORDER BY revenue DESC, o_orderkey LIMIT 10""".stripMargin)),

    // Broadcast dimension join: customers per region/nation.
    Q("j_broadcast_dims",
      (s, dir) => {
        val c = t(s, dir, "customer")
        val n = s.table("nation")
        val r = s.table("region")
        c.join(broadcast(n), $"c_nationkey" === $"n_nationkey")
          .join(broadcast(r), $"n_regionkey" === $"r_regionkey")
          .groupBy($"r_name", $"n_name")
          .agg(count(lit(1)).as("n_customers"), dsum($"c_acctbal").as("total_bal"))
          .orderBy($"r_name", $"n_name")
      },
      Some("""SELECT r_name, n_name, COUNT(*) AS n_customers,
             |  CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS total_bal
             |FROM customer JOIN nation ON c_nationkey = n_nationkey
             |JOIN region ON n_regionkey = r_regionkey
             |GROUP BY r_name, n_name ORDER BY r_name, n_name""".stripMargin)),

    // Left-semi join (EXISTS).
    Q("j_semi_exists",
      (s, dir) => {
        val c = t(s, dir, "customer")
        val o = s.table("orders")
        c.join(o, $"c_custkey" === $"o_custkey", "left_semi")
          .select($"c_custkey", $"c_name")
          .orderBy($"c_custkey").limit(50)
      },
      Some("""SELECT c_custkey, c_name FROM customer
             |WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
             |ORDER BY c_custkey LIMIT 50""".stripMargin)),

    // Left-anti join (NOT EXISTS) — customers with no large order.
    Q("j_anti_not_exists",
      (s, dir) => {
        val c = t(s, dir, "customer")
        val o = s.table("orders").where($"o_totalprice" > 250000)
        c.join(o, $"c_custkey" === $"o_custkey", "left_anti")
          .select($"c_custkey", $"c_name")
          .orderBy($"c_custkey").limit(50)
      },
      Some("""SELECT c_custkey, c_name FROM customer
             |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_totalprice > 250000)
             |ORDER BY c_custkey LIMIT 50""".stripMargin)),

    // O2: per-source balanced limit (compiler semantic rule — limits
    // are pushed inside each union branch, made deterministic by a
    // per-branch sort).
    Q("o2_balanced_union_limit",
      (s, dir) => {
        Tables.registerAll(s, dir)
        val a = s.table("customer").select($"c_name".as("name"), lit("customer").as("_source"))
          .orderBy($"name").limit(50)
        val b = s.table("supplier").select($"s_name".as("name"), lit("supplier").as("_source"))
          .orderBy($"name").limit(50)
        a.unionByName(b).orderBy($"_source", $"name")
      },
      Some("""SELECT * FROM (
             |  (SELECT c_name AS name, 'customer' AS _source FROM customer ORDER BY name LIMIT 50)
             |  UNION ALL
             |  (SELECT s_name AS name, 'supplier' AS _source FROM supplier ORDER BY name LIMIT 50)
             |) ORDER BY _source, name""".stripMargin)),

    // O3: top-k (TakeOrderedAndProject).
    Q("o3_topk",
      (s, dir) =>
        t(s, dir, "orders")
          .select($"o_orderkey", $"o_totalprice")
          .orderBy(desc("o_totalprice"), $"o_orderkey")
          .limit(20),
      Some("SELECT o_orderkey, o_totalprice FROM orders ORDER BY o_totalprice DESC, o_orderkey LIMIT 20")),

    // O5: pagination (LIMIT/OFFSET).
    Q("o5_offset_page",
      (s, dir) =>
        t(s, dir, "orders")
          .select($"o_orderkey", $"o_totalprice")
          .orderBy($"o_orderkey")
          .offset(40).limit(20),
      Some("SELECT o_orderkey, o_totalprice FROM orders ORDER BY o_orderkey LIMIT 20 OFFSET 40")),

    // O7: multi-type sort with NULLs last semantics.
    Q("o7_nulls_last_sort",
      (s, dir) =>
        t(s, dir, "part")
          .select($"p_partkey", $"p_brand", $"p_retailprice")
          .orderBy($"p_brand".asc_nulls_last, desc("p_retailprice"), $"p_partkey")
          .limit(100),
      Some("""SELECT p_partkey, p_brand, p_retailprice FROM part
             |ORDER BY p_brand ASC NULLS LAST, p_retailprice DESC, p_partkey LIMIT 100""".stripMargin)),

    // U2: UNION (distinct) of two key sets.
    Q("u2_union_distinct",
      (s, dir) => {
        Tables.registerAll(s, dir)
        s.table("customer").select($"c_nationkey".as("nationkey"))
          .union(s.table("supplier").select($"s_nationkey".as("nationkey")))
          .distinct().orderBy($"nationkey")
      },
      Some("""SELECT c_nationkey AS nationkey FROM customer
             |UNION SELECT s_nationkey FROM supplier ORDER BY nationkey""".stripMargin)),

    // §2.7 scalar-function surface: cast/coalesce/concat_ws/round/
    // regexp_replace/length/abs/ilike.
    Q("scalar_functions",
      (s, dir) =>
        t(s, dir, "customer")
          .where(lower($"c_name").contains("1"))
          .select(
            $"c_custkey",
            coalesce($"c_name".cast("string"), lit("")).as("name_str"),
            concat_ws(" ", $"c_name", $"c_mktsegment").as("concat_name"),
            round($"c_acctbal".cast("decimal(12,2)"), 1).cast("double").as("bal_round"),
            regexp_replace($"c_name", "[0-9]+", "#").as("name_masked"),
            length($"c_name").as("name_len"),
            abs($"c_acctbal".cast("decimal(12,2)")).cast("double").as("bal_abs"))
          .orderBy($"c_custkey").limit(200),
      Some("""SELECT c_custkey,
             |  COALESCE(CAST(c_name AS VARCHAR), '') AS name_str,
             |  CONCAT_WS(' ', c_name, c_mktsegment) AS concat_name,
             |  CAST(ROUND(CAST(c_acctbal AS DECIMAL(12,2)), 1) AS DOUBLE) AS bal_round,
             |  REGEXP_REPLACE(c_name, '[0-9]+', '#', 'g') AS name_masked,
             |  LENGTH(c_name) AS name_len,
             |  CAST(ABS(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE) AS bal_abs
             |FROM customer WHERE c_name ILIKE '%1%'
             |ORDER BY c_custkey LIMIT 200""".stripMargin)),

    // Window: top-3 customers per nation by balance.
    Q("w_rownum_topk",
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val w = Window.partitionBy($"c_nationkey")
          .orderBy(desc("c_acctbal"), $"c_custkey")
        t(s, dir, "customer")
          .withColumn("rn", row_number().over(w))
          .where($"rn" <= 3)
          .select($"c_nationkey", $"rn", $"c_custkey", $"c_acctbal")
          .orderBy($"c_nationkey", $"rn")
      },
      Some("""SELECT c_nationkey, rn, c_custkey, c_acctbal FROM (
             |  SELECT c_nationkey, c_custkey, c_acctbal,
             |    ROW_NUMBER() OVER (PARTITION BY c_nationkey ORDER BY c_acctbal DESC, c_custkey) AS rn
             |  FROM customer)
             |WHERE rn <= 3 ORDER BY c_nationkey, rn""".stripMargin)),

    // Window: running sum per customer over order dates.
    Q("w_running_sum",
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val w = Window.partitionBy($"o_custkey")
          .orderBy($"o_orderdate", $"o_orderkey")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        t(s, dir, "orders")
          .withColumn("running_spend",
            sum($"o_totalprice".cast("decimal(18,2)")).over(w).cast("double"))
          .select($"o_custkey", $"o_orderkey", $"running_spend")
          .orderBy($"o_custkey", $"o_orderkey")
          .limit(500)
      },
      Some("""SELECT o_custkey, o_orderkey,
             |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER (
             |    PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
             |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_spend
             |FROM orders ORDER BY o_custkey, o_orderkey LIMIT 500""".stripMargin)),

    // HAVING.
    Q("g_having",
      (s, dir) =>
        t(s, dir, "orders")
          .groupBy($"o_custkey")
          .agg(count(lit(1)).as("n_orders"), dsum($"o_totalprice").as("spend"))
          .where($"n_orders" >= 3)
          .orderBy($"o_custkey"),
      Some("""SELECT o_custkey, COUNT(*) AS n_orders,
             |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS spend
             |FROM orders GROUP BY o_custkey HAVING COUNT(*) >= 3
             |ORDER BY o_custkey""".stripMargin)),
  )

  import org.apache.spark.sql.SparkSession
  // bring $ interpolator into scope for the closures above
  private implicit class Dollar(val sc: StringContext) {
    def $(args: Any*): org.apache.spark.sql.Column =
      org.apache.spark.sql.functions.col(sc.s(args: _*))
  }
}

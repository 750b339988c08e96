package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Replays the DuckDB-generated golden fixture (976 randomized +
  * boundary-sweep cases, tools/gen_slice_fixture.py, DuckDB 1.0)
  * through the DuckListSlice expression and requires byte-identical
  * results — the executable form of "list_slice matches DuckDB".
  */
class DuckListSliceFixtureSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("DuckListSlice matches DuckDB on all fixture cases") {
    DuckFunctions.register(spark)
    val path = getClass.getResource("/duckdb_list_slice_cases.jsonl").getPath
    val cases = spark.read
      .schema("arr array<int>, b int, e int, step int, has_step boolean, expected array<int>")
      .json(path)
      .withColumn("case_id", monotonically_increasing_id())
      .cache()
    try {
      val total = cases.count()
      assert(total == 976L)
      def mismatches(df: org.apache.spark.sql.DataFrame, actualExpr: String) = df
        .withColumn("actual", expr(actualExpr))
        // null-safe inequality: NULL expected must meet NULL actual
        .where(not(col("actual") <=> col("expected")))
        .select("case_id", "arr", "b", "e", "step", "expected", "actual")
      val bad3 = mismatches(cases.where(!col("has_step")), "list_slice(arr, b, e)")
      val bad4 = mismatches(cases.where(col("has_step")), "list_slice(arr, b, e, step)")
      val bad  = bad3.unionByName(bad4).collect()
      assert(bad.isEmpty, s"${bad.length} DuckDB-divergent cases, first: ${bad.headOption}")
    } finally cases.unpersist()
  }
}

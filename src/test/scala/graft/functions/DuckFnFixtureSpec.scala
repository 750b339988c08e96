package graft.functions

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Replays the DuckDB-generated golden fixture for the whole
  * DuckFunctions + DuckSqlShim surface (tools/gen_duckfn_fixture.py,
  * DuckDB 1.0): each case is a DuckDB-dialect scalar expression whose
  * expected value DuckDB itself computed; here it runs through
  * DuckSqlShim.rewrite + spark.sql and must produce the identical
  * value. Batched 40 expressions per statement to keep the replay
  * fast.
  */
class DuckFnFixtureSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.session.timeZone", "UTC")
    .getOrCreate()

  private case class Case(sql: String, typ: String, eL: java.lang.Long,
                          eD: java.lang.Double, eS: String,
                          eB: java.lang.Boolean, isNull: Boolean)

  test("DuckFunctions + shim match DuckDB on all fixture cases") {
    DuckFunctions.register(spark)
    val path = getClass.getResource("/duckdb_fn_cases.jsonl").getPath
    val cases = spark.read
      .schema("sql string, typ string, e_l long, e_d double, e_s string, e_b boolean, is_null boolean")
      .json(path)
      .collect()
      .map(r => Case(r.getString(0), r.getString(1),
        if (r.isNullAt(2)) null else r.getLong(2),
        if (r.isNullAt(3)) null else r.getDouble(3),
        if (r.isNullAt(4)) null else r.getString(4),
        if (r.isNullAt(5)) null else r.getBoolean(5),
        r.getBoolean(6)))
    assert(cases.length == 3402)
    val failures = scala.collection.mutable.ArrayBuffer[String]()
    // cast in-dialect so INT/BIGINT width differences don't trip the
    // typed getters; the cast is value-preserving for every case
    def castOf(c: Case): String = c.typ match {
      case "long" => "BIGINT"; case "double" => "DOUBLE"
      case "bool" => "BOOLEAN"; case _ => "VARCHAR"
    }
    def check(c: Case, row: org.apache.spark.sql.Row, i: Int): Unit = {
      val ok =
        if (c.isNull) row.isNullAt(i)
        else if (row.isNullAt(i)) false
        else c.typ match {
          case "long"   => row.getLong(i) == c.eL
          case "double" =>
            // relative 1e-12: libm transcendentals differ in the last
            // bit and corr/covar use different accumulation orders
            // (Welford vs naive, ~3 ULP); any SEMANTIC divergence
            // (e.g. log10 vs ln) is orders of magnitude larger
            val got  = row.getDouble(i)
            val want = c.eD.doubleValue
            got == want || math.abs(got - want) <= 1e-12 * math.max(1.0, math.abs(want))
          case "bool"   => row.getBoolean(i) == c.eB
          case _        => row.getString(i) == c.eS
        }
      if (!ok) {
        val got = if (row.isNullAt(i)) "NULL" else row.get(i).toString
        val want = if (c.isNull) "NULL"
          else Seq(c.eL, c.eD, c.eS, c.eB).find(_ != null).map(_.toString).getOrElse("?")
        failures += s"${c.sql} -> got $got, duckdb says $want"
      }
    }
    def runOne(c: Case): Unit =
      try {
        val row = spark.sql(graft.compile.DuckSqlShim.rewrite(
          s"SELECT (${c.sql})::${castOf(c)} AS c0")).head()
        check(c, row, 0)
      } catch {
        case e: Exception =>
          failures += s"${c.sql} -> THREW ${e.getMessage.linesIterator.next()}"
      }
    cases.grouped(40).foreach { batch =>
      val sel = batch.zipWithIndex.map { case (c, i) =>
        s"(${c.sql})::${castOf(c)} AS c$i"
      }.mkString(", ")
      try {
        val row = spark.sql(graft.compile.DuckSqlShim.rewrite(s"SELECT $sel")).head()
        batch.zipWithIndex.foreach { case (c, i) => check(c, row, i) }
      } catch {
        // a throwing case poisons its whole batch — isolate per case so
        // every divergence is still reported
        case _: Exception => batch.foreach(runOne)
      }
    }
    assert(failures.isEmpty,
      s"${failures.length} DuckDB-divergent cases:\n  ${failures.take(20).mkString("\n  ")}")
  }
}

package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}

/** SparkSession factory + base-table catalog for the graft engine.
  *
  * The engine is DataFrame/Catalyst-first: every operator is declared
  * through the public `org.apache.spark.sql` API so predicate pushdown,
  * column pruning, partition pruning and whole-stage codegen apply
  * without hand-scheduling. Designed for a multi-executor cluster;
  * tested on local[N].
  */
object Engine {

  /** Build a session with scale-appropriate defaults.
    *
    * - shuffle.partitions sized to the machine, not the 200 default;
    *   on a real cluster AQE coalesces post-shuffle partitions anyway.
    * - AQE on: runtime re-planning (skew join splitting, dynamic
    *   coalescing) is the 100TB safety net for skewed keys.
    */
  def session(master: String = "local[*]", cores: Int = Runtime.getRuntime.availableProcessors()): SparkSession = {
    val spark = SparkSession
      .builder()
      .master(master)
      .appName("graft")
      .config("spark.sql.shuffle.partitions", cores.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.geo.GeoFunctions.register(spark)
    spark
  }

  /** Register graft SQL functions + the grid-join optimizer rule on
    * an externally-created session (e.g. the driver's Verify/Bench
    * sessions). Idempotent.
    */
  def prepare(spark: SparkSession): SparkSession = {
    graft.geo.GeoFunctions.register(spark)
    graft.functions.TextExpressions.register(spark)
    graft.functions.DuckFunctions.register(spark)
    // protects naive user spatial SQL with the grid rewrite even when
    // the session wasn't built withExtensions(new GraftExtensions)
    if (!spark.experimental.extraOptimizations.contains(graft.plans.GridJoinRule))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ graft.plans.GridJoinRule
    spark
  }
}

/** The driver-provided synthetic tables (TESTDATA.md). One parquet file
  * per table under `<sfDir>/<name>.parquet`.
  */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def path(dir: String, name: String): String = s"$dir/$name.parquet"

  def df(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(path(dir, name))

  /** Register every base table as a temp view named after the table.
    * Idempotent; parquet footers only are read at registration time
    * (scans stay lazy), so this is cheap to call per-query.
    *
    * `events.ts` is exposed as a microsecond TIMESTAMP_NTZ regardless
    * of the on-disk physical type: TIMESTAMP(NANOS) parquet (which
    * Spark's vectorized reader rejects) is read as raw nanos via the
    * legacy conf and truncated to µs — the same truncation DuckDB
    * applies reading TIMESTAMP_NS into its µs TIMESTAMP — while µs
    * timestamp columns pass through with only the NTZ cast.
    */
  private val registeredDirs =
    new java.util.concurrent.ConcurrentHashMap[Integer, String]()

  def registerAll(spark: SparkSession, dir: String): Unit = {
    // memoized on the session's CURRENTLY-registered dir: repeated
    // registration costs footer reads + plan invalidation on every
    // query — measurable at the bench scale — but switching dirs MUST
    // re-register (a keep-forever set left the views pointing at the
    // previously-registered dir, which silently turned the
    // EmptyInputSpec zero-row sweep into a single-row sweep for every
    // query after the first)
    val key: Integer = System.identityHashCode(spark)
    if (dir == registeredDirs.get(key)) return
    Engine.prepare(spark)
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val aqe = sys.env.getOrElse("SPARK_GRAFT_AQE", "true")
    spark.conf.set("spark.sql.adaptive.enabled", aqe)
    spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", aqe)
    all.foreach { n =>
      if (new java.io.File(path(dir, n)).exists()) {
        val raw = df(spark, dir, n)
        val v =
          if (n == "events")
            raw.schema("ts").dataType match {
              case org.apache.spark.sql.types.LongType =>
                raw.withColumn("ts",
                  org.apache.spark.sql.functions.timestamp_micros(
                    org.apache.spark.sql.functions.expr("ts div 1000"))
                    .cast("timestamp_ntz"))
              case _ =>
                raw.withColumn("ts",
                  org.apache.spark.sql.functions.col("ts")
                    .cast("timestamp_ntz"))
            }
          else raw
        v.createOrReplaceTempView(n)
      }
    }
    registeredDirs.put(key, dir)
  }
}

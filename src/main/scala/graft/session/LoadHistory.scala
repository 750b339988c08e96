package graft.session

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** `_load_history` append-only load log (reference:
  * src/lib/themes.js:417-440) — one row per theme load with
  * `current_timestamp` stamping, stored as an append-mode parquet
  * dataset.
  */
object LoadHistory {

  final case class Entry(
      key: String,
      release: String,
      bbox: String,
      lim: Long,
      cached: Boolean,
      row_count: Long,
      file_count: Long,
      load_time_ms: Long)

  private def path(dir: String) = s"$dir/_load_history"

  def append(spark: SparkSession, dir: String, e: Entry): Unit = {
    import spark.implicits._
    Seq(e).toDF()
      .withColumn("ts", current_timestamp())
      .write.mode("append").parquet(path(dir))
  }

  def read(spark: SparkSession, dir: String): DataFrame = {
    val f = new java.io.File(path(dir))
    if (!f.exists()) {
      import spark.implicits._
      Seq.empty[Entry].toDF().withColumn("ts", current_timestamp()).limit(0)
    } else spark.read.parquet(path(dir))
  }
}

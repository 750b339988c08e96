package graft.session

import org.apache.spark.sql.SparkSession

/** `_session` key→value persistence (reference:
  * src/lib/sessionState.js:29-68,128-135 — INSERT OR REPLACE, point
  * SELECT, DELETE over a 2-column table).
  *
  * Spark has no primary-key upsert over files, and the table is tiny
  * (≤ a handful of keys), so the idiomatic equivalent is an in-memory
  * map checkpointed by atomically rewriting one parquet dir
  * (write-new + swap, not in-place).
  */
final class SessionState(spark: SparkSession, dir: String) {

  import spark.implicits._

  private val path = s"$dir/_session"
  private var cache: Map[String, String] = loadFromDisk()

  private def loadFromDisk(): Map[String, String] = {
    val f = new java.io.File(path)
    if (!f.exists()) Map.empty
    else
      try spark.read.parquet(path).as[(String, String)].collect().toMap
      catch { case _: Exception => Map.empty }
  }

  /** Write-new + swap: the live dir is renamed aside (not deleted)
    * before the new dir is renamed in, so a crash or failed rename at
    * any point leaves either the old or the new state intact — never
    * neither. Rename results are checked and fail loudly.
    */
  private def checkpoint(): Unit = {
    def rm(f: java.io.File): Unit = {
      if (f.isDirectory) Option(f.listFiles()).foreach(_.foreach(rm))
      f.delete()
    }
    val tmp = new java.io.File(s"$path.tmp")
    val old = new java.io.File(s"$path.old")
    cache.toSeq.toDF("key", "val").coalesce(1).write.mode("overwrite").parquet(tmp.getPath)
    if (old.exists()) rm(old)
    val target = new java.io.File(path)
    if (target.exists() && !target.renameTo(old))
      sys.error(s"session checkpoint: could not move $path aside")
    if (!tmp.renameTo(target)) {
      if (old.exists()) old.renameTo(target) // restore previous state
      sys.error(s"session checkpoint: could not publish ${tmp.getPath} to $path")
    }
    if (old.exists()) rm(old)
  }

  def get(key: String): Option[String] = cache.get(key)

  def set(key: String, value: String): Unit = {
    cache = cache.updated(key, value)
    checkpoint()
  }

  def delete(key: String): Unit = {
    cache = cache - key
    checkpoint()
  }

  def all: Map[String, String] = cache

  def clear(): Unit = { cache = Map.empty; checkpoint() }

  /** Corrupt-JSON resilience (sessionState.test.js:111-122): returns
    * only entries whose value parses with `parse`, skipping the rest.
    */
  def loadParsed[T](parse: String => T): Map[String, T] =
    cache.flatMap { case (k, v) =>
      try Some(k -> parse(v)) catch { case _: Exception => None }
    }
}

package graft.runtime

import java.util.concurrent.atomic.AtomicLong

/** Query-observability surface: per-query wall-clock timing and a ring
  * of the last 20 statuses with 140-char SQL previews (reference:
  * src/lib/queryRunner.js:7-55, pipelineRunner.js:87,138-144).
  */
object QueryRunner {
  final val HistoryCap = 20
  final val PreviewChars = 140
}

final class QueryRunner {

  final case class Status(
      id: Long,
      label: String,
      sqlPreview: String,
      startMs: Long,
      var endMs: Long = -1,
      var ok: Boolean = false,
      var error: Option[String] = None) {
    def durationMs: Long = if (endMs >= 0) endMs - startMs else -1
  }

  private val seq = new AtomicLong(0)
  private var ring: List[Status] = Nil

  def history: Seq[Status] = synchronized(ring.toSeq)

  /** Time an action, record status, propagate result or failure. */
  def run[T](label: String, sql: String)(action: => T): T = {
    val st = Status(seq.incrementAndGet(), label,
      sql.replaceAll("\\s+", " ").take(QueryRunner.PreviewChars),
      System.currentTimeMillis())
    synchronized { ring = (st :: ring).take(QueryRunner.HistoryCap) }
    try {
      val out = action
      st.endMs = System.currentTimeMillis(); st.ok = true
      out
    } catch {
      case e: Throwable =>
        st.endMs = System.currentTimeMillis(); st.ok = false
        st.error = Some(Option(e.getMessage).getOrElse(e.getClass.getName))
        throw e
    }
  }

  /** Wall-clock formatting (themes.js:412-415): <1 s as ms, else 0.1 s
    * precision.
    */
  def formatDuration(ms: Long): String =
    if (ms < 1000) s"${ms}ms" else f"${ms / 1000.0}%.1fs"
}

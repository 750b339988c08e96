package graft.functions

import org.apache.spark.unsafe.types.UTF8String

/** Static string-similarity kernels called from generated code (the
  * GeoKernels pattern): one JVM call per candidate pair, zero
  * allocation on the ASCII fast path (thread-local match buffers,
  * bytes read in place), String fallback for multi-byte input. At
  * blocked-fuzzy-join scale the pair count is the work — a ~25M-pair
  * block sweep runs in seconds, not minutes.
  */
object StringKernels {

  private val tlBuf = new ThreadLocal[Array[Boolean]] {
    override def initialValue(): Array[Boolean] = new Array[Boolean](256)
  }
  private val tlBuf2 = new ThreadLocal[Array[Boolean]] {
    override def initialValue(): Array[Boolean] = new Array[Boolean](256)
  }

  /** Jaro(-Winkler) similarity with DuckDB's parameters (scaling 0.1,
    * max prefix 4, no boost threshold) — byte-for-byte the same scores
    * as DuckDB 1.0 (golden-fixture proven).
    */
  def jaroWinkler(l: UTF8String, r: UTF8String, winkler: Boolean): Double = {
    val la = l.numBytes()
    val lb = r.numBytes()
    // ASCII fast path: one byte per char, compare in place
    if (la == l.numChars() && lb == r.numChars()) {
      jaroAscii(l, la, r, lb, winkler)
    } else {
      jaroChars(l.toString.toCharArray, r.toString.toCharArray, winkler)
    }
  }

  private def buffers(n: Int, m: Int): (Array[Boolean], Array[Boolean]) = {
    var a = tlBuf.get()
    if (a.length < n) { a = new Array[Boolean](Integer.highestOneBit(n) * 2); tlBuf.set(a) }
    var b = tlBuf2.get()
    if (b.length < m) { b = new Array[Boolean](Integer.highestOneBit(m) * 2); tlBuf2.set(b) }
    java.util.Arrays.fill(a, 0, n, false)
    java.util.Arrays.fill(b, 0, m, false)
    (a, b)
  }

  private def finish(matches: Int, transpositions: Int, n: Int, m: Int,
                     prefix: Int, winkler: Boolean): Double = {
    if (matches == 0) return 0.0
    val mm   = matches.toDouble
    val jaro = (mm / n + mm / m + (mm - transpositions / 2.0) / mm) / 3.0
    if (!winkler) jaro else jaro + prefix * 0.1 * (1.0 - jaro)
  }

  private def jaroAscii(l: UTF8String, n: Int, r: UTF8String, m: Int,
                        winkler: Boolean): Double = {
    if (n == 0 && m == 0) return 1.0
    if (n == 0 || m == 0) return 0.0
    val window = math.max(math.max(n, m) / 2 - 1, 0)
    val (aM, bM) = buffers(n, m)
    var matches = 0
    var i = 0
    while (i < n) {
      val c  = l.getByte(i)
      val hi = math.min(m - 1, i + window)
      var j  = math.max(0, i - window)
      var found = false
      while (j <= hi && !found) {
        if (!bM(j) && c == r.getByte(j)) {
          aM(i) = true; bM(j) = true; matches += 1; found = true
        }
        j += 1
      }
      i += 1
    }
    var transpositions = 0
    var k = 0
    i = 0
    while (i < n) {
      if (aM(i)) {
        while (!bM(k)) k += 1
        if (l.getByte(i) != r.getByte(k)) transpositions += 1
        k += 1
      }
      i += 1
    }
    var prefix = 0
    val pMax   = math.min(4, math.min(n, m))
    while (prefix < pMax && l.getByte(prefix) == r.getByte(prefix)) prefix += 1
    finish(matches, transpositions, n, m, prefix, winkler)
  }

  private def jaroChars(a: Array[Char], b: Array[Char], winkler: Boolean): Double = {
    val n = a.length
    val m = b.length
    if (n == 0 && m == 0) return 1.0
    if (n == 0 || m == 0) return 0.0
    val window = math.max(math.max(n, m) / 2 - 1, 0)
    val (aM, bM) = buffers(n, m)
    var matches = 0
    var i = 0
    while (i < n) {
      val c  = a(i)
      val hi = math.min(m - 1, i + window)
      var j  = math.max(0, i - window)
      var found = false
      while (j <= hi && !found) {
        if (!bM(j) && c == b(j)) {
          aM(i) = true; bM(j) = true; matches += 1; found = true
        }
        j += 1
      }
      i += 1
    }
    var transpositions = 0
    var k = 0
    i = 0
    while (i < n) {
      if (aM(i)) {
        while (!bM(k)) k += 1
        if (a(i) != b(k)) transpositions += 1
        k += 1
      }
      i += 1
    }
    var prefix = 0
    val pMax   = math.min(4, math.min(n, m))
    while (prefix < pMax && a(prefix) == b(prefix)) prefix += 1
    finish(matches, transpositions, n, m, prefix, winkler)
  }
}

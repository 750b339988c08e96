package graft.functions

import org.apache.spark.unsafe.types.UTF8String

/** Static string-similarity kernels called from generated code (the
  * GeoKernels pattern): one JVM call per candidate pair, zero
  * allocation on the hot paths (thread-local buffers, bytes read in
  * place). All kernels operate on UTF-8 BYTES, matching DuckDB's
  * string-distance family exactly (its levenshtein('café','cafe') is
  * 2, hamming compares byte positions, jaccard is a byte-set measure —
  * golden-fixture verified). At blocked-fuzzy-join scale the pair
  * count is the work — a ~25M-pair block sweep runs in seconds.
  */
object StringKernels {

  private val tlBuf = new ThreadLocal[Array[Boolean]] {
    override def initialValue(): Array[Boolean] = new Array[Boolean](256)
  }
  private val tlBuf2 = new ThreadLocal[Array[Boolean]] {
    override def initialValue(): Array[Boolean] = new Array[Boolean](256)
  }
  private val tlInts = new ThreadLocal[Array[Int]] {
    override def initialValue(): Array[Int] = new Array[Int](256)
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

  /** Jaro(-Winkler) similarity with DuckDB's parameters (scaling 0.1,
    * max prefix 4, prefix boost applied only when jaro > 0.7 — the
    * rapidfuzz boost threshold DuckDB 1.0 vendors) — byte-for-byte the
    * same scores as DuckDB 1.0. Golden-fixture cases cover both sides
    * of the 0.7 gate (e.g. 'duck'/'delta' = jaro 0.4833 un-boosted
    * despite the shared prefix).
    */
  def jaroWinkler(l: UTF8String, r: UTF8String, winkler: Boolean): Double = {
    val n = l.numBytes()
    val m = r.numBytes()
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
    if (matches == 0) return 0.0
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
    val mm   = matches.toDouble
    val jaro = (mm / n + mm / m + (mm - transpositions / 2.0) / mm) / 3.0
    // rapidfuzz (vendored by DuckDB) gates the Winkler boost on
    // jaro > 0.7; below it the plain Jaro score is returned even when
    // a prefix is shared
    if (!winkler || jaro <= 0.7) return jaro
    var prefix = 0
    val pMax   = math.min(4, math.min(n, m))
    while (prefix < pMax && l.getByte(prefix) == r.getByte(prefix)) prefix += 1
    jaro + prefix * 0.1 * (1.0 - jaro)
  }

  /** Byte-wise Levenshtein distance (two-row DP, thread-local row). */
  def levenshtein(l: UTF8String, r: UTF8String): Int = {
    val n = l.numBytes()
    val m = r.numBytes()
    if (n == 0) return m
    if (m == 0) return n
    var row = tlInts.get()
    if (row.length < m + 1) {
      row = new Array[Int](Integer.highestOneBit(m + 1) * 2); tlInts.set(row)
    }
    var j = 0
    while (j <= m) { row(j) = j; j += 1 }
    var i = 1
    while (i <= n) {
      var prevDiag = row(0)
      row(0) = i
      val ca = l.getByte(i - 1)
      j = 1
      while (j <= m) {
        val cost    = if (ca == r.getByte(j - 1)) 0 else 1
        val newVal  = math.min(math.min(row(j) + 1, row(j - 1) + 1), prevDiag + cost)
        prevDiag = row(j)
        row(j) = newVal
        j += 1
      }
      i += 1
    }
    row(m)
  }

  /** Byte positions that differ; byte lengths must match (DuckDB's
    * "Mismatch Function" contract).
    */
  def hamming(l: UTF8String, r: UTF8String): Long = {
    val n = l.numBytes()
    if (n != r.numBytes())
      throw new IllegalArgumentException("hamming: strings must be of equal length")
    var d = 0L
    var i = 0
    while (i < n) {
      if (l.getByte(i) != r.getByte(i)) d += 1
      i += 1
    }
    d
  }

  /** Jaccard over the SETS of bytes (256-bit bitmaps, no allocation
    * beyond 8 longs). Empty input raises, as DuckDB's does.
    */
  def jaccard(l: UTF8String, r: UTF8String): Double = {
    if (l.numBytes() == 0 || r.numBytes() == 0)
      throw new IllegalArgumentException("jaccard: arguments must not be empty")
    var a0 = 0L; var a1 = 0L; var a2 = 0L; var a3 = 0L
    var b0 = 0L; var b1 = 0L; var b2 = 0L; var b3 = 0L
    var i = 0
    val n = l.numBytes()
    while (i < n) {
      val v = l.getByte(i) & 0xff
      (v >> 6: @annotation.switch) match {
        case 0 => a0 |= 1L << v
        case 1 => a1 |= 1L << (v - 64)
        case 2 => a2 |= 1L << (v - 128)
        case _ => a3 |= 1L << (v - 192)
      }
      i += 1
    }
    val m = r.numBytes()
    i = 0
    while (i < m) {
      val v = r.getByte(i) & 0xff
      (v >> 6: @annotation.switch) match {
        case 0 => b0 |= 1L << v
        case 1 => b1 |= 1L << (v - 64)
        case 2 => b2 |= 1L << (v - 128)
        case _ => b3 |= 1L << (v - 192)
      }
      i += 1
    }
    val inter = java.lang.Long.bitCount(a0 & b0) + java.lang.Long.bitCount(a1 & b1) +
      java.lang.Long.bitCount(a2 & b2) + java.lang.Long.bitCount(a3 & b3)
    val union = java.lang.Long.bitCount(a0 | b0) + java.lang.Long.bitCount(a1 | b1) +
      java.lang.Long.bitCount(a2 | b2) + java.lang.Long.bitCount(a3 | b3)
    if (union == 0) 1.0 else inter.toDouble / union
  }
}

package graft.geo

/** Static entry points for codegen'd geometry predicates, plus a
  * decoded-WKB cache.
  *
  * Generated Java from `StIntersects`/`StDistance` calls these through
  * the object's static forwarders — one static call per row, no
  * virtual `Expression.eval` dispatch, and the enclosing filter/join
  * stage stays inside whole-stage codegen.
  *
  * The cache exists because join probes decode the same WKB bytes over
  * and over: a grid-cell spatial join compares each probe row against
  * every build row in its cell, so a build-side geometry is re-decoded
  * once per probe (and vice versa). A small per-thread LRU keyed on
  * the raw bytes turns that into one parse per (thread, geometry) —
  * thread-local, so zero synchronization on the hot path, and bounded
  * (decoded geometries of typical feature size ≪ 1 MB per thread).
  */
object GeoKernels {

  private final val CacheEntries = 1024

  private val cache =
    new ThreadLocal[java.util.LinkedHashMap[java.nio.ByteBuffer, Geometry]] {
      override def initialValue(): java.util.LinkedHashMap[java.nio.ByteBuffer, Geometry] =
        new java.util.LinkedHashMap[java.nio.ByteBuffer, Geometry](64, 0.75f, true) {
          override def removeEldestEntry(
              e: java.util.Map.Entry[java.nio.ByteBuffer, Geometry]): Boolean =
            size() > CacheEntries
        }
    }

  /** Decode WKB through the per-thread LRU. ByteBuffer.wrap gives
    * content-based equals/hashCode without copying the array. Point
    * WKB (21 bytes) bypasses the cache: a probe-side point is
    * typically unique per row, and parsing two doubles is cheaper
    * than hashing the bytes for a guaranteed miss.
    */
  def decode(wkb: Array[Byte]): Geometry = {
    if (wkb.length <= 25) return Wkb.read(wkb)
    val m = cache.get()
    val k = java.nio.ByteBuffer.wrap(wkb)
    val g = m.get(k)
    if (g != null) g
    else {
      val d = Wkb.read(wkb)
      m.put(k, d)
      d
    }
  }

  def intersects(a: Array[Byte], b: Array[Byte]): Boolean =
    GeoOps.intersects(decode(a), decode(b))

  def distance(a: Array[Byte], b: Array[Byte]): Double =
    GeoOps.distance(decode(a), decode(b))

  def intersection(a: Array[Byte], b: Array[Byte]): Array[Byte] =
    Wkb.write(GeoOps.intersection(decode(a), decode(b)))
}

package graft.functions

import org.apache.spark.unsafe.types.UTF8String
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/** ScalaCheck property pass over the string-distance kernels: the
  * golden fixture pins DuckDB agreement pointwise; these properties
  * cover the space between the points — metric laws (triangle
  * inequality, symmetry, bounds), set identities, and agreement with
  * independent naive reference implementations (full-matrix DP,
  * collection-based set algebra) on random UTF-8 including multibyte
  * and astral-plane input. Deterministic via a fixed ScalaCheck seed.
  */
class StringKernelPropertySpec extends AnyFunSuite {

  private def u(s: String): UTF8String = UTF8String.fromString(s)
  private def bytes(s: String): Array[Byte] = s.getBytes("UTF-8")

  private val genPiece: Gen[String] = Gen.frequency(
    8 -> Gen.alphaNumChar.map(_.toString),
    2 -> Gen.oneOf(" ", ",", "'", "-", "_"),
    2 -> Gen.oneOf("é", "ü", "ß", "Ω", "中", "文", "𐍈", "👍"))
  private val genText: Gen[String] =
    Gen.chooseNum(0, 24).flatMap(n => Gen.listOfN(n, genPiece).map(_.mkString))
  // near-duplicates exercise the interesting region (shared prefixes,
  // small edits) that independent uniform pairs almost never reach
  private val genPair: Gen[(String, String)] = Gen.frequency(
    2 -> genText.flatMap(a => genText.map(b => (a, b))),
    1 -> (for {
      a   <- genText; if a.nonEmpty
      cut <- Gen.chooseNum(0, a.length - 1)
      ins <- genPiece
    } yield (a, a.substring(0, cut) + ins + a.substring(math.min(cut + 1, a.length)))))

  private def check(name: String, p: Prop): Unit = {
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(500)
        .withInitialSeed(Seed(20260813L)), p)
    assert(res.passed, s"$name: $res")
  }

  /** Naive full-matrix byte Levenshtein — O(n·m) memory, trivially
    * auditable, shares no code with the two-row kernel.
    */
  private def refLevenshtein(a: Array[Byte], b: Array[Byte]): Int = {
    val d = Array.ofDim[Int](a.length + 1, b.length + 1)
    for (i <- 0 to a.length) d(i)(0) = i
    for (j <- 0 to b.length) d(0)(j) = j
    for (i <- 1 to a.length; j <- 1 to b.length)
      d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
        d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
    d(a.length)(b.length)
  }

  /** Naive byte Jaro via scala collections (greedy in-window matching,
    * then transposition count over the match sequences).
    */
  private def refJaro(a: Array[Byte], b: Array[Byte]): Double = {
    if (a.isEmpty && b.isEmpty) return 1.0
    if (a.isEmpty || b.isEmpty) return 0.0
    val window = math.max(math.max(a.length, b.length) / 2 - 1, 0)
    val bUsed = Array.fill(b.length)(false)
    val aMatch = scala.collection.mutable.ArrayBuffer[Byte]()
    val aMatchedIdx = scala.collection.mutable.ArrayBuffer[Int]()
    for (i <- a.indices) {
      val lo = math.max(0, i - window)
      val hi = math.min(b.length - 1, i + window)
      val j = (lo to hi).find(j => !bUsed(j) && a(i) == b(j))
      j.foreach { jj => bUsed(jj) = true; aMatch += a(i); aMatchedIdx += jj }
    }
    if (aMatch.isEmpty) return 0.0
    val bMatch = bUsed.zipWithIndex.filter(_._1).map { case (_, j) => b(j) }
    val t = aMatch.zip(bMatch).count { case (x, y) => x != y } / 2.0
    val m = aMatch.length.toDouble
    (m / a.length + m / b.length + (m - t) / m) / 3.0
  }

  test("levenshtein agrees with the full-matrix reference and is a metric") {
    check("lev-vs-ref", Prop.forAll(genPair) { case (a, b) =>
      StringKernels.levenshtein(u(a), u(b)) == refLevenshtein(bytes(a), bytes(b))
    })
    check("lev-symmetry", Prop.forAll(genPair) { case (a, b) =>
      StringKernels.levenshtein(u(a), u(b)) == StringKernels.levenshtein(u(b), u(a))
    })
    check("lev-identity", Prop.forAll(genText) { a =>
      StringKernels.levenshtein(u(a), u(a)) == 0
    })
    check("lev-bounds", Prop.forAll(genPair) { case (a, b) =>
      val (n, m) = (bytes(a).length, bytes(b).length)
      val d = StringKernels.levenshtein(u(a), u(b))
      d >= math.abs(n - m) && d <= math.max(n, m) && (d != 0 || a == b)
    })
    check("lev-triangle", Prop.forAll(genText, genText, genText) { (a, b, c) =>
      StringKernels.levenshtein(u(a), u(c)) <=
        StringKernels.levenshtein(u(a), u(b)) + StringKernels.levenshtein(u(b), u(c))
    })
  }

  test("jaro agrees with the collection reference; winkler boost-gate holds") {
    check("jaro-vs-ref", Prop.forAll(genPair) { case (a, b) =>
      val k = StringKernels.jaroWinkler(u(a), u(b), winkler = false)
      math.abs(k - refJaro(bytes(a), bytes(b))) < 1e-12
    })
    check("jaro-symmetry", Prop.forAll(genPair) { case (a, b) =>
      StringKernels.jaroWinkler(u(a), u(b), winkler = true) ==
        StringKernels.jaroWinkler(u(b), u(a), winkler = true)
    })
    check("jaro-range", Prop.forAll(genPair) { case (a, b) =>
      val j  = StringKernels.jaroWinkler(u(a), u(b), winkler = false)
      val jw = StringKernels.jaroWinkler(u(a), u(b), winkler = true)
      j >= 0.0 && jw <= 1.0 && jw >= j
    })
    check("jaro-identity", Prop.forAll(genText) { a =>
      StringKernels.jaroWinkler(u(a), u(a), winkler = true) == 1.0
    })
    // the rapidfuzz/DuckDB boost threshold: at jaro <= 0.7 the Winkler
    // form IS the Jaro score, shared prefix or not; above it the boost
    // follows the prefix formula exactly
    check("winkler-boost-gate", Prop.forAll(genPair) { case (a, b) =>
      val j  = StringKernels.jaroWinkler(u(a), u(b), winkler = false)
      val jw = StringKernels.jaroWinkler(u(a), u(b), winkler = true)
      val (ba, bb) = (bytes(a), bytes(b))
      val prefix = ba.zip(bb).take(4).takeWhile { case (x, y) => x == y }.length
      if (j <= 0.7) jw == j
      else math.abs(jw - (j + prefix * 0.1 * (1.0 - j))) < 1e-12
    })
  }

  test("jaccard is the byte-set measure; hamming counts differing positions") {
    check("jaccard-vs-sets", Prop.forAll(genPair) { case (a, b) =>
      (a.isEmpty || b.isEmpty) || {
        val (sa, sb) = (bytes(a).toSet, bytes(b).toSet)
        val want = sa.intersect(sb).size.toDouble / sa.union(sb).size
        math.abs(StringKernels.jaccard(u(a), u(b)) - want) < 1e-12
      }
    })
    check("jaccard-identity", Prop.forAll(genText) { a =>
      a.isEmpty || StringKernels.jaccard(u(a), u(a)) == 1.0
    })
    check("jaccard-symmetry", Prop.forAll(genPair) { case (a, b) =>
      (a.isEmpty || b.isEmpty) ||
        StringKernels.jaccard(u(a), u(b)) == StringKernels.jaccard(u(b), u(a))
    })
    check("hamming-vs-zip", Prop.forAll(genPair) { case (a, b) =>
      val (ba, bb) = (bytes(a), bytes(b))
      if (ba.length != bb.length)
        Prop.throws(classOf[IllegalArgumentException])(
          StringKernels.hamming(u(a), u(b)))
      else StringKernels.hamming(u(a), u(b)) ==
        ba.zip(bb).count { case (x, y) => x != y }.toLong
    })
    intercept[IllegalArgumentException](StringKernels.jaccard(u(""), u("a")))
  }
}

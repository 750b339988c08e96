package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import scala.util.Random

/** Property tests for the native text kernels: on randomized strings
  * (ASCII, punctuation runs, unicode incl. astral plane, degenerate
  * whitespace) the kernels must be bit-identical to the declarative
  * HOF formulation they replace, across shingle widths and dedup
  * modes. Deterministic seeded generation, same convention as
  * GeoPropertySpec.
  */
class TextPropertySpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val alphabet: IndexedSeq[String] =
    ('a' to 'z').map(_.toString) ++ ('A' to 'Z').map(_.toString) ++
      ('0' to '9').map(_.toString) ++
      Seq(" ", "  ", "\t", "\n", ".", ",", "!", "-", "_", "'", "\"",
        "é", "ü", "ß", "Ω", "λ", "中", "文", "𐍈", "👍", "́")

  private def genText(r: Random): String = {
    val len = r.nextInt(60)
    (0 until len).map(_ => alphabet(r.nextInt(alphabet.length))).mkString
  }

  test("WordShingles and ShingleHashes match declarative exprs on random input") {
    import spark.implicits._
    val r = new Random(20260812L)
    val texts = ((0 until 400).map(_ => genText(r)) ++ Seq("", " ", " ab c"))
      .toDF("text")
    texts.cache().count()
    for (n <- Seq(1, 2, 3, 4); dedup <- Seq(true, false)) {
      val toks = filter(split(lower(col("text")), "[^a-z0-9]+"), t => length(t) > 0)
      val arr = transform(sequence(lit(0), size(toks) - lit(n)),
        i => concat_ws(" ", slice(toks, i + 1, lit(n))))
      val decl = when(size(toks) >= n, if (dedup) array_distinct(arr) else arr)
        .otherwise(array(concat_ws(" ", toks)))
      val rows = texts.select(col("text"),
          TextExpressions.word_shingles(col("text"), n, dedup).as("k"), decl.as("d"))
        .collect()
      rows.foreach { row =>
        assert(row.getSeq[String](1) == row.getSeq[String](2),
          s"n=$n dedup=$dedup text=${row.getString(0).take(60)}")
      }
      if (!dedup) {
        val hrows = texts.select(col("text"),
            TextExpressions.shingle_hashes(col("text"), n).as("kh"),
            transform(decl, s => conv(substring(md5(s), 1, 15), 16, 10).cast("long")).as("dh"))
          .collect()
        hrows.foreach { row =>
          assert(row.getSeq[Long](1) == row.getSeq[Long](2),
            s"hash n=$n text=${row.getString(0).take(60)}")
        }
      }
    }
    texts.unpersist()
  }

  test("WinnowHashes matches the declarative formulation on random input") {
    import spark.implicits._
    val r = new Random(20260813L)
    val texts = ((0 until 300).map(_ => genText(r)) ++
      Seq("", " ", "abcdefgh", "ab", "!!!", "aa aa aa aa aa aa aa"))
      .toDF("text")
    texts.cache().count()
    for ((k, w) <- Seq((8, 4), (5, 3), (2, 1))) {
      val norm = trim(regexp_replace(lower(col("text")), "[^a-z0-9]+", " "))
      val nGrams = length(norm) - lit(k - 1)
      val hashes = transform(sequence(lit(1), greatest(nGrams, lit(1))),
        i => substring(md5(substring(norm, i, lit(k))), 1, 15))
      val nh = size(hashes)
      val decl = array_sort(array_distinct(transform(
        sequence(lit(1), greatest(nh - lit(w - 1), lit(1))),
        j => array_min(slice(hashes, j, least(lit(w), nh))))))
      val rows = texts.select(col("text"),
          TextExpressions.winnow_hashes(col("text"), k, w).as("kern"), decl.as("decl"))
        .collect()
      rows.foreach { row =>
        assert(row.getSeq[String](1) == row.getSeq[String](2),
          s"k=$k w=$w text=${row.getString(0).take(60)}")
      }
    }
    texts.unpersist()
  }
}

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

  test("LangIdExpr matches the declarative greatest(struct) formulation on random input") {
    import spark.implicits._
    val r = new Random(20260814L)
    // bias towards stopword-bearing text so hits > 0 paths are exercised
    val stop = graft.ops.TextAnalysis.stopwords.values.flatten.toIndexedSeq
    def genDoc(): String = {
      val n = r.nextInt(20)
      (0 until n).map { _ =>
        if (r.nextBoolean()) stop(r.nextInt(stop.length)) else genText(r)
      }.mkString(" ")
    }
    val texts = ((0 until 300).map(_ => genDoc()) ++ Seq("", "la la un de", "the und la"))
      .toDF("text")
    val rows = texts.select(col("text"),
        graft.ops.TextAnalysis.langId(col("text")).as("kern"),
        graft.ops.TextAnalysis.langIdDeclarative(col("text")).as("decl"))
      .collect()
    rows.foreach { row =>
      assert(row.getString(1) == row.getString(2), s"text=${row.getString(0).take(80)}")
    }
  }

  test("TokenStatsExpr matches the declarative quality bundle on random input") {
    import spark.implicits._
    import graft.ops.TextAnalysis
    val r = new Random(20260816L)
    val texts = ((0 until 300).map(_ => genText(r)) ++
      Seq("", " ", "the the of dog", "ONLY CAPS 123", "!!\t\n..", "é中文👍"))
      .toDF("text")
    val t = col("text")
    val decl = texts.select(col("text"),
      TextAnalysis.tokenCount(t).cast("long").as("d_n"),
      TextAnalysis.subwordCountEstimate(t).as("d_sub"),
      struct(TextAnalysis.qualityColumns(t).map { case (n, c) => c.as(n) }: _*).as("d_q"),
      TextAnalysis.tokenStats(t).as("k"))
    decl.collect().foreach { row =>
      val k = row.getStruct(row.fieldIndex("k"))
      val q = row.getStruct(row.fieldIndex("d_q"))
      val tag = s"text=${row.getString(0).take(60)}"
      assert(k.getAs[Long]("n_tokens") == row.getAs[Long]("d_n"), tag)
      assert(k.getAs[Long]("n_subwords_est") == row.getAs[Long]("d_sub"), tag)
      assert(k.getAs[Long]("q_chars") == q.getAs[Long]("q_chars"), tag)
      assert(k.getAs[Double]("q_avg_token_len") == q.getAs[Double]("q_avg_token_len"), tag)
      assert(k.getAs[Double]("q_stopword_ratio") == q.getAs[Double]("q_stopword_ratio"), tag)
      assert(k.getAs[Double]("q_distinct_ratio") == q.getAs[Double]("q_distinct_ratio"), tag)
      assert(k.getAs[Double]("q_punct_ratio") == q.getAs[Double]("q_punct_ratio"), tag)
    }
  }

  test("VecQuantize matches the declarative HOF formulation on random vectors") {
    import spark.implicits._
    val r = new Random(20260815L)
    val vecs = ((0 until 300).map { _ =>
      Array.fill(r.nextInt(16) + 1)((r.nextDouble() - 0.5) * math.pow(10, r.nextInt(6) - 3))
    } ++ Seq(Array(0.0, 0.0), Array(1.0), Array(-1e-12)))
      .zipWithIndex.map { case (v, i) => (i.toLong, v) }.toDF("id", "v")
    val amax = array_max(transform(col("v"), x => abs(x)))
    val declQ = when(amax > 0, transform(col("v"), x => floor(x / amax * lit(127.0) + lit(0.5)).cast("int")))
      .otherwise(transform(col("v"), _ => lit(0)))
    val declS = when(amax > 0, amax / lit(127.0)).otherwise(lit(0.0))
    val rows = vecs.select(col("id"),
        graft.functions.VectorExpressions.vec_quantize(col("v")).as("k"),
        declQ.as("dq"), declS.as("ds"))
      .selectExpr("id", "k.q AS kq", "k.scale AS ks", "dq", "ds")
      .collect()
    rows.foreach { row =>
      assert(row.getSeq[Int](1) == row.getSeq[Int](3), s"id=${row.getLong(0)}")
      assert(row.getDouble(2) == row.getDouble(4), s"id=${row.getLong(0)}")
    }
  }

  test("SimHashExpr matches the two-shuffle declarative formulation on random input") {
    import spark.implicits._
    val r = new Random(20260817L)
    val texts = ((0 until 200).map(i => (i.toLong, genText(r))) ++
      Seq((990L, ""), (991L, "the the the"), (992L, "a b c d e f g")))
      .toDF("doc_id", "text")
    for (bits <- Seq(64, 32)) {
      val kern = graft.ops.Dedup.simhash(texts, "doc_id", "text", bits)
        .collect().map(rw => rw.getLong(0) -> rw.getString(1)).toMap
      val decl = graft.ops.Dedup.simhashDeclarative(texts, "doc_id", "text", bits)
        .collect().map(rw => rw.getLong(0) -> rw.getString(1)).toMap
      // the declarative form drops zero-token docs (no rows to group);
      // the kernel emits the all-zero fingerprint for them
      decl.foreach { case (id, d) => assert(kern(id) == d, s"bits=$bits id=$id") }
      (kern.keySet -- decl.keySet).foreach { id =>
        assert(kern(id) == "0" * bits, s"bits=$bits id=$id empty-doc fingerprint")
      }
    }
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

  test("RepetitionStatsExpr matches the declarative formulation on random input") {
    import spark.implicits._
    val r = new Random(20260814L)
    val texts = ((0 until 400).map(_ => genText(r)) ++
      Seq("", " ", "a", "a a", "a a b", "go go go go", "x y z x y z x y"))
      .toDF("text")
    texts.cache().count()
    val rows = texts.select(col("text"),
        TextExpressions.repetition_stats(col("text")).as("kern"),
        graft.ops.TextAnalysis.repetitionStatsDeclarative(col("text")).as("decl"))
      .collect()
    rows.foreach { row =>
      val k = row.getStruct(1)
      val d = row.getStruct(2)
      // exact equality: both sides are integer-derived double divisions
      assert((0 until 5).forall(i => k.get(i) == d.get(i)),
        s"text=${row.getString(0).take(60)} kern=$k decl=$d")
    }
    texts.unpersist()
  }

  test("BpeEncodeExpr matches the declarative chained-replace formulation on random input") {
    import spark.implicits._
    val r = new Random(20260815L)
    val texts = ((0 until 300).map(_ => genText(r)) ++
      Seq("", " ", "aaaa", "abab abba", "banana bandana", "xxxxxx"))
      .toDF("text")
    texts.cache().count()
    // merge lists exercising cascades (later rules over earlier merged
    // symbols) and same-rule repeats ("a a" on runs)
    val mergeLists = Seq(
      Seq("a" -> "a"),
      Seq("a" -> "b", "ab" -> "a", "b" -> "a"),
      Seq("a" -> "n", "b" -> "an", "ban" -> "an", "x" -> "x", "xx" -> "xx"),
      Seq("1" -> "2", "e" -> "r", "t" -> "h"))
    mergeLists.foreach { merges =>
      val rows = texts.select(col("text"),
          graft.functions.TextExpressions.bpe_encode(col("text"), merges).as("kern"),
          graft.ops.Bpe.encodeSubwordsDeclarative(col("text"), merges).as("decl"))
        .collect()
      rows.foreach { row =>
        assert(row.getSeq[String](1) == row.getSeq[String](2),
          s"merges=$merges text=${row.getString(0).take(60)} " +
            s"kern=${row.getSeq[String](1)} decl=${row.getSeq[String](2)}")
      }
    }
    texts.unpersist()
  }
}

package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Property pass over the corpus scorers. The DuckDB golden gate pins
  * values pointwise on the driver data; these properties cover the
  * contracts between the points:
  *
  *  1. bit-stability under repartitioning and row order — the
  *     12-dp-round → DECIMAL-sum pipeline's order-independence claim,
  *     tested end to end rather than argued;
  *  2. agreement of the unigram LM with an independent plain-Scala
  *     reference that replicates the documented rounding pipeline.
  *
  * Corpora are seeded-random with mixed case, punctuation runs and
  * empty documents, so the tokenizer edges participate.
  */
class ScorerPropertySpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.session.timeZone", "UTC")
    .getOrCreate()

  import spark.implicits._

  private val vocab = Vector("a", "bb", "ccc", "data", "spark", "the",
    "of", "x1", "y2", "zz", "table", "row")

  private def corpus(seed: Int, nDocs: Int): Seq[(Long, String)] = {
    val r = new scala.util.Random(seed)
    val seps = Vector(" ", "  ", ", ", "! ", " - ", "\t")
    (1L to nDocs.toLong).map { i =>
      val n = r.nextInt(13) // includes 0 → empty doc
      val txt = (0 until n).map { _ =>
        val w = vocab(r.nextInt(vocab.size))
        (if (r.nextInt(5) == 0) w.toUpperCase else w) + seps(r.nextInt(seps.size))
      }.mkString
      (i, txt)
    }
  }

  private def canon(df: DataFrame): Seq[String] =
    df.collect().map(_.toString).sorted.toSeq

  test("scorers are bit-stable under repartitioning and row order") {
    for (seed <- 1 to 5) {
      val rows = corpus(seed, 6 + seed)
      val base = rows.toDF("doc_id", "text")
      val shuf = rows.reverse.toDF("doc_id", "text").repartition(7)
      val tgtB = base.where($"doc_id" % 3 === 0)
      val tgtS = shuf.where($"doc_id" % 3 === 0)
      val cases: Seq[(String, DataFrame, DataFrame)] = Seq(
        ("tfidf",
          TextAnalysis.tfIdfTopTerms(base, "doc_id", "text"),
          TextAnalysis.tfIdfTopTerms(shuf, "doc_id", "text")),
        ("unigram-ppl",
          TextAnalysis.lmPerplexity(base, "doc_id", "text"),
          TextAnalysis.lmPerplexity(shuf, "doc_id", "text")),
        ("bigram-ppl",
          TextAnalysis.bigramPerplexity(base, "doc_id", "text"),
          TextAnalysis.bigramPerplexity(shuf, "doc_id", "text")),
        ("dsir",
          TextAnalysis.dsirLogWeights(base, tgtB, "doc_id", "text", buckets = 64),
          TextAnalysis.dsirLogWeights(shuf, tgtS, "doc_id", "text", buckets = 64)),
        ("dsir-resample",
          TextAnalysis.dsirResample(base, tgtB, "doc_id", "text", k = 3, buckets = 64),
          TextAnalysis.dsirResample(shuf, tgtS, "doc_id", "text", k = 3, buckets = 64)))
      cases.foreach { case (name, a, b) =>
        assert(canon(a) == canon(b), s"$name diverged under repartition (seed=$seed)")
      }
    }
  }

  /** Independent unigram-LM reference: plain Scala collections, same
    * documented pipeline — per-class contribution rounded to 12 dp,
    * exact decimal sum, single final double cast, 6-dp rounds.
    */
  private def refPpl(docs: Seq[(Long, String)]): Map[Long, (Long, Double, Double)] = {
    import java.math.{BigDecimal => JBD, RoundingMode}
    def toks(s: String): Seq[String] =
      s.toLowerCase.split("[^a-z0-9]+").filter(_.nonEmpty).toSeq
    def r(x: Double, scale: Int): JBD =
      JBD.valueOf(x).setScale(scale, RoundingMode.HALF_UP)
    val all = docs.flatMap { case (_, t) => toks(t) }
    val cnt = all.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    val T = all.size.toLong
    val V = cnt.size.toLong
    docs.flatMap { case (id, t) =>
      val tk = toks(t)
      if (tk.isEmpty) None
      else {
        val tf = tk.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
        val slp = tf.map { case (w, m) =>
          r(m * math.log((cnt(w) + 1.0) / (T + V)), 12)
        }.reduce(_.add(_)).doubleValue
        val n = tk.size.toLong
        val nll = -slp / n
        Some(id -> ((n, r(nll, 6).doubleValue, r(math.exp(nll), 6).doubleValue)))
      }
    }.toMap
  }

  test("unigram LM agrees with the plain-Scala reference on random corpora") {
    for (seed <- 10 to 17) {
      val rows = corpus(seed, 8)
      val got = TextAnalysis.lmPerplexity(rows.toDF("doc_id", "text"), "doc_id", "text")
        .collect()
        .map(x => x.getAs[Long]("doc_id") ->
          ((x.getAs[Long]("n_tokens"), x.getAs[Double]("avg_nll"), x.getAs[Double]("ppl"))))
        .toMap
      assert(got == refPpl(rows), s"unigram LM mismatch (seed=$seed)")
    }
  }

  test("PQ ADC agrees with a plain-Scala reference across seeds and geometries") {
    for ((seed, m) <- Seq((11, 1), (12, 2), (13, 4))) {
      val r = new scala.util.Random(seed)
      val n = 28 + r.nextInt(12)
      val raw = (0L until n.toLong).map { i =>
        i -> Array.fill(8)((r.nextInt(200) - 100) / 100.0f)
      }
      val vecs = raw.toDF("vec_id", "embedding")
      val cb = Similarity.trainPqCodebooks(vecs, "vec_id", "embedding",
        dims = 8, m = m, k = 3, iters = 2)
      val books = cb.collect().map(x => (x.getLong(0), x.getLong(1)) ->
        x.getSeq[Double](2).toArray).toMap
      val enc = Similarity.pqEncode(vecs, "vec_id", "embedding", cb)
        .collect().map(x => x.getAs[Long]("vec_id") ->
          x.getSeq[Long](x.fieldIndex("codes"))).toMap
      val w = 8 / m
      def dot(a: Array[Double], b: Array[Double]) =
        a.zip(b).map { case (x, y) => x * y }.sum
      val rawD = raw.toMap.view.mapValues(_.map(_.toDouble)).toMap
      // encode property: every code is the cosine-argmax centroid of
      // its slice (ties to the larger index)
      enc.foreach { case (id, codes) =>
        (0 until m).foreach { j =>
          val sub = rawD(id).slice(j * w, j * w + w)
          val best = (0 until 3).map { ci =>
            val cv = books((j.toLong, ci.toLong))
            (dot(sub, cv) / (math.sqrt(dot(sub, sub)) * math.sqrt(dot(cv, cv))), ci)
          }.maxBy(x => (x._1, x._2))._2
          assert(codes(j) == best.toLong,
            s"seed=$seed m=$m id=$id sub=$j: code ${codes(j)} != argmax $best")
        }
      }
      // ADC property: pqTopK equals the reference ranking computed
      // from the collected codes and codebooks alone
      val q0 = raw.head._1
      val got = Similarity.pqTopK(vecs, vecs.where($"vec_id" === q0),
          "vec_id", "embedding", cb, k = 7)
        .collect().map(x => x.getAs[Int]("rank") -> x.getAs[Long]("nn_id")).toMap
      val qv = rawD(q0); val qn = math.sqrt(dot(qv, qv))
      val ref = rawD.keys.filter(_ != q0).map { v =>
        val num = (0 until m).map(j => dot(qv.slice(j * w, j * w + w),
          books((j.toLong, enc(v)(j))))).sum
        val vn2 = (0 until m).map(j => dot(books((j.toLong, enc(v)(j))),
          books((j.toLong, enc(v)(j))))).sum
        v -> num / (qn * math.sqrt(vn2))
      }.toSeq.sortBy { case (id, c) => (-c, id) }.take(7)
        .zipWithIndex.map { case ((id, _), i) => (i + 1) -> id }.toMap
      assert(got == ref, s"seed=$seed m=$m: ADC ranking mismatch")
    }
  }
}

package graft.ops

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class RetrievalSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.session.timeZone", "UTC")
    .getOrCreate()

  import spark.implicits._

  private lazy val docs = Seq(
    (1L, "spark query engine for big data"),
    (2L, "spark spark spark tuning guide"),
    (3L, "a cook book of pasta recipes"),
    (4L, "query planning in database engines"),
    (5L, "gardening tips for dry climates")
  ).toDF("doc_id", "text")

  private lazy val emb = Seq(
    (1L, Array(1.0f, 0.0f, 0.0f)),
    (2L, Array(0.9f, 0.1f, 0.0f)),
    (3L, Array(0.0f, 1.0f, 0.0f)),
    (4L, Array(0.7f, 0.7f, 0.0f)),
    (5L, Array(0.0f, 0.0f, 1.0f))
  ).toDF("vec_id", "embedding")

  test("bm25: only matching docs scored, rarer term outweighs common tf") {
    val scored = Retrieval.bm25Scores(docs, "doc_id", "text", Seq("spark", "query"))
      .collect().map(r => r.getAs[Long]("id") -> r.getAs[Double]("_score")).toMap
    // docs 3 and 5 contain neither term — never scored
    assert(scored.keySet == Set(1L, 2L, 4L))
    assert(scored.values.forall(_ > 0.0))
    // doc 1 matches BOTH terms and beats the single-term matches
    assert(scored(1L) > scored(2L) && scored(1L) > scored(4L))
  }

  test("hybrid RRF: fuses both rank lists, k-bounded, plan passes the gate") {
    val res = Retrieval.hybridTopK(docs, emb, Seq("spark", "query"),
      emb.where($"vec_id" === 1), k = 3)
    assert(graft.plans.PlanGate.violations(res).isEmpty)
    val rows = res.collect()
    assert(rows.length <= 3)
    val byId = rows.map(r => r.getAs[Long]("id") -> r).toMap
    // doc 1: lexical rank 1 (matches both terms) and dense rank 1
    // (cosine 1.0 with itself) → rrf = 2/(60+1), and nothing can beat it
    val top = rows.maxBy(_.getAs[Double]("rrf_score"))
    assert(top.getAs[Long]("id") == 1L)
    assert(math.abs(top.getAs[Double]("rrf_score") - 2.0 / 61.0) < 1e-12)
    // a doc present in only one list still surfaces with one rrf term
    byId.get(2L).foreach { r =>
      val rb = Option(r.getAs[Integer]("r_bm25"))
      val rc = Option(r.getAs[Integer]("r_cos"))
      assert(rb.isDefined || rc.isDefined)
    }
  }

  test("zero-norm embedding scores null cosine and never enters the dense top-k") {
    val embZ = emb.union(Seq((9L, Array(0.0f, 0.0f, 0.0f))).toDF("vec_id", "embedding"))
    val cs = Retrieval.cosineScores(embZ, "vec_id", "embedding", embZ.where($"vec_id" === 1))
      .collect().map(r => r.getAs[Long]("id") -> Option(r.get(1))).toMap
    assert(cs(9L).isEmpty) // null, not NaN — NaN would sort above rank 1
    val res = Retrieval.hybridTopK(docs, embZ, Seq("spark"),
      embZ.where($"vec_id" === 1), k = 3).collect()
    assert(!res.exists(_.getAs[Long]("id") == 9L))
    assert(res.head.getAs[Long]("id") == 1L) // the true best still wins
  }

  test("bm25 model scoring: matches the postings form, annotates non-matches") {
    val model = Retrieval.bm25Model(docs, "doc_id", "text", Seq("spark", "query"))
    val scored = Retrieval.scoreWithBm25Model(docs, model)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Double]("_score"), r.getAs[Boolean]("matched")))).toMap
    // every input row survives (annotate, never filter)
    assert(scored.keySet == Set(1L, 2L, 3L, 4L, 5L))
    assert(!scored(3L)._2 && scored(3L)._1 == 0.0)
    assert(!scored(5L)._2 && scored(5L)._1 == 0.0)
    // matched rows agree with the postings/shuffle form to 6 dp
    val postings = Retrieval.bm25Scores(docs, "doc_id", "text", Seq("spark", "query"))
      .collect().map(r => r.getAs[Long]("id") -> r.getAs[Double]("_score")).toMap
    assert(postings.keySet == scored.filter(_._2._2).keySet)
    postings.foreach { case (id, s) =>
      assert(math.abs(s - scored(id)._1) < 1e-6, s"doc $id: $s vs ${scored(id)._1}")
    }
    // the model row is bounded by the query, not the corpus
    val m = model.head()
    assert(m.getAs[Seq[String]]("bm_terms").toSet == Set("spark", "query"))
  }

  test("hybrid RRF: missing-list rank contributes zero, ties break by id") {
    // query vector orthogonal to everything except docs 3 → dense list
    // is {3 first}; lexical list is {2} ("tuning") — doc 2 and doc 3
    // each appear in exactly one list at rank 1 → identical rrf, and
    // the id tiebreak puts 2 before 3
    val res = Retrieval.hybridTopK(docs, emb, Seq("tuning"),
      emb.where($"vec_id" === 3), k = 2).collect()
    assert(res.length == 2)
    assert(res(0).getAs[Long]("id") == 2L && res(1).getAs[Long]("id") == 3L)
    assert(res(0).getAs[Double]("rrf_score") == res(1).getAs[Double]("rrf_score"))
  }
}

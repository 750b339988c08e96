package graft.session

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.ArrowBridge
import org.scalatest.funsuite.AnyFunSuite

/** Arrow result handoff: chunks must round-trip through Spark's own
  * converters AND parse with the plain arrow-java stream reader (the
  * consumer contract — downstream tooling never sees Spark).
  */
class ArrowExportSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.session.timeZone", "UTC")
    .getOrCreate()

  import spark.implicits._

  private lazy val df = Seq(
    (1L, "alpha", 1.5, Seq(1.0, 2.0), Some("x")),
    (2L, "beta", -0.25, Seq(3.0), None),
    (3L, "γ unicode", 0.0, Seq.empty[Double], Some("z"))
  ).toDF("id", "name", "score", "vec", "opt")

  test("round-trip: DataFrame -> Arrow chunks -> DataFrame preserves rows and schema") {
    val chunks = ArrowBridge.toArrowBatches(df, maxRecordsPerBatch = 2)
    assert(chunks.length >= 2) // 3 rows at 2/batch → ≥2 chunks
    val back = ArrowBridge.fromArrowBatches(spark, chunks.iterator)
    assert(back.schema == df.schema)
    assert(back.collect().map(_.toString).sorted.toSeq ==
      df.collect().map(_.toString).sorted.toSeq)
  }

  test("chunks parse with the plain arrow-java stream reader") {
    val chunks = ArrowBridge.toArrowBatches(df.select($"id", $"name"), 100)
    assert(chunks.nonEmpty)
    val alloc = new org.apache.arrow.memory.RootAllocator(Long.MaxValue)
    try {
      var rows = 0
      val names = scala.collection.mutable.Set[String]()
      chunks.foreach { bytes =>
        val reader = new org.apache.arrow.vector.ipc.ArrowStreamReader(
          new java.io.ByteArrayInputStream(bytes), alloc)
        try {
          val root = reader.getVectorSchemaRoot
          assert(root.getSchema.getFields.size() == 2)
          while (reader.loadNextBatch()) {
            rows += root.getRowCount
            val nameVec = root.getVector("name")
              .asInstanceOf[org.apache.arrow.vector.VarCharVector]
            (0 until root.getRowCount).foreach { i =>
              names += new String(nameVec.get(i), java.nio.charset.StandardCharsets.UTF_8)
            }
          }
        } finally reader.close()
      }
      assert(rows == 3)
      assert(names == Set("alpha", "beta", "γ unicode"))
    } finally alloc.close()
  }

  test("timestamp columns survive the round-trip") {
    val t = spark.sql(
      "SELECT timestamp_micros(1700000000123456) AS ts, CAST('2024-01-15' AS DATE) AS d")
    val chunks = ArrowBridge.toArrowBatches(t, 10)
    val back = ArrowBridge.fromArrowBatches(spark, chunks.iterator)
    assert(back.schema == t.schema)
    assert(back.head() == t.head())
  }

  test("empty result produces a schema-only stream that round-trips") {
    val empty = df.where(lit(false))
    val chunks = ArrowBridge.toArrowBatches(empty, 10)
    val back = ArrowBridge.fromArrowBatches(spark, chunks.iterator)
    assert(back.schema == df.schema)
    assert(back.count() == 0)
  }
}

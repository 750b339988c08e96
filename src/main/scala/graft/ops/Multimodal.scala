package graft.ops

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing: images/audio/video ride through the
  * engine as opaque `binary` columns with a typed metadata struct;
  * decode / feature-extraction / resize / frame-sampling run as
  * partition-local batch transforms.
  *
  * The actual codec calls are STUBBED (no image/audio libraries in
  * this build — see `decodeStub`): each stub is a deterministic fake
  * with the real signature, batch shape and schema, so swapping in a
  * real decoder is a one-function change. The Spark-side plumbing —
  * schema, partitioning, per-partition batching — is real and tested.
  */
object Multimodal {

  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType),
    StructField("content", BinaryType),
    StructField("meta", StructType(Seq(
      StructField("format", StringType),
      StructField("width", IntegerType),
      StructField("height", IntegerType),
      StructField("n_frames", IntegerType))))))

  /** Synthesize a deterministic media table from any corpus: content
    * bytes are the UTF-8 of md5(text) (stable across engines), meta
    * derives from id arithmetic.
    */
  def syntheticMedia(docs: DataFrame, idCol: String = "doc_id", textCol: String = "text"): DataFrame =
    docs.select(
      col(idCol).cast("long").as("media_id"),
      encode(md5(col(textCol)), "UTF-8").as("content"),
      struct(
        when(col(idCol) % 3 === 0, "png").when(col(idCol) % 3 === 1, "jpeg").otherwise("webp").as("format"),
        (col(idCol) % 640 + 32).cast("int").as("width"),
        (col(idCol) % 480 + 32).cast("int").as("height"),
        (col(idCol) % 30 + 1).cast("int").as("n_frames")).as("meta"))

  /** STUB decode: a real implementation would parse `content` with an
    * image codec; the stub "decodes" to the mean byte value — the
    * plumbing (binary in, fixed-width features out, partition-local,
    * no shuffle) is exactly what a mapInPandas/mapPartitions decoder
    * needs at scale.
    */
  def decodeStub(content: Array[Byte]): Array[Double] = {
    if (content == null || content.isEmpty) Array(0.0, 0.0)
    else {
      var sum = 0L; var i = 0
      while (i < content.length) { sum += content(i) & 0xff; i += 1 }
      Array(sum.toDouble / content.length, content.length.toDouble)
    }
  }

  /** Feature extraction over the media table. The stub decode is pure
    * column expressions (mean byte via a fold over the hex encoding),
    * so the query stays in DataFrame land — Catalyst-planned, AQE'd,
    * never dropping to an RDD for what is plain arithmetic. A real
    * codec goes through `extractFeaturesWithDecoder` below.
    */
  def extractFeatures(media: DataFrame): DataFrame = {
    val h = lower(hex(col("content")))
    val n = (length(h) / lit(2)).cast("int")
    val byteSum = aggregate(
      when(n > lit(0), sequence(lit(0), n - lit(1))).otherwise(expr("array()")),
      lit(0L),
      (acc, i) => acc + conv(h.substr(i * lit(2) + lit(1), lit(2)), 16, 10).cast("long"))
    media
      .withColumn("f_mean_byte",
        when(col("content").isNull || n === lit(0), lit(0.0))
          .otherwise(byteSum.cast("double") / n.cast("double")))
      .withColumn("f_n_bytes",
        when(col("content").isNull, lit(0.0)).otherwise(n.cast("double")))
      .drop("content")
  }

  /** The real-codec slot: partition-local batch transform
    * (mapPartitions — one JVM-side batch per partition, the Scala
    * analogue of mapInPandas batches). Pass the actual decoder (image/
    * audio library call) as `decode`; `decodeStub` is the default fake.
    */
  def extractFeaturesWithDecoder(media: DataFrame,
                                 decode: Array[Byte] => Array[Double] = decodeStub): DataFrame = {
    val spark = media.sparkSession
    val outSchema = StructType(media.schema.fields.filter(_.name != "content") ++ Seq(
      StructField("f_mean_byte", DoubleType),
      StructField("f_n_bytes", DoubleType)))
    val rdd = media.rdd.mapPartitions { it =>
      it.map { r =>
        val content = r.getAs[Array[Byte]]("content")
        val fs = decode(content)
        Row.fromSeq(r.toSeq.patch(r.fieldIndex("content"), Nil, 1) ++ fs.toSeq)
      }
    }
    spark.createDataFrame(rdd, outSchema)
  }

  /** Frame sampling: byte-range slices standing in for frame decode —
    * the schema (media_id, frame_idx, frame_bytes) and the explode
    * shape are the real contract.
    */
  def sampleFrames(media: DataFrame, everyN: Int = 10): DataFrame =
    media
      .withColumn("frame_idx",
        explode(sequence(lit(0),
          greatest(floor((col("meta.n_frames") - 1) / lit(everyN)).cast("int"), lit(0)))))
      .withColumn("frame_bytes",
        // STUB: slice of the content as a fake frame payload
        expr(s"substring(content, frame_idx * 4 + 1, 4)"))
      .select("media_id", "frame_idx", "frame_bytes")

  /** Resize metadata transform (pure-metadata stub: a real resize
    * would re-encode content; dims math is the verifiable part).
    */
  def resizeMeta(media: DataFrame, maxDim: Int): DataFrame = {
    val scale = least(
      lit(maxDim).cast("double") / col("meta.width"),
      lit(maxDim).cast("double") / col("meta.height"),
      lit(1.0))
    media.withColumn("meta",
      struct(
        col("meta.format").as("format"),
        floor(col("meta.width") * scale).cast("int").as("width"),
        floor(col("meta.height") * scale).cast("int").as("height"),
        col("meta.n_frames").as("n_frames")))
  }
}

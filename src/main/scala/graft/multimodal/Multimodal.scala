package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.catalyst.encoders.RowEncoder
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal columns at 100 TB: media (image/audio/video) is an opaque
  * BINARY payload column + a typed metadata struct; decode/resize/
  * feature-extract run as PARTITION-WISE batch functions
  * (`mapPartitions`) so per-partition setup (codec init, model load) is
  * amortized over thousands of rows — the Scala analogue of
  * `mapInPandas`. Everything Spark-side (schemas, batch shape,
  * partition-wise init, explode fan-out) is real; only the codec call
  * itself is stubbed (STUB markers below) because no image/audio
  * libraries exist in this environment. Swapping a real decoder in
  * changes one function body and nothing else.
  */
object Multimodal {

  /** Typed metadata carried alongside every payload. */
  val MediaMetaType: StructType = StructType(Seq(
    StructField("format", StringType),
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("n_frames", IntegerType)))

  val MediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType),
    StructField("payload", BinaryType),
    StructField("meta", MediaMetaType)))

  /** Decoded per-media features. */
  val FeatureSchema: StructType = StructType(Seq(
    StructField("media_id", LongType),
    StructField("format", StringType),
    StructField("n_bytes", IntegerType),
    StructField("mean_byte", DoubleType),
    StructField("embedding", ArrayType(FloatType, containsNull = false))))

  /** STUB decoder — a deterministic stand-in for an image/audio codec.
    * Real implementation would parse `payload` with the codec matching
    * `format`; the fake derives features from the raw bytes so tests
    * are reproducible. The *interface* (bytes → features, constructed
    * once per partition) is the production shape.
    */
  class StubDecoder extends Serializable {
    def decode(payload: Array[Byte]): (Double, Array[Float]) = {
      // STUB: mean byte value as "brightness", 8-dim byte-histogram
      // sketch as "embedding" — replace with real codec + model call
      var sum = 0L
      val hist = new Array[Float](8)
      var i = 0
      while (i < payload.length) {
        val b = payload(i) & 0xff
        sum += b
        hist(b >>> 5) += 1f
        i += 1
      }
      val mean = if (payload.length == 0) 0.0 else sum.toDouble / payload.length
      (mean, hist)
    }
  }

  /** Wrap a text/bytes table into the canonical media frame (in real
    * ingestion the payload arrives as binary files via
    * `spark.read.format("binaryFile")` or parquet BINARY).
    */
  def asMedia(df: DataFrame, idCol: String, payloadCol: String): DataFrame =
    df.select(
      col(idCol).cast(LongType).as("media_id"),
      col(payloadCol).cast(BinaryType).as("payload"),
      struct(
        element_at(typedLit(Seq("jpeg", "png", "webp")),
          (col(idCol) % 3).cast(IntegerType) + 1).as("format"),
        (octet_length(col(payloadCol).cast(BinaryType)) % 640 + 32).as("width"),
        ((octet_length(col(payloadCol).cast(BinaryType)) * 7) % 480 + 32).as("height"),
        ((col(idCol) % 30) + 1).cast(IntegerType).as("n_frames")).as("meta"))

  /** Partition-wise decode + feature extraction: ONE decoder per
    * partition (init amortization — the reason this is mapPartitions
    * and not a per-row UDF), rows streamed through it lazily (no
    * partition-sized materialization).
    */
  def decodeFeatures(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    val enc = RowEncoder.encoderFor(FeatureSchema)
    media.select(col("media_id"), col("payload"), col("meta.format").as("format"))
      .mapPartitions { rows =>
        val decoder = new StubDecoder // per-partition, NOT per-row
        rows.map { r =>
          val payload = r.getAs[Array[Byte]]("payload")
          val (mean, emb) = decoder.decode(payload)
          Row(r.getAs[Long]("media_id"), r.getAs[String]("format"),
            payload.length, mean, emb.toSeq)
        }
      }(enc)
  }

  /** "Resize": payload-transform plumbing — new payload bytes + updated
    * metadata in one pass. STUB scales the byte array; a real resize
    * calls the codec.
    */
  def resize(media: DataFrame, w: Int, h: Int): DataFrame = {
    val enc = RowEncoder.encoderFor(MediaSchema)
    media.mapPartitions { rows =>
      val decoder = new StubDecoder
      rows.map { r =>
        val payload = r.getAs[Array[Byte]]("payload")
        val meta = r.getAs[Row]("meta")
        // STUB: proportional byte truncation/padding stands in for
        // an actual pixel resample
        val outLen = math.max(1,
          (payload.length.toLong * (w.toLong * h) /
            math.max(1, meta.getAs[Int]("width").toLong * meta.getAs[Int]("height")))
            .toInt)
        val out = java.util.Arrays.copyOf(payload, outLen)
        Row(r.getAs[Long]("media_id"), out,
          Row(meta.getAs[String]("format"), w, h, meta.getAs[Int]("n_frames")))
      }
    }(enc)
  }

  /** Frame sampling for video-like payloads: explode every k-th frame
    * index into its own row (the fan-out is real; frame extraction is
    * the STUB decoder's job downstream). Fan-out preserves partitioning
    * of `media_id` — no shuffle.
    */
  def sampleFrames(media: DataFrame, everyK: Int): DataFrame =
    media
      .select(col("media_id"), col("meta"),
        explode(sequence(lit(0), col("meta.n_frames") - 1, lit(everyK)))
          .as("frame_idx"))
      .select(col("media_id"), col("frame_idx"), col("meta.format").as("format"))
}

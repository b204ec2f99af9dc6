package graft

import org.apache.spark.sql.functions._
import org.apache.spark.util.LongAccumulator

import graft.functions.GraftExtensions
import graft.multimodal.Multimodal

/** Multimodal plumbing: binary payload + typed metadata, partition-wise
  * stub decode, resize, frame sampling — and SQL registration of the
  * native expressions.
  */
class MultimodalSpec extends SparkSpec {

  private lazy val media = Multimodal.asMedia(
    spark.read.parquet(s"$sfDir/documents.parquet"), "doc_id", "text")

  test("asMedia produces the canonical media schema") {
    assert(media.schema.simpleString == Multimodal.MediaSchema.simpleString)
    assert(media.count() > 0)
    val m = media.filter(col("media_id") === 1).collect()(0)
    assert(m.getAs[org.apache.spark.sql.Row]("meta")
      .getAs[String]("format") == "png") // 1 % 3 = 1 -> 2nd entry
  }

  test("decodeFeatures: deterministic features, schema, all rows") {
    val feats = Multimodal.decodeFeatures(media)
    assert(feats.schema.simpleString == Multimodal.FeatureSchema.simpleString)
    assert(feats.count() == media.count())
    val f = feats.filter(col("media_id") === 0).collect()(0)
    assert(f.getAs[Int]("n_bytes") > 0)
    assert(f.getAs[Double]("mean_byte") > 0)
    val emb = f.getAs[scala.collection.Seq[Float]]("embedding")
    assert(emb.length == 8)
    // histogram sketch counts every byte exactly once
    assert(emb.sum.toInt == f.getAs[Int]("n_bytes"))
    // deterministic: rerun yields identical rows
    val again = Multimodal.decodeFeatures(media)
    assert(feats.exceptAll(again).isEmpty)
  }

  test("resize rewrites payload and metadata consistently") {
    val out = Multimodal.resize(media, 64, 64)
    assert(out.schema.simpleString == Multimodal.MediaSchema.simpleString)
    val r = out.filter(col("media_id") === 0).collect()(0)
    val meta = r.getAs[org.apache.spark.sql.Row]("meta")
    assert(meta.getAs[Int]("width") == 64 && meta.getAs[Int]("height") == 64)
    assert(r.getAs[Array[Byte]]("payload").nonEmpty)
  }

  test("sampleFrames explodes every k-th frame without shuffle") {
    val frames = Multimodal.sampleFrames(media, everyK = 5)
    // each media contributes ceil(n_frames / 5) rows
    val want = media.select(
      sum(ceil((col("meta.n_frames")) / lit(5.0)).cast("long"))).collect()(0).getLong(0)
    assert(frames.count() == want)
    // no Exchange in the plan: fan-out preserves partitioning
    val plan = frames.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"unexpected shuffle in:\n$plan")
  }

  test("pipeline composes: decode features -> cosine top-k over stub embeddings") {
    val feats = Multimodal.decodeFeatures(media)
      .select(col("media_id"), col("embedding"))
      .filter(aggregate(col("embedding"), lit(0.0), (a, v) => a + v) > 0)
    val q = feats.filter(col("media_id") < 3)
      .select(col("media_id").as("query_id"), col("embedding").as("qe"))
    val scored = feats.join(broadcast(q), col("media_id") =!= col("query_id"))
      .select(col("query_id"), col("media_id").as("neighbor_id"),
        (graft.functions.VectorExpressions.vecDot(col("qe"), col("embedding")) /
          (graft.functions.VectorExpressions.vecNorm(col("qe")) *
            graft.functions.VectorExpressions.vecNorm(col("embedding"))))
          .as("cosine"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("neighbor_id"))
    val topk = scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= 3)
    val rows = topk.collect()
    assert(rows.length == 9) // 3 queries x k=3
    assert(rows.forall(r => r.getAs[Double]("cosine") <= 1.0000001))
  }

  test("ImageDecoder decodes the checked-in PNG to exact pixel features") {
    // src/test/resources/graft/media/tiny.png: 2x2 RGB — black, white /
    // red, blue. Integer Rec.601 luminances: 0, 255, 76, 29.
    val png = java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(
      getClass.getResource("/graft/media/tiny.png").toURI))
    val dec = new Multimodal.ImageDecoder
    val Some((mean, hist, w, h)) = dec.decodePixels(png)
    assert(w == 2 && h == 2)
    assert(mean == (0 + 255 + 76 + 29) / 4.0) // 90.0
    assert(hist.toSeq == Seq(2f, 0f, 1f, 0f, 0f, 0f, 0f, 1f))
    // garbage bytes are not an image — None, not an exception
    assert(dec.decodePixels("not a png".getBytes("UTF-8")).isEmpty)
    assert(dec.decodePixels(Array.emptyByteArray).isEmpty)
  }

  test("AudioDecoder decodes the checked-in WAV to exact sample features") {
    // src/test/resources/graft/media/tiny.wav: 8 mono 16-bit PCM
    // samples 0, 16384, -16384, 32767, -32768, 4096, -4096, 8192.
    // |amplitude| >> 12 bins: 0,4,4,7,7(capped),1,1,2 ->
    // hist = [1,2,1,0,2,0,0,2]; sum of squares = 2784952321.
    val wav = java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(
      getClass.getResource("/graft/media/tiny.wav").toURI))
    val dec = new Multimodal.AudioDecoder
    val Some((rms, hist)) = dec.decodeSamples(wav)
    assert(rms == math.sqrt(2784952321.0 / 8) / 32768.0)
    assert(hist.toSeq == Seq(1f, 2f, 1f, 0f, 2f, 0f, 0f, 2f))
    // garbage bytes are not a WAV — None, not an exception
    assert(dec.decodeSamples("not a wav".getBytes("UTF-8")).isEmpty)
    assert(dec.decodeSamples(Array.emptyByteArray).isEmpty)
  }

  test("decodeFeatures uses real samples for wav, byte stub for video") {
    import org.apache.spark.sql.Row
    val wav = java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(
      getClass.getResource("/graft/media/tiny.wav").toURI))
    val media = spark.createDataFrame(
      java.util.Arrays.asList(
        Row(1L, wav, Row("wav", 0, 0, 1)),
        Row(2L, "junk".getBytes("UTF-8"), Row("wav", 0, 0, 1)),
        Row(3L, wav, Row("mp4", 0, 0, 30))), // video: stub even for wav bytes
      Multimodal.MediaSchema)
    val out = Multimodal.decodeFeatures(media).collect()
      .map(r => r.getAs[Long]("media_id") ->
        ((r.getAs[Double]("mean_byte"),
          r.getAs[scala.collection.Seq[Float]]("embedding").toSeq))).toMap
    assert(out(1L) == ((math.sqrt(2784952321.0 / 8) / 32768.0,
      Seq(1f, 2f, 1f, 0f, 2f, 0f, 0f, 2f))))
    val (sm, se) = new Multimodal.StubDecoder().decode("junk".getBytes("UTF-8"))
    assert(out(2L) == ((sm, se.toSeq)))
    val (vm, ve) = new Multimodal.StubDecoder().decode(wav)
    assert(out(3L) == ((vm, ve.toSeq)))
  }

  test("decodeFeatures uses real pixels for images, byte stub otherwise") {
    import org.apache.spark.sql.Row
    val png = java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(
      getClass.getResource("/graft/media/tiny.png").toURI))
    val fake = "definitely not an image".getBytes("UTF-8")
    val media = spark.createDataFrame(
      java.util.Arrays.asList(
        Row(1L, png, Row("png", 2, 2, 1)),
        Row(2L, fake, Row("png", 0, 0, 1)),   // labeled png, not decodable
        Row(3L, fake, Row("mp4", 0, 0, 30))), // non-image format
      Multimodal.MediaSchema)
    val out = Multimodal.decodeFeatures(media).collect()
      .map(r => r.getAs[Long]("media_id") ->
        ((r.getAs[Double]("mean_byte"),
          r.getAs[scala.collection.Seq[Float]]("embedding").toSeq))).toMap
    // real PNG: pixel-domain features
    assert(out(1L) == ((90.0, Seq(2f, 0f, 1f, 0f, 0f, 0f, 0f, 1f))))
    // undecodable "png" and non-image format: byte-domain stub — both
    // identical to the direct stub call (the q96 oracle contract)
    val (sm, se) = new Multimodal.StubDecoder().decode(fake)
    assert(out(2L) == ((sm, se.toSeq)))
    assert(out(3L) == ((sm, se.toSeq)))
  }

  test("Mp4Decoder walks the checked-in MP4's container structure") {
    // src/test/resources/graft/media/tiny.mp4: ftyp(isom) +
    // moov(mvhd timescale=1000 duration=5000,
    //      trak(vide, stsd avc1), trak(soun, stsd mp4a)) + mdat
    val mp4 = java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(
      getClass.getResource("/graft/media/tiny.mp4").toURI))
    val dec = new Multimodal.Mp4Decoder
    val Some(m) = dec.decodeMeta(mp4)
    assert(m.brand == "isom")
    assert(m.duration_s == 5.0)
    assert(m.n_tracks == 2)
    assert(m.handlers == Seq("vide", "soun"))
    assert(m.codecs == Seq("avc1", "mp4a"))
    // garbage / truncated payloads: None, not an exception
    assert(dec.decodeMeta("not an mp4 at all".getBytes("UTF-8")).isEmpty)
    assert(dec.decodeMeta(Array.emptyByteArray).isEmpty)
    assert(dec.decodeMeta(mp4.take(20)).isEmpty ||
      dec.decodeMeta(mp4.take(20)).exists(_.brand == "isom")) // ftyp survives
    // hostile size fields (size < header) end the walk cleanly
    val hostile = mp4.clone(); hostile(0) = 0; hostile(1) = 0
    hostile(2) = 0; hostile(3) = 2 // top box claims size 2 (< 8)
    assert(dec.decodeMeta(hostile).isEmpty)
  }

  test("videoMeta extracts container metadata partition-wise") {
    import org.apache.spark.sql.Row
    val mp4 = java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(
      getClass.getResource("/graft/media/tiny.mp4").toURI))
    val media = spark.createDataFrame(
      java.util.Arrays.asList(
        Row(1L, mp4, Row("mp4", 320, 240, 30)),
        Row(2L, "junk".getBytes("UTF-8"), Row("mp4", 0, 0, 1))),
      Multimodal.MediaSchema)
    val out = Multimodal.videoMeta(media).collect()
      .map(r => r.getAs[Long]("media_id") -> r).toMap
    assert(out(1L).getAs[String]("brand") == "isom")
    assert(out(1L).getAs[Double]("duration_s") == 5.0)
    assert(out(1L).getAs[Int]("n_tracks") == 2)
    assert(out(1L).getAs[scala.collection.Seq[String]]("codecs").toSeq ==
      Seq("avc1", "mp4a"))
    // unparseable payload keeps its row with null brand (corpus
    // accounting still sees the media_id)
    assert(out(2L).isNullAt(out(2L).fieldIndex("brand")))
  }

  /** Hermetic MJPEG-in-BMFF fixture: two real JPEGs (encoded by the
    * JVM's own ImageIO, so the decode side is guaranteed a matching
    * codec) laid out as ftyp + mdat + moov with honest sample tables
    * (stsd 'jpeg', stsz per-sample sizes, stsc one run, stco absolute
    * chunk offset). Built in code rather than checked in as a blob so
    * the layout is reviewable.
    */
  private object MjpegFixture {
    private def u32(v: Long): Array[Byte] = Array(
      ((v >> 24) & 0xff).toByte, ((v >> 16) & 0xff).toByte,
      ((v >> 8) & 0xff).toByte, (v & 0xff).toByte)

    private def box(typ: String, payload: Array[Byte]): Array[Byte] =
      u32(payload.length + 8L) ++ typ.getBytes("ISO-8859-1") ++ payload

    def jpeg(seed: Int): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(8, 8,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until 8; x <- 0 until 8)
        img.setRGB(x, y, (x * 32 + y + seed * 7919) & 0xffffff)
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "jpg", bos)
      bos.toByteArray
    }

    /** (container bytes, the two frame payloads). */
    def build(): (Array[Byte], Seq[Array[Byte]]) = {
      val (j1, j2) = (jpeg(1), jpeg(2))
      val ftyp = box("ftyp", "isom".getBytes("ISO-8859-1") ++ u32(0))
      val mdat = box("mdat", j1 ++ j2)
      val mdatPayloadOff = ftyp.length + 8L // first jpeg's absolute offset
      val mvhd = box("mvhd",
        u32(0) ++ u32(0) ++ u32(0) ++ u32(1000) ++ u32(2000))
      val hdlr = box("hdlr",
        u32(0) ++ u32(0) ++ "vide".getBytes("ISO-8859-1"))
      val entry = u32(16) ++ "jpeg".getBytes("ISO-8859-1") ++ u32(0) ++ u32(0)
      val stsd = box("stsd", u32(0) ++ u32(1) ++ entry)
      val stsz = box("stsz",
        u32(0) ++ u32(0) ++ u32(2) ++ u32(j1.length) ++ u32(j2.length))
      val stsc = box("stsc", u32(0) ++ u32(1) ++ u32(1) ++ u32(2) ++ u32(1))
      val stco = box("stco", u32(0) ++ u32(1) ++ u32(mdatPayloadOff))
      val stbl = box("stbl", stsd ++ stsz ++ stsc ++ stco)
      val minf = box("minf", stbl)
      val mdia = box("mdia", hdlr ++ minf)
      val trak = box("trak", mdia)
      val moov = box("moov", mvhd ++ trak)
      (ftyp ++ mdat ++ moov, Seq(j1, j2))
    }
  }

  test("Mp4Decoder extracts MJPEG frames from the sample tables") {
    val (container, jpegs) = MjpegFixture.build()
    val dec = new Multimodal.Mp4Decoder
    // the container is also valid for the metadata walk
    val Some(meta) = dec.decodeMeta(container)
    assert(meta.codecs == Seq("jpeg") && meta.duration_s == 2.0)
    // frame payloads slice out byte-exactly and ImageIO-decode
    val frames = dec.decodeFrames(container)
    assert(frames.length == 2)
    assert(frames.map(_.toSeq) == jpegs.map(_.toSeq))
    val img = new Multimodal.ImageDecoder
    assert(frames.forall(f => img.decodePixels(f).exists(_._3 == 8)))
    // the avc1 fixture has no MJPEG track -> no frames, no exception
    val avc = java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(
      getClass.getResource("/graft/media/tiny.mp4").toURI))
    assert(dec.decodeFrames(avc).isEmpty)
    // hostile: truncation anywhere yields only the frames that check out
    assert(dec.decodeFrames(container.take(60)).isEmpty)
    assert(dec.decodeFrames("junk".getBytes("UTF-8")).isEmpty)
    // maxFrames caps the fan-out
    assert(dec.decodeFrames(container, maxFrames = 1).length == 1)
  }

  test("videoFrameFeatures decodes MJPEG frames partition-wise") {
    import org.apache.spark.sql.Row
    val (container, _) = MjpegFixture.build()
    val media = spark.createDataFrame(
      java.util.Arrays.asList(
        Row(1L, container, Row("mov", 8, 8, 2)),
        Row(2L, "junk".getBytes("UTF-8"), Row("mp4", 0, 0, 1))),
      Multimodal.MediaSchema)
    val out = Multimodal.videoFrameFeatures(media).collect()
    assert(out.map(r => (r.getLong(0), r.getInt(1))).sorted.toSeq ==
      Seq((1L, 0), (1L, 1))) // junk contributes no rows
    assert(out.forall(r => r.getInt(2) == 8 && r.getInt(3) == 8))
    assert(out.forall(r => r.getDouble(4) >= 0.0 && r.getDouble(4) <= 255.0))
  }

  test("native expressions callable from SQL after registration") {
    GraftExtensions.registerAll(spark)
    spark.read.parquet(s"$sfDir/embeddings.parquet")
      .createOrReplaceTempView("emb_sql")
    val d = spark.sql(
      "SELECT vec_dot(embedding, embedding) AS d FROM emb_sql LIMIT 5")
      .collect()
    assert(d.forall(_.getDouble(0) > 0))
    val sh = spark.sql(
      "SELECT word_shingles(array('a','b','c','d')) AS s").collect()(0)
      .getAs[scala.collection.Seq[String]]("s")
    assert(sh.toSeq == Seq("a b c", "b c d"))
    val fp = spark.sql(
      "SELECT simhash32(array(3L, 3L, 2L)) AS fp").collect()(0).getLong(0)
    assert(fp == 3L) // bit0: 2/3, bit1: 3/3 -> both majority
    val sp = spark.sql(
      "SELECT sign_projection(embedding, 32) AS s FROM emb_sql LIMIT 5")
      .collect()
    // matches the Column-API form exactly
    val api = spark.read.parquet(s"$sfDir/embeddings.parquet").limit(5)
      .select(graft.functions.VectorExpressions
        .signProjection(org.apache.spark.sql.functions.col("embedding"), 32))
      .collect()
    assert(sp.map(_.getLong(0)).sameElements(api.map(_.getLong(0))))
  }
}

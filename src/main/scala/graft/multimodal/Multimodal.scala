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
  * partition-wise init, explode fan-out) is real. IMAGE formats decode
  * to actual pixels via the JDK's own `javax.imageio` codecs
  * ([[ImageDecoder]] — PNG/JPEG/GIF/BMP, no extra jars); AUDIO WAV/PCM
  * decodes to actual samples via the JDK's `javax.sound.sampled`
  * ([[AudioDecoder]]). VIDEO container structure parses for real
  * ([[Mp4Decoder]] ISO-BMFF box walk) and Motion-JPEG FRAMES decode
  * for real too ([[videoFrameFeatures]] — MJPEG samples are standalone
  * JPEGs, sliced out of the sample tables and fed to ImageIO). Only
  * INTER-CODED video codecs (avc1/hev1/…) and payloads no JDK codec
  * parses take the byte-domain [[StubDecoder]] path (STUB markers
  * below), whose interface is the production shape for codecs this JVM
  * doesn't bundle.
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

  /** Formats [[decodeFeatures]] tries real pixel decode for — the set
    * javax.imageio handles out of the box.
    */
  val ImageFormats: Set[String] = Set("png", "jpeg", "jpg", "gif", "bmp")

  /** Formats [[decodeFeatures]] tries real sample decode for — the
    * container javax.sound.sampled parses out of the box.
    */
  val AudioFormats: Set[String] = Set("wav", "wave")

  /** Real image decode via the JDK-bundled `javax.imageio` codecs:
    * pixel-domain features — integer-luminance mean (Rec.601 weights in
    * exact integer arithmetic, so results are bit-stable across
    * platforms) and an 8-bin luminance histogram, the pixel twin of
    * [[StubDecoder]]'s byte histogram. Returns None when the payload
    * isn't a decodable image (ImageIO sniffs magic bytes), letting the
    * caller fall back to byte-domain features instead of failing the
    * partition.
    */
  class ImageDecoder extends Serializable {
    def decodePixels(payload: Array[Byte])
        : Option[(Double, Array[Float], Int, Int)] = {
      // NonFatal, not just IOException: ImageIO plugins throw unchecked
      // exceptions (IndexOutOfBounds, NegativeArraySize, IllegalArgument)
      // on corrupt/truncated headers — a hostile payload must take the
      // byte-domain fallback, not fail the task.
      val img = try {
        javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(payload))
      } catch { case scala.util.control.NonFatal(_) => null }
      if (img == null) None
      else {
        val w = img.getWidth
        val h = img.getHeight
        val hist = new Array[Float](8)
        var sum = 0L
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            val rgb = img.getRGB(x, y)
            val lum = (((rgb >> 16) & 0xff) * 299 + ((rgb >> 8) & 0xff) * 587 +
              (rgb & 0xff) * 114) / 1000
            sum += lum
            hist(lum >>> 5) += 1f
            x += 1
          }
          y += 1
        }
        Some((sum.toDouble / (w.toLong * h), hist, w, h))
      }
    }
  }

  /** Real audio decode via the JDK-bundled `javax.sound.sampled` WAV/
    * PCM parser (no extra jars): sample-domain features — RMS amplitude
    * normalized to [0, 1] (in [[FeatureSchema]]'s `mean_byte` slot) and
    * an 8-bin |amplitude| histogram, the audio twin of
    * [[ImageDecoder]]'s luminance histogram. 8-bit samples are lifted
    * to the 16-bit domain so both depths land in the same bins.
    * Returns None for anything that isn't parseable 8/16-bit PCM
    * (compressed codecs stay on the byte-domain stub path).
    */
  class AudioDecoder extends Serializable {
    def decodeSamples(payload: Array[Byte]): Option[(Double, Array[Float])] = {
      import javax.sound.sampled._
      // NonFatal throughout: the parser throws unchecked exceptions on
      // hostile/truncated headers; any failure takes the stub fallback
      val stream = try {
        AudioSystem.getAudioInputStream(
          new java.io.ByteArrayInputStream(payload))
      } catch { case scala.util.control.NonFatal(_) => null }
      if (stream == null) None
      else try {
        val f = stream.getFormat
        val bits = f.getSampleSizeInBits
        val unsigned = f.getEncoding == AudioFormat.Encoding.PCM_UNSIGNED
        val pcm = unsigned || f.getEncoding == AudioFormat.Encoding.PCM_SIGNED
        if (!pcm || (bits != 8 && bits != 16)) None
        else {
          val bytes = stream.readAllBytes()
          val be = f.isBigEndian
          val n = bytes.length / (bits / 8)
          if (n == 0) None
          else {
            val hist = new Array[Float](8)
            var sumSq = 0.0
            var i = 0
            while (i < n) {
              // every channel's sample counts once: per-sample stats,
              // not per-frame — channel layout doesn't change the math
              val s16 =
                if (bits == 16) {
                  val b0 = bytes(i * 2) & 0xff
                  val b1 = bytes(i * 2 + 1) & 0xff
                  val raw = if (be) (b0 << 8) | b1 else (b1 << 8) | b0
                  if (unsigned) raw - 32768 else raw.toShort.toInt
                } else {
                  val c = if (unsigned) (bytes(i) & 0xff) - 128
                          else bytes(i).toInt
                  c << 8
                }
              val abs = math.abs(s16)
              hist(math.min(7, abs >> 12)) += 1f // 4096-wide bins
              sumSq += s16.toDouble * s16
              i += 1
            }
            Some((math.sqrt(sumSq / n) / 32768.0, hist))
          }
        }
      } catch { case scala.util.control.NonFatal(_) => None }
      finally stream.close()
    }
  }

  /** Container formats [[Mp4Decoder]] parses structurally — the
    * ISO-BMFF family (MP4/QuickTime layout). */
  val VideoFormats: Set[String] = Set("mp4", "m4v", "mov")

  /** Parsed ISO-BMFF container metadata — everything the box structure
    * itself carries, no codec needed. */
  case class Mp4Meta(brand: String, duration_s: Double, n_tracks: Int,
                     handlers: Seq[String], codecs: Seq[String])

  /** REAL video container-metadata decode: a pure-JVM ISO base media
    * file format (MP4/MOV, ISO/IEC 14496-12 — public spec) box walk.
    * The JDK bundles no video codec, so FRAME decode stays on the
    * byte-domain [[StubDecoder]] path; but the container structure is
    * plain length-prefixed boxes, so duration, track count, handler
    * types and sample-entry codec fourccs are honestly parseable:
    *  - top level: `ftyp` (major brand) and `moov`
    *  - `moov/mvhd`: movie timescale + duration (v0 u32 / v1 u64)
    *  - each `moov/trak/mdia/hdlr`: handler type (`vide`/`soun`/…)
    *  - each `moov/trak/mdia/minf/stbl/stsd`: first sample entry's
    *    box type IS the codec fourcc (`avc1`, `hev1`, `mp4a`, …)
    * Returns None for anything that isn't a structurally valid BMFF
    * prefix; every size field is bounds-checked so hostile payloads
    * fall back to the stub instead of failing the task (the same
    * contract as the image/audio decoders).
    */
  class Mp4Decoder extends Serializable {

    private def u32(b: Array[Byte], o: Int): Long =
      ((b(o) & 0xffL) << 24) | ((b(o + 1) & 0xffL) << 16) |
        ((b(o + 2) & 0xffL) << 8) | (b(o + 3) & 0xffL)

    private def u64(b: Array[Byte], o: Int): Long =
      (u32(b, o) << 32) | u32(b, o + 4)

    private def fourcc(b: Array[Byte], o: Int): String =
      new String(b, o, 4, "ISO-8859-1")

    /** Iterate the child boxes of [start, end): (type, payloadStart,
      * payloadEnd). Malformed sizes end the walk (truncated output,
      * never an exception past this point).
      */
    private def boxes(b: Array[Byte], start: Long, end: Long)
        : Iterator[(String, Long, Long)] = new Iterator[(String, Long, Long)] {
      private var p = start
      def hasNext: Boolean = p + 8 <= end
      def next(): (String, Long, Long) = {
        val size0 = u32(b, p.toInt)
        val typ = fourcc(b, p.toInt + 4)
        var hdr = 8L
        val size =
          if (size0 == 1L && p + 16 <= end) { hdr = 16; u64(b, p.toInt + 8) }
          else if (size0 == 0L) end - p // box extends to end of enclosure
          else size0
        if (size < hdr || p + size > end) { // malformed: stop the walk
          p = end
          ("", end, end)
        } else {
          val out = (typ, p + hdr, p + size)
          p += size
          out
        }
      }
    }

    def decodeMeta(payload: Array[Byte]): Option[Mp4Meta] =
      try {
        val end = payload.length.toLong
        if (end < 16) return None
        var brand: String = null
        var duration = -1.0
        var handlers = List.empty[String]
        var codecs = List.empty[String]
        var nTracks = 0
        boxes(payload, 0, end).foreach {
          case ("ftyp", s, e) if e - s >= 4 =>
            brand = fourcc(payload, s.toInt)
          case ("moov", ms, me) =>
            boxes(payload, ms, me).foreach {
              case ("mvhd", s, e) if e - s >= 20 =>
                val v = payload(s.toInt) & 0xff
                // a v1 box truncated below its 32-byte field layout is
                // malformed: skip it rather than reinterpreting v1
                // bytes at v0 offsets (garbage-but-bounded duration)
                if (v != 1 || e - s >= 32) {
                  val (ts, dur) =
                    if (v == 1)
                      (u32(payload, s.toInt + 20), u64(payload, s.toInt + 24))
                    else (u32(payload, s.toInt + 12), u32(payload, s.toInt + 16))
                  if (ts > 0) duration = dur.toDouble / ts
                }
              case ("trak", ts0, te) =>
                nTracks += 1
                boxes(payload, ts0, te).foreach {
                  case ("mdia", mds, mde) =>
                    boxes(payload, mds, mde).foreach {
                      case ("hdlr", s, e) if e - s >= 12 =>
                        handlers ::= fourcc(payload, s.toInt + 8)
                      case ("minf", mis, mie) =>
                        boxes(payload, mis, mie).foreach {
                          case ("stbl", sts, ste) =>
                            boxes(payload, sts, ste).foreach {
                              case ("stsd", s, e) if e - s >= 16 &&
                                  u32(payload, s.toInt + 4) > 0 =>
                                // first sample entry: box at payload+8
                                codecs ::= fourcc(payload, s.toInt + 12)
                              case _ =>
                            }
                          case _ =>
                        }
                      case _ =>
                    }
                  case _ =>
                }
              case _ =>
            }
          case _ =>
        }
        // a real BMFF file has at least a brand or a movie header —
        // random bytes that happen to walk as boxes produce neither
        if (brand == null && duration < 0 && nTracks == 0) None
        else Some(Mp4Meta(Option(brand).getOrElse(""),
          math.max(duration, 0.0), nTracks, handlers.reverse, codecs.reverse))
      } catch { case scala.util.control.NonFatal(_) => None }

    /** Sample-entry fourccs whose samples are standalone JPEG images —
      * the Motion-JPEG family. These frames ARE ImageIO-decodable; no
      * inter-frame codec exists in the JVM, so everything else stays on
      * the byte-domain stub path.
      */
    private val JpegFourccs = Set("jpeg", "mjpa", "mjpb")

    /** Extract the raw sample payloads of the FIRST Motion-JPEG track:
      * walks the track's sample tables (stsz sizes, stsc sample→chunk
      * runs, stco/co64 absolute chunk offsets — ISO/IEC 14496-12 §8.7)
      * and slices each sample's bytes out of the file. Every offset and
      * size is bounds-checked against the payload; malformed tables
      * yield the frames that DO check out (possibly none) rather than
      * an exception. Returns at most `maxFrames` frames.
      */
    def decodeFrames(payload: Array[Byte],
                     maxFrames: Int = 32): Seq[Array[Byte]] =
      try {
        val end = payload.length.toLong
        var out = Seq.empty[Array[Byte]]
        boxes(payload, 0, end).foreach {
          case ("moov", ms, me) => boxes(payload, ms, me).foreach {
            case ("trak", ts0, te) if out.isEmpty =>
              var codec: String = null
              var sizes: Array[Long] = null
              var chunkOffs: Array[Long] = null
              var runs: Array[(Long, Long)] = null // (first_chunk, per_chunk)
              boxes(payload, ts0, te).foreach {
                case ("mdia", mds, mde) => boxes(payload, mds, mde).foreach {
                  case ("minf", mis, mie) => boxes(payload, mis, mie).foreach {
                    case ("stbl", sts, ste) => boxes(payload, sts, ste).foreach {
                      case ("stsd", s, e) if e - s >= 16 &&
                          u32(payload, s.toInt + 4) > 0 =>
                        codec = fourcc(payload, s.toInt + 12)
                      case ("stsz", s, e) if e - s >= 12 =>
                        val fixed = u32(payload, s.toInt + 4)
                        val n = math.min(u32(payload, s.toInt + 8), 4096L).toInt
                        sizes =
                          if (fixed != 0) Array.fill(n)(fixed)
                          else if (e - s >= 12 + 4L * n)
                            Array.tabulate(n)(i =>
                              u32(payload, s.toInt + 12 + 4 * i))
                          else null
                      case ("stsc", s, e) if e - s >= 8 =>
                        val n = math.min(u32(payload, s.toInt + 4), 4096L).toInt
                        runs =
                          if (e - s >= 8 + 12L * n)
                            Array.tabulate(n)(i => (
                              u32(payload, s.toInt + 8 + 12 * i),
                              u32(payload, s.toInt + 12 + 12 * i)))
                          else null
                      case ("stco", s, e) if e - s >= 8 =>
                        val n = math.min(u32(payload, s.toInt + 4), 4096L).toInt
                        chunkOffs =
                          if (e - s >= 8 + 4L * n)
                            Array.tabulate(n)(i =>
                              u32(payload, s.toInt + 8 + 4 * i))
                          else null
                      case ("co64", s, e) if e - s >= 8 =>
                        val n = math.min(u32(payload, s.toInt + 4), 4096L).toInt
                        chunkOffs =
                          if (e - s >= 8 + 8L * n)
                            Array.tabulate(n)(i =>
                              u64(payload, s.toInt + 8 + 8 * i))
                          else null
                      case _ =>
                    }
                    case _ =>
                  }
                  case _ =>
                }
                case _ =>
              }
              if (codec != null && JpegFourccs.contains(codec) &&
                  sizes != null && chunkOffs != null && runs != null &&
                  runs.nonEmpty) {
                val frames = Seq.newBuilder[Array[Byte]]
                var si = 0 // next sample index
                var taken = 0
                var ci = 0
                while (ci < chunkOffs.length && si < sizes.length &&
                    taken < maxFrames) {
                  // samples-per-chunk: the run with the largest
                  // first_chunk <= this (1-based) chunk index
                  val chunkNo = ci + 1L
                  val perChunk = runs.takeWhile(_._1 <= chunkNo)
                    .lastOption.map(_._2).getOrElse(0L)
                  var off = chunkOffs(ci)
                  var j = 0L
                  while (j < perChunk && si < sizes.length &&
                      taken < maxFrames) {
                    val sz = sizes(si)
                    if (off >= 0 && sz > 0 && sz <= Int.MaxValue &&
                        off + sz <= end) {
                      frames += java.util.Arrays.copyOfRange(
                        payload, off.toInt, (off + sz).toInt)
                      taken += 1
                    }
                    off += sz
                    si += 1
                    j += 1
                  }
                  ci += 1
                }
                out = frames.result()
              }
            case _ =>
          }
          case _ =>
        }
        out
      } catch { case scala.util.control.NonFatal(_) => Seq.empty }
  }

  /** Container-metadata extraction for video payloads: partition-wise
    * [[Mp4Decoder]] walk emitting (media_id, brand, duration_s,
    * n_tracks, handlers, codecs); unparseable payloads yield a null
    * brand row (kept, so corpus accounting still sees the media_id).
    * Frame/pixel decode of the tracks remains [[StubDecoder]] —
    * narrowed stub caveat: the CONTAINER walk above is real.
    */
  val VideoMetaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType),
    StructField("brand", StringType),
    StructField("duration_s", DoubleType),
    StructField("n_tracks", IntegerType),
    StructField("handlers", ArrayType(StringType, containsNull = false)),
    StructField("codecs", ArrayType(StringType, containsNull = false))))

  def videoMeta(media: DataFrame): DataFrame = {
    val enc = RowEncoder.encoderFor(VideoMetaSchema)
    media.select(col("media_id"), col("payload"))
      .mapPartitions { rows =>
        val dec = new Mp4Decoder // per-partition, NOT per-row
        rows.map { r =>
          dec.decodeMeta(r.getAs[Array[Byte]]("payload")) match {
            case Some(m) => Row(r.getAs[Long]("media_id"), m.brand,
              m.duration_s, m.n_tracks, m.handlers, m.codecs)
            case None => Row(r.getAs[Long]("media_id"), null, null, null,
              Seq.empty[String], Seq.empty[String])
          }
        }
      }(enc)
  }

  /** Per-frame pixel features of Motion-JPEG video payloads. */
  val VideoFrameSchema: StructType = StructType(Seq(
    StructField("media_id", LongType),
    StructField("frame_idx", IntegerType),
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("mean_lum", DoubleType)))

  /** REAL video frame decode for the Motion-JPEG subset: MJPEG samples
    * in an ISO-BMFF container are standalone JPEGs, so
    * [[Mp4Decoder.decodeFrames]] slices them out of the sample tables
    * and the existing [[ImageDecoder]] pixel path decodes each one —
    * (media_id, frame_idx, width, height, mean_lum), one row per
    * decodable frame, fan-out bounded by `maxFrames`. Runs partition-
    * wise with ONE decoder pair per partition. Payloads with no
    * MJPEG track (inter-coded codecs — the remaining honest stub
    * caveat) or undecodable frames simply contribute no rows.
    */
  def videoFrameFeatures(media: DataFrame, maxFrames: Int = 32): DataFrame = {
    val enc = RowEncoder.encoderFor(VideoFrameSchema)
    media.select(col("media_id"), col("payload"))
      .mapPartitions { rows =>
        val mp4 = new Mp4Decoder   // per-partition codec init,
        val img = new ImageDecoder // NOT per row
        rows.flatMap { r =>
          val id = r.getAs[Long]("media_id")
          mp4.decodeFrames(r.getAs[Array[Byte]]("payload"), maxFrames)
            .iterator.zipWithIndex.flatMap { case (bytes, i) =>
              img.decodePixels(bytes).map { case (lum, _, w, h) =>
                Row(id, i, w, h, lum)
              }
            }
        }
      }(enc)
  }

  /** STUB decoder — a deterministic stand-in for a VIDEO frame codec
    * (and the fallback for undecodable image/audio payloads). Real
    * implementation would parse `payload` with the codec matching
    * `format`; the fake derives features from the raw bytes so tests
    * are reproducible. The *interface* (bytes → features, constructed
    * once per partition) is the production shape. Video CONTAINER
    * metadata does NOT take this path — [[Mp4Decoder]] parses it for
    * real; only the frame/pixel domain is stubbed.
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
    * partition-sized materialization). Image formats decode real
    * pixels ([[ImageDecoder]]); non-image formats and payloads ImageIO
    * can't parse fall back to byte-domain features.
    */
  def decodeFeatures(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    val enc = RowEncoder.encoderFor(FeatureSchema)
    media.select(col("media_id"), col("payload"), col("meta.format").as("format"))
      .mapPartitions { rows =>
        val img = new ImageDecoder // per-partition, NOT per-row
        val aud = new AudioDecoder
        val stub = new StubDecoder
        rows.map { r =>
          val payload = r.getAs[Array[Byte]]("payload")
          val format = r.getAs[String]("format")
          val lc = if (format == null) "" else format.toLowerCase
          val (mean, emb) =
            if (ImageFormats(lc))
              img.decodePixels(payload) match {
                case Some((m, h, _, _)) => (m, h)
                case None => stub.decode(payload)
              }
            else if (AudioFormats(lc))
              aud.decodeSamples(payload).getOrElse(stub.decode(payload))
            else stub.decode(payload)
          Row(r.getAs[Long]("media_id"), format,
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

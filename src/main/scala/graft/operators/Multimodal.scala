package graft.operators

import java.awt.image.BufferedImage
import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import javax.imageio.ImageIO
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.pipeline.Rng

/** Multimodal column handling: image/audio/video as opaque BINARY columns
  * with typed metadata, processed in partition-sized batches.
  *
  * The IMAGE path is real end-to-end: `generateAssets` encodes actual
  * PNG/JPEG bytes (deterministic pixels via splitmix, `javax.imageio` —
  * ships with the JDK), and `extractFeatures` decodes them back with
  * ImageIO, so decoded width/height and pixel-derived features exercise a
  * genuine binary→decode→feature pipeline. The AUDIO path is likewise real:
  * 16-bit mono PCM WAV encoded and decoded with `javax.sound.sampled`
  * (also pure JDK) — declared (sample rate, frame count) is verified
  * against the decoded stream and features derive from decoded amplitudes.
  * Only VIDEO keeps the clearly-marked deterministic `FakeCodec` (no video
  * codec ships in this container) — the Spark-side plumbing (binary
  * schema, mapPartitions batching, frame sampling, determinism) is
  * identical for all types, and swapping FakeCodec for a real decoder
  * changes no plan shape.
  */
object Multimodal {

  val MediaTypes: Vector[String] = Vector("image/png", "image/jpeg", "audio/wav", "video/mp4")

  /** STUB — deterministic fake codec standing in for the real VIDEO
    * decoder (images use ImageIO, audio uses javax.sound below).
    */
  object FakeCodec {
    /** "Extract" an nDim feature vector — pure hash of content windows. */
    def features(bytes: Array[Byte], nDim: Int): Array[Float] = {
      val out = new Array[Float](nDim)
      val step = math.max(1, bytes.length / nDim)
      var d = 0
      while (d < nDim) {
        var h = 1469598103934665603L ^ d
        var i = d * step
        val end = math.min(bytes.length, i + step)
        while (i < end) { h = (h ^ (bytes(i) & 0xffL)) * 0x100000001b3L; i += 1 }
        out(d) = ((Rng.mix(h) >>> 11).toDouble / (1L << 53).toDouble).toFloat
        d += 1
      }
      out
    }
    /** "Sample" frames from a video blob: fixed-stride byte windows. */
    def sampleFrames(bytes: Array[Byte], nFrames: Int): Seq[Array[Byte]] = {
      if (bytes.isEmpty) return Seq.empty
      val stride = math.max(1, bytes.length / nFrames)
      (0 until nFrames).map { f =>
        val from = math.min(bytes.length - 1, f * stride)
        java.util.Arrays.copyOfRange(bytes, from, math.min(bytes.length, from + stride))
      }
    }
  }

  /** Real image codec: deterministic pixels → PNG/JPEG bytes and back. */
  object ImageCodec {
    // the bytes are fully in memory — ImageIO's default file cache would
    // create/delete a temp file per image in the per-row decode loop
    ImageIO.setUseCache(false)
    /** Encode a deterministic w×h RGB image (pixels from splitmix of r). */
    def encode(format: String, w: Int, h: Int, r: Long): Array[Byte] = {
      val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
      var st = r
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          st = Rng.mix(st)
          img.setRGB(x, y, (st & 0xFFFFFF).toInt)
          x += 1
        }
        y += 1
      }
      val baos = new ByteArrayOutputStream()
      ImageIO.write(img, format, baos)
      baos.toByteArray
    }

    def decode(bytes: Array[Byte]): BufferedImage =
      ImageIO.read(new ByteArrayInputStream(bytes))

    /** Pixel-derived features: luminance means over nDim interleaved bins. */
    def features(img: BufferedImage, nDim: Int): Array[Float] = {
      val sums = new Array[Double](nDim)
      val counts = new Array[Int](nDim)
      var y = 0
      var i = 0
      while (y < img.getHeight) {
        var x = 0
        while (x < img.getWidth) {
          val rgb = img.getRGB(x, y)
          val lum = (((rgb >> 16) & 0xFF) * 299 + ((rgb >> 8) & 0xFF) * 587 + (rgb & 0xFF) * 114) / 1000.0
          val d = i % nDim
          sums(d) += lum; counts(d) += 1
          i += 1; x += 1
        }
        y += 1
      }
      Array.tabulate(nDim)(d => if (counts(d) == 0) 0f else (sums(d) / counts(d) / 255.0).toFloat)
    }
  }

  /** Real audio codec: deterministic 16-bit mono PCM samples → WAV bytes
    * and back, via `javax.sound.sampled` (pure JDK — no external codec
    * needed for WAV). PCM round trips losslessly, so decoded sample rate /
    * frame count / amplitudes are ground truth for verification.
    */
  object AudioCodec {
    import javax.sound.sampled.{AudioFileFormat, AudioFormat, AudioInputStream, AudioSystem}

    def encode(sampleRate: Int, samples: Array[Short]): Array[Byte] = {
      val data = new Array[Byte](samples.length * 2)
      var i = 0
      while (i < samples.length) { // little-endian 16-bit
        data(2 * i) = (samples(i) & 0xff).toByte
        data(2 * i + 1) = ((samples(i) >> 8) & 0xff).toByte
        i += 1
      }
      val fmt = new AudioFormat(sampleRate.toFloat, 16, 1, true, false)
      val ais = new AudioInputStream(new ByteArrayInputStream(data), fmt, samples.length.toLong)
      val baos = new ByteArrayOutputStream()
      AudioSystem.write(ais, AudioFileFormat.Type.WAVE, baos)
      baos.toByteArray
    }

    /** Returns (sampleRate, decoded 16-bit samples). Rejects (throws on)
      * anything that is not 16-bit signed little-endian mono PCM rather
      * than silently mis-reinterpreting the frames — callers that must not
      * fail per-asset catch and degrade (see [[Multimodal.decodeOne]]).
      */
    def decode(bytes: Array[Byte]): (Int, Array[Short]) = {
      val ais = AudioSystem.getAudioInputStream(new ByteArrayInputStream(bytes))
      try {
        val fmt = ais.getFormat
        require(fmt.getEncoding == AudioFormat.Encoding.PCM_SIGNED &&
          fmt.getSampleSizeInBits == 16 && fmt.getChannels == 1 && !fmt.isBigEndian,
          s"unsupported audio format: $fmt (need 16-bit signed LE mono PCM)")
        val data = ais.readAllBytes()
        val samples = new Array[Short](data.length / 2)
        var i = 0
        while (i < samples.length) {
          samples(i) = (((data(2 * i + 1) & 0xff) << 8) | (data(2 * i) & 0xff)).toShort
          i += 1
        }
        (fmt.getSampleRate.toInt, samples)
      } finally ais.close()
    }

    /** Amplitude features: mean |sample|/32768 over nDim interleaved bins —
      * the audio analogue of ImageCodec's luminance bins.
      */
    def features(samples: Array[Short], nDim: Int): Array[Float] = {
      val sums = new Array[Double](nDim)
      val counts = new Array[Int](nDim)
      var i = 0
      while (i < samples.length) {
        val d = i % nDim
        sums(d) += math.abs(samples(i).toInt); counts(d) += 1
        i += 1
      }
      Array.tabulate(nDim)(d => if (counts(d) == 0) 0f else (sums(d) / counts(d) / 32768.0).toFloat)
    }
  }

  /** The per-asset generation kernel — pure function of (id, seed), shared
    * by the distributed `generateAssets` and Verify's sequential driver
    * replay (the m1 oracle re-derives the expected per-type stats without
    * Spark). Returns (id, media_type, width, height, content).
    *
    * Declared "dims" per type: images (pixel width, pixel height); audio
    * (sample rate Hz, frame count) — both verified against the decoded
    * bytes; video (synthetic width, height) metadata only (FakeCodec).
    */
  def generateOne(id: Long, seed: Long = 42L): (Long, String, Int, Int, Array[Byte]) = {
    val r = Rng.mix2(seed, id)
    val mt = MediaTypes(Rng.bounded(r, MediaTypes.size))
    if (mt.startsWith("image")) {
      val w = 8 + Rng.bounded(Rng.mix(r), 24)
      val h = 8 + Rng.bounded(Rng.mix2(r, 17L), 24)
      val bytes = ImageCodec.encode(if (mt.endsWith("png")) "png" else "jpg", w, h, r)
      (id, mt, w, h, bytes)
    } else if (mt.startsWith("audio")) {
      val rates = Array(8000, 11025, 16000)
      val rate = rates(Rng.bounded(Rng.mix2(r, 23L), rates.length))
      val n = 1024 + Rng.bounded(Rng.mix(r), 2048)
      val samples = new Array[Short](n)
      var hsh = r
      var i = 0
      while (i < n) { hsh = Rng.mix(hsh); samples(i) = (hsh & 0xffff).toShort; i += 1 }
      (id, mt, rate, n, AudioCodec.encode(rate, samples))
    } else {
      val len = 4096 + Rng.bounded(Rng.mix(r), 8192)
      val bytes = new Array[Byte](len)
      var hsh = r
      var i = 0
      while (i < len) { hsh = Rng.mix(hsh); bytes(i) = (hsh & 0xff).toByte; i += 1 }
      val w = 64 + Rng.bounded(hsh, 960)
      val h = 64 + Rng.bounded(Rng.mix(hsh), 960)
      (id, mt, w, h, bytes)
    }
  }

  /** Deterministic synthetic asset table: (asset_id, media_type, width,
    * height, content BINARY). Images are REAL encoded PNG/JPEG and audio
    * REAL encoded WAV whose declared dims are ground truth for the decode
    * check; video is an opaque deterministic blob with synthetic metadata.
    */
  def generateAssets(spark: SparkSession, n: Long, seed: Long = 42L): DataFrame = {
    import spark.implicits._
    spark.range(n).map(id => generateOne(id, seed))
      .toDF("asset_id", "media_type", "width", "height", "content")
  }

  /** Decode + feature-extract over binary columns in partition batches.
    * Images: real ImageIO decode (width/height read from the bytes).
    * Audio/video: FakeCodec (documented stub). Output: (asset_id,
    * media_type, width, height, n_frames, embedding) with DECODED dims.
    */
  /** The per-asset decode kernel — ONE implementation shared by
    * [[extractFeatures]] and [[decodeVerify]], so the verification query
    * exercises exactly the production decode path (a drifting private copy
    * would let regressions pass verification).
    * Returns (decodedW, decodedH, nFrames, embedding).
    */
  private[graft] def decodeOne(mt: String, declW: Int, declH: Int, bytes: Array[Byte],
                               nDim: Int, framesPerVideo: Int): (Int, Int, Int, Array[Float]) = {
    if (mt.startsWith("image")) {
      val img = ImageCodec.decode(bytes)
      if (img == null) (-1, -1, 1, new Array[Float](nDim))
      else (img.getWidth, img.getHeight, 1, ImageCodec.features(img, nDim))
    } else if (mt.startsWith("audio")) {
      // real WAV decode: dims = (decoded sample rate, decoded frame count).
      // Corrupt/unsupported audio degrades to the same (-1, -1) sentinel the
      // image path uses — one bad asset must not kill the whole job's task.
      try {
        val (rate, samples) = AudioCodec.decode(bytes)
        (rate, samples.length, 1, AudioCodec.features(samples, nDim))
      } catch {
        case _: Exception => (-1, -1, 1, new Array[Float](nDim))
      }
    } else {
      val frames = FakeCodec.sampleFrames(bytes, framesPerVideo)
      // mean-pool per-frame features
      val acc = new Array[Float](nDim)
      frames.foreach { fb =>
        val f = FakeCodec.features(fb, nDim)
        var d = 0
        while (d < nDim) { acc(d) += f(d) / frames.size; d += 1 }
      }
      // stub decode reports the declared dims (no real video codec here)
      (declW, declH, frames.size, acc)
    }
  }

  def extractFeatures(assets: DataFrame, nDim: Int = 32, framesPerVideo: Int = 4): DataFrame = {
    val spark = assets.sparkSession
    import spark.implicits._
    assets.select("asset_id", "media_type", "width", "height", "content")
      .as[(Long, String, Int, Int, Array[Byte])]
      .mapPartitions { iter =>
        // batch-shaped: one pass per partition, codec state amortized here
        iter.map { case (id, mt, declW, declH, bytes) =>
          val (w, h, frames, emb) = decodeOne(mt, declW, declH, bytes, nDim, framesPerVideo)
          (id, mt, w, h, frames, emb)
        }
      }
      .toDF("asset_id", "media_type", "width", "height", "n_frames", "embedding")
  }

  /** Per-media-type stats over extracted features. avg_norm sums the
    * per-asset norms in ASCENDING ORDER (sort_array over the collected
    * group): double addition is not associative, so a partition-order avg()
    * could flip the 4-decimal rounding at a boundary under a different core
    * count, spuriously diverging from the oracle's sequential replay (which
    * sorts the same way). collect_list is safe here — groups are the 3-4
    * media types of a bounded stats summary, not corpus-sized keys. The
    * integer-fed aggregates (avg_width, total_frames) stay plain: integer
    * sums inside a double are exact below 2^53, so order cannot matter.
    */
  def featureStats(features: DataFrame): DataFrame =
    features
      .withColumn("norm", sqrt(aggregate(col("embedding"), lit(0.0d),
        (acc, x) => acc + x.cast("double") * x.cast("double"))))
      .groupBy("media_type")
      .agg(
        count(lit(1)).as("n_assets"),
        // denominator counts NON-NULL norms: collect_list drops nulls, and
        // count(lit(1)) counted all rows — a null embedding (unreachable
        // today, decodeOne always returns an array) would silently deflate
        // the mean vs avg()'s ignore-null semantics
        round(aggregate(sort_array(collect_list(col("norm"))), lit(0.0d),
          (acc, x) => acc + x) / count(col("norm")), 4).as("avg_norm"),
        round(avg("width"), 2).as("avg_width"),
        sum("n_frames").as("total_frames"))

  /** End-to-end decode verification: per media type, do the dims DECODED
    * from the binary content match the dims declared at generation, and did
    * video frame sampling produce the requested frame count? For images
    * this is a real PNG/JPEG round trip — the driver-checkable property of
    * the multimodal path.
    */
  def decodeVerify(assets: DataFrame, framesPerVideo: Int = 4): DataFrame = {
    val spark = assets.sparkSession
    import spark.implicits._
    // ONE pass: decode (via the shared production kernel) and compare
    // against the declared dims in the same map — a join against a second
    // branch of `assets` would re-run the whole asset generation/scan
    // (including image encoding) twice
    assets.select("asset_id", "media_type", "width", "height", "content")
      .as[(Long, String, Int, Int, Array[Byte])]
      .mapPartitions { iter =>
        iter.map { case (_, mt, declW, declH, bytes) =>
          val (w, h, frames, _) = decodeOne(mt, declW, declH, bytes, 1, framesPerVideo)
          (mt, w == declW && h == declH,
            !mt.startsWith("video") || frames == framesPerVideo)
        }
      }
      .toDF("media_type", "dims_match", "frames_match")
      .groupBy("media_type")
      .agg(
        (count(lit(1)) > 0).as("has_assets"),
        (sum(when(col("dims_match"), 0L).otherwise(1L)) === 0L).as("dims_ok"),
        (sum(when(col("frames_match"), 0L).otherwise(1L)) === 0L).as("frames_ok"))
  }
}

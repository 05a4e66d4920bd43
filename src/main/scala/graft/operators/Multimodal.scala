package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.pipeline.Rng

/** Multimodal column handling: image/audio/video as opaque BINARY columns
  * with typed metadata, processed in partition-sized batches.
  *
  * The actual codecs are NOT in this container, so the decode step is a
  * clearly-marked deterministic fake (`FakeCodec`) — but the Spark-side
  * plumbing is real and tested: binary column schema, metadata struct,
  * batch-iteration via mapPartitions (the Scala analogue of Python's
  * mapInPandas batches), deterministic feature extraction signature
  * `(asset_id, media_type, bytes) → Array[Float]`, frame sampling for
  * video-typed assets, and partition-count preservation. Swapping FakeCodec
  * for a real JNI/ImageIO decoder changes no plan shape.
  */
object Multimodal {

  val MediaTypes: Vector[String] = Vector("image/png", "image/jpeg", "audio/wav", "video/mp4")

  /** STUB — deterministic fake codec standing in for the real decoder. */
  object FakeCodec {
    /** "Decode" bytes to a dims pair (e.g. width×height) — pure hash. */
    def decodeDims(bytes: Array[Byte]): (Int, Int) = {
      var h = 0xcbf29ce484222325L
      var i = 0
      while (i < bytes.length) { h ^= bytes(i) & 0xffL; h *= 0x100000001b3L; i += 1 }
      (64 + Rng.bounded(h, 960), 64 + Rng.bounded(Rng.mix(h), 960))
    }
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

  /** Deterministic synthetic asset table: (asset_id, media_type, meta
    * struct, content BINARY). Blob sizes vary by type; bytes are a pure
    * function of (seed, id).
    */
  def generateAssets(spark: SparkSession, n: Long, seed: Long = 42L): DataFrame = {
    import spark.implicits._
    spark.range(n).map { id =>
      val r = Rng.mix2(seed, id)
      val mt = MediaTypes(Rng.bounded(r, MediaTypes.size))
      val len = mt match {
        case s if s.startsWith("image") => 512 + Rng.bounded(Rng.mix(r), 2048)
        case s if s.startsWith("audio") => 2048 + Rng.bounded(Rng.mix(r), 4096)
        case _                          => 4096 + Rng.bounded(Rng.mix(r), 8192)
      }
      val bytes = new Array[Byte](len)
      var h = r
      var i = 0
      while (i < len) { h = Rng.mix(h); bytes(i) = (h & 0xff).toByte; i += 1 }
      (id, mt, bytes)
    }.toDF("asset_id", "media_type", "content")
  }

  /** Decode + feature-extract over binary columns in partition batches.
    * Output: (asset_id, media_type, width, height, n_frames, embedding).
    */
  def extractFeatures(assets: DataFrame, nDim: Int = 32, framesPerVideo: Int = 4): DataFrame = {
    val spark = assets.sparkSession
    import spark.implicits._
    assets.select("asset_id", "media_type", "content")
      .as[(Long, String, Array[Byte])]
      .mapPartitions { iter =>
        // batch-shaped: one pass per partition, codec state amortized here
        iter.map { case (id, mt, bytes) =>
          val (w, h) = FakeCodec.decodeDims(bytes)
          val isVideo = mt.startsWith("video")
          val frames = if (isVideo) FakeCodec.sampleFrames(bytes, framesPerVideo) else Seq(bytes)
          // mean-pool per-frame features
          val acc = new Array[Float](nDim)
          frames.foreach { fb =>
            val f = FakeCodec.features(fb, nDim)
            var d = 0
            while (d < nDim) { acc(d) += f(d) / frames.size; d += 1 }
          }
          (id, mt, w, h, frames.size, acc)
        }
      }
      .toDF("asset_id", "media_type", "width", "height", "n_frames", "embedding")
  }

  /** Per-media-type stats over extracted features. */
  def featureStats(features: DataFrame): DataFrame =
    features
      .withColumn("norm", sqrt(aggregate(col("embedding"), lit(0.0d),
        (acc, x) => acc + x.cast("double") * x.cast("double"))))
      .groupBy("media_type")
      .agg(
        count(lit(1)).as("n_assets"),
        round(avg("norm"), 4).as("avg_norm"),
        round(avg("width"), 2).as("avg_width"),
        sum("n_frames").as("total_frames"))
}

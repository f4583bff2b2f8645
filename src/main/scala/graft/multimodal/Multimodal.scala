package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal (image/audio/video) column handling for training-data
  * pipelines: media travel as opaque `binary` columns next to typed
  * metadata, and per-item compute runs batched inside `mapPartitions`
  * (the JVM analog of pandas-UDF batching — one decoder instantiation per
  * partition, not per row).
  *
  * The actual codec step is STUBBED (this environment ships no image/audio
  * libraries): [[StubCodec.decode]] derives deterministic fake metadata +
  * pixels from the bytes. Everything around it — schemas, partitioning,
  * batch shape, feature extraction, resize, frame sampling — is real
  * Spark code and is tested.
  */
object Multimodal {

  case class MediaMeta(format: String, width: Int, height: Int, channels: Int,
                       sizeBytes: Long)
  case class DecodedImage(meta: MediaMeta, pixels: Array[Byte])
  case class ImageFeatures(id: Long, format: String, width: Int, height: Int,
                           sizeBytes: Long, histogram: Array[Long],
                           meanIntensity: Double)

  /** STUB decoder — deterministic fake: metadata from a stable hash of the
    * bytes, "pixels" = the bytes themselves. A real deployment swaps this
    * object for a JNI/javax.imageio-backed codec with the same signature. */
  object StubCodec {
    def decode(bytes: Array[Byte]): DecodedImage = {
      val h = java.util.Arrays.hashCode(bytes)
      val fmt = Seq("png", "jpeg", "webp")(math.floorMod(h, 3))
      val w = 16 + math.floorMod(h >> 2, 16)
      val ht = 16 + math.floorMod(h >> 7, 16)
      DecodedImage(MediaMeta(fmt, w, ht, 3, bytes.length.toLong), bytes)
    }

    /** "Resize": deterministic byte-stride subsample to ≈ targetLen. */
    def resize(img: DecodedImage, targetLen: Int): DecodedImage = {
      val stride = math.max(1, img.pixels.length / math.max(1, targetLen))
      val out = img.pixels.indices.by(stride).map(img.pixels).toArray
      img.copy(meta = img.meta.copy(width = out.length, height = 1),
        pixels = out)
    }
  }

  /** Attach a fake binary "image" column derived from a text column —
    * stands in for reading real media files alongside their records. */
  def withFakeImage(df: DataFrame, textCol: String, out: String = "image"): DataFrame =
    df.withColumn(out, encode(col(textCol), "UTF-8"))

  /** Decode + feature-extract, batched per partition. Output schema is the
    * typed [[ImageFeatures]] row — exactly what a downstream training
    * pipeline joins on. The decoder is constructed once per partition. */
  def extractImageFeatures(df: DataFrame, idCol: String, binCol: String,
                           resizeTo: Int = 64): Dataset[ImageFeatures] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(binCol))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        // per-partition decoder state (real codecs are expensive to build)
        val codec = StubCodec
        it.map { case (id, bytes) =>
          val img = codec.resize(codec.decode(bytes), resizeTo)
          val hist = new Array[Long](16)
          var sum = 0.0
          img.pixels.foreach { b =>
            val v = java.lang.Byte.toUnsignedInt(b)
            hist(v >> 4) += 1
            sum += v
          }
          ImageFeatures(id, img.meta.format, img.meta.width, img.meta.height,
            img.meta.sizeBytes, hist,
            if (img.pixels.isEmpty) 0.0 else sum / img.pixels.length)
        }
      }
  }

  /** "Video" frame sampling: treat the binary as a frame sequence of
    * `frameBytes`-sized chunks, keep every `stride`-th frame. Pure Spark
    * expression (no driver loop): explode over computed frame offsets. */
  def sampleFrames(df: DataFrame, idCol: String, binCol: String,
                   frameBytes: Int, stride: Int): DataFrame = {
    val nFrames = floor(length(col(binCol)) / frameBytes).cast("int")
    df.select(col(idCol), col(binCol), nFrames.as("n_frames"))
      .filter(col("n_frames") > 0)
      .select(col(idCol), col(binCol), col("n_frames"),
        explode(sequence(lit(0), col("n_frames") - 1, lit(stride))).as("frame_idx"))
      .select(col(idCol), col("frame_idx"),
        col(binCol).substr(col("frame_idx") * frameBytes + 1, lit(frameBytes))
          .as("frame"))
  }

  /** "Audio" frame energy: treat the binary as unsigned 8-bit samples,
    * window into `frameBytes`-sized frames, and emit per-frame energy
    * (Σ sample²) + RMS — the waveform-analysis analog of the image path.
    * The per-frame sum is exact integer math in a tight JVM loop, so a
    * byte-level SQL oracle reproduces it bit-for-bit. */
  def frameEnergy(df: DataFrame, idCol: String, binCol: String,
                  frameBytes: Int): DataFrame = {
    val energyUdf = udf { (b: Array[Byte]) =>
      var e = 0L
      var i = 0
      while (i < b.length) {
        val v = java.lang.Byte.toUnsignedInt(b(i)); e += v.toLong * v; i += 1
      }
      e
    }
    sampleFrames(df, idCol, binCol, frameBytes, stride = 1)
      .withColumn("energy", energyUdf(col("frame")))
      .withColumn("rms", sqrt(col("energy") / lit(frameBytes.toDouble)))
      .select(col(idCol), col("frame_idx"), col("energy"), col("rms"))
  }

  /** Media metadata quality gate: keep items whose (stub-)decoded shape is
    * plausible for training (the dedup/quality analog for media columns). */
  def filterDecodable(features: Dataset[ImageFeatures], minSize: Long = 1L,
                      minDim: Int = 1): Dataset[ImageFeatures] =
    features.filter(f => f.sizeBytes >= minSize && f.width >= minDim &&
      f.height >= minDim)
}

package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal (image/audio/video) column handling for training-data
  * pipelines: media travel as opaque `binary` columns next to typed
  * metadata, and per-item compute runs batched inside `mapPartitions`
  * (the JVM analog of pandas-UDF batching — one decoder instantiation per
  * partition, not per row).
  *
  * The IMAGE codec step is STUBBED (this environment ships no image
  * libraries): [[StubCodec.decode]] derives deterministic fake metadata +
  * pixels from the bytes. The AUDIO codec is REAL: [[WavCodec]] is a
  * pure-JVM RIFF/WAVE PCM16 encoder + chunk-walking decoder, verified
  * end-to-end by a closed-form oracle (q_mm_wav_roundtrip). Everything
  * around both — schemas, partitioning, batch shape, feature extraction,
  * resize, frame sampling — is real Spark code and is tested.
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

  // ---------------------------------------------------------------- WAV

  /** REAL audio codec — RIFF/WAVE PCM16, pure JVM (ECMA-ish RIFF layout:
    * little-endian chunks; `fmt ` carries rate/channels/bits, `data`
    * carries the samples). Unlike [[StubCodec]], nothing here is fake:
    * these bytes open in any audio tool, and the decoder walks the chunk
    * list like a real parser (tolerating extra chunks such as LIST). */
  object WavCodec {
    case class Wav(sampleRate: Int, channels: Int, bitsPerSample: Int,
                   samples: Array[Short])

    def encode(samples: Array[Short], sampleRate: Int,
               channels: Int = 1): Array[Byte] = {
      val dataLen = samples.length * 2
      val bb = java.nio.ByteBuffer.allocate(44 + dataLen)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      bb.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataLen)
        .put("WAVE".getBytes("US-ASCII"))
      bb.put("fmt ".getBytes("US-ASCII")).putInt(16)
        .putShort(1) // PCM
        .putShort(channels.toShort).putInt(sampleRate)
        .putInt(sampleRate * channels * 2) // byte rate
        .putShort((channels * 2).toShort)  // block align
        .putShort(16)                      // bits per sample
      bb.put("data".getBytes("US-ASCII")).putInt(dataLen)
      samples.foreach(bb.putShort)
      bb.array()
    }

    def decode(bytes: Array[Byte]): Wav = {
      val bb = java.nio.ByteBuffer.wrap(bytes)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      def tag(): String = {
        val b = new Array[Byte](4); bb.get(b); new String(b, "US-ASCII")
      }
      require(tag() == "RIFF", "not a RIFF file")
      bb.getInt() // declared size
      require(tag() == "WAVE", "not a WAVE file")
      var rate = 0; var channels = 0; var bits = 0
      var data: Array[Byte] = null
      while (bb.remaining() >= 8 && (data == null || rate == 0)) {
        val id = tag(); val size = bb.getInt()
        id match {
          case "fmt " =>
            val start = bb.position()
            require(bb.getShort() == 1, "only PCM supported")
            channels = bb.getShort(); rate = bb.getInt()
            bb.getInt(); bb.getShort() // byte rate, block align
            bits = bb.getShort()
            bb.position(start + size + (size & 1)) // chunks pad to even
          case "data" =>
            data = new Array[Byte](size); bb.get(data)
          case _ => // skip unknown chunks (LIST, fact, ...)
            bb.position(bb.position() + size + (size & 1))
        }
      }
      require(rate > 0 && data != null, "missing fmt/data chunk")
      require(bits == 16, "only PCM16 supported")
      val sb = java.nio.ByteBuffer.wrap(data)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN).asShortBuffer()
      val out = new Array[Short](sb.remaining())
      sb.get(out)
      Wav(rate, channels, bits, out)
    }
  }

  /** Deterministic synthetic waveform per id — INTEGER-exact (a centered
    * modular sawtooth, no libm), so an oracle can recompute the same
    * samples in closed form and thereby verify the whole WAV
    * encode→decode round trip byte-for-byte:
    * s(i) = (((i·k + b) mod p)·2 − (p−1))·300 with k,b,p derived from id. */
  private[graft] def synthSamples(id: Long): Array[Short] = {
    val n = (800 + (id % 5) * 160).toInt
    val k = (id % 7 + 2).toInt; val b = (id % 13).toInt
    val p = (20 + (id % 30)).toInt
    Array.tabulate(n)(i => ((((i * k + b) % p) * 2 - (p - 1)) * 300).toShort)
  }

  /** Attach a REAL WAV binary column (synthetic PCM16 waveform per id). */
  def withSyntheticWav(df: DataFrame, idCol: String, out: String = "wav",
                       sampleRate: Int = 8000): DataFrame = {
    val enc = udf { (id: Long) =>
      WavCodec.encode(synthSamples(id), sampleRate)
    }
    df.withColumn(out, enc(col(idCol).cast("long")))
  }

  case class WavFeatures(id: Long, sample_rate: Int, n_samples: Long,
                         duration_s: Double, peak: Long, energy: Long,
                         zero_crossings: Long)

  /** Decode WAV binaries and extract waveform features, batched per
    * partition (one parser instance per batch, as a real codec needs).
    * Every feature is exact integer math except the final duration
    * division — so a closed-form oracle hash-matches the output, which
    * PROVES the encode→decode round trip (a header or byte-order bug
    * would corrupt samples and break the match). */
  def extractWavFeatures(df: DataFrame, idCol: String,
                         binCol: String): Dataset[WavFeatures] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(binCol))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, bytes) =>
          val wav = WavCodec.decode(bytes)
          val s = wav.samples
          var peak = 0L; var energy = 0L; var zc = 0L
          var i = 0
          while (i < s.length) {
            val v = s(i).toLong
            if (math.abs(v) > peak) peak = math.abs(v)
            energy += v * v
            if (i > 0 && ((s(i - 1) < 0 && v >= 0) || (s(i - 1) >= 0 && v < 0)))
              zc += 1
            i += 1
          }
          WavFeatures(id, wav.sampleRate, s.length.toLong,
            s.length.toDouble / wav.sampleRate, peak, energy, zc)
        }
      }
  }
}

package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal (image/audio/video) column handling for training-data
  * pipelines: media travel as opaque `binary` columns next to typed
  * metadata, and per-item compute runs batched inside `mapPartitions`
  * (the JVM analog of pandas-UDF batching — one decoder instantiation per
  * partition, not per row).
  *
  * Codec status: UNCOMPRESSED formats are REAL — [[WavCodec]]
  * (RIFF/WAVE PCM16) and [[BmpCodec]] (BMP BGR24) encode/decode genuine
  * file bytes in pure JVM code, each verified end-to-end by a
  * closed-form oracle (q_mm_wav_roundtrip / q_mm_bmp_roundtrip).
  * COMPRESSED formats (JPEG/MP3/H.264) stay behind [[StubCodec]], which
  * derives deterministic fake metadata from the bytes (this environment
  * ships no compression libraries). Everything around both — schemas,
  * partitioning, batch shape, feature extraction, resize, frame
  * sampling — is real Spark code and is tested.
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

  // ---------------------------------------------------------------- BMP

  /** REAL image codec — uncompressed 24-bit BMP (BITMAPFILEHEADER +
    * BITMAPINFOHEADER, BGR pixel order, rows bottom-up and padded to
    * 4-byte boundaries), pure JVM. Together with [[WavCodec]] this makes
    * both media families round-trip through genuine file bytes; only
    * compressed formats (JPEG/MP3/H.264) remain behind the stub. */
  object BmpCodec {
    case class Bmp(width: Int, height: Int, pixels: Array[Byte]) // BGR rows, top-down

    def encode(img: Bmp): Array[Byte] = {
      require(img.pixels.length == img.width * img.height * 3, "BGR24 size mismatch")
      val rowBytes = img.width * 3
      val pad = (4 - rowBytes % 4) % 4
      val dataLen = (rowBytes + pad) * img.height
      val bb = java.nio.ByteBuffer.allocate(54 + dataLen)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      bb.put('B'.toByte).put('M'.toByte).putInt(54 + dataLen)
        .putInt(0).putInt(54) // reserved, pixel-data offset
      bb.putInt(40).putInt(img.width).putInt(img.height)
        .putShort(1).putShort(24) // planes, bpp
        .putInt(0).putInt(dataLen).putInt(2835).putInt(2835) // BI_RGB, 72 dpi
        .putInt(0).putInt(0)      // palette sizes
      var row = img.height - 1   // BMP stores rows bottom-up
      while (row >= 0) {
        bb.put(img.pixels, row * rowBytes, rowBytes)
        var i = 0
        while (i < pad) { bb.put(0.toByte); i += 1 }
        row -= 1
      }
      bb.array()
    }

    def decode(bytes: Array[Byte]): Bmp = {
      val bb = java.nio.ByteBuffer.wrap(bytes)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      require(bb.get() == 'B'.toByte && bb.get() == 'M'.toByte, "not a BMP")
      bb.getInt(); bb.getInt()
      val dataOffset = bb.getInt()
      val headerSize = bb.getInt()
      require(headerSize >= 40, "unsupported DIB header")
      val w = bb.getInt(); val h = bb.getInt()
      require(bb.getShort() == 1, "bad plane count")
      require(bb.getShort() == 24, "only 24-bit BMP supported")
      require(bb.getInt() == 0, "only uncompressed BI_RGB supported")
      require(h > 0 && w > 0, "top-down/degenerate BMP unsupported")
      val rowBytes = w * 3
      val pad = (4 - rowBytes % 4) % 4
      val out = new Array[Byte](rowBytes * h)
      var row = h - 1
      var pos = dataOffset
      while (row >= 0) {
        System.arraycopy(bytes, pos, out, row * rowBytes, rowBytes)
        pos += rowBytes + pad
        row -= 1
      }
      Bmp(w, h, out)
    }
  }

  /** Deterministic synthetic image per id — INTEGER-exact pixel function
    * (no float), so a closed-form oracle can verify the BMP round trip:
    * at (x, y): b = (x·3 + y·7 + id) mod 256, g = (x + y·11 + id·5) mod
    * 256, r = (x·13 + y + id·9) mod 256. Odd widths exercise row padding. */
  private[graft] def synthPixels(id: Long, w: Int, h: Int): Array[Byte] = {
    val out = new Array[Byte](w * h * 3)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val o = (y * w + x) * 3
        out(o) = (((x * 3 + y * 7 + id) % 256).toInt & 0xff).toByte
        out(o + 1) = (((x + y * 11 + id * 5) % 256).toInt & 0xff).toByte
        out(o + 2) = (((x * 13 + y + id * 9) % 256).toInt & 0xff).toByte
        x += 1
      }
      y += 1
    }
    out
  }

  /** Attach a REAL BMP binary column (synthetic BGR24 image per id; odd
    * widths 17..31 force nonzero row padding through the codec). */
  def withSyntheticBmp(df: DataFrame, idCol: String, out: String = "bmp"): DataFrame = {
    val enc = udf { (id: Long) =>
      val w = (17 + (id % 15)).toInt; val h = (9 + (id % 7)).toInt
      BmpCodec.encode(BmpCodec.Bmp(w, h, synthPixels(id, w, h)))
    }
    df.withColumn(out, enc(col(idCol).cast("long")))
  }

  case class BmpFeatures(id: Long, width: Int, height: Int, size_bytes: Long,
                         sum_b: Long, sum_g: Long, sum_r: Long)

  /** Decode BMP binaries → per-channel pixel sums, batched per partition.
    * Exact integer output, so the closed-form oracle hash-matches — which
    * proves the encode→decode round trip including bottom-up row order
    * and 4-byte row padding. */
  def extractBmpFeatures(df: DataFrame, idCol: String,
                         binCol: String): Dataset[BmpFeatures] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(binCol))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, bytes) =>
          val img = BmpCodec.decode(bytes)
          var sb = 0L; var sg = 0L; var sr = 0L
          var i = 0
          while (i < img.pixels.length) {
            sb += java.lang.Byte.toUnsignedInt(img.pixels(i))
            sg += java.lang.Byte.toUnsignedInt(img.pixels(i + 1))
            sr += java.lang.Byte.toUnsignedInt(img.pixels(i + 2))
            i += 3
          }
          BmpFeatures(id, img.width, img.height, bytes.length.toLong, sb, sg, sr)
        }
      }
  }

  /** Nearest-neighbor downsample THROUGH the real codec: decode BGR24,
    * sample every `factor`-th pixel (floor mapping, target dims = source
    * div factor), re-encode. Batched per partition like every codec-
    * boundary op. Because the sampled pixels are exact source bytes, a
    * closed-form oracle over the resized grid proves the whole
    * decode→resize→encode→decode chain (row order, padding, and the
    * sampling arithmetic). */
  def resizeBmpNearest(df: DataFrame, idCol: String, binCol: String,
                       factor: Int = 2): DataFrame = {
    require(factor >= 1)
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(binCol))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, bytes) =>
          val img = BmpCodec.decode(bytes)
          val w2 = math.max(1, img.width / factor)
          val h2 = math.max(1, img.height / factor)
          val outPx = new Array[Byte](w2 * h2 * 3)
          var y = 0
          while (y < h2) {
            var x = 0
            while (x < w2) {
              val so = ((y * factor) * img.width + (x * factor)) * 3
              val to = (y * w2 + x) * 3
              outPx(to) = img.pixels(so)
              outPx(to + 1) = img.pixels(so + 1)
              outPx(to + 2) = img.pixels(so + 2)
              x += 1
            }
            y += 1
          }
          (id, BmpCodec.encode(BmpCodec.Bmp(w2, h2, outPx)))
        }
      }.toDF(idCol, binCol)
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

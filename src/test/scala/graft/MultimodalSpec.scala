package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.multimodal.Multimodal

class MultimodalSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  def docs = Seq((1L, "hello world this is a binary payload of some length"),
    (2L, "x"), (3L, "another somewhat longer document body for frames"))
    .toDF("doc_id", "text")

  test("fake image column is the utf-8 bytes of the text") {
    val df = Multimodal.withFakeImage(docs, "text")
    val row = df.filter(col("doc_id") === 2L).select("image").head
    assert(row.getAs[Array[Byte]](0).toSeq == "x".getBytes("UTF-8").toSeq)
  }

  test("feature extraction is deterministic, typed, and batched") {
    val df = Multimodal.withFakeImage(docs, "text")
    val f1 = Multimodal.extractImageFeatures(df, "doc_id", "image").collect()
    val f2 = Multimodal.extractImageFeatures(df, "doc_id", "image").collect()
    assert(f1.map(_.id).sorted.toSeq == Seq(1L, 2L, 3L))
    assert(f1.sortBy(_.id).zip(f2.sortBy(_.id)).forall { case (a, b) =>
      a.format == b.format && a.meanIntensity == b.meanIntensity &&
        a.histogram.toSeq == b.histogram.toSeq
    })
    val one = f1.find(_.id == 1L).get
    assert(one.sizeBytes == 51 && one.histogram.sum > 0 && one.meanIntensity > 0)
  }

  test("frame sampling chunks the binary with stride") {
    val df = Multimodal.withFakeImage(docs, "text")
    val frames = Multimodal.sampleFrames(df, "doc_id", "image",
      frameBytes = 10, stride = 2).collect()
    // doc 1: 51 bytes → 5 frames → idx 0,2,4; doc 2: 1 byte → 0 frames;
    // doc 3: 48 bytes → 4 frames → idx 0,2
    val byDoc = frames.groupBy(_.getLong(0)).view.mapValues(_.map(_.getInt(1)).sorted.toSeq)
    assert(byDoc(1L) == Seq(0, 2, 4))
    assert(!byDoc.contains(2L))
    assert(byDoc(3L) == Seq(0, 2))
    val f0 = frames.find(r => r.getLong(0) == 1L && r.getInt(1) == 0).get
    assert(new String(f0.getAs[Array[Byte]](2), "UTF-8") == "hello worl")
  }

  test("audio frame energy is the exact integer sum of squared samples") {
    import spark.implicits._
    val df = Seq((1L, "ab")).toDF("id", "txt")   // 'a'=97, 'b'=98
    val out = Multimodal.frameEnergy(
      Multimodal.withFakeImage(df, "txt", out = "audio"), "id", "audio",
      frameBytes = 2).collect()
    assert(out.length == 1)
    assert(out(0).getLong(2) == 97L * 97 + 98L * 98)
    assert(math.abs(out(0).getDouble(3) -
      math.sqrt((97.0 * 97 + 98 * 98) / 2.0)) == 0.0)
  }

  test("decodability gate filters degenerate media") {
    val df = Multimodal.withFakeImage(docs, "text")
    val feats = Multimodal.extractImageFeatures(df, "doc_id", "image")
    assert(Multimodal.filterDecodable(feats, minSize = 2L).collect()
      .map(_.id).sorted.toSeq == Seq(1L, 3L))
  }

  test("WAV codec round-trips PCM16 exactly and tolerates extra chunks") {
    import Multimodal.WavCodec
    val samples = Array[Short](0, 1, -1, 32767, -32768, 12345, -12345)
    val bytes = WavCodec.encode(samples, sampleRate = 8000)
    // RIFF magic + declared lengths
    assert(new String(bytes.take(4), "US-ASCII") == "RIFF")
    assert(new String(bytes.slice(8, 12), "US-ASCII") == "WAVE")
    assert(bytes.length == 44 + samples.length * 2)
    val wav = WavCodec.decode(bytes)
    assert(wav.sampleRate == 8000 && wav.channels == 1 && wav.bitsPerSample == 16)
    assert(wav.samples.toSeq == samples.toSeq)
    // a LIST chunk between fmt and data must be skipped, not parsed
    val bb = java.nio.ByteBuffer.allocate(bytes.length + 12)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put(bytes, 0, 36) // up to end of fmt chunk
    bb.put("LIST".getBytes("US-ASCII")).putInt(4).put("INFO".getBytes("US-ASCII"))
    bb.put(bytes, 36, bytes.length - 36)
    val withList = bb.array()
    // fix the RIFF size field for the inserted 12 bytes
    java.nio.ByteBuffer.wrap(withList).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      .putInt(4, withList.length - 8)
    assert(WavCodec.decode(withList).samples.toSeq == samples.toSeq)
    // garbage is rejected, not misparsed
    intercept[IllegalArgumentException] {
      WavCodec.decode("not a wav at all".getBytes)
    }
  }

  test("BMP codec round-trips BGR24 exactly, incl. odd-width row padding") {
    import Multimodal.BmpCodec
    for ((w, h) <- Seq((17, 9), (4, 4), (1, 3))) { // 17*3=51 → 1 pad byte
      val px = Multimodal.synthPixels(5L, w, h)
      val bytes = BmpCodec.encode(BmpCodec.Bmp(w, h, px))
      assert(bytes(0) == 'B'.toByte && bytes(1) == 'M'.toByte)
      val rowBytes = w * 3; val pad = (4 - rowBytes % 4) % 4
      assert(bytes.length == 54 + (rowBytes + pad) * h)
      val back = BmpCodec.decode(bytes)
      assert(back.width == w && back.height == h)
      assert(back.pixels.toSeq == px.toSeq)
    }
    intercept[IllegalArgumentException] {
      Multimodal.BmpCodec.decode("PNG?definitely-not-bmp".getBytes)
    }
  }

  test("synthetic WAV features match a direct computation of the waveform") {
    import spark.implicits._
    val df = Seq(3L, 7L).toDF("doc_id")
    val got = Multimodal.extractWavFeatures(
      Multimodal.withSyntheticWav(df, "doc_id"), "doc_id", "wav")
      .collect().map(f => f.id -> f).toMap
    for (id <- Seq(3L, 7L)) {
      val s = Multimodal.synthSamples(id)
      val f = got(id)
      assert(f.n_samples == s.length)
      assert(f.peak == s.map(v => math.abs(v.toLong)).max)
      assert(f.energy == s.map(v => v.toLong * v).sum)
      val zc = (1 until s.length).count(i =>
        (s(i - 1) < 0 && s(i) >= 0) || (s(i - 1) >= 0 && s(i) < 0))
      assert(f.zero_crossings == zc)
    }
  }

  test("nearest-neighbor BMP resize samples exactly the (fx, fy) pixels") {
    import spark.implicits._
    val w = 5; val h = 4
    val px = Multimodal.synthPixels(42L, w, h)
    val bytes = Multimodal.BmpCodec.encode(Multimodal.BmpCodec.Bmp(w, h, px))
    val resized = Multimodal.resizeBmpNearest(
      Seq((42L, bytes)).toDF("id", "bmp"), "id", "bmp", factor = 2)
      .collect().head.getAs[Array[Byte]]("bmp")
    val img = Multimodal.BmpCodec.decode(resized)
    assert(img.width == 2 && img.height == 2)
    for (y <- 0 until 2; x <- 0 until 2; c <- 0 until 3) {
      val expected = px(((y * 2) * w + (x * 2)) * 3 + c)
      assert(img.pixels((y * 2 + x) * 3 + c) == expected,
        s"pixel ($x,$y) channel $c")
    }
  }
}

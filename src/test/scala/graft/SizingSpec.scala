package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.core.Sizing

/** Pins the data-sized shuffle-partition rule (SCALE.md round-11: the
  * sf10 gate OOM'd pagerank/triangles under cores-sized partitions and
  * passed at 96-192; the rule must land sf10 in that band WITHOUT an
  * env override while leaving harness scales at the core count). */
class SizingSpec extends AnyFunSuite {

  test("rule: cores floor at harness scales, data-sized past sf1") {
    val mib = 1024L * 1024
    // sf0.1 (~17 MiB) and sf1 (~156 MiB): clamped to cores — harness
    // timings untouched
    assert(Sizing.partitionsFor(17 * mib, 32) === 32)
    assert(Sizing.partitionsFor(156 * mib, 32) === 32)
    // sf10 (~1,560 MiB on disk): inside the empirically-passing 96-192
    // band with no override
    val sf10 = Sizing.partitionsFor(1560 * mib, 32)
    assert(sf10 >= 96 && sf10 <= 192, s"sf10 -> $sf10")
    // monotone in data, linear asymptotically: 10x the bytes -> ~10x
    // the partitions once past the cores floor
    val p1 = Sizing.partitionsFor(10L * 1024 * mib, 32)
    val p10 = Sizing.partitionsFor(100L * 1024 * mib, 32)
    assert(p10 >= 9 * p1 && p10 <= 11 * p1)
    // empty/missing data: the cores floor, never zero
    assert(Sizing.partitionsFor(0L, 32) === 32)
  }

  test("footer-calibrated expansion: typical catalog table reproduces " +
    "~8x; a high-decode table gets proportionally more partitions") {
    val spark = TestSpark.spark
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("sizingx").toFile
    // numeric-heavy table (the catalog's typical shape): snappy barely
    // compresses quantized doubles/ids — footer ratio ~1.0-1.5
    (0 until 20000).map(i => (i.toLong, i * 3.7, i % 97))
      .toDF("id", "v", "k").repartition(1)
      .write.parquet(s"$dir/nums.parquet")
    // plain-text-JSON-shaped table: repetitive keys + prose compress
    // 4x+ on disk, so decoded bytes blow up well past the catalog 8x
    (0 until 20000).map(i =>
        (i.toLong, s"""{"event":"page_view","user_agent":"Mozilla/5.0 """ +
          s"""(X11; Linux x86_64) AppleWebKit/537.36","path":"/catalog/""" +
          s"""items/$i","referrer":"https://example.com/search?q=widget""" +
          s""","payload":"${"lorem ipsum dolor sit amet " * 8}"}"""))
      .toDF("id", "json").repartition(1)
      .write.parquet(s"$dir/events_json.parquet")
    val numsR = Sizing.footerRatio(
      new org.apache.hadoop.fs.Path(s"$dir/nums.parquet"))
    val jsonR = Sizing.footerRatio(
      new org.apache.hadoop.fs.Path(s"$dir/events_json.parquet"))
    assert(numsR.nonEmpty && jsonR.nonEmpty)
    // the typical table lands near the old catalog constant...
    val numsExp = Sizing.expansionOf(numsR)
    assert(numsExp >= 4 && numsExp <= 12, s"nums expansion $numsExp")
    // ...the JSON-ish table measures a decode ratio the constant missed
    val jsonExp = Sizing.expansionOf(jsonR)
    assert(jsonExp > 12, s"json expansion $jsonExp (ratio $jsonR)")
    // and the session-level rule gives it MORE partitions than the 8x
    // rule would (scaled to a size where partitions exceed the floor)
    val jsonBytes = Sizing.dataBytes(s"$dir/events_json.parquet")
    val scale = (4L * 1024 * 1024 * 1024) / jsonBytes // pretend ~4 GiB
    val fixed = Sizing.partitionsFor(jsonBytes * scale, 32)
    val measured = Sizing.partitionsForExpanded(
      (jsonBytes * scale * jsonExp).toLong, 32)
    assert(measured > fixed, s"measured $measured <= fixed $fixed")
    // missing footer (empty dir) → the fallback constant
    assert(Sizing.expansionOf(None) === 8.0)
  }

  test("expandedBytes degrades to 0 on unreadable roots; footerRatio " +
    "skips empty part files") {
    assert(Sizing.expandedBytes("/nonexistent/sizing/root") === 0L)
    // a dir with only an empty .parquet file: no blocks → None → caller
    // falls back to the catalog constant, never throws
    val dir = java.nio.file.Files.createTempDirectory("sizinge").toFile
    val t = new java.io.File(dir, "t.parquet"); t.mkdirs()
    java.nio.file.Files.write(new java.io.File(t, "part-0.parquet").toPath,
      Array.empty[Byte])
    assert(Sizing.footerRatio(
      new org.apache.hadoop.fs.Path(t.getAbsolutePath)) === None)
  }

  test("dataBytes sums files recursively through the Hadoop FS") {
    val dir = java.nio.file.Files.createTempDirectory("sizing").toFile
    val sub = new java.io.File(dir, "t.parquet")
    sub.mkdirs()
    java.nio.file.Files.write(new java.io.File(sub, "a.bin").toPath,
      Array.fill[Byte](1000)(1))
    java.nio.file.Files.write(new java.io.File(dir, "b.bin").toPath,
      Array.fill[Byte](500)(2))
    assert(Sizing.dataBytes(dir.getAbsolutePath) === 1500L)
    assert(Sizing.dataBytes(dir.getAbsolutePath + "/absent") === 0L)
  }
}

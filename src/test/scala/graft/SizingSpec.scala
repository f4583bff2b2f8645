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

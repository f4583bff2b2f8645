package graft

import org.scalatest.funsuite.AnyFunSuite

/** Replays the round-11 DRIVER bench (loaded machine, 42 uniform-offset
  * false mem flags under the old gate) through [[BenchGates]]: the
  * contention floor must zero the false flags while a synthetic
  * single-query regression is still caught, and the bound classifier
  * must reproduce the round-11 judging's hand inference. */
class BenchGatesSpec extends AnyFunSuite {

  private lazy val fixture: (Map[String, Long], Map[String, Long],
                             Map[String, (Double, Long, Long, Long)]) = {
    val src = scala.io.Source.fromInputStream(
      getClass.getResourceAsStream("/r11_loaded_bench.json"))
    val txt = try src.mkString finally src.close()
    // minimal extraction (no JSON lib on the classpath): per-query
    // objects are flat with known keys
    val entry = ("\"(q_[a-z0-9_]+)\":\\{\"budget\":(\\d+),\"mem_peak\":(\\d+)," +
      "\"time\":([-0-9.]+),\"exec_run_ms\":(\\d+),\"gc_ms\":(\\d+)," +
      "\"jobs\":(\\d+)\\}").r
    val rows = entry.findAllMatchIn(txt).map { m =>
      (m.group(1), m.group(2).toLong, m.group(3).toLong, m.group(4).toDouble,
        m.group(5).toLong, m.group(6).toLong, m.group(7).toLong)
    }.toSeq
    assert(rows.size > 200, s"fixture parse found only ${rows.size} rows")
    (rows.map(r => r._1 -> r._2).toMap,
      rows.map(r => r._1 -> r._3).toMap,
      rows.map(r => r._1 -> ((r._4, r._5, r._6, r._7))).toMap)
  }

  test("r11 loaded run: zero false mem flags under the contention floor") {
    val (budget, measured, _) = fixture
    val slack = 64L * 1024 * 1024
    // the old (floorless) gate: the 42 false flags the driver saw
    val (_, before) = BenchGates.regressions(budget, measured, slack,
      floored = false)
    assert(before.size >= 40, s"expected the r11 flag storm, got ${before.size}")
    // the floored gate: all of them were machine-side page noise
    val (floor, after) = BenchGates.regressions(budget, measured, slack,
      floored = true)
    assert(floor > 0)
    assert(after.isEmpty, s"false flags survived: ${after.map(_._1)}")
  }

  test("synthetic single-query regression is still caught under load") {
    val (budget, measured, _) = fixture
    val slack = 64L * 1024 * 1024
    // triple one query's measured memory on TOP of the loaded run —
    // a genuine plan regression (e.g. a sort buffering 3x the rows)
    val k = "q_t8_spearman"
    val bumped = measured.updated(k, 3 * measured(k))
    val (_, flags) = BenchGates.regressions(budget, bumped, slack,
      floored = true)
    assert(flags.map(_._1) == Seq(k),
      s"expected exactly [$k], got ${flags.map(_._1)}")
  }

  test("idle run: floor vanishes, gate keeps full sensitivity") {
    val budget = (1 to 50).map(i => s"q_$i" -> 100L * 1024 * 1024).toMap
    val idle = budget.map { case (k, b) => k -> (b + 1024 * 1024) }
    val (floor0, none) = BenchGates.regressions(budget, idle,
      64L * 1024 * 1024, floored = true)
    assert(floor0 <= 2L * 1024 * 1024 && none.isEmpty)
    val regressed = idle.updated("q_7", 400L * 1024 * 1024)
    val (_, one) = BenchGates.regressions(budget, regressed,
      64L * 1024 * 1024, floored = true)
    assert(one.map(_._1) == Seq("q_7"))
  }

  test("bound classifier reproduces the r11 hand inference") {
    val (_, _, tel) = fixture
    val cores = 32
    val jl = 0.139 // the r11 loaded run's own job-latency probe
    // q_a_histogram: 9.15 s wall at 3.5 s summed exec, 0 GC, 6 jobs —
    // the judging's worked example of a scheduler-bound burst
    val (t, er, gc, nj) = tel("q_a_histogram")
    assert(t > 5.0, s"fixture drifted: q_a_histogram t=$t")
    assert(BenchGates.bound(t, er, gc, nj, cores, jl) == "scheduler")
    // q_g_pagerank: 121 s of task work across 32 cores in a ~5 s wall —
    // genuinely compute-bound
    val (t2, er2, gc2, nj2) = tel("q_g_pagerank")
    assert(BenchGates.bound(t2, er2, gc2, nj2, cores, jl) == "exec")
    // an unremarkable small query whose wall is explained by its job
    // count times the run's own per-job latency is idle-consistent —
    // the expected-wall term is what keeps an idle catalog from being
    // mass-classified scheduler-bound
    assert(BenchGates.bound(0.2, 640, 0, 2, cores, jl) == "idle-consistent")
    assert(BenchGates.bound(0.9, 640, 0, 6, cores, 0.11) == "idle-consistent")
    // ...but the same shape at 5x the explained wall is a spike
    assert(BenchGates.bound(4.5, 640, 0, 6, cores, 0.11) == "scheduler")
    // GC-dominated: pauses cover most of the per-core wall
    assert(BenchGates.bound(4.0, 8000, 64000, 2, cores, jl) == "gc")
  }
}

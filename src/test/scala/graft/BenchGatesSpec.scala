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

  /** Second recorded machine signature (round-12 driver loaded run):
    * mildly contended — job latency 1.22x idle, page offsets small. */
  private lazy val fixtureR12: (Map[String, Long], Map[String, Long]) = {
    val src = scala.io.Source.fromInputStream(
      getClass.getResourceAsStream("/r12_loaded_bench.json"))
    val txt = try src.mkString finally src.close()
    val entry = ("\"(q_[a-z0-9_]+)\":\\{\"budget\":(\\d+),\"mem_peak\":(\\d+)," +
      "\"time\":([-0-9.]+),\"exec_run_ms\":(\\d+),\"gc_ms\":(\\d+)," +
      "\"jobs\":(\\d+)\\}").r
    val rows = entry.findAllMatchIn(txt).map { m =>
      (m.group(1), m.group(2).toLong, m.group(3).toLong)
    }.toSeq
    assert(rows.size > 200, s"r12 fixture parse found only ${rows.size} rows")
    (rows.map(r => r._1 -> r._2).toMap, rows.map(r => r._1 -> r._3).toMap)
  }

  test("r12 loaded run (second machine signature): no flags, floor stays " +
    "near zero, and a planted regression is caught") {
    val (budget, measured) = fixtureR12
    val slack = 64L * 1024 * 1024
    // the r12 driver run gated clean live; the replay must agree — and
    // unlike r11, its contention floor is small (mild load), so the
    // floor mechanism is exercised at BOTH ends of the load spectrum
    val (floor, flags) = BenchGates.regressions(budget, measured, slack,
      floored = true)
    assert(flags.isEmpty, s"replay flagged: ${flags.map(_._1)}")
    assert(floor < 16L * 1024 * 1024, s"unexpected large floor $floor")
    // sensitivity intact on THIS signature too
    val k = "q_t8_spearman"
    val bumped = measured.updated(k, math.max(3 * measured(k), 512L << 20))
    val (_, one) = BenchGates.regressions(budget, bumped, slack,
      floored = true)
    assert(one.map(_._1).contains(k))
  }

  test("K-wide simultaneous regression: floor suppressed without load " +
    "evidence, every query flagged") {
    val (budget, measured, _) = fixture
    val slack = 64L * 1024 * 1024
    // a shared-operator change inflates K queries' mem_peak 4x in an
    // IDLE run (job latency at baseline → loadEvidence = false). The
    // unconditional floor would absorb all but K-1 of them; the
    // evidence-gated floor flags every one.
    val victims = budget.filter(_._2 > 0).keys.take(6).toSeq
    val idleish = budget.map { case (k, b) =>
      k -> (if (victims.contains(k)) 4 * b + 2 * slack else b)
    }
    val (floor, flags) = BenchGates.regressions(budget, idleish, slack,
      floored = true, loadEvidence = false)
    assert(floor === 0L)
    assert(victims.forall(v => flags.map(_._1).contains(v)),
      s"missed: ${victims.filterNot(flags.map(_._1).contains)}")
    // the same plant under an unconditionally-applied floor shows the
    // blind spot the evidence gate closes: the floor eats into the
    // uniform plant (K > contentionFloor's K-1 masking bound here, so
    // some still flag — but the margin collapses)
    val (floorU, _) = BenchGates.regressions(budget, idleish, slack,
      floored = true, loadEvidence = true)
    assert(floorU > 0L)
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

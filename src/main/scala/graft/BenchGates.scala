package graft

/** Budget-gate + spike-attribution logic, factored out of [[Bench]] so a
  * spec can replay recorded driver runs through it (BenchGatesSpec pins
  * the round-11 loaded run: 42 uniform-offset false mem flags before,
  * zero after, synthetic single-query regression still caught). */
object BenchGates {

  /** Run-level contention floor for the MEMORY gate.
    *
    * `peakExecutionMemory` is contention-sensitive: under a loaded
    * machine the same plan grabs more allocator pages, and the round-11
    * driver run showed the signature exactly — half the catalog over
    * its idle-seeded budget by quantized page multiples (+56/+112/+168/
    * ... MiB), 42 flags, zero real regressions. An offset shared across
    * many queries is self-identifying: a genuine regression moves ONE
    * query (its delta is set by its own data), machine noise moves the
    * whole run. The floor is the K-th largest over-budget delta with
    * K = max(3, ceil(n/64)): in an idle run deltas sit at ~0 so the
    * floor vanishes and the gate keeps full sensitivity; in a loaded
    * run the top deltas are the noise ceiling and everything below it
    * clears. Cost: K-1 queries regressing SIMULTANEOUSLY in a loaded
    * run can mask each other — the committed idle bench (floor 0)
    * still catches them the next round. */
  def contentionFloor(deltas: Seq[Long]): Long = {
    if (deltas.isEmpty) 0L
    else {
      val k = math.max(3, (deltas.size + 63) / 64)
      val top = deltas.sorted(Ordering[Long].reverse)
      if (top.size < k) 0L else math.max(0L, top(k - 1))
    }
  }

  /** Queries whose measured value, after subtracting `floor`, exceeds
    * 2x budget AND budget + slack. Returns (floor, flagged).
    *
    * `loadEvidence` gates the floor on independent proof the run was
    * actually contended (the caller compares its own job-latency probe
    * against the committed idle baseline — r11 loaded probed 1.56x
    * idle, r12 loaded 1.22x). Without it, a GENUINE uniform regression
    * (a shared-operator change inflating mem_peak across the catalog in
    * an idle run) would raise the floor to its own delta and silently
    * clear itself; with the gate, an idle-latency run keeps floor 0 and
    * flags every query. When the suppressed floor would have been
    * non-trivial the caller should surface it loudly — that combination
    * (uniform offsets at idle latency) IS the shared-regression
    * signature, not noise. */
  def regressions(budget: Map[String, Long], measured: Map[String, Long],
                  slack: Long, floored: Boolean,
                  loadEvidence: Boolean = true)
  : (Long, Seq[(String, Long, Long)]) = {
    val deltas = budget.toSeq.flatMap { case (k, b) =>
      measured.get(k).map(_ - b)
    }
    val floor =
      if (floored && loadEvidence) contentionFloor(deltas) else 0L
    val flagged = budget.toSeq.collect {
      case (k, b) if measured.get(k).exists(m =>
        (m - floor) > 2 * b && (m - floor) - b > slack) =>
          (k, b, measured(k))
    }.sortBy(-_._3)
    (floor, flagged)
  }

  /** Machine-classification of a query's wall time — the inference the
    * round-11 judging did by hand from (wall, exec_run, gc, jobs),
    * computed into the artifact:
    *
    *  - `exec`: task work explains the wall (exec_run spread over the
    *    cores covers >= 40% of it) — genuinely compute/IO-bound.
    *  - `gc`: GC pauses cover >= 25% of the wall's per-core budget.
    *  - `scheduler`: wall is > 2x what work + GC + the run's OWN
    *    measured per-job latency explain, over >= 3 jobs. Including
    *    jobs x jobLatency in the expected-wall term is what keeps an
    *    idle run idle-consistent: every small Spark query pays the
    *    per-job setup cost, and a classifier that ignores it calls
    *    the whole idle catalog scheduler-bound (measured: 177/236).
    *    Under load the latency probe itself inflates, and a query
    *    whose wall STILL exceeds twice the inflated expectation is
    *    the genuine spike signature (byte-flat, GC-flat, exec-flat).
    *  - `idle-consistent`: none of the above — the wall is what an
    *    unloaded machine would give. */
  def bound(tSec: Double, execRunMs: Long, gcMs: Long, jobs: Long,
            cores: Int, jobLatencySec: Double): String = {
    if (tSec <= 0) "idle-consistent"
    else {
      val execSec = execRunMs / 1000.0 / cores
      val gcSec = gcMs / 1000.0 / cores
      val expected = execSec + gcSec + jobs * jobLatencySec + 0.2
      if (execSec >= 0.4 * tSec) "exec"
      else if (gcSec >= 0.25 * tSec) "gc"
      else if (tSec > 2 * expected && jobs >= 3) "scheduler"
      else "idle-consistent"
    }
  }
}

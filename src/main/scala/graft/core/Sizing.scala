package graft.core

/** Shuffle-partition sizing: partitions follow the DATA, not the core
  * count, past the scale where cores-sized partitions stop fitting in
  * execution memory.
  *
  * The sf10 gate measured the failure concretely: 100M-row edge
  * relations under partitions=32 push per-task sorts past execution
  * memory and OOM q_g_pagerank/q_g_triangles; 96-192 partitions pass
  * (SCALE.md round-11 notes). At 100 TB nobody exports an env var per
  * query — the session must compute this at setup.
  *
  * Rule: one shuffle partition per ~128 MiB of EXPANDED input,
  * floor-clamped to the core count so small scales keep full
  * parallelism. Parquet on-disk bytes under-state the in-memory/shuffle
  * footprint by roughly the codec + row-overhead factor; 8x is the
  * measured expansion for this catalog's tables (sf10 = 1,560 MiB on
  * disk -> 98 partitions, inside the empirically-passing 96-192 band;
  * sf1 and below stay at the core count, so harness-scale timings are
  * untouched). AQE coalesces the small end back down per stage, so the
  * only cost of over-estimating is scheduler overhead that AQE removes.
  *
  * SPARK_GRAFT_SHUFFLE_PARTITIONS remains an explicit override for
  * experiments; absent it, Verify/Bench/IsoBench size from the sf dir. */
object Sizing {
  val TargetPartitionBytes: Long = 128L * 1024 * 1024
  val ParquetExpansion: Long = 8L

  /** Total file bytes under `dir`, resolved through the path's Hadoop
    * FileSystem (works for hdfs:///s3a:// table roots, not just local
    * disk). Missing dir = 0 (callers fall back to the core count). */
  def dataBytes(dir: String,
                conf: org.apache.hadoop.conf.Configuration =
                  new org.apache.hadoop.conf.Configuration()): Long = {
    val p = new org.apache.hadoop.fs.Path(dir)
    val fs = p.getFileSystem(conf)
    if (!fs.exists(p)) 0L
    else fs.getContentSummary(p).getLength
  }

  /** The sizing rule itself, pure so a spec can pin it. */
  def partitionsFor(bytes: Long, cores: Int): Int = {
    val byData = (bytes * ParquetExpansion + TargetPartitionBytes - 1) /
      TargetPartitionBytes
    math.max(cores.toLong, byData).min(Int.MaxValue).toInt
  }

  /** Partitions for a session reading `sfDir`: env override first, else
    * the data-sized rule. */
  def shufflePartitions(sfDir: String, cores: Int): Int =
    sys.env.get("SPARK_GRAFT_SHUFFLE_PARTITIONS").map(_.toInt)
      .getOrElse(partitionsFor(dataBytes(sfDir), cores))
}

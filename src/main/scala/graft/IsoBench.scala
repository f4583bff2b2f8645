package graft
import org.apache.spark.sql.SparkSession

/** Dev harness: time named queries in ISOLATION (warmup + 3 iters, min) —
  * the only trustworthy way to adjudicate a per-query bench regression
  * (round-3 lesson: single-shot JIT noise; round-4 lesson: shared-JVM
  * pollution). Usage: runMain graft.IsoBench q_a,q_b [sfDir]. */
object IsoBench {
  def main(args: Array[String]): Unit = {
    val names = args(0).split(",")
    val sfDir = args.lift(1).getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions",
        graft.core.Sizing.shufflePartitions(sfDir, cpus.toInt))
      // shuffle scratch override only (SPARK_GRAFT_LOCAL_DIR; Sizing.localDir doc)
      .config(graft.core.Sizing.localDir(sfDir).map("spark.local.dir" -> _).toMap)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000).selectExpr("sum(id)").collect()
    names.foreach { name =>
      val fn = SparkEntry.queries(name)
      // cold = the first materialization, timed too: for queries whose
      // fitted parameters are process-memoized (tournament accuracies,
      // the shared forest model) the warm iterations measure only
      // scoring — cold is the honest fit-inclusive number
      val c0 = System.nanoTime()
      fn(spark, sfDir).count()
      val cold = (System.nanoTime() - c0) / 1e9
      val leakedBeforeSweep = graft.ops.Leaks.persistentRddCount(spark)
      graft.ops.Leaks.sweep(spark)
      val times = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        fn(spark, sfDir).count()
        val dt = (System.nanoTime() - t0) / 1e9
        graft.ops.Leaks.sweep(spark)
        dt
      }
      println(f"[iso] $name min=${times.min}%.3f cold=$cold%.3f " +
        s"times=${times.map(t => f"$t%.2f").mkString(",")} " +
        s"pinned_after_materialize=$leakedBeforeSweep " +
        s"pinned_after_sweep=${graft.ops.Leaks.persistentRddCount(spark)}")
    }
    spark.stop()
  }
}

package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart, SparkListenerStageCompleted}

/** Dumps `.explain("formatted")` of queries matching a regex into
  * per-query files — the plans/r13/<query>_{before,after}.txt evidence
  * trail. args: <regex> <outDir> <suffix> [sfDir]. */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val pat = args(0).r
    val outDir = java.nio.file.Paths.get(args(1))
    val suffix = args(2)
    val sfDir = args.lift(3).getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions",
        graft.core.Sizing.shufflePartitions(sfDir, cpus.toInt))
      .config(graft.core.Sizing.localDir(sfDir).map("spark.local.dir" -> _).toMap)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    java.nio.file.Files.createDirectories(outDir)
    SparkEntry.queries.keys.toSeq.sorted
      .filter(n => pat.findFirstIn(n).isDefined).foreach { name =>
        val plan =
          try SparkEntry.queries(name)(spark, sfDir).queryExecution
            .explainString(org.apache.spark.sql.execution.ExplainMode
              .fromString("formatted"))
          catch { case e: Throwable => s"PLAN FAILED: ${e.getMessage}\n" }
        java.nio.file.Files.writeString(
          outDir.resolve(s"${name}_$suffix.txt"), plan)
        graft.ops.Leaks.sweep(spark)
      }
    spark.stop()
  }
}

/** Ad-hoc profiling entry (not part of the driver contract): runs catalog
  * queries (regex over names) with per-stage wall attribution and job
  * counts. Extra session confs via SPARK_GRAFT_EXTRA_CONF="k=v;k=v" for
  * A/B experiments (e.g. AQE on/off). */
object Scratch {
  def main(args: Array[String]): Unit = {
    val pat = args.lift(0).getOrElse("q_p_ep1_chain").r
    val d = args.lift(1).getOrElse("/root/testdata/sf0.1")
    val iters = args.lift(2).map(_.toInt).getOrElse(3)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val builder = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions",
        graft.core.Sizing.shufflePartitions(d, cpus.toInt))
      .config(graft.core.Sizing.localDir(d).map("spark.local.dir" -> _).toMap)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
    sys.env.get("SPARK_GRAFT_EXTRA_CONF").foreach(_.split(";").foreach { kv =>
      val Array(k, v) = kv.split("=", 2)
      builder.config(k.trim, v.trim)
    })
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val stages = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    val jobs = new java.util.concurrent.atomic.AtomicLong
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit = {
        jobs.incrementAndGet(); ()
      }
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit = {
        val i = s.stageInfo
        val wall = (i.completionTime.getOrElse(0L) -
          i.submissionTime.getOrElse(0L)) / 1000.0
        val m = i.taskMetrics
        if (wall > 0.05)
          stages.add(f"    stage ${i.stageId}%4d $wall%7.2f s " +
            f"tasks=${i.numTasks}%4d run=${m.executorRunTime / 1000.0}%6.2f " +
            f"cpu=${m.executorCpuTime / 1e9}%6.2f " +
            f"deser=${m.executorDeserializeTime / 1000.0}%6.2f " +
            f"gc=${m.jvmGCTime / 1000.0}%5.2f ${i.name.take(40)}")
      }
    })
    // warmup, mirroring Bench
    spark.range(1000).selectExpr("sum(id)").collect()
    spark.read.parquet(s"$d/region.parquet").groupBy("r_name").count().collect()
    val names = SparkEntry.queries.keys.toSeq.sorted
      .filter(n => pat.findFirstIn(n).isDefined)
    for (name <- names) {
      val fn = SparkEntry.queries(name)
      var best = Double.MaxValue
      var bestJobs = 0L
      for (i <- 0 until iters) {
        stages.clear(); jobs.set(0)
        val t0 = System.nanoTime()
        val df = fn(spark, d)
        df.count()
        val t2 = System.nanoTime()
        val w = (t2 - t0) / 1e9
        if (w < best) { best = w; bestJobs = jobs.get }
        if (i == iters - 1) stages.forEach(println)
        graft.ops.Leaks.sweep(spark)
      }
      println(f"[scratch] $name%-28s best=$best%6.2f s jobs=$bestJobs")
    }
    spark.stop()
  }
}

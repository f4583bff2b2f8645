package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}

/** Ad-hoc profiling entry (not part of the driver contract): runs one
  * catalog query with per-stage wall attribution. */
object Scratch {
  def main(args: Array[String]): Unit = {
    val name = args.lift(0).getOrElse("q_p_ep1_chain")
    val d = args.lift(1).getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions",
        graft.core.Sizing.shufflePartitions(d, cpus.toInt))
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val stages = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit = {
        val i = s.stageInfo
        val wall = (i.completionTime.getOrElse(0L) -
          i.submissionTime.getOrElse(0L)) / 1000.0
        if (wall > 0.5)
          stages.add(f"    stage ${i.stageId}%4d $wall%7.2f s " +
            f"tasks=${i.numTasks}%4d ${i.name.take(60)}")
      }
    })
    val fn = SparkEntry.queries(name)
    for (i <- 0 until 3) {
      stages.clear()
      val t0 = System.nanoTime()
      val df = fn(spark, d)
      val t1 = System.nanoTime()
      df.count()
      val t2 = System.nanoTime()
      Thread.sleep(300)
      println(f"[scratch] iter $i build=${(t1 - t0) / 1e9}%.2f " +
        f"count=${(t2 - t1) / 1e9}%.2f")
      stages.forEach(println)
      graft.ops.Leaks.sweep(spark)
    }
    spark.stop()
  }
}

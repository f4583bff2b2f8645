package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Ad-hoc profiling entry (not part of the driver contract; removed or kept
  * idle between investigations). Current subject: residual-PQ oracle
  * divergence. */
object Scratch {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.sim.Similarity
    val e = graft.core.Tables(spark, sfDir, "embeddings")
    val (centroids, assigned) = Similarity.ivfIndex(e, 16)
    println("DBG assign sample: " + assigned.select("vec_id", "centroid_id")
      .filter(col("vec_id") < 10).orderBy("vec_id")
      .collect().map(r => s"${r.getLong(0)}->${r.getInt(0 max r.fieldIndex("centroid_id"))}").mkString(" "))
    val cgrid = centroids.select(col("centroid_id"),
      graft.ml.KMeans.quantize(col("centroid"), 64, 1e6).as("cg"))
    val resid = assigned.select(col("vec_id"), col("centroid_id"),
        graft.ml.KMeans.quantize(col("embedding"), 64, 1e6).as("qx"))
      .join(broadcast(cgrid), Seq("centroid_id"))
      .select(col("vec_id"), col("centroid_id"),
        zip_with(col("qx"), col("cg"), (a, b) => a - b).as("rq"))
    println("DBG resid vec 0: " + resid.filter(col("vec_id") === 0)
      .select(col("centroid_id"), slice(col("rq"), 1, 8))
      .collect().map(r => r.getInt(0) + " " + r.getSeq[Long](1).mkString(",")).mkString)
    // subspace-0 fit
    val sub0 = resid.select(col("vec_id"), slice(col("rq"), 1, 8).as("__sub"))
    val cents0 = graft.ml.KMeans.fitGrid(sub0, "vec_id", "__sub", 16, 2)
    println("DBG rc1_0 cid=1: " + cents0.head._2.mkString(","))
    val codes0 = graft.ml.KMeans.assignGridUnder(sub0, "vec_id", "__sub", cents0)
    println("DBG ra2_0 first 10: " + codes0.filter(col("vec_id") < 10)
      .orderBy("vec_id").collect().map(r => s"${r.getLong(0)}:${r.getInt(1)}").mkString(" "))
    // base term for query 0 vs its probed centroids
    val qgrid = e.filter(col("vec_id") < 5).select(col("vec_id").as("query_id"),
      posexplode(graft.ml.KMeans.quantize(col("embedding"), 64, 1e6))
        .as(Seq("d64", "qq")))
    val qcent = qgrid
      .join(broadcast(cgrid.select(col("centroid_id"),
        posexplode(col("cg")).as(Seq("d64", "cgv")))), Seq("d64"))
      .groupBy("query_id", "centroid_id")
      .agg(sum(col("qq") * col("cgv")).as("base"))
    println("DBG qcent q0: " + qcent.filter(col("query_id") === 0)
      .orderBy("centroid_id")
      .collect().map(r => s"${r.getInt(1)}:${r.getLong(2)}").mkString(" "))
    spark.stop()
  }
}

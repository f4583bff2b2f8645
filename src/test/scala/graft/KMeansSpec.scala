package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.ml.KMeans

class KMeansSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  /** Three well-separated blobs around (0,0,0), (10,10,10), (-10,5,-5). */
  def blobs(n: Int = 300) = {
    val jit = (c: Int) =>
      graft.ml.Split.hashUniform(concat_ws("#", col("vec_id"), lit(c)), 7) - 0.5
    spark.range(n).select(col("id").as("vec_id"),
        pmod(col("id"), lit(3)).as("blob"))
      .withColumn("embedding", array(
        col("blob").cast("double") * 10.0 - when(col("blob") === 2, 30.0).otherwise(0.0) + jit(0),
        when(col("blob") === 2, 5.0).otherwise(col("blob").cast("double") * 10.0) + jit(1),
        when(col("blob") === 2, -5.0).otherwise(col("blob").cast("double") * 10.0) + jit(2))
        .cast("array<float>"))
  }

  test("kmeans recovers separated blobs and sizes sum to n") {
    val df = blobs().cache()
    val out = KMeans.kmeansQuantized(df, "vec_id", "embedding",
      k = 3, dims = 3, iters = 4, quant = 1e6).cache()
    assert(out.count() == 9) // k * dims
    val sizes = out.filter(col("dim") === 0)
      .select("cluster", "n").as[(Int, Long)].collect().toMap
    assert(sizes.values.sum == 300)
    // converged centroids sit near a blob center: every centroid's dims
    // are within 1.0 of one of the three true centers
    val cents = out.groupBy("cluster")
      .agg(collect_list(struct(col("dim"), col("centroid"))).as("cs"))
      .select(transform(array_sort(col("cs")), s => s.getField("centroid")))
      .as[Seq[Double]].collect()
    val truth = Seq(Seq(0.0, 0.0, 0.0), Seq(10.0, 10.0, 10.0), Seq(-10.0, 5.0, -5.0))
    cents.foreach { c =>
      assert(truth.exists(t => t.zip(c).forall { case (a, b) => math.abs(a - b) < 1.0 }),
        s"centroid $c matches no blob center")
    }
    df.unpersist(); out.unpersist()
  }

  test("kmeans result is bit-identical under a different partitioning") {
    val df = blobs(240)
    val a = KMeans.kmeansQuantized(df, "vec_id", "embedding",
      k = 4, dims = 3, iters = 2).collect()
    val b = KMeans.kmeansQuantized(df.repartition(17, col("vec_id")),
      "vec_id", "embedding", k = 4, dims = 3, iters = 2).collect()
    assert(a.toSeq == b.toSeq)
  }

  test("empty clusters keep their centroid and report n = 0") {
    // two identical points → with k = 2 one seed duplicates the other, so
    // every row lands on the lower centroid id and cluster 2 goes empty
    val df = Seq((1L, Seq(1.0f, 1.0f)), (2L, Seq(1.0f, 1.0f)))
      .toDF("vec_id", "embedding")
    val out = KMeans.kmeansQuantized(df, "vec_id", "embedding",
        k = 2, dims = 2, iters = 2)
      .filter(col("dim") === 0)
      .select("cluster", "centroid", "n").as[(Int, Double, Long)]
      .collect().sortBy(_._1)
    assert(out(0) == ((1, 1.0, 2L)))
    assert(out(1)._3 == 0L) // empty, centroid carried
    assert(out(1)._2 == 1.0)
  }
}

package graft.ml

import org.apache.spark.ml.classification.GBTClassifier
import org.apache.spark.ml.feature.{PCA, VectorAssembler}
import org.apache.spark.ml.functions.vector_to_array
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.sim.Similarity

/** Remaining model-surface items from SURVEY.md §2.7-2.8 that need
  * composition rather than a single MLlib estimator. */
object Extras {

  /** L9 — KNN classifier as a relational plan (MLlib has none): broadcast
    * the query rows against the train corpus, take the k nearest by cosine,
    * majority-vote the label (ties → smallest label). Exact; for large
    * query sets switch the neighbor search to Similarity.lshTopK. */
  def knnPredict(train: DataFrame, queries: DataFrame, k: Int,
                 idCol: String, vecCol: String, labelCol: String): DataFrame = {
    val neighbors = Similarity.bruteForceTopK(
      train, queries, k, idCol, vecCol)
    val labeled = neighbors.join(
      train.select(col(idCol).as("neighbor_id"), col(labelCol).as("__nl")),
      Seq("neighbor_id"))
    val votes = labeled.groupBy(col("query_id"), col("__nl"))
      .agg(count(lit(1)).as("votes"))
    val w = Window.partitionBy("query_id")
      .orderBy(col("votes").desc, col("__nl").asc)
    votes.withColumn("__rn", row_number().over(w)).filter(col("__rn") === 1)
      .select(col("query_id").as(idCol), col("__nl").as("knn_prediction"))
  }

  /** L5 — multiclass gradient boosting via one-vs-rest GBTs (MLlib GBT is
    * binary-only; SURVEY §7.4 hard part 4). Each class trains a binary
    * this-vs-rest model; prediction = argmax of the positive-class
    * probabilities, ties → smallest class. */
  def ovrGbtFit(train: DataFrame, featureCols: Seq[String], labelCol: String,
                classes: Seq[Double], maxIter: Int = 20):
      Seq[(Double, org.apache.spark.ml.PipelineModel)] =
    classes.map { c =>
      val bin = train.withColumn("__ovr",
        when(col(labelCol) === c, 1.0).otherwise(0.0))
      val pipe = Models.pipelineFor(
        new GBTClassifier().setMaxIter(maxIter).setMaxDepth(5).setSeed(42),
        featureCols, "__ovr")
      c -> pipe.fit(bin)
    }

  def ovrGbtPredict(models: Seq[(Double, org.apache.spark.ml.PipelineModel)],
                    df: DataFrame, idCol: String): DataFrame = {
    // index-named prob columns (class labels are doubles — "__p_0.0" would
    // parse as a struct field access)
    val scored = models.zipWithIndex.foldLeft(df) { case (acc, ((_, m), i)) =>
      acc.join(
        m.transform(df).select(col(idCol),
          element_at(vector_to_array(col("probability")), 2).as(s"__p_$i")),
        Seq(idCol))
    }
    val probCols = models.zipWithIndex.map { case ((c, _), i) => (c, col(s"__p_$i")) }
    val best = probCols.map(_._2).reduce(greatest(_, _))
    val pred = probCols.foldRight(lit(null).cast("double")) {
      case ((c, p), acc) => when(p === best, lit(c)).otherwise(acc)
    }
    scored.withColumn("ovr_prediction", pred)
      .drop(models.indices.map(i => s"__p_$i"): _*)
  }

  /** Global 1..n rank by a hash key WITHOUT any single-partition window:
    * rank inside 256 hash-prefix buckets in parallel, then add per-bucket
    * offsets computed by a broadcast self-join over the 256 bucket-count
    * rows (graft.ops.Prefix.bucketOffsets — bounded by construction). The
    * bucket is a PREFIX of the order key, so bucket order is consistent
    * with the global order. Adds `rankCol`; `__h` is the order key.
    * Public surface: the deterministic epoch-shuffle position every
    * training-data pipeline needs (oracle: row_number over md5(seed:key)). */
  def hashRank(df: DataFrame, keyCol: String, seed: Int,
               rankCol: String): DataFrame = {
    val bucketed = df
      .withColumn("__h", Split.hashKey(col(keyCol), seed))
      .withColumn("__b", substring(col("__h"), 1, 2))
    val wLocal = Window.partitionBy(col("__b"))
      .orderBy(col("__h"), col(keyCol))
    val cnts = bucketed.groupBy("__b").agg(count(lit(1)).as("__n"))
    val offsets = graft.ops.Prefix.bucketOffsets(cnts, "__b", Seq("__n" -> "__off"))
    bucketed.withColumn("__lr", row_number().over(wLocal))
      .join(broadcast(offsets), Seq("__b"))
      .withColumn(rankCol, col("__off") + col("__lr"))
      .drop("__h", "__b", "__lr", "__off")
  }

  /** M14 — permutation importance: shuffle ONE feature column (deterministic
    * md5-rank rotation — a derangement-free but uniform permutation), score,
    * Δ = base metric − permuted metric. Distributed: the permutation is a
    * self-join on shifted ranks, never a driver materialization nor a
    * single-partition global sort (see [[hashRank]]).
    * Ref: wine nb 11 cell 46. */
  def permuteColumn(df: DataFrame, idCol: String, c: String, seed: Int): DataFrame = {
    val ranked = hashRank(df, idCol, seed, "__rn")
    val n = df.count()
    val shifted = ranked.select(
      (pmod(col("__rn"), lit(n)) + 1).as("__rn"), col(c).as("__perm"))
    ranked.join(shifted, Seq("__rn"))
      .drop(c, "__rn").withColumnRenamed("__perm", c)
  }

  def permutationImportance(fitted: org.apache.spark.ml.PipelineModel,
                            df: DataFrame, idCol: String, labelCol: String,
                            featureCols: Seq[String], nRepeats: Int = 3): Seq[(String, Double)] = {
    val base = Models.evaluate(fitted.transform(df), labelCol)
    featureCols.map { c =>
      val deltas = (0 until nRepeats).map { r =>
        val permuted = permuteColumn(df, idCol, c, seed = 1000 + r)
        base - Models.evaluate(fitted.transform(permuted), labelCol)
      }
      c -> deltas.sum / nRepeats
    }
  }

  /** M15 — PCA projection of assembled features to `k` components. */
  def pcaProject(df: DataFrame, featureCols: Seq[String], k: Int,
                 out: String = "pca"): DataFrame = {
    val assembled = new VectorAssembler().setInputCols(featureCols.toArray)
      .setOutputCol("__feat").transform(df)
    val model = new PCA().setInputCol("__feat").setOutputCol(out).setK(k)
      .fit(assembled)
    model.transform(assembled).drop("__feat")
      .withColumn(out, vector_to_array(col(out)))
  }
}

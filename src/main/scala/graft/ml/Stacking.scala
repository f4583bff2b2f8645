package graft.ml

import org.apache.spark.ml.classification.LogisticRegression
import org.apache.spark.ml.functions.vector_to_array
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** E10 — stacking with out-of-fold meta-features (binary label).
  * Ref: final-assignment/src/ensemble/stacking.py:15-129.
  *
  * Per fold f: fit each base model on folds ≠ f, predict P(1) on fold f.
  * The union of held-out predictions is a leakage-free OOF relation keyed
  * by ID; a logistic-regression meta-model trains on those columns. Test
  * rows are scored by every fold's base models and averaged (the
  * reference's test-prediction averaging), then passed to the meta model.
  */
object Stacking {

  case class StackModel(
      baseNames: Seq[String],
      meta: org.apache.spark.ml.PipelineModel,
      foldModels: Seq[Seq[org.apache.spark.ml.PipelineModel]])

  private def p1: org.apache.spark.sql.Column =
    element_at(vector_to_array(col("probability")), 2)

  /** Fit on `train` (must have idCol, labelCol ∈ {0,1}, featureCols). */
  def fit(train: DataFrame, featureCols: Seq[String], labelCol: String,
          idCol: String, baseModels: Seq[String] = Seq("logistic_regression",
            "random_forest", "decision_tree"),
          k: Int = 5): (StackModel, DataFrame) = {
    val folded = Split.tagStratifiedKFold(train, idCol, labelCol, k).cache()
    val registry = Models.registry(numClasses = 2, nFeatures = featureCols.size)

    val foldModels = (0 until k).map { f =>
      val fit = folded.filter(col("fold") =!= f)
      baseModels.map { name =>
        Models.pipelineFor(registry(name)(), featureCols, labelCol).fit(fit)
      }
    }

    // leakage-free OOF meta-features: each row scored only by the models
    // that did NOT see it
    val oof = (0 until k).map { f =>
      val held = folded.filter(col("fold") === f)
      baseModels.zip(foldModels(f)).foldLeft(
        held.select(col(idCol), col(labelCol))) { case (acc, (name, m)) =>
        acc.join(
          m.transform(held).select(col(idCol), p1.as(s"oof_$name")),
          Seq(idCol))
      }
    }.reduce(_.unionByName(_))

    val metaPipe = Models.pipelineFor(
      new LogisticRegression().setMaxIter(100).setRegParam(1e-3),
      baseModels.map(n => s"oof_$n"), labelCol)
    val meta = metaPipe.fit(oof)
    folded.unpersist()
    (StackModel(baseModels, meta, foldModels), oof)
  }

  /** Score: base predictions averaged across fold models → meta model. */
  def transform(model: StackModel, df: DataFrame, idCol: String): DataFrame = {
    val withBase = model.baseNames.zipWithIndex.foldLeft(df) { case (acc, (name, bi)) =>
      val perFold = model.foldModels.zipWithIndex.map { case (ms, f) =>
        ms(bi).transform(df).select(col(idCol), p1.as(s"p_${name}_$f"))
      }
      val joined = perFold.reduce(_.join(_, Seq(idCol)))
      val avg = model.foldModels.indices.map(f => col(s"p_${name}_$f"))
        .reduce(_ + _) / model.foldModels.size
      acc.join(joined.select(col(idCol), avg.as(s"oof_$name")), Seq(idCol))
    }
    model.meta.transform(withBase)
      .withColumn("stack_probability", p1)
      .withColumnRenamed("prediction", "stack_prediction")
  }
}

/** E8 — bagging: n base models fitted on deterministic bootstrap resamples,
  * predictions averaged. Ref: src/ensemble/alternative.py:120-151. */
object Bagging {

  def fit(train: DataFrame, featureCols: Seq[String], labelCol: String,
          idCol: String, nBags: Int = 5, ratio: Double = 1.0,
          modelName: String = "decision_tree"): Seq[org.apache.spark.ml.PipelineModel] = {
    val registry = Models.registry(numClasses = 2, nFeatures = featureCols.size)
    (0 until nBags).map { b =>
      val sample = Split.bootstrap(train, idCol, ratio, seed = 42 + b)
      Models.pipelineFor(registry(modelName)(), featureCols, labelCol).fit(sample)
    }
  }

  /** Average of the bags' P(1); threshold at 0.5 for the class. */
  def transform(models: Seq[org.apache.spark.ml.PipelineModel], df: DataFrame,
                idCol: String): DataFrame = {
    import org.apache.spark.ml.functions.vector_to_array
    val scored = models.zipWithIndex.map { case (m, i) =>
      m.transform(df).select(col(idCol),
        element_at(vector_to_array(col("probability")), 2).as(s"__b_$i"))
    }.reduce(_.join(_, Seq(idCol)))
    val avgP = models.indices.map(i => col(s"__b_$i")).reduce(_ + _) / models.size
    df.join(scored.select(col(idCol), avgP.as("bag_probability")), Seq(idCol))
      .withColumn("bag_prediction",
        when(col("bag_probability") >= 0.5, 1.0).otherwise(0.0))
  }
}

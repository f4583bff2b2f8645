package graft.ml

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** L-family gap closure — k-nearest-neighbor classification, built from
  * the engine's own retrieval + ranking primitives rather than a model
  * object: exact-cosine brute-force top-k (`Similarity.exactCosineTopK`,
  * broadcast queries — the corpus never shuffles) feeding a bounded-heap
  * majority vote (`TopKRows` with k = 1 per query: votes DESC, label ASC
  * — deterministic ties to the smallest label).
  *
  * Scale shape: the corpus is scanned once map-side (broadcast query
  * set), ≤ k·|queries| neighbor rows cross the exchange, the vote
  * aggregate is map-side combined on (query, label), and the argmax is a
  * 1-entry heap — no window, no global sort, no per-query pass.
  *
  * The majority vote (not sklearn's `weights='distance'`) is chosen
  * deliberately: vote counts are integers, so the whole prediction is
  * hash-exact cross-engine on top of the already-oracle-exact cosine
  * ranking — distance weighting would put engine-ordered float sums in
  * the argmax. Ref: cross-validation/wine_analysis.py:84
  * (KNeighborsClassifier(n_neighbors=11) in the tournament; SURVEY §7.3
  * listed KNN as the one registry family without an engine form).
  */
object Knn {

  /** Predict a label for each query row: (query_id, prediction).
    * `corpus` provides both neighbors and labels; queries present in the
    * corpus never vote for themselves (the ANN self-exclusion). */
  def predict(corpus: DataFrame, queries: DataFrame, k: Int,
              idCol: String = "vec_id", vecCol: String = "embedding",
              labelCol: String = "label"): DataFrame = {
    // candidate relation = corpus × broadcast queries minus self, ranked
    // by the shared oracle-exact two-stage cosine (fast-cosine prune →
    // decimal-exact rescoring)
    val pairs = corpus.select(col(idCol).as("neighbor_id"))
      .crossJoin(broadcast(queries.select(col(idCol).as("query_id"))))
      .filter(col("neighbor_id") =!= col("query_id"))
      .select("query_id", "neighbor_id")
    val top = graft.sim.Similarity
      .exactCosineTopK(corpus, pairs, k, idCol, vecCol)
      .select(col("query_id"), col("neighbor_id"))
    // labels join: the k·|queries| neighbor relation is the broadcast
    // side; the corpus label scan streams map-side
    val votes = corpus
      .select(col(idCol).as("neighbor_id"), col(labelCol).cast("long").as("__lbl"))
      .join(broadcast(top), Seq("neighbor_id"))
      .groupBy("query_id", "__lbl")
      .agg(count(lit(1)).as("__votes"))
    votes.groupBy("query_id")
      .agg(graft.expressions.TopKRows
        .topRows(col("__votes").cast("double"), col("__lbl"), 1).as("__top"))
      .select(col("query_id"),
        element_at(col("__top"), 1).getField("id").as("prediction"))
  }

  /** Prediction joined with the true labels — the evaluation relation a
    * tournament consumes: (query_id, true_label, prediction). */
  def predictWithTruth(corpus: DataFrame, queries: DataFrame, k: Int,
                       idCol: String = "vec_id", vecCol: String = "embedding",
                       labelCol: String = "label"): DataFrame =
    predict(corpus, queries, k, idCol, vecCol, labelCol)
      .join(broadcast(queries.select(col(idCol).as("query_id"),
        col(labelCol).cast("long").as("true_label"))), Seq("query_id"))
      .select("query_id", "true_label", "prediction")
}

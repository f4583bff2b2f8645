package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.expressions.FloatDotProduct
import graft.sim.Similarity

class ExpressionSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("native dot product is bit-identical to the HOF fold") {
    val e = graft.core.Tables(spark, "/root/testdata/sf0.01", "embeddings")
    val pairs = e.select(col("vec_id"), col("embedding").as("a"))
      .join(e.select((col("vec_id") - 1).as("vec_id"), col("embedding").as("b")),
        Seq("vec_id"))
    val diff = pairs.select(
      FloatDotProduct.dot(col("a"), col("b")).as("native"),
      Similarity.dotFold(col("a"), col("b")).as("fold"))
      .filter(col("native") =!= col("fold")).count()
    assert(diff == 0, "native and fold dot products must agree exactly")
  }

  test("float_dot is callable from SQL after registration") {
    graft.expressions.GraftExtensions.register(spark)
    graft.core.Tables(spark, "/root/testdata/sf0.001", "embeddings")
      .limit(20).createOrReplaceTempView("emb_sql")
    val viaSql = spark.sql(
      "SELECT vec_id, float_dot(embedding, embedding) AS d FROM emb_sql")
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val viaCol = spark.table("emb_sql")
      .select(col("vec_id"), FloatDotProduct.dot(col("embedding"), col("embedding")).as("d"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(viaSql == viaCol && viaSql.nonEmpty)
    // the extensions class itself must construct (used via spark.sql.extensions)
    assert(new graft.expressions.GraftExtensions() != null)
  }

  test("fused cosine is bit-identical to the composed dot/norm form") {
    val e = graft.core.Tables(spark, "/root/testdata/sf0.01", "embeddings")
    val pairs = e.select(col("vec_id"), col("embedding").as("a"))
      .join(e.select((col("vec_id") - 1).as("vec_id"), col("embedding").as("b")),
        Seq("vec_id"))
    val diff = pairs.select(
      Similarity.cosine(col("a"), col("b")).as("fused"),
      Similarity.cosineComposed(col("a"), col("b")).as("composed"))
      .filter(col("fused") =!= col("composed")).count()
    assert(diff == 0, "fused and composed cosine must agree exactly")
    // and from SQL
    graft.expressions.GraftExtensions.register(spark)
    e.limit(5).createOrReplaceTempView("emb_cos_sql")
    val viaSql = spark.sql(
      "SELECT float_cosine(embedding, embedding) AS c FROM emb_cos_sql")
      .collect().map(_.getDouble(0))
    assert(viaSql.forall(c => math.abs(c - 1.0) < 1e-12))
  }

  test("null array yields null; mismatched type fails analysis") {
    val df = Seq((Some(Array(1f, 2f)), None: Option[Array[Float]]))
      .toDF("a", "b")
    val row = df.select(FloatDotProduct.dot(col("a"), col("b"))).head
    assert(row.isNullAt(0))
    val bad = Seq((1, "x")).toDF("a", "b")
    intercept[Exception] {
      bad.select(FloatDotProduct.dot(col("a"), col("b"))).collect()
    }
  }

  test("NearestCentroid matches the composed array_min form, ties included") {
    val cents: Seq[Seq[Long]] = Seq(
      Seq(0L, 0L, 0L), Seq(10L, 0L, 0L),
      Seq(0L, 10L, 0L), Seq(10L, 0L, 0L)) // centroid 4 duplicates 2 → tie
    val rows = (0 until 200).map { i =>
      (i.toLong, Seq((i % 13).toLong, (i % 7).toLong, (i % 5).toLong))
    } :+ (1000L, Seq(10L, 0L, 0L)) // exactly on the duplicated centroid
    val df = rows.toDF("id", "qa")
    // the pre-round-6 composable form (interpreted HOFs), as reference
    val composed = array_min(array(cents.zipWithIndex.map { case (arr, i) =>
      struct(
        aggregate(zip_with(col("qa"), typedLit(arr), (a, b) => (a - b) * (a - b)),
          lit(0L), (acc, x) => acc + x).as("d"),
        lit(i + 1).as("c"))
    }: _*)).getField("c")
    val diff = df.select(col("id"),
        graft.expressions.NearestCentroid.assign(col("qa"), cents).as("native"),
        composed.as("ref"))
      .filter(col("native") =!= col("ref")).count()
    assert(diff == 0)
    // the duplicated-centroid tie resolves toward the LOWER id
    val tied = df.filter(col("id") === 1000L)
      .select(graft.expressions.NearestCentroid.assign(col("qa"), cents))
      .head().getInt(0)
    assert(tied == 2)
  }

  test("zero-norm cosine mirrors Divide: error under ANSI, null in legacy") {
    // NaN (raw Java division) would sort as the LARGEST double and put a
    // zero vector at rank 1 of every cosine-DESC top-k — the fix mirrors
    // Divide in both modes instead.
    val df = Seq(
      (1L, Array(0f, 0f, 0f), Array(1f, 2f, 3f)),
      (2L, Array(1f, 0f, 0f), Array(1f, 2f, 3f))).toDF("id", "a", "b")
    // ANSI (the Spark 4 default in this session): divide-by-zero error
    assert(spark.conf.get("spark.sql.ansi.enabled") == "true")
    val ex = intercept[Exception] {
      df.select(Similarity.cosine(col("a"), col("b"))).collect()
    }
    def rootMsg(t: Throwable): String =
      (Iterator.iterate(t)(_.getCause).takeWhile(_ != null)
        .map(e => Option(e.getMessage).getOrElse("")).mkString(" | "))
    assert(rootMsg(ex).contains("DIVIDE_BY_ZERO"))
    // legacy: NULL for the zero-norm row, normal value for the other
    spark.conf.set("spark.sql.ansi.enabled", "false")
    try {
      val rows = df.select(col("id"), Similarity.cosine(col("a"), col("b")))
        .orderBy("id").collect()
      assert(rows(0).isNullAt(1), "zero-norm cosine must be NULL in legacy mode")
      assert(!rows(1).isNullAt(1) && !rows(1).getDouble(1).isNaN)
    } finally spark.conf.set("spark.sql.ansi.enabled", "true")
  }

  test("round-7 native kernels are SQL-callable and match the column API") {
    graft.expressions.GraftExtensions.register(spark)
    graft.core.Tables(spark, "/root/testdata/sf0.001", "documents")
      .limit(25).createOrReplaceTempView("docs_k_sql")
    val viaSql = spark.sql(
      """SELECT doc_id, lang_id(text) AS l, simhash48(text, 16) AS sh,
        |  minhash_signature(text, 4, 3) AS mh
        |FROM docs_k_sql""".stripMargin)
      .collect().map(r => r.getLong(0) ->
        (r.getString(1), r.getLong(2), r.getSeq[String](3))).toMap
    val t = spark.table("docs_k_sql")
    val viaCol = t.select(col("doc_id"),
        graft.text.TextOps.langIdFast(col("text")).as("l"),
        graft.text.TextOps.simhashFast(col("text"), 16).as("sh"),
        graft.text.TextOps.minhashSignatureFast(col("text"), 4).as("mh"))
      .collect().map(r => r.getLong(0) ->
        (r.getString(1), r.getLong(2), r.getSeq[String](3))).toMap
    assert(viaSql == viaCol && viaSql.nonEmpty)
    // hyperplane signature + est_jaccard over embeddings
    graft.core.Tables(spark, "/root/testdata/sf0.001", "embeddings")
      .limit(25).createOrReplaceTempView("emb_k_sql")
    val hs = spark.sql(
      """SELECT vec_id, hyperplane_signature(embedding, 8, 64, 42) AS s
        |FROM emb_k_sql""".stripMargin)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val hc = spark.table("emb_k_sql")
      .select(col("vec_id"),
        graft.sim.Similarity.hyperplaneSignatureFast(col("embedding"), 8).as("s"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(hs == hc && hs.nonEmpty)
    val ej = spark.sql(
      """SELECT est_jaccard(minhash_signature(text, 8, 3),
        |                   minhash_signature(text, 8, 3), 8) AS j
        |FROM docs_k_sql""".stripMargin).collect().map(_.getDouble(0))
    assert(ej.nonEmpty && ej.forall(_ == 1.0))
  }

  test("IntL1Capped matches the HOF L1 under the cap, abandons above it") {
    import spark.implicits._
    val df = Seq(
      (Seq(1, 5, 3), Seq(2, 2, 3)),     // L1 = 4
      (Seq(0, 0, 0), Seq(0, 0, 0)),     // L1 = 0
      (Seq(10, 0), Seq(0, 10)),         // L1 = 20
      (Seq(1, 2, 3, 4), Seq(1, 2)),     // ragged: tail counts whole, L1 = 7
      (Seq(100, 100, 100), Seq(0, 0, 0))// L1 = 300, abandoned at cap
    ).toDF("a", "b")
    // zip_with pads the short side with nulls — coalesce to 0 to mirror
    // the expression's absent-tail semantics
    val hof = df.select(aggregate(zip_with(col("a"), col("b"),
        (x, y) => abs(coalesce(x, lit(0)) - coalesce(y, lit(0)))),
        lit(0L), (acc, v) => acc + v)).as[Long].collect()
    val cap = 20L
    val capped = df.select(
      graft.expressions.IntL1Capped.l1Capped(col("a"), col("b"), cap))
      .as[Long].collect()
    // exact while <= cap; any value > cap is a valid "pruned" verdict
    hof.zip(capped).foreach { case (h, c) =>
      if (h <= cap) assert(c == h) else assert(c > cap)
    }
    // the <= cap FILTER verdict is identical to the exact HOF's
    assert(hof.map(_ <= cap).toSeq == capped.map(_ <= cap).toSeq)
    // interpreted eval path agrees with codegen (ragged + capped cases)
    val viaEval = graft.expressions.IntL1Capped(
      org.apache.spark.sql.graftbridge.Bridge.expression(col("a")),
      org.apache.spark.sql.graftbridge.Bridge.expression(col("b")), cap)
    assert(viaEval.nullSafeEval(
      org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(Array(1, 2, 3, 4)),
      org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(Array(1, 2))) == 7L)
  }

  test("native dot is substantially faster than the interpreted fold") {
    val e = graft.core.Tables(spark, "/root/testdata/sf0.01", "embeddings")
      .select(col("embedding").as("a"), col("embedding").as("b"))
      .cache()
    e.count()
    def time(c: org.apache.spark.sql.Column): Double = {
      val t0 = System.nanoTime()
      (1 to 20).foreach(_ => e.select(sum(c)).collect())
      (System.nanoTime() - t0) / 1e9
    }
    // best-of-3 per side, interleaved: a single-shot comparison flakes
    // under full-suite load (GC/JIT pauses land on one side), which is
    // scheduling noise, not a plan property
    val tf = (1 to 3).map(_ => time(Similarity.dotFold(col("a"), col("b")))).min
    val tn = (1 to 3).map(_ => time(FloatDotProduct.dot(col("a"), col("b")))).min
    info(f"fold: $tf%.2f s, native: $tn%.2f s (x${tf / tn}%.1f)")
    assert(tn < tf * 1.2,
      "codegen'd expression should not be meaningfully slower than the fold")
    e.unpersist()
  }
}

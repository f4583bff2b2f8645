package graft.expressions

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Cast, Expression, ExpressionInfo, Literal}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{DoubleType, IntegerType, LongType}

/** SparkSessionExtensions entry point: makes the engine's native
  * expressions callable from SQL and installs the optimizer rules. Wire
  * with `spark.sql.extensions=graft.expressions.GraftExtensions` at session
  * build, or call [[GraftExtensions.register]] on a live session.
  *
  * `float_dot(a, b)` — the codegen'd float-array dot product
  * ([[FloatDotProduct]]); `float_cosine(a, b)` — the fused cosine;
  * `top_rows(score, id, k)` — per-group bounded top-k aggregate
  * ([[TopKRows]]); `minhash_signature(text, numHashes, shingleN)`,
  * `simhash48(text, bits)`, `lang_id(text)`,
  * `hyperplane_signature(vec, nPlanes, dim, seed)` and
  * `est_jaccard(a, b, numHashes)` — the round-7 native dedup/ANN kernels;
  * [[CosineFuseRule]] — rewrites composed dot/norm cosine into the fused
  * form. Shape parameters (k, numHashes, bits, …) must be integer
  * literals — they parameterize the generated code. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  override def apply(ext: SparkSessionExtensions): Unit = {
    GraftExtensions.builders.foreach { case (name, builder) =>
      ext.injectFunction((
        FunctionIdentifier(name),
        new ExpressionInfo(classOf[GraftExtensions].getName, name),
        builder))
    }
    ext.injectOptimizerRule(_ => CosineFuseRule)
  }
}

object GraftExtensions {

  private def intLit(fn: String, arg: String)(e: Expression): Int = e match {
    case Literal(v: Int, IntegerType) => v
    case other => throw new IllegalArgumentException(
      s"$fn $arg must be an integer literal, got $other")
  }

  private[expressions] val topRowsBuilder: Seq[Expression] => Expression = {
    args =>
      require(args.size == 3, "top_rows takes (score, id, k)")
      TopKRows(Cast(args(0), DoubleType), Cast(args(1), LongType),
        intLit("top_rows", "k")(args(2)))
  }

  /** All SQL-callable native functions, shared by the extensions entry
    * point and the live-session registration path. */
  private[expressions] val builders: Seq[(String, Seq[Expression] => Expression)] = Seq(
    "float_dot" -> { args =>
      require(args.size == 2, "float_dot takes exactly 2 arguments")
      FloatDotProduct(args(0), args(1))
    },
    "float_cosine" -> { args =>
      require(args.size == 2, "float_cosine takes exactly 2 arguments")
      FloatCosine(args(0), args(1))
    },
    "top_rows" -> topRowsBuilder,
    "minhash_signature" -> { args =>
      require(args.size == 3, "minhash_signature takes (text, numHashes, shingleN)")
      MinHashSignature(args(0),
        intLit("minhash_signature", "numHashes")(args(1)),
        intLit("minhash_signature", "shingleN")(args(2)))
    },
    "simhash48" -> { args =>
      require(args.size == 2, "simhash48 takes (text, bits)")
      SimHash64(args(0), intLit("simhash48", "bits")(args(1)))
    },
    "lang_id" -> { args =>
      require(args.size == 1, "lang_id takes (text)")
      LangIdExpr(args(0), graft.text.TextOps.LangProfiles.toSeq.sortBy(_._1))
    },
    "hyperplane_signature" -> { args =>
      require(args.size == 4,
        "hyperplane_signature takes (vec, nPlanes, dim, seed)")
      HyperplaneSignature(args(0),
        intLit("hyperplane_signature", "nPlanes")(args(1)),
        intLit("hyperplane_signature", "dim")(args(2)),
        intLit("hyperplane_signature", "seed")(args(3)))
    },
    "est_jaccard" -> { args =>
      require(args.size == 3, "est_jaccard takes (a, b, numHashes)")
      EstJaccard(args(0), args(1), intLit("est_jaccard", "numHashes")(args(2)))
    })

  /** Register the same functions + optimizer rule on an already-built
    * session (extraOptimizations is the live-session route for rules). */
  def register(spark: SparkSession): Unit = {
    builders.foreach { case (name, builder) =>
      Bridge.registerFunction(spark, name, builder)
    }
    if (!spark.experimental.extraOptimizations.contains(CosineFuseRule))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ CosineFuseRule
  }
}

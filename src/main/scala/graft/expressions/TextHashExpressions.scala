package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native text-hash kernels (ladder step (b)) for the dedup blocking hot
  * paths: the per-row tokenizer/md5 work stays a tight JVM loop (generated
  * Java cannot express it more efficiently), but as Catalyst expressions
  * the calls inline into the surrounding WholeStageCodegen span with NO
  * ScalaUDF conversion boundary — no String↔UTF8String re-wrap through
  * CatalystTypeConverters, no boxed Seq allocation, no codegen-span break.
  * Each is BIT-IDENTICAL to the interpreted higher-order-function form in
  * [[graft.text.TextOps]] (and to the Scala-UDF fast path it replaces), so
  * every oracle written against those forms verifies these (TextSimSpec
  * parity cases).
  *
  * One shared per-thread MessageDigest: `getInstance("MD5")` per row was
  * measurable allocation churn in the UDF versions, and generated-class
  * instances may be shared across threads in local mode, so the digest
  * lives in a ThreadLocal rather than on the expression.
  */
private[graft] object TextKernels {
  val md5: ThreadLocal[java.security.MessageDigest] =
    ThreadLocal.withInitial(() => java.security.MessageDigest.getInstance("MD5"))
}

/** MinHash signature: `numHashes` md5-permutation minima over the distinct
  * `shingleN`-token shingles of the normalized text (the
  * [[graft.text.TextOps.minhashSignature]] semantics, kernel form). */
case class MinHashSignature(child: Expression, numHashes: Int, shingleN: Int)
    extends UnaryExpression {

  require(numHashes >= 1, s"numHashes must be positive, got $numHashes")
  require(shingleN >= 1, s"shingleN must be positive, got $shingleN")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"MinHashSignature requires string input, got ${t.catalogString}")
  }

  override def dataType: DataType = ArrayType(StringType, containsNull = true)

  def compute(t: UTF8String): ArrayData = {
    val md = TextKernels.md5.get()
    val sh = graft.text.TextOps.shingleSet(t.toString, shingleN)
    val out = new Array[Any](numHashes)
    var i = 0
    while (i < numHashes) {
      var min: String = null
      var j = 0
      while (j < sh.length) {
        val h = graft.text.TextOps.md5Hex(md, i + ":" + sh(j))
        if (min == null || h < min) min = h
        j += 1
      }
      out(i) = UTF8String.fromString(min)
      i += 1
    }
    new GenericArrayData(out)
  }

  override def nullSafeEval(a: Any): Any = compute(a.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("minhash", this, classOf[MinHashSignature].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.compute($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** SimHash fingerprint: per distinct normalized token, bit b contributes
  * ±1 by the token's 48-bit md5-prefix hash; fingerprint sets bit b iff
  * the sum is positive ([[graft.text.TextOps.simhash]] semantics). */
case class SimHash64(child: Expression, bits: Int) extends UnaryExpression {

  require(bits >= 1 && bits <= 48, "token hash provides 48 bits")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"SimHash64 requires string input, got ${t.catalogString}")
  }

  override def dataType: DataType = LongType

  def compute(t: UTF8String): Long = {
    val md = TextKernels.md5.get()
    val counts = new Array[Int](bits)
    val toks = graft.text.TextOps.normTokens(t.toString).distinct
    var i = 0
    while (i < toks.length) {
      val d = md.digest(toks(i).getBytes("UTF-8"))
      val h = ((d(0) & 0xffL) << 40) | ((d(1) & 0xffL) << 32) |
        ((d(2) & 0xffL) << 24) | ((d(3) & 0xffL) << 16) |
        ((d(4) & 0xffL) << 8) | (d(5) & 0xffL)
      var b = 0
      while (b < bits) {
        if (((h >> b) & 1L) == 1L) counts(b) += 1 else counts(b) -= 1
        b += 1
      }
      i += 1
    }
    var out = 0L
    var b = 0
    while (b < bits) { if (counts(b) > 0) out |= (1L << b); b += 1 }
    out
  }

  override def nullSafeEval(a: Any): Any = compute(a.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("simhash", this, classOf[SimHash64].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.compute($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Language ID by stopword-profile hit ratio: score(lang) = |tokens ∩
  * profile| / |tokens|, argmax with sorted-code tie-break, 'und' when all
  * zero ([[graft.text.TextOps.langId]] semantics). Profiles are a
  * constructor field (Seq — equals-friendly), sorted by code here so the
  * tie-break never depends on caller map order. */
case class LangIdExpr(child: Expression, profiles: Seq[(String, Seq[String])])
    extends UnaryExpression {

  require(profiles.nonEmpty, "at least one language profile required")

  @transient private lazy val profs: Array[(UTF8String, Set[String])] =
    profiles.sortBy(_._1).map { case (l, ws) =>
      (UTF8String.fromString(l), ws.toSet)
    }.toArray
  @transient private lazy val und = UTF8String.fromString("und")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"LangIdExpr requires string input, got ${t.catalogString}")
  }

  override def dataType: DataType = StringType

  def compute(t: UTF8String): UTF8String = {
    val toks = graft.text.TextOps.normTokens(t.toString)
    val n = toks.length.toDouble
    var best = 0.0
    var bestIdx = -1
    var p = 0
    while (p < profs.length) {
      val ws = profs(p)._2
      var hits = 0
      var i = 0
      while (i < toks.length) { if (ws.contains(toks(i))) hits += 1; i += 1 }
      val s = hits.toDouble / n
      // strict > keeps the FIRST (lowest-sorted) code on ties, matching
      // the expression form's foldRight chain
      if (s > best) { best = s; bestIdx = p }
      p += 1
    }
    if (bestIdx >= 0 && best > 0) profs(bestIdx)._1 else und
  }

  override def nullSafeEval(a: Any): Any = compute(a.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("langid", this, classOf[LangIdExpr].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.compute($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Distinct n-token shingle set of the normalized text
  * ([[graft.text.TextOps.shingleSet]] — SET order, use only where element
  * order is irrelevant: explode-then-aggregate/join pipelines like the
  * decontamination gram scan). */
case class DistinctShingles(child: Expression, n: Int) extends UnaryExpression {

  require(n >= 1, s"shingle n must be positive, got $n")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"DistinctShingles requires string input, got ${t.catalogString}")
  }

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  def compute(t: UTF8String): ArrayData = {
    val sh = graft.text.TextOps.shingleSet(t.toString, n)
    val out = new Array[Any](sh.length)
    var i = 0
    while (i < sh.length) { out(i) = UTF8String.fromString(sh(i)); i += 1 }
    new GenericArrayData(out)
  }

  override def nullSafeEval(a: Any): Any = compute(a.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("shingles", this, classOf[DistinctShingles].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.compute($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Exact Jaccard of the distinct n-token shingle sets of two texts — the
  * verify stage of minhash near-dup, which runs ONLY on est-pruned
  * survivors ([[graft.text.TextOps.jaccardShingles]] semantics). */
case class JaccardShingles(left: Expression, right: Expression, n: Int)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {

  require(n >= 1, s"shingle n must be positive, got $n")

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == StringType && right.dataType == StringType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"JaccardShingles requires string inputs, got " +
        s"${left.dataType.catalogString} / ${right.dataType.catalogString}")

  override def dataType: DataType = DoubleType

  def compute(a: UTF8String, b: UTF8String): Double = {
    val sa = graft.text.TextOps.shingleSet(a.toString, n).toSet
    val sb = graft.text.TextOps.shingleSet(b.toString, n).toSet
    (sa & sb).size.toDouble / (sa | sb).size
  }

  override def nullSafeEval(a: Any, b: Any): Any =
    compute(a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("jaccard", this, classOf[JaccardShingles].getName)
    nullSafeCodeGen(ctx, ev, (a, b) => s"${ev.value} = $ref.compute($a, $b);")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Signature-agreement Jaccard estimate: |matching minhash positions| /
  * numHashes ([[graft.text.TextOps.estJaccardFast]] semantics) — fully
  * codegen'd; runs once per CANDIDATE pair out of the band join, which
  * emits far more candidates than survivors. */
case class EstJaccard(left: Expression, right: Expression, numHashes: Int)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {

  require(numHashes >= 1, s"numHashes must be positive, got $numHashes")

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(t: DataType) = t match {
      case ArrayType(StringType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"EstJaccard requires array<string> inputs, got " +
        s"${left.dataType.catalogString} / ${right.dataType.catalogString}")
  }

  override def dataType: DataType = DoubleType

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var c = 0
    var i = 0
    while (i < n) {
      val xi = x.getUTF8String(i)
      val yi = y.getUTF8String(i)
      if (xi == null) { if (yi == null) c += 1 }
      else if (xi.equals(yi)) c += 1
      i += 1
    }
    c.toDouble / numHashes
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val c = ctx.freshName("c")
      val xi = ctx.freshName("xi")
      val yi = ctx.freshName("yi")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |int $c = 0;
         |for (int $i = 0; $i < $n; $i++) {
         |  UTF8String $xi = $a.isNullAt($i) ? null : $a.getUTF8String($i);
         |  UTF8String $yi = $b.isNullAt($i) ? null : $b.getUTF8String($i);
         |  if ($xi == null ? $yi == null : $xi.equals($yi)) $c++;
         |}
         |${ev.value} = (double) $c / $numHashes;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object TextHashExpressions {
  def estJaccard(a: Column, b: Column, numHashes: Int): Column =
    Bridge.column(EstJaccard(Bridge.expression(a), Bridge.expression(b), numHashes))

  def distinctShingles(text: Column, n: Int): Column =
    Bridge.column(DistinctShingles(Bridge.expression(text), n))

  def jaccardShingles(a: Column, b: Column, n: Int): Column =
    Bridge.column(JaccardShingles(Bridge.expression(a), Bridge.expression(b), n))

  def minhash(text: Column, numHashes: Int, shingleN: Int): Column =
    Bridge.column(MinHashSignature(Bridge.expression(text), numHashes, shingleN))

  def simhash(text: Column, bits: Int): Column =
    Bridge.column(SimHash64(Bridge.expression(text), bits))

  def langId(text: Column, profiles: Seq[(String, Seq[String])]): Column =
    Bridge.column(LangIdExpr(Bridge.expression(text), profiles))
}

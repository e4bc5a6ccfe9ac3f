package graft.plans

import scala.util.Try

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo, Generator, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions.udaf
import org.apache.spark.sql.types._
import org.apache.spark.sql.{Encoder, Encoders}

import graft.cap.{CapAlert, CotFeature, Features}
import graft.functions.CentroidAgg

/** JVM kernel for [[PolygonCentroid]] — one static entry point shared by
  * interpreted eval and generated code, operating directly on Catalyst
  * [[ArrayData]] (no row conversion, no boxing of the hot loop).
  * Semantics = `Geo.polygonCentroid` (reference task.ts:340-378):
  * shoelace centroid, arithmetic-mean fallback for |area| < 1e-10,
  * [0,0] for rings with < 3 points.
  */
object PolygonCentroidKernel {
  /** Returns null for malformed rings (null points, points with < 2
    * coordinates) — the input type allows them (`containsNull`) and a
    * SQL-surface function must not NPE the whole query on one row. */
  def compute(ring: ArrayData): ArrayData = {
    val n = ring.numElements()
    var v = 0
    while (v < n) {
      if (ring.isNullAt(v) || ring.getArray(v).numElements() < 2) return null
      v += 1
    }
    if (n < 3) return UnsafeArrayData.fromPrimitiveArray(Array(0.0, 0.0))
    var area = 0.0
    var cx = 0.0
    var cy = 0.0
    var i = 0
    while (i < n - 1) {
      val p0 = ring.getArray(i)
      val p1 = ring.getArray(i + 1)
      val x0 = p0.getDouble(0); val y0 = p0.getDouble(1)
      val x1 = p1.getDouble(0); val y1 = p1.getDouble(1)
      val a = x0 * y1 - x1 * y0
      area += a
      cx += (x0 + x1) * a
      cy += (y0 + y1) * a
      i += 1
    }
    area *= 0.5
    if (math.abs(area) < 1e-10) {
      var x = 0.0; var y = 0.0
      var j = 0
      while (j < n) {
        val p = ring.getArray(j)
        x += p.getDouble(0); y += p.getDouble(1)
        j += 1
      }
      UnsafeArrayData.fromPrimitiveArray(Array(x / n, y / n))
    } else {
      UnsafeArrayData.fromPrimitiveArray(Array(cx / (6 * area), cy / (6 * area)))
    }
  }
}

/** `polygon_centroid(ring)` as a native Catalyst expression with code
  * generation — the SURVEY §4 showcase expression. Unlike a Scala UDF,
  * this stays inside the WholeStageCodegen span (no serialization
  * boundary, no closure dispatch): the generated code calls the static
  * kernel on Catalyst's own array representation.
  */
case class PolygonCentroid(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)

  // the kernel returns null for malformed rings even when the child is
  // non-nullable
  override def nullable: Boolean = true

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(ArrayType(DoubleType, _), _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"polygon_centroid expects array<array<double>>, got ${other.catalogString}")
    }

  override protected def nullSafeEval(ring: Any): Any =
    PolygonCentroidKernel.compute(ring.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = graft.plans.PolygonCentroidKernel.compute($c);
      if (${ev.value} == null) { ${ev.isNull} = true; }
    """)

  override protected def withNewChildInternal(newChild: Expression): PolygonCentroid =
    copy(child = newChild)
}

/** JVM kernel for [[WinnowFingerprints]] — winnowing document
  * fingerprints (poly-hash over char-K-grams, window-4 minimum,
  * distinct) in one O(n) pass with a TRUE rolling hash, replacing the
  * O(Kn) per-position refold of the declarative pipeline. Semantics
  * are bit-identical to the SQL formulation in the TextStats.t4/t7
  * DuckDB oracles:
  *   h(i)  = fold_{j=0..K-1} (h*257 + codepoint(text[i+j])) mod 1e9+7
  *   fp(i) = min(h(i)..h(i+3))  for i in [0, len-(K+3)]
  *   out   = sorted distinct fp
  * Codepoints (not UTF-16 chars, not bytes) because Spark's ascii()
  * and DuckDB's unicode() both yield codepoints.
  *
  * K = 25 (MOSS-scale noise threshold, vs the round-3 K = 8): a
  * fingerprint is only shared by documents with a verbatim common
  * substring of ≥ K chars (winnowing guarantee: any match of
  * ≥ K+3 = 28 chars shares a fingerprint). Short grams saturate — on
  * the sf0.1 corpus 8-gram document frequencies reached 3813 and grew
  * linearly with corpus size, making every fingerprint boilerplate at
  * scale; 25-gram df tops out at 14 there and stays flat, so the
  * t4/t7 fingerprint joins stay near-linear.
  */
object WinnowKernel {
  private val P = 1000000007L
  private val B = 257L
  /** Gram width. */
  val K = 25
  /** Winnowing window: min over 4 consecutive gram hashes. */
  private val W = 4
  /** B^(K-1) mod P, the coefficient of the outgoing character. */
  private val POWK: Long = {
    var r = 1L
    var i = 0
    while (i < K - 1) { r = r * B % P; i += 1 }
    r
  }

  def compute(text: org.apache.spark.unsafe.types.UTF8String): ArrayData = {
    val cps = text.toString.codePoints().toArray
    val n = cps.length
    if (n < K + W - 1) return UnsafeArrayData.fromPrimitiveArray(Array.emptyLongArray)
    val nGrams = n - (K - 1)
    val khs = new Array[Long](nGrams)
    var h = 0L
    var j = 0
    while (j < K) { h = (h * B + cps(j)) % P; j += 1 }
    khs(0) = h
    var i = 1
    while (i < nGrams) {
      // remove cps(i-1), shift, add cps(i+K-1): stays in [0, P)
      h = ((h + P - cps(i - 1) * POWK % P) % P * B + cps(i + K - 1)) % P
      khs(i) = h
      i += 1
    }
    val nFps = nGrams - (W - 1)
    val fps = new Array[Long](nFps)
    var k = 0
    while (k < nFps) {
      var m = khs(k)
      if (khs(k + 1) < m) m = khs(k + 1)
      if (khs(k + 2) < m) m = khs(k + 2)
      if (khs(k + 3) < m) m = khs(k + 3)
      fps(k) = m
      k += 1
    }
    java.util.Arrays.sort(fps)
    var w = 0
    var r = 0
    while (r < nFps) {
      if (w == 0 || fps(r) != fps(w - 1)) { fps(w) = fps(r); w += 1 }
      r += 1
    }
    // fromPrimitiveArray keeps the longs unboxed (GenericArrayData would
    // wrap them in Array[Any], one java.lang.Long per fingerprint)
    UnsafeArrayData.fromPrimitiveArray(java.util.Arrays.copyOf(fps, w))
  }
}

/** `winnow_fps(text)` — the winnowing fingerprint set as a native
  * codegen expression. The declarative version explodes one row per
  * character position before hashing (K× refold per position, a
  * position×row blowup through the shuffle); this computes the whole
  * distinct fingerprint set in one pass inside WholeStageCodegen and
  * only then explodes, so the per-position intermediate never
  * materializes.
  */
case class WinnowFingerprints(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"winnow_fps expects string, got ${other.catalogString}")
    }

  override protected def nullSafeEval(text: Any): Any =
    WinnowKernel.compute(text.asInstanceOf[org.apache.spark.unsafe.types.UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.WinnowKernel.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): WinnowFingerprints =
    copy(child = newChild)
}

/** JVM kernel for [[CosineSim]] — unrounded cosine similarity of two
  * double arrays in ONE fused pass (dot, ‖a‖², ‖b‖² accumulated
  * left-to-right), operating directly on Catalyst [[ArrayData]].
  *
  * Bit-parity contract with the declarative form it replaces
  * (`aggregate(zip_with(a,b,(x,y)=>x*y), 0.0, _+_) / (sqrt(..)*sqrt(..))`
  * in [[graft.queries.Similarity]], mirrored by the DuckDB oracles'
  * `SUM(x*y)/ (SQRT(SUM(x*x))*SQRT(SUM(y*y)))`): every accumulator is
  * the same left-to-right IEEE double fold, sqrt is the correctly-
  * rounded `Math.sqrt` both engines use, and the final round(…,6)
  * stays in the Column layer so rounding goes through the exact same
  * Spark path as before. Returns null on length mismatch or null
  * elements exactly where the higher-order form nulls out.
  *
  * Why native: zip_with/aggregate are interpreted HigherOrderFunctions
  * — three of them per cosine broke whole-stage codegen in the hottest
  * loop of the ANN/dedup family (s1/s2/s4/s5/d5/d6/d8). This kernel
  * keeps the loop inside generated code with zero per-element closure
  * dispatch and no intermediate zipped array allocation.
  */
object CosineKernel {
  def compute(a: ArrayData, b: ArrayData): java.lang.Double = {
    val n = a.numElements()
    if (b.numElements() != n) return null
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      val x = a.getDouble(i); val y = b.getDouble(i)
      dot += x * y; na += x * x; nb += y * y
      i += 1
    }
    dot / (Math.sqrt(na) * Math.sqrt(nb))
  }
}

/** `cosine_sim(array<double>, array<double>)` → unrounded cosine, as a
  * codegen-friendly native expression. See [[CosineKernel]] for the
  * parity contract.
  */
case class CosineSim(left: Expression, right: Expression) extends BinaryExpression {

  override def prettyName: String = "cosine_sim"

  override def dataType: DataType = DoubleType

  // null on length mismatch / null element, even for non-null inputs
  override def nullable: Boolean = true

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(DoubleType, _), ArrayType(DoubleType, _)) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case (l, r) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"cosine_sim expects (array<double>, array<double>), got (${l.catalogString}, ${r.catalogString})")
    }

  override protected def nullSafeEval(a: Any, b: Any): Any =
    CosineKernel.compute(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val tmp = ctx.freshName("graftCos")
    nullSafeCodeGen(ctx, ev, (a, b) => s"""
      java.lang.Double $tmp = graft.plans.CosineKernel.compute($a, $b);
      if ($tmp == null) { ${ev.isNull} = true; } else { ${ev.value} = $tmp.doubleValue(); }
    """)
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CosineSim =
    copy(left = newLeft, right = newRight)
}

/** JVM kernel for [[NativeDot]] — left-to-right dot product of two
  * double arrays; the exact fold order of the declarative
  * `aggregate(zip_with(a, b, _*_), 0.0, _+_)` idiom it substitutes. */
object DotKernel {
  def compute(a: ArrayData, b: ArrayData): java.lang.Double = {
    val n = a.numElements()
    if (b.numElements() != n) return null
    var dot = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      dot += a.getDouble(i) * b.getDouble(i)
      i += 1
    }
    dot
  }
}

/** `native_dot(array<double>, array<double>)` — fused single-pass dot
  * product, codegen-resident. Usually not written by hand: the
  * [[DotRewrite]] optimizer rule swaps it in for the declarative
  * zip_with/aggregate idiom.
  */
case class NativeDot(left: Expression, right: Expression) extends BinaryExpression {

  override def prettyName: String = "native_dot"

  override def dataType: DataType = DoubleType

  override def nullable: Boolean = true

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(DoubleType, _), ArrayType(DoubleType, _)) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case (l, r) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"native_dot expects (array<double>, array<double>), got (${l.catalogString}, ${r.catalogString})")
    }

  override protected def nullSafeEval(a: Any, b: Any): Any =
    DotKernel.compute(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val tmp = ctx.freshName("graftDot")
    nullSafeCodeGen(ctx, ev, (a, b) => s"""
      java.lang.Double $tmp = graft.plans.DotKernel.compute($a, $b);
      if ($tmp == null) { ${ev.isNull} = true; } else { ${ev.value} = $tmp.doubleValue(); }
    """)
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): NativeDot =
    copy(left = newLeft, right = newRight)
}

/** Optimizer rule: recognize the declarative dot-product idiom
  *
  *   aggregate(zip_with(a, b, (x, y) => x * y), 0.0, (acc, v) => acc + v)
  *
  * (three interpreted HigherOrderFunctions per evaluation) and replace
  * it with the fused, codegen-resident [[NativeDot]] kernel. The
  * rewrite is a pure engine-level strength reduction: the kernel
  * executes the exact same left-to-right IEEE fold, so results are
  * bit-identical (spec-asserted) — users who write the idiomatic
  * DataFrame form get the native kernel for free when the session is
  * built with [[GraftExtensions]]. Matches conservatively: double
  * arrays, literal 0.0 zero, bare x*y and acc+v lambda bodies (in
  * either operand order), identity finish lambda.
  */
object DotRewrite extends org.apache.spark.sql.catalyst.rules.Rule[
    org.apache.spark.sql.catalyst.plans.logical.LogicalPlan] {
  import org.apache.spark.sql.catalyst.expressions.{Add, ArrayAggregate, LambdaFunction, Literal, Multiply, NamedLambdaVariable, ZipWith}

  private def isDoubleArray(e: Expression): Boolean = e.dataType match {
    case ArrayType(DoubleType, _) => true
    case _ => false
  }

  /** body is `l op r` over exactly the two bound variables, either order. */
  private def usesBoth(l: Expression, r: Expression,
      v1: NamedLambdaVariable, v2: NamedLambdaVariable): Boolean =
    (l, r) match {
      case (a: NamedLambdaVariable, b: NamedLambdaVariable) =>
        (a.exprId == v1.exprId && b.exprId == v2.exprId) ||
          (a.exprId == v2.exprId && b.exprId == v1.exprId)
      case _ => false
    }

  override def apply(plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan)
      : org.apache.spark.sql.catalyst.plans.logical.LogicalPlan =
    // tree-pattern pruning: this rule runs in every optimizer pass of
    // every query (AQE re-optimizations included) — subtrees without a
    // higher-order function are skipped via the pattern bitmask instead
    // of walked, so the 100+ non-vector queries pay ~nothing for it
    plan.transformAllExpressionsWithPruning(
        _.containsPattern(org.apache.spark.sql.catalyst.trees.TreePattern.HIGH_ORDER_FUNCTION)) {
      case ArrayAggregate(
          ZipWith(a, b, LambdaFunction(Multiply(ml, mr, _), Seq(x: NamedLambdaVariable, y: NamedLambdaVariable), _)),
          Literal(seed: Double, DoubleType),
          LambdaFunction(Add(al, ar, _), Seq(acc: NamedLambdaVariable, v: NamedLambdaVariable), _),
          LambdaFunction(fin: NamedLambdaVariable, Seq(fv: NamedLambdaVariable), _))
          // bit-compare the seed: Scala's == treats -0.0 == 0.0, but
          // NativeDot folds from +0.0, and a -0.0-seeded fold whose
          // result is ±0.0 keeps the seed's sign bit — fusing it would
          // breach the advertised bit-identical guarantee.
          if java.lang.Double.doubleToLongBits(seed) ==
              java.lang.Double.doubleToLongBits(0.0) &&
            isDoubleArray(a) && isDoubleArray(b) &&
            usesBoth(ml, mr, x, y) && usesBoth(al, ar, acc, v) &&
            fin.exprId == fv.exprId =>
        NativeDot(a, b)
    }
}

/** `alert_to_features(struct(<CapAlert columns>))` — the X2 fan-out
  * (task.ts:644-875) as a custom Catalyst [[Generator]] (UDTF analog,
  * SURVEY §2.6): one alert row generates 0..2N feature rows directly in
  * the plan, composable with any other operators, instead of the typed
  * `flatMap` that forces a full Dataset boundary. Per-alert error
  * isolation (F2) is preserved: a throwing alert yields zero rows.
  */
case class AlertToFeatures(child: Expression)
    extends UnaryExpression with Generator with CodegenFallback {

  @transient private lazy val deser =
    ExpressionEncoder[CapAlert]().resolveAndBind().createDeserializer()
  @transient private lazy val ser =
    ExpressionEncoder[CotFeature]().resolveAndBind().createSerializer()

  override def elementSchema: StructType =
    ExpressionEncoder[CotFeature]().schema

  /** The deserializer binds POSITIONALLY, so a struct whose fields are
    * reordered (e.g. alphabetized) would silently swap values into the
    * wrong CapAlert fields — reject any field-name/arity mismatch at
    * analysis time; field TYPES must match too (a right-named,
    * wrong-typed field would otherwise pass analysis and throw a
    * ClassCastException per row at runtime). */
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    val expected = ExpressionEncoder[CapAlert]().schema
    child.dataType match {
      case s: StructType if s.fieldNames.toSeq == expected.fieldNames.toSeq &&
          s.fields.zip(expected.fields).forall { case (g, w) =>
            org.apache.spark.sql.types.DataType.equalsIgnoreNullability(g.dataType, w.dataType) } =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case s: StructType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"alert_to_features expects struct ${expected.catalogString} " +
            s"(field names, order, and types), got ${s.catalogString}")
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"alert_to_features expects a struct, got ${other.catalogString}")
    }
  }

  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val row = child.eval(input).asInstanceOf[InternalRow]
    if (row == null) Nil
    // the deserializer sits INSIDE the per-alert Try: F2's isolation
    // contract is "a throwing alert yields zero rows", and decode
    // failures are alert failures too
    else Try(Features.alertToFeatures(deser(row))).getOrElse(Seq.empty)
      .map(f => ser(f).copy())
  }

  override protected def withNewChildInternal(newChild: Expression): AlertToFeatures =
    copy(child = newChild)
}

/** Session-extension entry point: registers the graft-native functions
  * into the Catalyst function registry. Activate with
  * `.config("spark.sql.extensions", "graft.plans.GraftExtensions")` or
  * `SparkSession.builder.withExtensions(new GraftExtensions)`.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("polygon_centroid"),
      new ExpressionInfo(classOf[PolygonCentroid].getName, "polygon_centroid"),
      (exprs: Seq[Expression]) => PolygonCentroid(exprs.head)))
    ext.injectFunction((
      FunctionIdentifier("alert_to_features"),
      new ExpressionInfo(classOf[AlertToFeatures].getName, "alert_to_features"),
      (exprs: Seq[Expression]) => AlertToFeatures(exprs.head)))
    ext.injectFunction((
      FunctionIdentifier("winnow_fps"),
      new ExpressionInfo(classOf[WinnowFingerprints].getName, "winnow_fps"),
      (exprs: Seq[Expression]) => WinnowFingerprints(exprs.head)))
    ext.injectFunction((
      FunctionIdentifier("cosine_sim"),
      new ExpressionInfo(classOf[CosineSim].getName, "cosine_sim"),
      (exprs: Seq[Expression]) => CosineSim(exprs.head, exprs(1))))
    ext.injectFunction((
      FunctionIdentifier("native_dot"),
      new ExpressionInfo(classOf[NativeDot].getName, "native_dot"),
      (exprs: Seq[Expression]) => NativeDot(exprs.head, exprs(1))))
    ext.injectOptimizerRule(_ => DotRewrite)
    // whole-operator extension point (SURVEY §4 preference (c)): the
    // graft_asof hint → AsOfJoinPlan rewrite and its physical strategy
    ext.injectResolutionRule(_ => ResolveAsOfJoin)
    ext.injectPlannerStrategy(_ => AsOfJoinStrategy)
  }
}

/** Registration for an already-built session (tests, REPL) plus the
  * UDAF, which goes through the udf registry rather than extensions. */
object GraftFunctions {

  /** Idempotent, cheap registration of just `winnow_fps` — called from
    * query builders, which must not re-derive the UDAF encoders or
    * rebind every function on every DataFrame construction. */
  def ensureWinnow(spark: SparkSession): Unit = {
    val registry = spark.sessionState.functionRegistry
    if (!registry.functionExists(FunctionIdentifier("winnow_fps")))
      registry.createOrReplaceTempFunction(
        "winnow_fps", exprs => WinnowFingerprints(exprs.head), "scala_udf")
  }

  /** Same contract as [[ensureWinnow]], for `cosine_sim` (the ANN/dedup
    * family's hot loop — see [[CosineKernel]]). */
  def ensureCosine(spark: SparkSession): Unit = {
    val registry = spark.sessionState.functionRegistry
    if (!registry.functionExists(FunctionIdentifier("cosine_sim")))
      registry.createOrReplaceTempFunction(
        "cosine_sim", exprs => CosineSim(exprs.head, exprs(1)), "scala_udf")
  }

  def register(spark: SparkSession): Unit = {
    val registry = spark.sessionState.functionRegistry
    registry.createOrReplaceTempFunction(
      "polygon_centroid", exprs => PolygonCentroid(exprs.head), "scala_udf")
    registry.createOrReplaceTempFunction(
      "alert_to_features", exprs => AlertToFeatures(exprs.head), "scala_udf")
    registry.createOrReplaceTempFunction(
      "winnow_fps", exprs => WinnowFingerprints(exprs.head), "scala_udf")
    registry.createOrReplaceTempFunction(
      "cosine_sim", exprs => CosineSim(exprs.head, exprs(1)), "scala_udf")
    spark.udf.register("centroid_agg", udaf(CentroidAgg))
  }
}

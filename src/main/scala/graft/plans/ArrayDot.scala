package graft.plans

import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}
import org.apache.spark.sql.SparkSessionExtensions

/** Native dot product over two array<double> columns.
  *
  * The composable form (`zip_with` + `aggregate`) evaluates its lambda
  * interpreted per element; this expression generates a tight Java loop
  * inside whole-stage codegen instead — the preference order from
  * SURVEY.md §7.3: builtin < custom Expression < UDF. Null elements are
  * treated as 0 (embeddings are dense); mismatched lengths use the
  * common prefix.
  */
case class ArrayDot(left: Expression, right: Expression)
  extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes =
    Seq(ArrayType(DoubleType), ArrayType(DoubleType))
  override def dataType: DataType = DoubleType
  override def prettyName: String = "array_dot"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var s = 0.0
    var i = 0
    while (i < n) {
      if (!x.isNullAt(i) && !y.isNullAt(i)) s += x.getDouble(i) * y.getDouble(i)
      i += 1
    }
    s
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val s = ctx.freshName("s")
      s"""
         |int $n = java.lang.Math.min($x.numElements(), $y.numElements());
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  if (!$x.isNullAt($i) && !$y.isNullAt($i)) {
         |    $s += $x.getDouble($i) * $y.getDouble($i);
         |  }
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression,
                                                 newRight: Expression): ArrayDot =
    copy(left = newLeft, right = newRight)
}

object ArrayDot {
  val info = new ExpressionInfo(classOf[ArrayDot].getName, "array_dot")
  val builder: Seq[Expression] => Expression = args => ArrayDot(args(0), args(1))
}

/** [[ArrayDot]] over `array<float>` inputs, accumulating in double with
  * each element widened before the multiply — bit-identical to casting
  * the arrays to `array<double>` first (float→double widening is exact,
  * the product/sum rounding is the same), at HALF the bytes per vector.
  * Exists so float-sourced embeddings can ride a shuffle un-widened: the
  * banded LSH exchange carries one vector copy per (row, band), and the
  * r12 measurement put the double-array carry at ~70 ms of the banded
  * write stage alone (LshLab v0 vs v4).
  */
case class ArrayDotFloat(left: Expression, right: Expression)
  extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes =
    Seq(ArrayType(FloatType), ArrayType(FloatType))
  override def dataType: DataType = DoubleType
  override def prettyName: String = "array_dot_float"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var s = 0.0
    var i = 0
    while (i < n) {
      if (!x.isNullAt(i) && !y.isNullAt(i))
        s += x.getFloat(i).toDouble * y.getFloat(i).toDouble
      i += 1
    }
    s
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val s = ctx.freshName("s")
      s"""
         |int $n = java.lang.Math.min($x.numElements(), $y.numElements());
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  if (!$x.isNullAt($i) && !$y.isNullAt($i)) {
         |    $s += ((double) $x.getFloat($i)) * ((double) $y.getFloat($i));
         |  }
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression,
                                                 newRight: Expression): ArrayDotFloat =
    copy(left = newLeft, right = newRight)
}

object ArrayDotFloat {
  val info = new ExpressionInfo(classOf[ArrayDotFloat].getName, "array_dot_float")
  val builder: Seq[Expression] => Expression =
    args => ArrayDotFloat(args(0), args(1))
}

/** Optimizer rule: `pow(x, 2)` → `x * x` (a multiplication beats a
  * transcendental pow call; the reference's ExpressionRewriter plays the
  * same role with ArithmeticSimplification, duckdb-7.cpp:13908).
  * Exists chiefly to exercise the optimizer-extension injection point.
  */
object SquarePowRule
  extends org.apache.spark.sql.catalyst.rules.Rule[org.apache.spark.sql.catalyst.plans.logical.LogicalPlan] {
  import org.apache.spark.sql.catalyst.expressions.{Cast, LeafExpression, Literal, Multiply, Pow}
  import org.apache.spark.sql.catalyst.expressions.Expression

  // duplicating the base is only safe/profitable when it is deterministic
  // (pow(rand(),2) must NOT become rand()*rand()) and cheap to re-evaluate
  // (a column ref / literal, possibly cast) — the same guard Spark's own
  // optimizer applies before duplicating expressions
  private def cheapDeterministic(e: Expression): Boolean = e.deterministic && (e match {
    case _: LeafExpression => true
    case c: Cast => c.child.isInstanceOf[LeafExpression]
    case _ => false
  })

  override def apply(plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan)
  : org.apache.spark.sql.catalyst.plans.logical.LogicalPlan =
    plan.transformAllExpressions {
      case Pow(b, Literal(2.0, DoubleType)) if cheapDeterministic(b) => Multiply(b, b)
    }
}

/** Injection point for `spark.sql.extensions=graft.plans.GraftExtensions`
  * (the reference's extension-registration analog: parser/optimizer
  * extensions, duckdb-8.cpp:7282 / duckdb-7.cpp:14038). */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((FunctionIdentifier("array_dot"), ArrayDot.info, ArrayDot.builder))
    ext.injectFunction((FunctionIdentifier("array_dot_float"),
      ArrayDotFloat.info, ArrayDotFloat.builder))
    ext.injectFunction((FunctionIdentifier("levenshtein_within"),
      LevenshteinWithin.info, LevenshteinWithin.builder))
    ext.injectFunction((FunctionIdentifier("word_gram_hashes"),
      WordGramHashes.info, WordGramHashes.builder))
    ext.injectFunction((FunctionIdentifier("ws_token_hashes"),
      WsTokenHashes.info, WsTokenHashes.builder))
    ext.injectFunction((FunctionIdentifier("gram_roll_hashes"),
      GramRollHashes.info, GramRollHashes.builder))
    ext.injectFunction((FunctionIdentifier("fast_round"),
      FastRound.info, FastRound.builder))
    ext.injectFunction((FunctionIdentifier("graft_fdiv"),
      graft.functions.DuckFloorDiv.info, graft.functions.DuckFloorDiv.builder))
    ext.injectFunction((FunctionIdentifier("len"),
      graft.functions.DuckLen.info, graft.functions.DuckLen.builder))
    ext.injectOptimizerRule(_ => SquarePowRule)
    ext.injectOptimizerRule(_ => RangeJoinRule)
    ext.injectPostHocResolutionRule(_ => ResolveReservoirHint)
    ext.injectPlannerStrategy(_ => ReservoirStrategy)
  }
}

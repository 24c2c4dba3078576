package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ArrayType, DoubleType, LongType, NumericType, TimestampNTZType, TimestampType}

/** Automatic range-join planning (the IEJoin-class gap: reference
  * PhysicalPiecewiseMergeJoin/PhysicalIEJoin, duckdb-3.cpp:17261/15445).
  *
  * Detects an INNER join whose condition is exactly a two-sided band —
  * `lo ⋈ point ⋈ hi` with the point from one child and the interval from
  * the other, and NO equi conjunct — which Spark would otherwise execute
  * as a broadcast-nested-loop (O(n·m)). Rewrites it to: bucket the point
  * side, explode the interval side over the buckets it spans, equi-join
  * on the bucket, keep the original predicate as the exact refinement.
  *
  * Opt-in: set `spark.graft.rangeJoin.bucketWidth` to (at least) the
  * maximum interval width. Zero/unset disables the rule. Registered via
  * [[GraftExtensions]] and `spark.experimental.extraOptimizations`.
  */
object RangeJoinRule extends Rule[LogicalPlan] {

  private def refsOnly(e: Expression, side: LogicalPlan): Boolean =
    e.references.nonEmpty && e.references.subsetOf(side.outputSet)

  /** (point, lo, hi) when cmp is `point > lo`-shaped or `hi > point`-shaped. */
  private case class Band(point: Expression, bound: Expression, isLower: Boolean)

  // The rewrite buckets via Cast(e, DoubleType): valid only for numeric
  // and timestamp inputs. For anything else (string, date, …) the cast
  // yields null and the bucket equi-join would silently return zero rows
  // where the original join had matches — so bail out instead.
  private def bucketable(e: Expression): Boolean = e.dataType match {
    case _: NumericType | TimestampType | TimestampNTZType => true
    case _ => false
  }

  private def asBand(e: Expression, pointSide: LogicalPlan,
                     rangeSide: LogicalPlan): Option[Band] = (e match {
    case GreaterThan(a, b) => bandOf(a, b, pointSide, rangeSide)
    case GreaterThanOrEqual(a, b) => bandOf(a, b, pointSide, rangeSide)
    case LessThan(a, b) => bandOf(b, a, pointSide, rangeSide)
    case LessThanOrEqual(a, b) => bandOf(b, a, pointSide, rangeSide)
    case _ => None
  }).filter(band => bucketable(band.point) && bucketable(band.bound))

  // a > b: either point > lo (a = point) or hi > point (b = point)
  private def bandOf(a: Expression, b: Expression, pointSide: LogicalPlan,
                     rangeSide: LogicalPlan): Option[Band] =
    if (refsOnly(a, pointSide) && refsOnly(b, rangeSide)) Some(Band(a, b, isLower = true))
    else if (refsOnly(b, pointSide) && refsOnly(a, rangeSide)) Some(Band(b, a, isLower = false))
    else None

  override def apply(plan: LogicalPlan): LogicalPlan = {
    val width = conf.getConfString("spark.graft.rangeJoin.bucketWidth", "0").toDouble
    if (width <= 0) return plan
    plan.transform {
      case j @ Join(left, right, Inner, Some(cond), hint) =>
        val conjuncts = splitConjuncts(cond)
        val noEqui = !conjuncts.exists {
          case EqualTo(a, b) =>
            (refsOnly(a, left) && refsOnly(b, right)) ||
              (refsOnly(b, left) && refsOnly(a, right))
          case _ => false
        }
        val rewritten = if (conjuncts.size == 2 && noEqui) {
          val asPointLeft = conjuncts.flatMap(asBand(_, left, right))
          val asPointRight = conjuncts.flatMap(asBand(_, right, left))
          if (asPointLeft.size == 2 && asPointLeft.map(_.isLower).toSet.size == 2 &&
            samePoint(asPointLeft))
            Some(rewrite(left, right, asPointLeft, cond, hint, width, pointIsLeft = true))
          else if (asPointRight.size == 2 && asPointRight.map(_.isLower).toSet.size == 2 &&
            samePoint(asPointRight))
            Some(rewrite(right, left, asPointRight, cond, hint, width, pointIsLeft = false))
          else None
        } else None
        rewritten.getOrElse(j)
    }
  }

  private def samePoint(bands: Seq[Band]): Boolean =
    bands(0).point.semanticEquals(bands(1).point)

  private def splitConjuncts(e: Expression): Seq[Expression] = e match {
    case And(a, b) => splitConjuncts(a) ++ splitConjuncts(b)
    case other => Seq(other)
  }

  private def bucketOf(e: Expression, width: Double): Expression =
    Cast(Floor(Divide(Cast(e, DoubleType), Literal(width))), LongType)

  private def rewrite(pointSide: LogicalPlan, rangeSide: LogicalPlan,
                      bands: Seq[Band], cond: Expression, hint: JoinHint,
                      width: Double, pointIsLeft: Boolean): LogicalPlan = {
    val point = bands.head.point
    val lo = bands.find(_.isLower).get.bound
    val hi = bands.find(!_.isLower).get.bound

    val pBucket = Alias(bucketOf(point, width), "__graft_pbucket")()
    val newPointSide = Project(pointSide.output :+ pBucket, pointSide)

    val rBucketAttr = AttributeReference("__graft_rbucket", LongType, nullable = true)()
    // Sequence is TimeZoneAwareExpression — unresolved without a zone
    val buckets = new Sequence(bucketOf(lo, width), bucketOf(hi, width), Literal(1L))
      .withTimeZone(conf.sessionLocalTimeZone)
    // Sequence throws on start > stop with step 1 — an inverted/empty
    // interval (hi < lo) must contribute no rows, not fail the query
    val seq = If(LessThanOrEqual(bucketOf(lo, width), bucketOf(hi, width)),
      buckets, Literal.create(Array.empty[Long], ArrayType(LongType)))
    val newRangeSide = Generate(Explode(seq), unrequiredChildIndex = Nil,
      outer = false, qualifier = None, generatorOutput = Seq(rBucketAttr), rangeSide)

    val bucketEq = EqualTo(pBucket.toAttribute, rBucketAttr)
    val (l, r) = if (pointIsLeft) (newPointSide, newRangeSide)
    else (newRangeSide, newPointSide)
    val joined = Join(l, r, Inner, Some(And(bucketEq, cond)), hint)
    // restore the original output (drop the bucket columns)
    val originalOutput = if (pointIsLeft) pointSide.output ++ rangeSide.output
    else rangeSide.output ++ pointSide.output
    Project(originalOutput, joined)
  }
}

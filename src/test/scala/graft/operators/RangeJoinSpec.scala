package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class RangeJoinSpec extends SparkSpec {
  import spark.implicits._

  test("bucketed point-in-range equals the nested-loop inequality join") {
    val points = (1 to 200).map(i => (i.toLong, i * 0.7)).toDF("pid", "x")
    val ranges = (1 to 40).map(i => (i.toLong, i * 3.0, i * 3.0 + 8.0)).toDF("rid", "lo", "hi")
    val bucketed = RangeJoin.pointInRange(points, "x", ranges, "lo", "hi", bucketWidth = 10.0)
      .select("pid", "rid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val bnlj = points.join(ranges, col("x") > col("lo") && col("x") <= col("hi"))
      .select("pid", "rid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(bucketed == bnlj)
    assert(bucketed.nonEmpty)
  }

  test("bucketed plan is an equi-join, not nested loop") {
    val points = (1 to 50).map(i => (i.toLong, i * 1.0)).toDF("pid", "x")
    val ranges = (1 to 10).map(i => (i.toLong, i * 4.0, i * 4.0 + 3.0)).toDF("rid", "lo", "hi")
    val plan = RangeJoin.pointInRange(points, "x", ranges, "lo", "hi", 5.0)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin"))
  }

  test("interval overlap join equals nested loop, emits each pair once") {
    val left = (1 to 120).map(i => (i.toLong, i * 0.9, i * 0.9 + (i % 7) * 5.0)).toDF("lid", "llo", "lhi")
    val right = (1 to 80).map(i => (i.toLong, i * 1.3 - 3.0, i * 1.3 + (i % 11) * 2.0)).toDF("rid", "rlo", "rhi")
    val got = RangeJoin.intervalOverlap(left, "llo", "lhi", right, "rlo", "rhi")
      .select("lid", "rid").collect().map(r => (r.getLong(0), r.getLong(1)))
    val expected = left.join(right, col("llo") <= col("rhi") && col("rlo") <= col("lhi"))
      .select("lid", "rid").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(got.length == expected.length, "duplicate or missing pairs") // multiset equality
    assert(got.toSet == expected.toSet)
    assert(got.nonEmpty)
  }

  test("adaptive point-in-range: variable widths, skew, inverted intervals") {
    // skewed points (clustered near 0) + interval widths from 0.5 to 500
    // — no single bucketWidth fits; quantile buckets adapt
    val points = ((1 to 300).map(i => (i.toLong, i * 0.01)) ++
      (301 to 400).map(i => (i.toLong, i * 7.0))).toDF("pid", "x")
    val ranges = ((1 to 30).map(i => (i.toLong, i * 0.05, i * 0.05 + (if (i % 3 == 0) 500.0 else 0.5))) :+
      ((99L, 10.0, 5.0))).map { case (a, b, c) => (a, b, c) }.toDF("rid", "lo", "hi")
    val adaptive = RangeJoin.pointInRangeAdaptive(points, "x", ranges, "lo", "hi")
      .select("pid", "rid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val bnlj = points.join(ranges, col("x") > col("lo") && col("x") <= col("hi"))
      .select("pid", "rid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(adaptive == bnlj)
    assert(adaptive.nonEmpty)
    val plan = RangeJoin.pointInRangeAdaptive(points, "x", ranges, "lo", "hi")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin"))
  }
}

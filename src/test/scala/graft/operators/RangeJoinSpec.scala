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
}

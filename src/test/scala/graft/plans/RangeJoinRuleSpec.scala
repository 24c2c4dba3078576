package graft.plans

import graft.SparkSpec
import org.apache.spark.sql.functions._

class RangeJoinRuleSpec extends SparkSpec {
  import spark.implicits._

  private def points = (1 to 500).map(i => (i.toLong, i * 0.37)).toDF("pid", "x")
  private def ranges = (1 to 60).map(i => (i.toLong, i * 2.0, i * 2.0 + 7.0)).toDF("rid", "lo", "hi")

  private def bandJoin() = points.join(ranges,
    col("x") > col("lo") && col("x") <= col("hi"))

  test("rule rewrites a pure band join to a bucketed equi-join") {
    val baseline = bandJoin().select("pid", "rid").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    spark.conf.set("spark.graft.rangeJoin.bucketWidth", "8.0")
    try {
      val rewritten = bandJoin()
      val plan = rewritten.queryExecution.executedPlan.toString
      assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
      assert(plan.contains("__graft_pbucket") || plan.contains("hashpartitioning") ||
        plan.contains("BroadcastHashJoin"), plan)
      val got = rewritten.select("pid", "rid").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(got == baseline)
      assert(got.nonEmpty)
    } finally spark.conf.unset("spark.graft.rangeJoin.bucketWidth")
  }

  test("rule bails out on non-numeric band columns (no silent wrong results)") {
    // string band: Cast(_, Double) would be null on both bucket keys and
    // the equi-join would silently drop every match — rule must not fire
    val sPoints = Seq(("p1", "m"), ("p2", "c")).toDF("pid", "s")
    val sRanges = Seq(("r1", "a", "f"), ("r2", "k", "z")).toDF("rid", "slo", "shi")
    val j = () => sPoints.join(sRanges, col("s") > col("slo") && col("s") <= col("shi"))
    val baseline = j().select("pid", "rid").collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(baseline == Set("p1" -> "r2", "p2" -> "r1"))
    spark.conf.set("spark.graft.rangeJoin.bucketWidth", "8.0")
    try {
      val got = j()
      assert(!got.queryExecution.optimizedPlan.toString.contains("__graft_pbucket"))
      assert(got.select("pid", "rid").collect().map(r => (r.getString(0), r.getString(1))).toSet == baseline)
    } finally spark.conf.unset("spark.graft.rangeJoin.bucketWidth")
  }

  test("inverted intervals (hi < lo) match nothing instead of throwing") {
    val badRanges = Seq((1L, 10.0, 5.0), (2L, 20.0, 27.0)).toDF("rid", "lo", "hi")
    spark.conf.set("spark.graft.rangeJoin.bucketWidth", "8.0")
    try {
      val got = points.join(badRanges, col("x") > col("lo") && col("x") <= col("hi"))
      assert(got.queryExecution.optimizedPlan.toString.contains("__graft_pbucket"))
      val rids = got.select("rid").distinct().as[Long].collect().toSet
      assert(rids == Set(2L)) // rid 1 is inverted: contributes no rows, no error
    } finally spark.conf.unset("spark.graft.rangeJoin.bucketWidth")
  }

  test("rule leaves equi-joins and disabled sessions alone") {
    // disabled: BNLJ stays
    val plan0 = bandJoin().queryExecution.executedPlan.toString
    assert(plan0.contains("NestedLoopJoin") || plan0.contains("CartesianProduct"), plan0)
    // enabled but equi conjunct present: native hash join keeps priority
    spark.conf.set("spark.graft.rangeJoin.bucketWidth", "8.0")
    try {
      val equi = points.join(ranges, col("pid") === col("rid") && col("x") > col("lo") / 8)
      val plan1 = equi.queryExecution.executedPlan.toString
      assert(!plan1.contains("__graft_pbucket"), plan1)
      assert(equi.count() > 0)
    } finally spark.conf.unset("spark.graft.rangeJoin.bucketWidth")
  }
}

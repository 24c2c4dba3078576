package graft.plans

import graft.SparkSpec

/** Physical-plan contract for the TPC-H Q5-shape multiway join
  * (`join_multiway_broadcast`): the four dimension joins must all be
  * broadcast (no dim ever shuffles), and the only shuffled join is the
  * single fact-fact lineitem⋈orders co-shuffle on orderkey. This is the
  * plan that survives a 100 TB fact table — a regression to a shuffled
  * dim join or a BNLJ is caught here, not in a bench diff.
  */
class MultiwayPlanSpec extends SparkSpec {

  test("join_multiway_broadcast: 4 broadcast dim joins + exactly 1 fact-fact shuffle join") {
    // disable size-based auto-broadcast so the tiny test SF plans the way
    // a 100 TB fact table would: only the EXPLICIT broadcast hints remain
    val key = "spark.sql.autoBroadcastJoinThreshold"
    val prev = spark.conf.get(key)
    val plan = try {
      spark.conf.set(key, "-1")
      graft.queries.Relational.queries("join_multiway_broadcast")(
        spark, "/root/testdata/sf0.001").queryExecution.executedPlan.toString
    } finally spark.conf.set(key, prev)
    def count(marker: String): Int = marker.r.findAllIn(plan).length
    val bhj = count("BroadcastHashJoin")
    val shuffledJoins = count("SortMergeJoin") + count("ShuffledHashJoin")
    assert(bhj == 4, s"expected 4 BroadcastHashJoins, got $bhj in:\n$plan")
    assert(shuffledJoins == 1,
      s"expected exactly 1 shuffled fact-fact join, got $shuffledJoins in:\n$plan")
    assert(count("BroadcastNestedLoopJoin") == 0, "BNLJ must not appear")
  }
}

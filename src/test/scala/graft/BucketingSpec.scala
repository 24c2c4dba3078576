package graft

import org.apache.spark.sql.functions._

/** Bucketed tables + CBO statistics — the co-located-join story from
  * SURVEY §4.3 ("bucketing at 100 TB"), asserted on the actual plans.
  */
class BucketingSpec extends SparkSpec {

  private def rmrf(f: java.io.File): Unit = {
    if (f.isDirectory) f.listFiles().foreach(rmrf)
    f.delete()
  }

  private lazy val setup: Unit = {
    val dir = "/root/testdata/sf0.001"
    spark.sql("DROP TABLE IF EXISTS lineitem_b")
    spark.sql("DROP TABLE IF EXISTS orders_b")
    // the in-memory catalog resets per JVM but the warehouse dir persists
    rmrf(new java.io.File("spark-warehouse/lineitem_b"))
    rmrf(new java.io.File("spark-warehouse/orders_b"))
    Engine.table(spark, dir, "lineitem")
      .write.mode("overwrite").format("parquet")
      .bucketBy(8, "l_orderkey").sortBy("l_orderkey")
      .saveAsTable("lineitem_b")
    Engine.table(spark, dir, "orders")
      .write.mode("overwrite").format("parquet")
      .bucketBy(8, "o_orderkey").sortBy("o_orderkey")
      .saveAsTable("orders_b")
  }

  test("bucketed co-located join has no shuffle exchange") {
    setup
    // force SMJ so the bucketing (not a broadcast) decides the plan
    val before = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val j = spark.table("orders_b").join(spark.table("lineitem_b"),
        col("o_orderkey") === col("l_orderkey"))
        .groupBy("o_orderstatus").agg(count(lit(1)).as("n"))
      val plan = j.queryExecution.executedPlan.toString
      // the join itself reads both sides bucket-aligned: the only
      // exchange allowed is the one for the final aggregation
      val joinPart = plan.substring(plan.indexOf("SortMergeJoin"))
      assert(!joinPart.contains("Exchange hashpartitioning(o_orderkey") &&
        !joinPart.contains("Exchange hashpartitioning(l_orderkey"), plan)
      assert(j.agg(sum("n")).head().getLong(0) == 6000L)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", before)
  }

  test("ANALYZE TABLE feeds CBO row counts") {
    setup
    spark.sql("ANALYZE TABLE lineitem_b COMPUTE STATISTICS")
    val before = spark.conf.get("spark.sql.cbo.enabled", "false")
    spark.conf.set("spark.sql.cbo.enabled", "true")
    try {
      val stats = spark.table("lineitem_b").queryExecution.optimizedPlan.stats
      assert(stats.rowCount.exists(_.toLong == 6000L), stats.toString)
    } finally spark.conf.set("spark.sql.cbo.enabled", before)
  }
}

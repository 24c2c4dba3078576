package graft.plans

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Scan-level plan contracts: filters must reach the parquet reader as
  * PushedFilters (the reference's zone-map skipping analog,
  * duckdb-10.cpp:5441) and the ReadSchema must be pruned to the columns
  * the query touches. A scan that decodes all columns for a 2-column
  * projection is wrong at any scale; at 100 TB it is the whole job.
  */
class PushdownSpec extends SparkSpec {
  private val dir = "/root/testdata/sf0.001"

  test("filter is pushed to the parquet scan") {
    val df = graft.Engine.table(spark, dir, "lineitem")
      .filter(col("l_quantity") > 45.0)
      .select(col("l_orderkey"), col("l_quantity"))
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: [IsNotNull(l_quantity), GreaterThan(l_quantity,45.0)]"),
      s"filter not pushed:\n$plan")
  }

  test("read schema is pruned to referenced columns") {
    val df = graft.Engine.table(spark, dir, "lineitem")
      .groupBy(col("l_returnflag")).agg(sum(col("l_quantity")).as("q"))
    val plan = df.queryExecution.executedPlan.toString
    val read = "ReadSchema: struct<([^>]*)>".r.findFirstMatchIn(plan).map(_.group(1))
    assert(read.isDefined, s"no ReadSchema in:\n$plan")
    val cols = read.get.split(",").map(_.split(":").head.trim).toSet
    assert(cols == Set("l_returnflag", "l_quantity"),
      s"scan reads ${cols.mkString(",")} — expected exactly the two referenced columns")
  }

  test("partition-count limit pushes as a row-group-skipping limit scan") {
    val df = graft.Engine.table(spark, dir, "orders").limit(5)
    // CollectLimit / GlobalLimit over the scan — no shuffle stage at all
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"LIMIT should not shuffle:\n$plan")
  }
}

package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Engine

/** Round-4 additions: automatic range-join planning coverage and the
  * remaining DuckDB v0.7 surface gaps (ON CONFLICT, system sampling,
  * duckdb_functions()).
  */
object Round4 {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Engine.table(s, dir, name)

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    "join_range_autoplan" -> ((s, dir) => {
      // the SAME plain band join as join_range_inequality with NO conf at
      // all: RangeJoinRule derives quantile bucket boundaries from the
      // point distribution at plan time (reference picks its range
      // operators from the condition shape alone, duckdb-4.cpp:9054).
      // bucketWidth is pinned to 0 because verify/bench share one session
      // and join_range_autorewrite sets a width — this query must prove
      // the statistics path specifically.
      graft.functions.DuckFunctions.register(s)
      val before = s.conf.getOption("spark.graft.rangeJoin.bucketWidth")
      s.conf.set("spark.graft.rangeJoin.bucketWidth", "0")
      try {
        val su = t(s, dir, "supplier"); val c = t(s, dir, "customer")
        val joined = su.join(c, col("c_acctbal") > col("s_acctbal") - 10.0 &&
            col("c_acctbal") <= col("s_acctbal"))
          .groupBy(col("s_suppkey")).agg(count(lit(1)).as("n_in_band"))
        // materialize the plan under the pinned conf (optimization is
        // lazy; restoring the conf first would re-enable the width path)
        joined.queryExecution.executedPlan
        joined
      } finally before match {
        case Some(w) => s.conf.set("spark.graft.rangeJoin.bucketWidth", w)
        case None => s.conf.unset("spark.graft.rangeJoin.bucketWidth")
      }
    })
  )

  val oracle: Map[String, String] = Map(

    "join_range_autoplan" ->
      """SELECT s_suppkey, count(*) AS n_in_band
        |FROM supplier JOIN customer
        |  ON c_acctbal > s_acctbal - 10.0 AND c_acctbal <= s_acctbal
        |GROUP BY s_suppkey""".stripMargin
  )
}

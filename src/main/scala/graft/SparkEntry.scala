package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` is the operator inventory (one entry per implemented operator
  * family from SURVEY.md §2); `oracleSql` carries the DuckDB-equivalent
  * SQL the driver runs for the hash compare. Column names and types are
  * aligned pairwise (the compare sorts columns by name).
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * TPC-H Q1 shape per SURVEY.md §7.1. */
  def entry(spark: SparkSession): DataFrame =
    queries("agg_q1_pricing")(spark, "/root/testdata/sf0.001")

  def queries: Map[String, (SparkSession, String) => DataFrame] =
    graft.queries.Relational.queries ++
      graft.queries.ScalarFns.queries ++
      graft.queries.Pipeline.queries ++
      graft.queries.Extended.queries ++
      graft.queries.Extended2.queries ++
      graft.queries.Tpch2.queries ++
      graft.queries.TpcDs.queries ++
      graft.queries.Round2.queries ++
      graft.queries.Round3.queries ++
      graft.queries.Round4.queries ++
      graft.queries.Round5.queries ++
      graft.queries.PipelineOps.queries

  def oracleSql: Map[String, String] =
    graft.queries.Relational.oracle ++
      graft.queries.ScalarFns.oracle ++
      graft.queries.Pipeline.oracle ++
      graft.queries.Extended.oracle ++
      graft.queries.Extended2.oracle ++
      graft.queries.Tpch2.oracle ++
      graft.queries.TpcDs.oracle ++
      graft.queries.Round2.oracle ++
      graft.queries.Round3.oracle ++
      graft.queries.Round4.oracle ++
      graft.queries.Round5.oracle ++
      graft.queries.PipelineOps.oracle
}

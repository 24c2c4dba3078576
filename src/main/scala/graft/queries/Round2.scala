package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.{Engine, SqlDialect}
import graft.operators.{RangeJoin, Similarity}

/** Round-2 coverage batch: data-adaptive interval join (the general
  * IEJoin case), embedding-cosine near-dup stats, star-modifier dialect
  * rewrites, stream-stream event-time join.
  */
object Round2 {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Engine.table(s, dir, name)

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    "join_range_adaptive" -> ((s, dir) => {
      // variable-width intervals (width 0..97 + 0..13) — no single
      // bucketWidth fits; pointInRangeAdaptive derives quantile buckets
      // from the point distribution instead (general IEJoin case,
      // reference duckdb-3.cpp:15445)
      val su = t(s, dir, "supplier")
        .withColumn("lo", col("s_acctbal") - (col("s_suppkey") % 97).cast("double"))
        .withColumn("hi", col("s_acctbal") + (col("s_suppkey") % 13).cast("double"))
      val c = t(s, dir, "customer")
      RangeJoin.pointInRangeAdaptive(c, "c_acctbal", su, "lo", "hi")
        .groupBy(col("s_suppkey")).agg(count(lit(1)).as("n_in_band"))
    }),

    "dedup_embedding_cosine" -> ((s, dir) => {
      // embedding-cosine near-dup candidate density per label pair:
      // exact all-pairs cosine via the codegen'd array_dot expression.
      // The all-pairs product is the EXACT baseline (oracle-matched);
      // at corpus scale the same refine runs over LSH/IVF candidates
      // (sim_lsh_ann / sim_ivf_topk) instead of the full cross product.
      val e = t(s, dir, "embeddings")
        .select(col("vec_id"), col("label").cast("long").as("label"),
          col("embedding").cast("array<double>").as("v"))
        .withColumn("nrm", Similarity.norm(col("v")))
      val a = e.select(col("vec_id").as("id_a"), col("label").as("la"),
        col("v").as("va"), col("nrm").as("na"))
      val b = e.select(col("vec_id").as("id_b"), col("label").as("lb"),
        col("v").as("vb"), col("nrm").as("nb"))
      a.join(b, col("id_a") < col("id_b"))
        .select(col("la"), col("lb"),
          (Similarity.dot(col("va"), col("vb")) / (col("na") * col("nb"))).as("cos"))
        .groupBy(col("la"), col("lb"))
        .agg(count(when(col("cos") >= 0.35, 1)).as("n_sim"),
          round(max(col("cos")), 6).as("max_cos"))
    }),

    "dialect_exclude_replace" -> ((s, dir) => {
      // star modifiers: EXCLUDE drops columns, REPLACE substitutes an
      // expression under the same name (SqlDialect rewrite → Spark
      // `* EXCEPT` + re-projection)
      Engine.registerAll(s, dir)
      SqlDialect.sql(s,
        """SELECT * EXCLUDE (o_orderpriority)
          |         REPLACE (round(o_totalprice / 1000, 2) AS o_totalprice)
          |FROM orders WHERE o_orderkey <= 100""".stripMargin)
    }),

    "stream_stream_join" -> ((s, dir) => {
      // real stream-stream inner join (two watermarked sides, event-time
      // range condition, bounded state)
      graft.streaming.EventStreams.runToBatchAppend(
        s, dir, s"ssj_${System.nanoTime()}",
        graft.streaming.EventStreams.viewClickJoin)
    })
  )

  val oracle: Map[String, String] = Map(
    "join_range_adaptive" ->
      """SELECT s_suppkey, count(*) AS n_in_band
        |FROM supplier JOIN customer
        |  ON c_acctbal > s_acctbal - (s_suppkey % 97)
        | AND c_acctbal <= s_acctbal + (s_suppkey % 13)
        |GROUP BY s_suppkey""".stripMargin,

    "dedup_embedding_cosine" ->
      """WITH e AS (SELECT vec_id, CAST(label AS BIGINT) AS label,
        |             CAST(embedding AS DOUBLE[]) AS v
        |           FROM embeddings)
        |SELECT a.label AS la, b.label AS lb,
        |  count(*) FILTER (WHERE list_cosine_similarity(a.v, b.v) >= 0.35) AS n_sim,
        |  round(max(list_cosine_similarity(a.v, b.v)), 6) AS max_cos
        |FROM e a JOIN e b ON a.vec_id < b.vec_id
        |GROUP BY 1, 2""".stripMargin,

    "dialect_exclude_replace" ->
      """SELECT * EXCLUDE (o_orderpriority)
        |         REPLACE (round(o_totalprice / 1000, 2) AS o_totalprice)
        |FROM orders WHERE o_orderkey <= 100""".stripMargin,

    "stream_stream_join" ->
      """SELECT v.event_id AS view_id, v.user_id,
        |  CAST(c.ts AS TIMESTAMP) AS cts, round(c.value, 2) AS click_value
        |FROM (SELECT * FROM events WHERE event_type = 'view') v
        |JOIN (SELECT * FROM events WHERE event_type = 'click') c
        |  ON v.user_id = c.user_id
        | AND c.ts >= v.ts - INTERVAL 4 HOUR AND c.ts <= v.ts""".stripMargin
  )
}

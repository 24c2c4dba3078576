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
    }),

    "stream_stream_left_join" -> ((s, dir) => {
      // left-outer stream-stream join: outer (null) rows emit on state
      // eviction, so restrict to the watermark-decided region — views
      // older than max event time minus (watermark 1h + range 4h + 1h
      // margin); the oracle applies the identical cutoff
      val res = graft.streaming.EventStreams.runToBatchAppend(
        s, dir, s"sslj_${System.nanoTime()}",
        graft.streaming.EventStreams.viewClickLeftJoin)
      val mx = t(s, dir, "events").agg(max(col("ts")).as("mx"))
      res.crossJoin(broadcast(mx))
        .where(col("vts") <= col("mx") - expr("INTERVAL 6 HOURS"))
        .select(col("view_id"), col("user_id"), col("vts"), col("cts"),
          col("click_value"))
    }),

    "join_interval_overlap" -> ((s, dir) => {
      // interval×interval overlap (the FULL IEJoin shape: two-sided
      // inequality with different intervals on each side), written as a
      // PLAIN join — graft.plans.RangeJoinRule detects the shape and
      // rewrites it to the quantile-bucketed equi-join automatically
      // (reference join selection, duckdb-4.cpp:9054-9168; no conf
      // needed). The programmatic RangeJoin.intervalOverlap API remains
      // for callers that want explicit control (spec-covered).
      graft.functions.DuckFunctions.register(s)
      val su = t(s, dir, "supplier")
        .withColumn("s_lo", col("s_acctbal") - (col("s_suppkey") % 50).cast("double"))
        .withColumn("s_hi", col("s_acctbal") + (col("s_suppkey") % 20).cast("double"))
      val c = t(s, dir, "customer").filter(col("c_custkey") <= 1000)
        .withColumn("c_lo", col("c_acctbal") - (col("c_custkey") % 30).cast("double"))
        .withColumn("c_hi", col("c_acctbal") + (col("c_custkey") % 40).cast("double"))
      su.join(c, col("s_lo") <= col("c_hi") && col("c_lo") <= col("s_hi"))
        .groupBy(col("s_suppkey"))
        .agg(count(lit(1)).as("n_overlap"), sum(col("c_custkey")).as("sum_cust"))
    }),

    "fn_map_bar" -> ((s, dir) => {
      // MAP surface (map / map_from_entries / element_at / cardinality /
      // map_keys, duckdb-5.cpp:16351) + the bar() chart function — all
      // rendered to scalars
      val n = t(s, dir, "nation")
      val m = map(col("n_name"), col("n_regionkey").cast("long"), lit("x"), lit(99L))
      n.select(
        col("n_nationkey").cast("long").as("nk"),
        element_at(m, col("n_name")).as("self_val"),
        size(m).cast("long").as("card"),
        array_join(map_keys(m), ",").as("ks"),
        element_at(map_from_entries(array(struct(col("n_name").as("k"),
          col("n_regionkey").cast("long").as("v")))), col("n_name")).as("mfe_val"),
        callUDF("bar", col("n_nationkey").cast("double"), lit(0.0), lit(24.0), lit(10.0)).as("b"))
    }),

    "fn_union_type" -> ((s, dir) => {
      // UNION tagged sum type over the sparse-struct encoding
      // (SURVEY §1.2; union_value/extract/tag, duckdb-5.cpp:16371) —
      // tag names aligned with the reference's union_tag output
      import graft.functions.TypeHelpers._
      val members = Seq("num", "str")
      val n = t(s, dir, "nation")
      val u = when(col("n_nationkey") % 2 === 0,
        unionValue(0, members, col("n_nationkey").cast("int")))
        .otherwise(unionValue(1, members, col("n_name")))
      n.select(col("n_nationkey").cast("long").as("nk"), u.as("u"))
        .select(col("nk"),
          when(unionTag(col("u")) === 0, "num").otherwise("str").as("tag"),
          unionExtract(col("u"), "num").cast("long").as("num_val"),
          unionExtract(col("u"), "str").cast("string").as("str_val"))
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
        | AND c.ts >= v.ts - INTERVAL 4 HOUR AND c.ts <= v.ts""".stripMargin,

    "stream_stream_left_join" ->
      """SELECT v.event_id AS view_id, v.user_id, CAST(v.ts AS TIMESTAMP) AS vts,
        |  CAST(c.ts AS TIMESTAMP) AS cts, round(c.value, 2) AS click_value
        |FROM (SELECT * FROM events WHERE event_type = 'view') v
        |LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c
        |  ON v.user_id = c.user_id
        | AND c.ts >= v.ts - INTERVAL 4 HOUR AND c.ts <= v.ts
        |WHERE v.ts <= (SELECT max(ts) FROM events) - INTERVAL 6 HOUR""".stripMargin,

    "join_interval_overlap" ->
      """WITH s AS (SELECT s_suppkey,
        |    s_acctbal - (s_suppkey % 50) AS s_lo,
        |    s_acctbal + (s_suppkey % 20) AS s_hi FROM supplier),
        |c AS (SELECT c_custkey,
        |    c_acctbal - (c_custkey % 30) AS c_lo,
        |    c_acctbal + (c_custkey % 40) AS c_hi
        |  FROM customer WHERE c_custkey <= 1000)
        |SELECT s_suppkey, count(*) AS n_overlap,
        |  CAST(sum(c_custkey) AS BIGINT) AS sum_cust
        |FROM s JOIN c ON s_lo <= c_hi AND c_lo <= s_hi
        |GROUP BY s_suppkey""".stripMargin,

    "fn_map_bar" ->
      """SELECT CAST(n_nationkey AS BIGINT) AS nk,
        |  element_at(map([n_name, 'x'], [CAST(n_regionkey AS BIGINT), 99]), n_name)[1] AS self_val,
        |  CAST(cardinality(map([n_name, 'x'], [CAST(n_regionkey AS BIGINT), 99])) AS BIGINT) AS card,
        |  array_to_string(map_keys(map([n_name, 'x'], [CAST(n_regionkey AS BIGINT), 99])), ',') AS ks,
        |  CAST(element_at(map_from_entries([{'k': n_name, 'v': n_regionkey}]), n_name)[1] AS BIGINT) AS mfe_val,
        |  bar(n_nationkey, 0, 24, 10) AS b
        |FROM nation""".stripMargin,

    "fn_union_type" ->
      """WITH u AS (
        |  SELECT n_nationkey,
        |    (CASE WHEN n_nationkey % 2 = 0
        |      THEN union_value(num := CAST(n_nationkey AS INTEGER))::UNION(num INTEGER, str VARCHAR)
        |      ELSE union_value(str := n_name)::UNION(num INTEGER, str VARCHAR) END) AS uv
        |  FROM nation)
        |SELECT CAST(n_nationkey AS BIGINT) AS nk,
        |  CAST(union_tag(uv) AS VARCHAR) AS tag,
        |  CAST(union_extract(uv, 'num') AS BIGINT) AS num_val,
        |  union_extract(uv, 'str') AS str_val
        |FROM u""".stripMargin
  )
}

package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Engine

/** Further TPC-H-shaped queries adapted to the driver schema (no
  * commitdate/shipmode/partsupp columns — filters substituted, shapes
  * preserved): Q4 EXISTS + date window, Q12 CASE aggregation over a
  * join, Q14 conditional revenue share, Q16 NOT IN (null-aware anti).
  */
object Tpch2 {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Engine.table(s, dir, name)

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    "tpch_q4ish" -> ((s, dir) => {
      val o = t(s, dir, "orders")
        .filter(col("o_orderdate") >= expr("timestamp'1996-01-01 00:00:00'") &&
          col("o_orderdate") < expr("timestamp'1996-07-01 00:00:00'"))
      val big = t(s, dir, "lineitem").filter(col("l_quantity") > 48)
      o.join(big, col("o_orderkey") === col("l_orderkey"), "left_semi")
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("n"))
    }),

    "tpch_q12ish" -> ((s, dir) => {
      val o = t(s, dir, "orders"); val l = t(s, dir, "lineitem")
      val high = col("o_orderpriority").isin("1-URGENT", "2-HIGH")
      o.join(l, col("o_orderkey") === col("l_orderkey"))
        .filter(col("l_shipdate") >= expr("timestamp'1996-01-01 00:00:00'") &&
          col("l_shipdate") < expr("timestamp'1997-01-01 00:00:00'"))
        .groupBy(col("l_returnflag"))
        .agg(sum(when(high, 1).otherwise(0)).cast("long").as("high_count"),
          sum(when(!high, 1).otherwise(0)).cast("long").as("low_count"))
    }),

    "tpch_q14ish" -> ((s, dir) => {
      val l = t(s, dir, "lineitem")
        .filter(col("l_shipdate") >= expr("timestamp'1996-01-01 00:00:00'") &&
          col("l_shipdate") < expr("timestamp'1996-04-01 00:00:00'"))
      val p = broadcast(t(s, dir, "part"))
      val rev = col("l_extendedprice") * (lit(1.0) - col("l_discount"))
      l.join(p, col("l_partkey") === col("p_partkey"))
        .agg(round(lit(100.0) *
          sum(when(col("p_type").startsWith("PROMO"), rev).otherwise(0.0)) / sum(rev), 4)
          .as("promo_share"),
          count(lit(1)).as("n"))
    }),

    "tpch_q10ish" -> ((s, dir) => {
      // aggregate the FACT side down to one row per customer key before
      // the dimension join: the lineitem⋈orders revenue rolls up to
      // |customer| rows first, then the (broadcastable) customer table
      // attaches name/acctbal — c_name never rides through the fact
      // shuffle and the dim join moves |customer| rows, not |lineitem|
      val c = t(s, dir, "customer"); val o = t(s, dir, "orders")
      val l = t(s, dir, "lineitem").filter(col("l_returnflag") === "R")
      val rev = col("l_extendedprice") * (lit(1.0) - col("l_discount"))
      val perCust = l.select(col("l_orderkey"), rev.as("rev"))
        .join(o.select(col("o_orderkey"), col("o_custkey")),
          col("o_orderkey") === col("l_orderkey"))
        .groupBy(col("o_custkey")).agg(sum(col("rev")).as("raw_rev"))
      perCust
        .join(c.select(col("c_custkey"), col("c_name"), col("c_acctbal")),
          col("c_custkey") === col("o_custkey"))
        .select(col("c_custkey"), col("c_name"),
          round(col("raw_rev"), 2).as("revenue"),
          round(col("c_acctbal"), 2).as("c_acctbal"))
        .orderBy(col("revenue").desc, col("c_custkey").asc)
        .limit(20)
    }),

    "tpch_q13ish" -> ((s, dir) => {
      // distribution of orders-per-customer: double aggregation over a
      // left outer join
      val c = t(s, dir, "customer"); val o = t(s, dir, "orders")
      c.join(o, col("c_custkey") === col("o_custkey"), "left")
        .groupBy(col("c_custkey"))
        .agg(count(col("o_orderkey")).as("c_count"))
        .groupBy(col("c_count"))
        .agg(count(lit(1)).as("custdist"))
    }),

    "tpch_q22ish" -> ((s, dir) => {
      // scalar subquery threshold + anti join
      Engine.registerAll(s, dir)
      s.sql(
        """SELECT count(*) AS numcust, round(sum(c_acctbal), 2) AS totbal
          |FROM customer
          |WHERE c_acctbal > (SELECT avg(c_acctbal) FROM customer WHERE c_acctbal > 0)
          |  AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)""".stripMargin)
    }),

    "tpch_q16ish" -> ((s, dir) => {
      // NOT IN → Catalyst null-aware anti join
      Engine.registerAll(s, dir)
      s.sql(
        """SELECT p_brand, CAST(p_size AS BIGINT) AS p_size,
          |  count(DISTINCT l_suppkey) AS supplier_cnt
          |FROM part JOIN lineitem ON p_partkey = l_partkey
          |WHERE p_brand <> 'Brand#45' AND p_size IN (1, 4, 7)
          |  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 500)
          |GROUP BY p_brand, p_size""".stripMargin)
    })
  )

  val oracle: Map[String, String] = Map(
    "tpch_q4ish" ->
      """SELECT o_orderpriority, count(*) AS n
        |FROM orders
        |WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
        |  AND o_orderdate < TIMESTAMP '1996-07-01 00:00:00'
        |  AND EXISTS (SELECT 1 FROM lineitem
        |    WHERE l_orderkey = o_orderkey AND l_quantity > 48)
        |GROUP BY o_orderpriority""".stripMargin,

    "tpch_q12ish" ->
      """SELECT l_returnflag,
        |  CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH')
        |    THEN 1 ELSE 0 END) AS BIGINT) AS high_count,
        |  CAST(sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT','2-HIGH')
        |    THEN 1 ELSE 0 END) AS BIGINT) AS low_count
        |FROM orders JOIN lineitem ON o_orderkey = l_orderkey
        |WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        |  AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
        |GROUP BY l_returnflag""".stripMargin,

    "tpch_q14ish" ->
      """SELECT round(100.0 *
        |    sum(CASE WHEN p_type LIKE 'PROMO%'
        |        THEN l_extendedprice * (1.0 - l_discount) ELSE 0.0 END) /
        |    sum(l_extendedprice * (1.0 - l_discount)), 4) AS promo_share,
        |  count(*) AS n
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        |  AND l_shipdate < TIMESTAMP '1996-04-01 00:00:00'""".stripMargin,

    "tpch_q10ish" ->
      """SELECT c_custkey, c_name,
        |  round(sum(l_extendedprice * (1.0 - l_discount)), 2) AS revenue,
        |  round(first(c_acctbal), 2) AS c_acctbal
        |FROM customer
        |JOIN orders ON c_custkey = o_custkey
        |JOIN lineitem ON o_orderkey = l_orderkey
        |WHERE l_returnflag = 'R'
        |GROUP BY c_custkey, c_name
        |ORDER BY revenue DESC, c_custkey ASC LIMIT 20""".stripMargin,

    "tpch_q13ish" ->
      """SELECT c_count, count(*) AS custdist FROM (
        |  SELECT c_custkey, count(o_orderkey) AS c_count
        |  FROM customer LEFT JOIN orders ON c_custkey = o_custkey
        |  GROUP BY c_custkey
        |) GROUP BY c_count""".stripMargin,

    "tpch_q22ish" ->
      """SELECT count(*) AS numcust, round(sum(c_acctbal), 2) AS totbal
        |FROM customer
        |WHERE c_acctbal > (SELECT avg(c_acctbal) FROM customer WHERE c_acctbal > 0)
        |  AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)""".stripMargin,

    "tpch_q16ish" ->
      """SELECT p_brand, CAST(p_size AS BIGINT) AS p_size,
        |  count(DISTINCT l_suppkey) AS supplier_cnt
        |FROM part JOIN lineitem ON p_partkey = l_partkey
        |WHERE p_brand <> 'Brand#45' AND p_size IN (1, 4, 7)
        |  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 500)
        |GROUP BY p_brand, p_size""".stripMargin
  )
}

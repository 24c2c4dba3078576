package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.{Engine, SqlDialect}
import graft.sources.Csv

/** Extended surface: subqueries (Catalyst decorrelation — the reference
  * does this in the binder via FlattenDependentJoins, duckdb-9.cpp:939),
  * IGNORE NULLS windows, sampling, CSV source/sink, and the SQL dialect
  * shim (QUALIFY / DISTINCT ON / LIMIT n% / USING SAMPLE).
  */
object Extended {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Engine.table(s, dir, name)

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    "sub_scalar_correlated" -> ((s, dir) => {
      Engine.registerAll(s, dir)
      s.sql(
        """SELECT o_orderstatus, count(*) AS n_above,
          |  round(sum(o_totalprice), 2) AS sum_above
          |FROM orders o
          |WHERE o_totalprice > 1.5 * (SELECT avg(o2.o_totalprice)
          |  FROM orders o2 WHERE o2.o_custkey = o.o_custkey)
          |GROUP BY o_orderstatus""".stripMargin)
    }),

    "sub_in_uncorrelated" -> ((s, dir) => {
      Engine.registerAll(s, dir)
      s.sql(
        """SELECT count(*) AS n, round(sum(c_acctbal), 2) AS bal
          |FROM customer
          |WHERE c_nationkey IN (SELECT n_nationkey FROM nation WHERE n_regionkey IN (0, 1))""".stripMargin)
    }),

    "sub_exists_correlated" -> ((s, dir) => {
      Engine.registerAll(s, dir)
      s.sql(
        """SELECT count(*) AS n FROM customer c
          |WHERE EXISTS (SELECT 1 FROM orders o
          |  WHERE o.o_custkey = c.c_custkey AND o.o_orderstatus = 'F'
          |    AND o.o_totalprice > c.c_acctbal * 10)""".stripMargin)
    }),

    "sub_all_rewrite" -> ((s, dir) => {
      // `> ALL (…)` has no Spark form — rewritten to > (SELECT max(…)),
      // equivalent for non-empty null-free subqueries
      Engine.registerAll(s, dir)
      s.sql(
        """SELECT count(*) AS n_top FROM supplier
          |WHERE s_acctbal > (SELECT max(a) FROM
          |  (SELECT avg(c_acctbal) AS a FROM customer GROUP BY c_nationkey))""".stripMargin)
    }),

    "win_ignore_nulls" -> ((s, dir) => {
      val v = when(col("o_orderkey") % 3 === 0, null).otherwise(col("o_totalprice"))
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_orderdate").asc, col("o_orderkey").asc)
      val wf = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
      t(s, dir, "orders").withColumn("v", v).select(
        col("o_custkey"), col("o_orderkey"),
        round(lag(col("v"), 1, null, ignoreNulls = true).over(w), 2).as("prev_nn"),
        round(lead(col("v"), 1, null, ignoreNulls = true).over(w), 2).as("next_nn"),
        round(first(col("v"), ignoreNulls = true).over(wf), 2).as("first_nn"),
        round(last(col("v"), ignoreNulls = true).over(wf), 2).as("last_nn"))
    }),

    "sample_fixed_count" -> ((s, dir) => {
      // USING SAMPLE n ROWS via the dialect shim — the sampled COUNT is
      // deterministic even though the rows are engine-local
      Engine.registerAll(s, dir)
      SqlDialect.sql(s,
        "SELECT count(*) AS n FROM (SELECT * FROM lineitem USING SAMPLE 500 ROWS)")
    }),

    "sample_bernoulli" -> ((s, dir) => {
      // seeded bernoulli sample. RNG streams are engine-local, so the
      // oracle checks the SAMPLING contract instead: each engine's own
      // 1% sample must have a row count within 4σ of n·p and a sample
      // mean within ±3 of the population mean (≈5σ for quantity)
      val li = t(s, dir, "lineitem")
      val pop = li.agg(count(lit(1)).as("n_total"), avg(col("l_quantity")).as("pop_avg"))
      val samp = li.sample(0.01, 42L)
        .agg(count(lit(1)).as("n_samp"), avg(col("l_quantity")).as("samp_avg"))
      samp.crossJoin(pop).select(
        col("n_total"),
        (abs(col("n_samp") - col("n_total") * 0.01)
          <= greatest(sqrt(col("n_total") * 0.01 * 0.99) * 4, lit(10.0))).as("n_ok"),
        (abs(col("samp_avg") - col("pop_avg")) <= 3.0).as("avg_ok"))
    }),

    "csv_roundtrip" -> ((s, dir) => {
      // COPY TO csv + read_csv back (sniffed schema), aggregate must match
      // the parquet source
      val sub = t(s, dir, "lineitem").filter(col("l_orderkey") <= 1000)
        .select(col("l_orderkey"), col("l_quantity"), col("l_extendedprice"))
      Csv.write(sub, "target/graft_csv/lineitem")
      Csv.read(s, "target/graft_csv/lineitem").agg(
        count(lit(1)).as("n"),
        round(sum(col("l_quantity")), 2).as("sum_qty"),
        round(sum(col("l_extendedprice")), 2).as("sum_price"))
    }),

    "dialect_qualify" -> ((s, dir) => {
      Engine.registerAll(s, dir)
      SqlDialect.sql(s,
        """SELECT c_custkey, CAST(c_nationkey AS BIGINT) AS nk, c_acctbal,
          |  CAST(row_number() OVER (PARTITION BY c_nationkey
          |    ORDER BY c_acctbal DESC, c_custkey) AS BIGINT) AS rn
          |FROM customer QUALIFY rn <= 3""".stripMargin)
    }),

    "dialect_distinct_on" -> ((s, dir) => {
      Engine.registerAll(s, dir)
      SqlDialect.sql(s,
        """SELECT DISTINCT ON (c_nationkey) CAST(c_nationkey AS BIGINT) AS nk,
          |  c_custkey, c_acctbal
          |FROM customer ORDER BY c_acctbal DESC, c_custkey""".stripMargin)
    }),

    "dialect_limit_percent" -> ((s, dir) => {
      Engine.registerAll(s, dir)
      SqlDialect.sql(s,
        "SELECT o_orderkey, round(o_totalprice, 2) AS price FROM orders ORDER BY o_orderkey LIMIT 10%")
    })
  )

  val oracle: Map[String, String] = Map(
    "sub_scalar_correlated" ->
      """SELECT o_orderstatus, count(*) AS n_above,
        |  round(sum(o_totalprice), 2) AS sum_above
        |FROM orders o
        |WHERE o_totalprice > 1.5 * (SELECT avg(o2.o_totalprice)
        |  FROM orders o2 WHERE o2.o_custkey = o.o_custkey)
        |GROUP BY o_orderstatus""".stripMargin,

    "sub_in_uncorrelated" ->
      """SELECT count(*) AS n, round(sum(c_acctbal), 2) AS bal
        |FROM customer
        |WHERE c_nationkey IN (SELECT n_nationkey FROM nation WHERE n_regionkey IN (0, 1))""".stripMargin,

    "sub_exists_correlated" ->
      """SELECT count(*) AS n FROM customer c
        |WHERE EXISTS (SELECT 1 FROM orders o
        |  WHERE o.o_custkey = c.c_custkey AND o.o_orderstatus = 'F'
        |    AND o.o_totalprice > c.c_acctbal * 10)""".stripMargin,

    "sub_all_rewrite" ->
      """SELECT count(*) AS n_top FROM supplier
        |WHERE s_acctbal > ALL
        |  (SELECT avg(c_acctbal) FROM customer GROUP BY c_nationkey)""".stripMargin,

    "win_ignore_nulls" ->
      """SELECT o_custkey, o_orderkey,
        |  round(lag(v, 1 IGNORE NULLS) OVER w, 2) AS prev_nn,
        |  round(lead(v, 1 IGNORE NULLS) OVER w, 2) AS next_nn,
        |  round(first_value(v IGNORE NULLS) OVER wf, 2) AS first_nn,
        |  round(last_value(v IGNORE NULLS) OVER wf, 2) AS last_nn
        |FROM (SELECT *, CASE WHEN o_orderkey % 3 = 0 THEN NULL
        |        ELSE o_totalprice END AS v FROM orders)
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey),
        |  wf AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)""".stripMargin,

    "sample_fixed_count" ->
      "SELECT count(*) AS n FROM (SELECT * FROM lineitem USING SAMPLE 500 ROWS)",

    "sample_bernoulli" ->
      """WITH pop AS (SELECT count(*) AS n_total, avg(l_quantity) AS pop_avg
        |             FROM lineitem),
        |s AS (SELECT count(*) AS n_samp, avg(l_quantity) AS samp_avg
        |      FROM (SELECT * FROM lineitem USING SAMPLE 1% (bernoulli, 42)))
        |SELECT n_total,
        |  abs(n_samp - n_total * 0.01)
        |    <= greatest(sqrt(n_total * 0.01 * 0.99) * 4, 10.0) AS n_ok,
        |  abs(samp_avg - pop_avg) <= 3.0 AS avg_ok
        |FROM s, pop""".stripMargin,

    "csv_roundtrip" ->
      """SELECT count(*) AS n, round(sum(l_quantity), 2) AS sum_qty,
        |  round(sum(l_extendedprice), 2) AS sum_price
        |FROM lineitem WHERE l_orderkey <= 1000""".stripMargin,

    "dialect_qualify" ->
      """SELECT c_custkey, CAST(c_nationkey AS BIGINT) AS nk, c_acctbal,
        |  CAST(row_number() OVER (PARTITION BY c_nationkey
        |    ORDER BY c_acctbal DESC, c_custkey) AS BIGINT) AS rn
        |FROM customer QUALIFY rn <= 3""".stripMargin,

    "dialect_distinct_on" ->
      """SELECT DISTINCT ON (c_nationkey) CAST(c_nationkey AS BIGINT) AS nk,
        |  c_custkey, c_acctbal
        |FROM customer ORDER BY c_acctbal DESC, c_custkey""".stripMargin,

    "dialect_limit_percent" ->
      "SELECT o_orderkey, round(o_totalprice, 2) AS price FROM orders ORDER BY o_orderkey LIMIT 10%"
  )
}

package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.{Engine, SqlDialect}

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
    }),

    "catalog_on_conflict" -> ((s, dir) => {
      // INSERT OR REPLACE + ON CONFLICT DO NOTHING / DO UPDATE SET with
      // excluded.* (reference conflict binding, duckdb-4.cpp:9996-10015)
      // — identical statement text runs natively on the oracle
      Engine.registerAll(s, dir)
      onConflictStatements.foreach(stmt => SqlDialect.sql(s, stmt))
      SqlDialect.sql(s, onConflictSelect)
    }),

    "sample_system" -> ((s, dir) => {
      // USING SAMPLE p% (system, seed): block-granular sampling
      // (reference SampleMethod::SYSTEM_SAMPLE, duckdb.hpp:20017). RNG
      // streams are engine-local, so the oracle checks the contract:
      // non-empty proper subset, sampled fraction within a loose
      // block-variance bound, and seeded determinism (same seed twice =
      // same count). Each engine verifies its OWN sample.
      Engine.registerAll(s, dir)
      SqlDialect.sql(s, sampleSystemSql)
    }),

    "catalog_explain_analyze" -> ((s, dir) => {
      // EXPLAIN ANALYZE (reference QueryProfiler, duckdb-7.cpp:5536):
      // profiler output itself is engine-specific, so the oracle checks
      // the plan-independent invariant — the topmost operator that
      // reports an output-row metric emits exactly the query's result
      // cardinality, whatever physical plan either engine picked.
      Engine.registerAll(s, dir)
      val prof = SqlDialect.sql(s,
        "EXPLAIN ANALYZE SELECT o_orderpriority, count(*) AS n " +
          "FROM orders GROUP BY o_orderpriority")
      prof.filter(col("output_rows").isNotNull)
        .orderBy(col("operator_id"))
        .limit(1)
        .select(col("output_rows").cast("long").as("top_rows"))
    }),

    "catalog_functions" -> ((s, dir) => {
      // duckdb_functions() catalog fn (duckdb-6.cpp:14150-14176): the
      // probe list is a fixed set of DuckDB function names graft claims —
      // a name missing from EITHER engine's registry drops a row and
      // fails the hash compare, so this catches registry drift both ways
      Engine.registerAll(s, dir)
      SqlDialect.sql(s, functionsSql)
    })
  )

  private[queries] val onConflictStatements = Seq(
    "DROP TABLE IF EXISTS conf_t",
    "CREATE TABLE conf_t (id INTEGER PRIMARY KEY, name VARCHAR, qty INTEGER)",
    "INSERT INTO conf_t VALUES (1, 'a', 10), (2, 'b', 20), (3, 'c', 30)",
    // key 2 exists: replaced; key 4 fresh: inserted
    "INSERT OR REPLACE INTO conf_t VALUES (2, 'B2', 200), (4, 'd', 40)",
    // key 1 exists: skipped; key 5 fresh: inserted
    "INSERT INTO conf_t VALUES (1, 'dup', 999), (5, 'e', 50) ON CONFLICT DO NOTHING",
    // key 3 exists: assignments applied (excluded.* = incoming row);
    // key 6 fresh: inserted
    "INSERT INTO conf_t VALUES (3, 'c3', 5), (6, 'f', 60) " +
      "ON CONFLICT (id) DO UPDATE SET qty = qty + excluded.qty, name = excluded.name")

  private[queries] val onConflictSelect =
    "SELECT id, name, qty FROM conf_t ORDER BY id"

  private[queries] val sampleSystemSql =
    """WITH pop AS (SELECT count(*) AS n_total FROM lineitem),
      |s1 AS (SELECT count(*) AS n1
      |       FROM (SELECT * FROM lineitem USING SAMPLE 50% (system, 7))),
      |s2 AS (SELECT count(*) AS n2
      |       FROM (SELECT * FROM lineitem USING SAMPLE 50% (system, 7)))
      |SELECT CAST(n_total AS BIGINT) AS n_total,
      |  (n1 > 0 AND n1 < n_total) AS nonempty_proper,
      |  (abs(n1 / CAST(n_total AS DOUBLE) - 0.5) <= 0.45) AS frac_ok,
      |  (n1 = n2) AS repeat_ok
      |FROM pop, s1, s2""".stripMargin

  private[queries] val functionsSql =
    """SELECT DISTINCT function_name FROM duckdb_functions()
      |WHERE function_name IN (
      |  'abs','acos','asin','atan','atan2','bar','bit_count','bit_position',
      |  'cbrt','ceil','chr','concat','contains','corr','cos','date_part',
      |  'date_trunc','dayname','degrees','exp','factorial','floor','gamma',
      |  'get_bit','greatest','hamming','instr','jaccard','jaro_similarity',
      |  'jaro_winkler_similarity','kurtosis','least','left_grapheme',
      |  'length_grapheme','levenshtein','lgamma','ln','log10','log2','lower',
      |  'lpad','ltrim','make_date','make_timestamp','md5','median','mismatches',
      |  'mode','monthname','nextafter','nfc_normalize','pi','position','printf',
      |  'radians','regexp_extract','regexp_replace','regr_slope','repeat',
      |  'reverse','round','rpad','rtrim','set_bit','sign','signbit','sin',
      |  'skewness','split_part','sqrt','stddev','strip_accents',
      |  'substring_grapheme','tan','translate','trim','typeof','upper')
      |ORDER BY function_name""".stripMargin

  val oracle: Map[String, String] = Map(

    "join_range_autoplan" ->
      """SELECT s_suppkey, count(*) AS n_in_band
        |FROM supplier JOIN customer
        |  ON c_acctbal > s_acctbal - 10.0 AND c_acctbal <= s_acctbal
        |GROUP BY s_suppkey""".stripMargin,

    "catalog_on_conflict" ->
      (onConflictStatements :+ onConflictSelect).mkString(";\n"),

    "sample_system" -> sampleSystemSql,

    "catalog_explain_analyze" ->
      """SELECT CAST(count(*) AS BIGINT) AS top_rows
        |FROM (SELECT o_orderpriority FROM orders GROUP BY o_orderpriority)""".stripMargin,

    "catalog_functions" -> functionsSql
  )
}

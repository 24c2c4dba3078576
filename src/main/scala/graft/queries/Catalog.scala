package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.{Engine, SqlDialect}
import graft.sources.Csv

/** Catalog, dialect, and source-format surface (SURVEY §2.1/§2.11):
  * scans (glob/range/repeat/values), CSV options, Arrow IPC, COPY,
  * EXPORT, DML + ON CONFLICT + RETURNING scripts, introspection
  * (tables/columns/functions/table_info/SUMMARIZE/EXPLAIN ANALYZE),
  * macros, prepared statements, and the dialect rewrites (QUALIFY,
  * DISTINCT ON, GROUP BY ALL, PIVOT/UNPIVOT, star modifiers, views,
  * WITH RECURSIVE). Statement scripts execute the same text on both
  * engines via the dialect shim.
  */
object Catalog {

  /** r17 type-surface oracle row: the same `SELECT … FROM
    * test_all_types()` text runs on both engines and hash-compares the
    * SHARED-representable projections of every v0.7 column
    * (duckdb-6.cpp:13661): raw ints/floats/decimals/strings, unsigned
    * types through explicit widening casts, temporals through
    * zone-free epoch arithmetic (raw ±290k-year extremes overflow the
    * driver's ns/us frame canon), arrays/structs/maps through element
    * probes (the driver's canon rejects nested cells), interval/enum/
    * uuid/bit through VARCHAR casts. Documented carve-outs (SURVEY
    * §1.2 encodings, checked by TestTablesSpec instead): hugeint
    * (±(2^127−1) exceeds DECIMAL(38,0)), time/time_tz (LongType
    * encodings), raw blob bytes (engine-specific binary repr at the
    * canon layer — octet_length pins the payload size). */
  private val TestAllTypesSql: String =
    """SELECT
      |  CAST("bool" AS INTEGER) AS bool_i,
      |  tinyint, smallint, "int", bigint,
      |  CAST(utinyint AS SMALLINT) AS utinyint_w,
      |  CAST(usmallint AS INTEGER) AS usmallint_w,
      |  CAST(uint AS BIGINT) AS uint_w,
      |  CAST(CAST(ubigint AS DECIMAL(20,0)) AS VARCHAR) AS ubigint_w,
      |  CAST("date" - DATE '1970-01-01' AS BIGINT) AS date_days,
      |  CAST(date_part('epoch', "timestamp") AS DOUBLE) AS ts_epoch,
      |  CAST(date_part('microseconds', "timestamp") AS BIGINT) AS ts_micros,
      |  CAST(date_part('epoch', CAST(timestamp_s AS TIMESTAMP)) AS DOUBLE) AS ts_s_epoch,
      |  CAST(date_part('epoch', CAST(timestamp_ms AS TIMESTAMP)) AS DOUBLE) AS ts_ms_epoch,
      |  CAST(date_part('epoch', CAST(timestamp_ns AS TIMESTAMP)) AS DOUBLE) AS ts_ns_epoch,
      |  CAST(date_part('epoch', timestamp_tz) AS DOUBLE) AS ts_tz_epoch,
      |  "float", "double",
      |  CAST(dec_4_1 AS VARCHAR) AS dec_4_1_s,
      |  CAST(dec_9_4 AS VARCHAR) AS dec_9_4_s,
      |  CAST(dec_18_6 AS VARCHAR) AS dec_18_6_s,
      |  CAST(dec38_10 AS VARCHAR) AS dec38_10_s,
      |  CAST(uuid AS VARCHAR) AS uuid_s,
      |  CAST("interval" AS VARCHAR) AS interval_s,
      |  "varchar",
      |  CAST(octet_length(blob) AS BIGINT) AS blob_len,
      |  CAST(bit AS VARCHAR) AS bit_s,
      |  CAST(small_enum AS VARCHAR) AS small_enum_s,
      |  CAST(medium_enum AS VARCHAR) AS medium_enum_s,
      |  CAST(large_enum AS VARCHAR) AS large_enum_s,
      |  CAST(len(int_array) AS BIGINT) AS ia_len,
      |  int_array[1] AS ia1, int_array[5] AS ia5,
      |  double_array[1] AS da1,
      |  CAST(double_array[2] <> double_array[2] AS INTEGER) AS da2_nan,
      |  double_array[6] AS da6,
      |  CAST(len(varchar_array) AS BIGINT) AS va_len,
      |  varchar_array[1] AS va1, varchar_array[4] AS va4,
      |  CAST(len(nested_int_array) AS BIGINT) AS nia_len,
      |  nested_int_array[2][1] AS nia21,
      |  CAST(date_array[5] - DATE '1970-01-01' AS BIGINT) AS dta5,
      |  CAST(date_part('epoch', timestamp_array[5]) AS DOUBLE) AS tsa5_epoch,
      |  "struct".a AS struct_a, "struct".b AS struct_b,
      |  struct_of_arrays.a[2] AS soa_a2, struct_of_arrays.b[2] AS soa_b2,
      |  CAST(len(array_of_structs) AS BIGINT) AS aos_len,
      |  array_of_structs[2].a AS aos2a,
      |  CAST(cardinality("map") AS BIGINT) AS map_n,
      |  map_keys("map")[2] AS map_k2, map_values("map")[1] AS map_v1
      |FROM test_all_types()""".stripMargin

  /** r17: the sibling test-vector generator, INTEGER instance — v0.7's
    * FLAT/CONSTANT/DICTIONARY/SEQUENCE row blocks (duckdb-6.cpp:14135)
    * are value-identical on the oracle engine. */
  private val TestVectorTypesSql: String =
    """SELECT CAST(test_vector AS BIGINT) AS v, count(*) AS n
      |FROM test_vector_types(NULL::INTEGER, true)
      |GROUP BY v""".stripMargin

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Engine.table(s, dir, name)

  // Shared CREATE VIEW statement sequence (identical text both engines)
  private[queries] val dialectViewStatements = Seq(
    """CREATE OR REPLACE VIEW nation_per_region AS
      |SELECT n_regionkey, count(*) AS n, min(n_name) AS first_name
      |FROM nation GROUP BY n_regionkey""".stripMargin)


  private[queries] val dialectViewSelect =
    """SELECT CAST(n_regionkey AS BIGINT) AS rk, CAST(n AS BIGINT) AS n, first_name
      |FROM nation_per_region ORDER BY rk""".stripMargin

  // Shared WITH RECURSIVE text — native recursive CTE resolution on both
  // engines (Spark 4 UnionLoop; reference RecursiveCTENode duckdb-9.cpp)


  // Shared WITH RECURSIVE text — native recursive CTE resolution on both
  // engines (Spark 4 UnionLoop; reference RecursiveCTENode duckdb-9.cpp)
  private[queries] val withRecursiveSql =
    """WITH RECURSIVE seq(k) AS (
      |  SELECT CAST(0 AS BIGINT) UNION ALL SELECT k + 1 FROM seq WHERE k < 24
      |)
      |SELECT CAST(count(*) AS BIGINT) AS n, CAST(sum(k) AS BIGINT) AS sum_k,
      |  CAST(sum(n_regionkey) AS BIGINT) AS sum_region
      |FROM seq JOIN nation ON n_nationkey = k""".stripMargin

  // Shared DML statement sequence — the Spark side routes each through
  // SqlDialect; the oracle executes the identical text natively.


  // Shared DML statement sequence — the Spark side routes each through
  // SqlDialect; the oracle executes the identical text natively.
  private[queries] val sqlDmlStatements = Seq(
    """CREATE OR REPLACE TABLE sdml AS
      |SELECT n_nationkey AS k, n_name AS name, CAST(0 AS BIGINT) AS flag
      |FROM nation""".stripMargin,
    "INSERT INTO sdml VALUES (100, 'X_NATION', CAST(5 AS BIGINT))",
    "UPDATE sdml SET flag = flag + 9 WHERE k % 5 = 0",
    "DELETE FROM sdml WHERE k BETWEEN 10 AND 14",
    "ALTER TABLE sdml RENAME COLUMN flag TO mark")


  private[queries] val sqlDmlSelect =
    "SELECT CAST(k AS BIGINT) AS k, name, CAST(mark AS BIGINT) AS mark FROM sdml"


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

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

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

    "dialect_macro" -> ((s, dir) => {
      // CREATE MACRO: bind-time inlining (reference ScalarMacroFunction
      // duckdb-internal.hpp:9920) — nested macro reference + named
      // default parameter, exercised through an aggregate
      Engine.registerAll(s, dir)
      SqlDialect.sql(s, "CREATE OR REPLACE MACRO disc_price(p, d) AS p * (1 - d)")
      SqlDialect.sql(s,
        "CREATE OR REPLACE MACRO taxed(p, d, t := 0.05) AS disc_price(p, d) * (1 + t)")
      SqlDialect.sql(s,
        """SELECT l_returnflag,
          |  round(sum(disc_price(l_extendedprice, l_discount)), 2) AS sum_disc,
          |  round(sum(taxed(l_extendedprice, l_discount)), 2) AS sum_taxed,
          |  round(avg(taxed(l_extendedprice, l_discount, t := 0.10)), 2) AS avg_taxed10
          |FROM lineitem GROUP BY l_returnflag""".stripMargin)
    }),

    "dialect_group_by_all" -> ((s, dir) => {
      // GROUP BY ALL (reference duckdb-8.cpp:7745) — native in both
      // engines; groups by every non-aggregated select item
      Engine.registerAll(s, dir)
      s.sql(
        """SELECT o_orderstatus, o_orderpriority, count(*) AS n,
          |  round(sum(o_totalprice), 2) AS total
          |FROM orders GROUP BY ALL""".stripMargin)
    }),

    "scan_glob" -> ((s, dir) => {
      // glob table function (reference duckdb-6.cpp:9491) — file listing
      // compared against DuckDB's native glob() (Hadoop paths carry a
      // file: scheme; stripped for the comparison)
      graft.functions.TypeHelpers.glob(s, s"$dir/*.parquet")
        .select(regexp_replace(col("file"), "^file:", "").as("file"))
    }),

    "catalog_export" -> ((s, dir) => {
      // EXPORT DATABASE → IMPORT DATABASE round-trip (reference
      // duckdb-4.cpp:9722): re-imported tables must aggregate identically
      // to the source (oracle computes from the source directly). Runs in
      // a child session so EXPORT sees only this query's tables, not the
      // whole shared-session catalog.
      val ns = s.newSession()
      Engine.createTable(ns, "exp_nation",
        t(ns, dir, "nation").select(col("n_nationkey"), col("n_name")))
      Engine.createTable(ns, "exp_region",
        t(ns, dir, "region").select(col("r_regionkey"), col("r_name")))
      Engine.exportDatabase(ns, "/root/repo/target/exp_db")
      Engine.createTable(ns, "exp_nation", ns.range(0).toDF())  // clobber
      Engine.importDatabase(ns, "/root/repo/target/exp_db")
      ns.table("exp_nation").agg(
        count(lit(1)).as("n_nation"),
        sum(col("n_nationkey")).cast("long").as("key_sum"))
        .crossJoin(ns.table("exp_region").agg(count(lit(1)).as("n_region")))
    }),

    "catalog_defaults" -> ((s, dir) => {
      // column DEFAULTs + column-list INSERT + DEFAULT VALUES + UPDATE
      // SET DEFAULT (r16 tranche 5; reference SetToDefault /
      // CreateTableInfo defaults, duckdb-9.cpp) — same script text on
      // both engines, final table state compared
      Engine.registerAll(s, dir)
      SqlDialect.sql(s, DefaultsScript)
    }),

    "catalog_dml" -> ((s, dir) => {
      // INSERT/UPDATE/DELETE over the temp-view catalog (reference
      // PhysicalInsert/Delete/Update duckdb-4.cpp:9996-10015) — the
      // oracle replays the identical DML natively and compares the
      // final table state
      Engine.registerAll(s, dir)
      val base = t(s, dir, "nation")
        .select(col("n_nationkey"), col("n_name"), col("n_regionkey"))
      Engine.createTable(s, "dml_demo", base)
      Engine.insertInto(s, "dml_demo",
        base.filter(col("n_nationkey") === 0)
          .withColumn("n_nationkey", col("n_nationkey") + 100)
          .withColumn("n_name", lit("NEWLAND")))
      Engine.updateWhere(s, "dml_demo", col("n_regionkey") === 0,
        Map("n_name" -> concat(col("n_name"), lit("_X"))))
      Engine.deleteWhere(s, "dml_demo", col("n_nationkey") % 7 === 3)
      s.table("dml_demo").agg(
        count(lit(1)).as("n"),
        sum(col("n_nationkey")).cast("long").as("key_sum"),
        count(when(col("n_name").endsWith("_X"), 1)).as("n_upd"))
    }),

    "catalog_table_info" -> ((s, dir) => {
      // pragma_table_info analog (reference duckdb-6.cpp:14150): schema
      // reflection reported in the reference's type names
      Engine.registerAll(s, dir)
      val duckType = Map("bigint" -> "BIGINT", "int" -> "INTEGER",
        "string" -> "VARCHAR", "double" -> "DOUBLE",
        "timestamp_ntz" -> "TIMESTAMP", "timestamp" -> "TIMESTAMP",
        "date" -> "DATE", "boolean" -> "BOOLEAN")
      import s.implicits._
      Engine.tableInfo(s, "nation").collect()
        .map(r => (r.getInt(0), r.getString(1),
          duckType.getOrElse(r.getString(2), r.getString(2).toUpperCase)))
        .toSeq.toDF("cid", "name", "type")
    }),

    "catalog_sql_dml" -> ((s, dir) => {
      // the full SQL-level DML statement surface (INSERT positional /
      // UPDATE assignments / DELETE / ALTER TABLE RENAME COLUMN) —
      // identical statement text runs natively on the oracle
      Engine.registerAll(s, dir)
      sqlDmlStatements.foreach(stmt => SqlDialect.sql(s, stmt))
      SqlDialect.sql(s, sqlDmlSelect)
    }),

    "dialect_create_view" -> ((s, dir) => {
      // CREATE OR REPLACE VIEW (reference CreateViewInfo, duckdb-9.cpp)
      // — plan-level view, re-evaluated per query (vs the CTAS snapshot)
      Engine.registerAll(s, dir)
      dialectViewStatements.foreach(stmt => SqlDialect.sql(s, stmt))
      SqlDialect.sql(s, dialectViewSelect)
    }),

    "dialect_with_recursive" -> ((s, dir) => {
      // SQL-level WITH RECURSIVE — native in Spark 4 (recursive CTE
      // resolution); identical statement text runs on both engines
      Engine.registerAll(s, dir)
      SqlDialect.sql(s, withRecursiveSql)
    }),

    "dialect_pivot" -> ((s, dir) => {
      // PIVOT (DuckDB dialect statement → Spark's native groupBy().pivot;
      // explicit value list keeps the plan single-pass: no distinct-scan)
      t(s, dir, "orders")
        .groupBy(col("o_orderpriority"))
        .pivot("o_orderstatus", Seq("F", "O", "P"))
        .agg(sum(col("o_totalprice")))
        .select(col("o_orderpriority"),
          round(col("F"), 2).as("f"), round(col("O"), 2).as("o"),
          round(col("P"), 2).as("p"))
        .orderBy(col("o_orderpriority"))
    }),

    "dialect_unpivot" -> ((s, dir) => {
      // UNPIVOT round-trips the pivoted frame back to long form
      val priorities = Seq("1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW")
      val wide = t(s, dir, "orders")
        .groupBy(col("o_orderstatus"))
        .pivot("o_orderpriority", priorities)
        .agg(sum(col("o_totalprice")))
      wide.unpivot(
          Array(col("o_orderstatus")), priorities.map(col).toArray, "k", "v")
        .select(col("o_orderstatus"), col("k"), round(col("v"), 2).as("v"))
        .orderBy(col("o_orderstatus"), col("k"))
    }),

    "arrow_roundtrip" -> ((s, dir) => {
      // Arrow IPC export + import (reference ArrowTableFunction surface,
      // duckdb-6.cpp:7612): write a slice of orders as a directory of
      // IPC files (one per partition, executor-side), read it back, and
      // aggregate — must match the parquet source. Exercises int64,
      // double, varchar, and timestamp columns through the IPC boundary.
      val sub = t(s, dir, "orders").filter(col("o_orderkey") <= 2000)
      graft.sources.ArrowIpc.write(sub, "target/graft_arrow/orders")
      graft.sources.ArrowIpc.read(s, "target/graft_arrow/orders")
        .groupBy(col("o_orderstatus"))
        .agg(
          count(lit(1)).as("n"),
          round(sum(col("o_totalprice")), 2).as("total"),
          min(col("o_orderdate")).as("first_dt"),
          max(col("o_orderpriority")).as("top_pri"))
        .orderBy(col("o_orderstatus"))
    }),

    "catalog_ctas" -> ((s, dir) => {
      // SQL-level CREATE TABLE AS (reference CreateTableAs binder,
      // duckdb-9.cpp) — snapshot semantics into the temp catalog
      Engine.registerAll(s, dir)
      SqlDialect.sql(s,
        """CREATE OR REPLACE TABLE ctas_demo AS
          |SELECT l_returnflag, round(sum(l_quantity), 2) AS qty
          |FROM lineitem GROUP BY l_returnflag""".stripMargin)
      SqlDialect.sql(s, "SELECT l_returnflag, qty FROM ctas_demo")
    }),

    "catalog_summarize" -> ((s, dir) => {
      // SUMMARIZE (reference duckdb-6.cpp:9493) — deterministic column
      // subset; approx_unique/quantiles are engine-specific sketches and
      // stay out of the oracle on both sides
      Engine.summarizeTable(s, t(s, dir, "orders"))
    }),

    "catalog_sequence" -> ((s, dir) => {
      // CREATE SEQUENCE / nextval (reference duckdb-6.cpp:2012) —
      // driver-side monotonic counter, the same single-node catalog
      // semantics as the reference; oracle replays a native sequence
      import s.implicits._
      // mirror the oracle script's DROP SEQUENCE IF EXISTS so the query
      // is re-runnable in one JVM (the bench runs every query 3×; since
      // a6ff741 a duplicate CREATE raises the reference's catalog error)
      graft.functions.TypeHelpers.dropSequence("r3seq", ifExists = true)
      graft.functions.TypeHelpers.createSequence("r3seq", start = 100, incrementBy = 7)
      (1L to 6L).map(i => (i, graft.functions.TypeHelpers.nextval("r3seq")))
        .toDF("i", "v")
    }),

    "sql_copy_parquet" -> ((s, dir) => {
      // SQL-level COPY … TO (FORMAT PARQUET) + read_parquet replacement
      // scan (reference PhysicalCopyToFile duckdb-4.cpp:4689): each
      // engine round-trips through its own parquet file; the aggregates
      // must agree because the source rows do
      Engine.registerAll(s, dir)
      SqlDialect.sql(s,
        """COPY (SELECT l_orderkey, l_quantity, l_extendedprice
          |      FROM lineitem WHERE l_orderkey <= 2000)
          |TO '/root/repo/target/copy_spark_li' (FORMAT PARQUET)""".stripMargin)
      SqlDialect.sql(s,
        """SELECT count(*) AS n, round(sum(l_quantity), 2) AS sum_qty,
          |  round(sum(l_extendedprice), 2) AS sum_price
          |FROM read_parquet('/root/repo/target/copy_spark_li')""".stripMargin)
    }),

    "dialect_prepare" -> ((s, dir) => {
      // PREPARE / EXECUTE (reference PrepareStatement duckdb-8.cpp:8942):
      // $n placeholders bound at execute time, run through the dialect
      Engine.registerAll(s, dir)
      SqlDialect.sql(s,
        """PREPARE qty_cut AS
          |SELECT l_returnflag, count(*) AS n,
          |  round(sum(l_extendedprice), 2) AS total
          |FROM lineitem WHERE l_quantity <= $1 AND l_partkey % $2 = 0
          |GROUP BY l_returnflag""".stripMargin)
      SqlDialect.sql(s, "EXECUTE qty_cut(10, 3)")
    }),

    "scan_repeat" -> ((s, dir) => {
      // repeat(val, n) table function (reference RepeatTableFunction,
      // duckdb-6.cpp:10510-10530)
      Engine.repeatTable(s, "ab", 4).agg(
        count(lit(1)).as("n"),
        count(when(col("value") === "ab", 1)).as("n_ab"))
    }),

    "csv_options" -> ((s, dir) => {
      // CSV option long tail (reference read_csv named options,
      // duckdb-6.cpp:10273-10299): skip + normalize_names,
      // union_by_name, hive_partitioning — DuckDB reads the
      // byte-identical files with its native options
      import java.nio.file.{Files, Paths}
      val base = Paths.get("/root/repo/target/csv_opts")
      Files.createDirectories(base.resolve("pt/key=1"))
      Files.createDirectories(base.resolve("pt/key=2"))
      val nation = t(s, dir, "nation")
        .select(col("n_nationkey").cast("long"), col("n_name"),
          col("n_regionkey").cast("long"))
        .orderBy(col("n_nationkey")).collect()
      def put(rel: String, lines: Seq[String]): Unit =
        Files.write(base.resolve(rel), (lines.mkString("\n") + "\n").getBytes)
      put("skip_demo.csv",
        Seq("# generated demo file", "# second preamble line", "N_NationKey|N_Name") ++
          nation.map(r => s"${r.getLong(0)}|${r.getString(1)}"))
      val (ua, ub) = nation.splitAt(13)
      put("u_a.csv", "n_nationkey,n_name" +: ua.map(r => s"${r.getLong(0)},${r.getString(1)}"))
      put("u_b.csv", "n_nationkey,n_regionkey" +: ub.map(r => s"${r.getLong(0)},${r.getLong(2)}"))
      val (p1, p2) = nation.partition(_.getLong(0) % 2 == 0)
      put("pt/key=1/data.csv", "n_nationkey" +: p1.map(r => s"${r.getLong(0)}"))
      put("pt/key=2/data.csv", "n_nationkey" +: p2.map(r => s"${r.getLong(0)}"))
      val skipped = Csv.read(s, "/root/repo/target/csv_opts/skip_demo.csv",
        Map("skip" -> "2", "delim" -> "|", "normalize_names" -> "true"))
        .agg(count(lit(1)).as("n_skip"), sum(col("n_nationkey")).as("key_sum"))
      val unioned = Csv.read(s, "/root/repo/target/csv_opts/u_*.csv",
        Map("union_by_name" -> "true"))
        .agg(count(lit(1)).as("n_union"), count(col("n_name")).as("n_name_rows"),
          count(col("n_regionkey")).as("n_region_rows"))
      val hp = Csv.read(s, "/root/repo/target/csv_opts/pt",
        Map("hive_partitioning" -> "true"))
        .agg(count(lit(1)).as("n_hive"),
          sum(col("key").cast("long")).as("key_part_sum"))
      skipped.crossJoin(unioned).crossJoin(hp)
    }),

    "scan_test_all_types" -> ((s, _) => {
      // type-surface oracle (TestAllTypesSql doc): same text both engines
      SqlDialect.sql(s, TestAllTypesSql)
    }),

    "scan_test_vector_types" -> ((s, _) => {
      SqlDialect.sql(s, TestVectorTypesSql)
    }),

    "scan_json" -> ((s, dir) => {
      // NDJSON replacement scan (read_json_auto — the reference's JSON
      // extension scan; Spark's json reader is NDJSON-native): both
      // engines auto-detect schema from the same byte-identical file
      import java.nio.file.{Files, Paths}
      val base = Paths.get("/root/repo/target/json_scan")
      Files.createDirectories(base)
      val nation = t(s, dir, "nation")
        .select(col("n_nationkey").cast("long"), col("n_name"),
          col("n_regionkey").cast("long"))
        .orderBy(col("n_nationkey")).collect()
      val lines = nation.map(r =>
        s"""{"k": ${r.getLong(0)}, "name": "${r.getString(1)}", "rk": ${r.getLong(2)}}""")
      Files.write(base.resolve("nation.ndjson"),
        (lines.mkString("\n") + "\n").getBytes)
      SqlDialect.sql(s,
        """SELECT CAST(count(*) AS BIGINT) AS n, CAST(sum(k) AS BIGINT) AS key_sum,
          |  min(name) AS lo_name, CAST(sum(rk) AS BIGINT) AS rk_sum,
          |  CAST(count(*) FILTER (WHERE rk = 0) AS BIGINT) AS n_r0
          |FROM read_json_auto('/root/repo/target/json_scan/nation.ndjson')""".stripMargin)
    }),

    "dialect_collate" -> ((s, dir) => {
      // SQL-level COLLATE NOCASE (reference collation registry,
      // duckdb-5.cpp:5156): the shim folds the COMPARISON — both
      // operands of `a = b COLLATE NOCASE`, the sort key of an ORDER
      // BY item — while projected values keep their case. Same
      // statement text runs natively on DuckDB.
      graft.functions.DuckFunctions.register(s)
      SqlDialect.sql(s,
        """SELECT s,
          |  CAST(row_number() OVER (ORDER BY s COLLATE NOCASE, s) AS BIGINT) AS rk,
          |  (s = 'BANANA' COLLATE NOCASE) AS is_banana,
          |  (s < 'b' COLLATE NOCASE) AS lt_b
          |FROM (VALUES ('apple'), ('Banana'), ('cherry'), ('APRICOT'), ('banana')) AS v(s)""".stripMargin)
    }),

    "csv_sniffer" -> ((s, dir) => {
      // dialect sniffer (reference read_csv_auto / BufferedCSVReader,
      // duckdb-4.cpp:1949-3700): four tricky fixtures read with ZERO
      // dialect options on BOTH engines — semicolon-delimited with
      // quoted fields containing the delimiter and doubled quotes,
      // pipe-delimited, tab-delimited, and gzip-compressed comma — so
      // each engine must independently detect delim/quote/header
      import java.nio.file.{Files, Paths}
      val base = Paths.get("/root/repo/target/csv_sniff")
      Files.createDirectories(base)
      val nation = t(s, dir, "nation")
        .select(col("n_nationkey").cast("long"), col("n_name"),
          col("n_regionkey").cast("long"))
        .orderBy(col("n_nationkey")).collect()
      def put(rel: String, lines: Seq[String]): Unit =
        Files.write(base.resolve(rel), (lines.mkString("\n") + "\n").getBytes)
      // values carry the delimiter AND a doubled quote inside a quoted
      // field — the cases a delimiter-count sniffer gets wrong if it
      // ignores quoting
      put("semi.csv", "nkey;nname;nregion" +: nation.map(r =>
        // renders as: 0;"NAME;""x""";0 — quoted field with embedded
        // delimiter and a doubled-quote escape
        r.getLong(0) + ";\"" + r.getString(1) + ";\"\"x\"\"\";" + r.getLong(2)))
      put("pipe.csv", "nkey|nname|nregion" +: nation.map(r =>
        s"${r.getLong(0)}|${r.getString(1)}|${r.getLong(2)}"))
      put("tabs.csv", "nkey\tnname\tnregion" +: nation.map(r =>
        s"${r.getLong(0)}\t${r.getString(1)}\t${r.getLong(2)}"))
      val gz = new java.util.zip.GZIPOutputStream(
        Files.newOutputStream(base.resolve("gzip.csv.gz")))
      gz.write(("nkey,nname,nregion\n" + nation.map(r =>
        s"${r.getLong(0)},${r.getString(1)},${r.getLong(2)}").mkString("\n") + "\n").getBytes)
      gz.close()
      def agg(rel: String, pfx: String) =
        Csv.read(s, s"/root/repo/target/csv_sniff/$rel")
          .agg(count(lit(1)).as(s"${pfx}_n"),
            sum(col("nkey")).cast("long").as(s"${pfx}_keys"),
            sum(length(col("nname"))).cast("long").as(s"${pfx}_chars"))
      agg("semi.csv", "semi").crossJoin(agg("pipe.csv", "pipe"))
        .crossJoin(agg("tabs.csv", "tabs")).crossJoin(agg("gzip.csv.gz", "gz"))
    }),

    "dialect_table_macro" -> ((s, dir) => {
      // CREATE MACRO … AS TABLE (reference TableMacroFunction
      // duckdb-internal.hpp:9955) — call site in FROM with an alias
      Engine.registerAll(s, dir)
      SqlDialect.sql(s,
        """CREATE OR REPLACE MACRO top_parts(n) AS TABLE
          |SELECT p_partkey, p_type, p_retailprice FROM part
          |ORDER BY p_partkey LIMIT n""".stripMargin)
      SqlDialect.sql(s,
        """SELECT t.p_type, count(*) AS n, round(sum(t.p_retailprice), 2) AS price_sum
          |FROM top_parts(50) t GROUP BY t.p_type""".stripMargin)
    }),

    "catalog_on_conflict" -> ((s, dir) => {
      // INSERT OR REPLACE + ON CONFLICT DO NOTHING / DO UPDATE SET with
      // excluded.* (reference conflict binding, duckdb-4.cpp:9996-10015)
      // — identical statement text runs natively on the oracle
      Engine.registerAll(s, dir)
      onConflictStatements.foreach(stmt => SqlDialect.sql(s, stmt))
      SqlDialect.sql(s, onConflictSelect)
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
    }),

    "catalog_schemas_views" -> ((s, dir) => {
      // r12 introspection long tail (ref duckdb-6.cpp:14150-14176):
      // duckdb_schemas() (Spark's default database surfaces as the
      // reference's `main`), duckdb_views() (both engines' tables are
      // views over the parquet files — graft temp views vs the oracle
      // harness's CREATE VIEW), duckdb_settings() (the reference's
      // resource-setting NAMES resolve — values are machine state in
      // both engines, so only names probe), and pragma_database_size()
      // (a well-formed one-row accounting table; sizes are engine
      // storage state, so the contract is shape + positivity).
      // r13: plus the TABLE-vs-VIEW provenance split — a CTAS snapshot
      // must surface in duckdb_tables() and NOT in duckdb_views(), a
      // true view the other way (graft backs both with temp views; the
      // provenance registry restores the reference catalog's split)
      Engine.registerAll(s, dir)
      provenanceSetup.foreach(SqlDialect.sql(s, _))
      SqlDialect.sql(s, introspectionSql)
    })
  )

  private[queries] val provenanceSetup = Seq(
    """CREATE OR REPLACE TABLE prov_snap AS
      |SELECT CAST(n_nationkey AS BIGINT) AS k FROM nation""".stripMargin,
    """CREATE OR REPLACE VIEW prov_view AS
      |SELECT CAST(n_regionkey AS BIGINT) AS r FROM nation""".stripMargin)

  private[queries] val introspectionSql =
    """SELECT
      |  (SELECT count(DISTINCT schema_name) FROM duckdb_schemas()
      |   WHERE schema_name = 'main') AS has_main_schema,
      |  (SELECT count(DISTINCT view_name) FROM duckdb_views()
      |   WHERE view_name IN ('nation', 'region', 'customer', 'orders',
      |                       'lineitem')) AS n_table_views,
      |  (SELECT count(DISTINCT name) FROM duckdb_settings()
      |   WHERE name IN ('threads', 'memory_limit')) AS n_setting_names,
      |  (SELECT CAST(count(*) AS BIGINT) FROM pragma_database_size())
      |    AS db_size_rows,
      |  (SELECT CAST(count(*) AS BIGINT) FROM duckdb_views()
      |   WHERE view_name = 'prov_snap') AS ctas_in_views,
      |  (SELECT CAST(count(*) AS BIGINT) FROM duckdb_views()
      |   WHERE view_name = 'prov_view') AS view_in_views,
      |  (SELECT CAST(count(*) AS BIGINT) FROM duckdb_tables()
      |   WHERE table_name = 'prov_snap') AS ctas_in_tables,
      |  (SELECT CAST(count(*) AS BIGINT) FROM duckdb_tables()
      |   WHERE table_name = 'prov_view') AS view_in_tables,
      |  (SELECT CAST(count(*) AS BIGINT) FROM duckdb_tables()
      |   WHERE table_name IN ('nation', 'region', 'customer'))
      |    AS base_views_in_tables""".stripMargin

  /** r16 defaults script (probed case-by-case in BATTERY5_r16.json). */
  private val DefaultsScript: String =
    """DROP TABLE IF EXISTS rdef;
      |CREATE TABLE rdef(a INT DEFAULT 7, b INT, c VARCHAR DEFAULT 'x');
      |INSERT INTO rdef(b) VALUES (1);
      |INSERT INTO rdef VALUES (DEFAULT, 2, 'y');
      |INSERT INTO rdef(b, a) VALUES (3, 30);
      |INSERT INTO rdef(a, b) VALUES (99, 4);
      |INSERT INTO rdef(b) SELECT 5;
      |INSERT INTO rdef DEFAULT VALUES;
      |UPDATE rdef SET a = DEFAULT, c = 'z' WHERE b = 4;
      |SELECT a, b, c FROM rdef ORDER BY b NULLS LAST""".stripMargin

  val oracle: Map[String, String] = Map(
    "catalog_defaults" -> DefaultsScript,

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
      "SELECT o_orderkey, round(o_totalprice, 2) AS price FROM orders ORDER BY o_orderkey LIMIT 10%",

    "dialect_exclude_replace" ->
      """SELECT * EXCLUDE (o_orderpriority)
        |         REPLACE (round(o_totalprice / 1000, 2) AS o_totalprice)
        |FROM orders WHERE o_orderkey <= 100""".stripMargin,

    "dialect_macro" ->
      """CREATE OR REPLACE MACRO disc_price(p, d) AS p * (1 - d);
        |CREATE OR REPLACE MACRO taxed(p, d, t := 0.05) AS disc_price(p, d) * (1 + t);
        |SELECT l_returnflag,
        |  round(sum(disc_price(l_extendedprice, l_discount)), 2) AS sum_disc,
        |  round(sum(taxed(l_extendedprice, l_discount)), 2) AS sum_taxed,
        |  round(avg(taxed(l_extendedprice, l_discount, t := 0.10)), 2) AS avg_taxed10
        |FROM lineitem GROUP BY l_returnflag""".stripMargin,

    "dialect_group_by_all" ->
      """SELECT o_orderstatus, o_orderpriority, count(*) AS n,
        |  round(sum(o_totalprice), 2) AS total
        |FROM orders GROUP BY ALL""".stripMargin,

    // the driver's correctness gate always runs at sf0.01 (TESTDATA.md)
    "scan_glob" ->
      "SELECT file FROM glob('/root/testdata/sf0.01/*.parquet')",

    "catalog_export" ->
      """SELECT * FROM
        |(SELECT count(*) AS n_nation, CAST(sum(n_nationkey) AS BIGINT) AS key_sum
        | FROM nation)
        |CROSS JOIN (SELECT count(*) AS n_region FROM region)""".stripMargin,

    "catalog_dml" ->
      """CREATE OR REPLACE TABLE dml_demo AS
        |  SELECT n_nationkey, n_name, n_regionkey FROM nation;
        |INSERT INTO dml_demo
        |  SELECT n_nationkey + 100, 'NEWLAND', n_regionkey
        |  FROM nation WHERE n_nationkey = 0;
        |UPDATE dml_demo SET n_name = n_name || '_X' WHERE n_regionkey = 0;
        |DELETE FROM dml_demo WHERE n_nationkey % 7 = 3;
        |SELECT count(*) AS n, CAST(sum(n_nationkey) AS BIGINT) AS key_sum,
        |  count(*) FILTER (WHERE n_name LIKE '%!_X' ESCAPE '!') AS n_upd
        |FROM dml_demo""".stripMargin,

    "catalog_table_info" ->
      """SELECT CAST(cid AS INTEGER) AS cid, name, CAST(type AS VARCHAR) AS type
        |FROM pragma_table_info('nation')""".stripMargin,

    "catalog_sql_dml" ->
      (sqlDmlStatements :+ sqlDmlSelect).mkString(";\n"),

    "dialect_create_view" ->
      (dialectViewStatements :+ dialectViewSelect).mkString(";\n"),

    "dialect_with_recursive" -> withRecursiveSql,

    "dialect_pivot" ->
      """SELECT o_orderpriority, round(F, 2) AS f, round(O, 2) AS o, round(P, 2) AS p
        |FROM (PIVOT orders ON o_orderstatus USING sum(o_totalprice) GROUP BY o_orderpriority)
        |ORDER BY o_orderpriority""".stripMargin,

    "dialect_unpivot" ->
      """SELECT o_orderstatus, k, round(v, 2) AS v
        |FROM (UNPIVOT (PIVOT orders ON o_orderpriority USING sum(o_totalprice)
        |               GROUP BY o_orderstatus)
        |      ON COLUMNS(* EXCLUDE (o_orderstatus)) INTO NAME k VALUE v)
        |ORDER BY o_orderstatus, k""".stripMargin,

    "arrow_roundtrip" ->
      """SELECT o_orderstatus, CAST(count(*) AS BIGINT) AS n,
        |  round(sum(o_totalprice), 2) AS total,
        |  min(o_orderdate) AS first_dt,
        |  max(o_orderpriority) AS top_pri
        |FROM orders WHERE o_orderkey <= 2000
        |GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin,

    "catalog_ctas" ->
      """CREATE OR REPLACE TABLE ctas_demo AS
        |SELECT l_returnflag, round(sum(l_quantity), 2) AS qty
        |FROM lineitem GROUP BY l_returnflag;
        |SELECT l_returnflag, qty FROM ctas_demo""".stripMargin,

    "catalog_summarize" ->
      """SELECT column_name, column_type, min, max,
        |  CAST(count AS BIGINT) AS count,
        |  CAST(null_percentage AS DOUBLE) AS null_pct
        |FROM (SUMMARIZE orders)""".stripMargin,

    "catalog_sequence" ->
      """DROP SEQUENCE IF EXISTS r3seq;
        |CREATE SEQUENCE r3seq START 100 INCREMENT 7;
        |SELECT CAST(i AS BIGINT) AS i, CAST(nextval('r3seq') AS BIGINT) AS v
        |FROM range(1, 7) t(i)""".stripMargin,

    "sql_copy_parquet" ->
      """COPY (SELECT l_orderkey, l_quantity, l_extendedprice
        |      FROM lineitem WHERE l_orderkey <= 2000)
        |TO '/root/repo/target/copy_duck_li.parquet' (FORMAT PARQUET);
        |SELECT count(*) AS n, round(sum(l_quantity), 2) AS sum_qty,
        |  round(sum(l_extendedprice), 2) AS sum_price
        |FROM read_parquet('/root/repo/target/copy_duck_li.parquet')""".stripMargin,

    "dialect_prepare" ->
      """PREPARE qty_cut AS
        |SELECT l_returnflag, count(*) AS n,
        |  round(sum(l_extendedprice), 2) AS total
        |FROM lineitem WHERE l_quantity <= $1 AND l_partkey % $2 = 0
        |GROUP BY l_returnflag;
        |EXECUTE qty_cut(10, 3)""".stripMargin,

    "scan_repeat" ->
      """SELECT count(*) AS n, count(*) FILTER (WHERE ab = 'ab') AS n_ab
        |FROM repeat('ab', 4)""".stripMargin,

    "csv_options" ->
      """SELECT * FROM
        |(SELECT count(*) AS n_skip, CAST(sum(n_nationkey) AS BIGINT) AS key_sum
        | FROM read_csv('/root/repo/target/csv_opts/skip_demo.csv',
        |               skip=2, delim='|', header=true, normalize_names=true))
        |CROSS JOIN
        |(SELECT count(*) AS n_union, count(n_name) AS n_name_rows,
        |        count(n_regionkey) AS n_region_rows
        | FROM read_csv(['/root/repo/target/csv_opts/u_a.csv',
        |                '/root/repo/target/csv_opts/u_b.csv'],
        |               union_by_name=true, header=true))
        |CROSS JOIN
        |(SELECT count(*) AS n_hive,
        |        CAST(sum(CAST(key AS BIGINT)) AS BIGINT) AS key_part_sum
        | FROM read_csv('/root/repo/target/csv_opts/pt/*/*.csv',
        |               hive_partitioning=true, header=true))""".stripMargin,

    "scan_test_all_types" -> TestAllTypesSql,
    "scan_test_vector_types" -> TestVectorTypesSql,

    "scan_json" ->
      """SELECT CAST(count(*) AS BIGINT) AS n, CAST(sum(k) AS BIGINT) AS key_sum,
        |  min(name) AS lo_name, CAST(sum(rk) AS BIGINT) AS rk_sum,
        |  CAST(count(*) FILTER (WHERE rk = 0) AS BIGINT) AS n_r0
        |FROM read_json_auto('/root/repo/target/json_scan/nation.ndjson')""".stripMargin,

    "dialect_collate" ->
      """SELECT s,
        |  CAST(row_number() OVER (ORDER BY s COLLATE NOCASE, s) AS BIGINT) AS rk,
        |  (s = 'BANANA' COLLATE NOCASE) AS is_banana,
        |  (s < 'b' COLLATE NOCASE) AS lt_b
        |FROM (VALUES ('apple'), ('Banana'), ('cherry'), ('APRICOT'), ('banana')) AS v(s)""".stripMargin,

    "csv_sniffer" ->
      """SELECT * FROM
        |(SELECT count(*) AS semi_n, CAST(sum(nkey) AS BIGINT) AS semi_keys,
        |        CAST(sum(length(nname)) AS BIGINT) AS semi_chars
        | FROM read_csv_auto('/root/repo/target/csv_sniff/semi.csv'))
        |CROSS JOIN
        |(SELECT count(*) AS pipe_n, CAST(sum(nkey) AS BIGINT) AS pipe_keys,
        |        CAST(sum(length(nname)) AS BIGINT) AS pipe_chars
        | FROM read_csv_auto('/root/repo/target/csv_sniff/pipe.csv'))
        |CROSS JOIN
        |(SELECT count(*) AS tabs_n, CAST(sum(nkey) AS BIGINT) AS tabs_keys,
        |        CAST(sum(length(nname)) AS BIGINT) AS tabs_chars
        | FROM read_csv_auto('/root/repo/target/csv_sniff/tabs.csv'))
        |CROSS JOIN
        |(SELECT count(*) AS gz_n, CAST(sum(nkey) AS BIGINT) AS gz_keys,
        |        CAST(sum(length(nname)) AS BIGINT) AS gz_chars
        | FROM read_csv_auto('/root/repo/target/csv_sniff/gzip.csv.gz'))""".stripMargin,

    "dialect_table_macro" ->
      """CREATE OR REPLACE MACRO top_parts(n) AS TABLE
        |SELECT p_partkey, p_type, p_retailprice FROM part
        |ORDER BY p_partkey LIMIT n;
        |SELECT t.p_type, count(*) AS n, round(sum(t.p_retailprice), 2) AS price_sum
        |FROM top_parts(50) t GROUP BY t.p_type""".stripMargin,

    "catalog_on_conflict" ->
      (onConflictStatements :+ onConflictSelect).mkString(";\n"),

    "catalog_explain_analyze" ->
      """SELECT CAST(count(*) AS BIGINT) AS top_rows
        |FROM (SELECT o_orderpriority FROM orders GROUP BY o_orderpriority)""".stripMargin,

    "catalog_functions" -> functionsSql,

    // identical text runs natively in DuckDB: the harness registers the
    // parquet tables as views, `main` is the default schema, and
    // threads/memory_limit are native setting names
    "catalog_schemas_views" ->
      (provenanceSetup :+ introspectionSql).mkString(";\n")
  )
}

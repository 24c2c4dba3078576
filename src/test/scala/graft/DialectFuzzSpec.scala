package graft

import graft.tools.DialectFuzzGen

/** Dialect-shim fuzz harness (round-8 verdict item #2): compose the
  * shim's rewritten constructs (QUALIFY, DISTINCT ON, star EXCLUDE/
  * REPLACE, SIMILAR TO, COLLATE, macros, PREPARE/EXECUTE) inside CTEs,
  * derived tables, set-operation branches, string literals full of
  * trap keywords, and line/block comments. Two checkers share ONE
  * seeded generator ([[graft.tools.DialectFuzzGen]]):
  *   - this spec: every generated statement's result equals a
  *     hand-paired plain-Spark-SQL formulation (in-process, runs in
  *     `sbt test`);
  *   - `FuzzDump` + tools/fuzz_compare.py: DuckDB executes the SAME
  *     dialect text natively and the driver-style canon compare
  *     hash-matches results — the cross-engine differential.
  * The reference parses these with a full Postgres grammar
  * (duckdb-libpg_query.cpp, Parser::ParseQuery duckdb-8.cpp:7252); the
  * shim is textual, so composition contexts — not the constructs
  * themselves — are where rewrite bugs live.
  */
class DialectFuzzSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("fuzz: 250+ composed dialect statements match plain-Spark equivalents") {
    Engine.registerAll(spark, dir)
    var checked = 0
    val failures = scala.collection.mutable.Buffer.empty[String]
    DialectFuzzGen.cases(250).foreach { c =>
      try {
        c.setup.foreach(SqlDialect.sql(spark, _))
        val got = SqlDialect.sql(spark, c.dialectSql).collect()
          .map(_.toString).sorted.toSeq
        val want = spark.sql(c.sparkSql).collect().map(_.toString).sorted.toSeq
        if (got != want)
          failures += s"MISMATCH (${got.length} vs ${want.length} rows):\n  ${c.dialectSql}"
        checked += 1
      } catch {
        case e: Throwable =>
          failures += s"ERROR ${e.getClass.getSimpleName}: ${e.getMessage}\n  ${c.dialectSql}"
      }
    }
    assert(failures.isEmpty,
      s"${failures.size}/${checked + failures.size} failed:\n" +
        failures.take(8).mkString("\n---\n"))
    assert(checked >= 250)
  }

  test("LIMIT n% composes with a WITH prefix at top level; nested raises a named error") {
    Engine.registerAll(spark, dir)
    val n = SqlDialect.sql(spark,
      "WITH big AS (SELECT n_nationkey FROM nation) SELECT * FROM big LIMIT 20%").count()
    assert(n == 5) // ceil(25 * 0.20)
    val e = intercept[UnsupportedOperationException](SqlDialect.sql(spark,
      "SELECT * FROM (SELECT n_nationkey FROM nation LIMIT 20%) t"))
    assert(e.getMessage.contains("LIMIT n%"))
    // a LIMIT % inside a string must NOT trigger the named error
    val ok = SqlDialect.sql(spark,
      "SELECT 'LIMIT 20%' AS s, count(*) AS n FROM nation").head()
    assert(ok.getString(0) == "LIMIT 20%" && ok.getLong(1) == 25L)
  }

  test("macro bodies survive comments and quoted := text") {
    SqlDialect.sql(spark,
      "CREATE OR REPLACE MACRO fz_cm(a) AS a + 1 /* adds one -- really */")
    val v = SqlDialect.sql(spark, "SELECT fz_cm(41) AS v").head().getInt(0)
    assert(v == 42)
    SqlDialect.sql(spark,
      "CREATE OR REPLACE MACRO fz_qm(a) AS concat(a, ' x := y')")
    val s = SqlDialect.sql(spark, "SELECT fz_qm('k') AS v").head().getString(0)
    assert(s == "k x := y")
  }
}

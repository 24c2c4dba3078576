package graft

/** [[SqlSelect]] — the r13 recursive-descent statement-spine parser that
  * replaced the QUALIFY / DISTINCT ON / star-modifier regex splicers.
  * Each test pins a behavior the splicers got WRONG (duck-probed this
  * round); the full legacy surface is covered by DialectFuzzSpec + the
  * 500-case cross-engine sweep, which ran green against the parser.
  */
class SqlSelectSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("QUALIFY binds to its own select core inside a set operation (duck-probed)") {
    Engine.registerAll(spark, dir)
    val got = SqlDialect.sql(spark,
      """SELECT n_nationkey AS k FROM nation WHERE n_nationkey < 3
        |UNION ALL
        |SELECT n_nationkey FROM nation
        |QUALIFY row_number() OVER (ORDER BY n_nationkey) <= 2""".stripMargin)
      .collect().map(_.getAs[Number](0).longValue).sorted.toSeq
    // duck: first arm {0,1,2} + second arm top-2 {0,1} — the old splicer
    // wrapped EVERYTHING left of QUALIFY, mis-scoping the predicate
    assert(got == Seq(0L, 0L, 1L, 1L, 2L))
  }

  test("DISTINCT ON with trailing LIMIT applies the limit AFTER the distinct (duck-probed)") {
    Engine.registerAll(spark, dir)
    val got = SqlDialect.sql(spark,
      """SELECT DISTINCT ON (n_regionkey) n_regionkey, n_name FROM nation
        |ORDER BY n_regionkey, n_name LIMIT 3""".stripMargin)
      .collect().map(r => (r.getAs[Number](0).longValue, r.getString(1))).sortBy(_._1).toSeq
    assert(got == Seq((0L, "NATION_0"), (1L, "NATION_1"), (2L, "NATION_12")))
  }

  test("multiplication by a function named replace is NOT a star modifier (duck-probed)") {
    Engine.registerAll(spark, dir)
    // the old `\*\s+REPLACE\s*\(` regex rewrote this into `* EXCEPT`
    val got = SqlDialect.sql(spark,
      """SELECT n_nationkey * replace('30','0','1')::BIGINT AS v
        |FROM nation WHERE n_nationkey <= 2""".stripMargin)
      .collect().map(_.getLong(0)).sorted.toSeq
    assert(got == Seq(0L, 31L, 62L))
    // and the rewriter leaves the text structurally intact
    val txt = SqlSelect.rewrite("SELECT a * replace(b, 'x', 'y') AS v FROM t")
    assert(!txt.toUpperCase.contains("EXCEPT"), txt)
  }

  test("star modifiers parse as projection-item structure at any position") {
    Engine.registerAll(spark, dir)
    val rows = SqlDialect.sql(spark,
      """SELECT n_nationkey AS k, n.* EXCLUDE (n_name)
        |  REPLACE (n_regionkey * 10 AS n_regionkey)
        |FROM nation n WHERE n_nationkey <= 1""".stripMargin).collect()
    val cols = rows.head.schema.fieldNames.toSeq
    assert(cols == Seq("k", "n_nationkey", "n_regionkey"))
    assert(rows.map(_.getAs[Number](2).longValue).sorted.toSeq == Seq(0L, 10L))
  }

  test("subqueries inside clauses rewrite recursively (QUALIFY in a scalar subquery)") {
    Engine.registerAll(spark, dir)
    val got = SqlDialect.sql(spark,
      """SELECT n_nationkey AS k FROM nation
        |WHERE n_nationkey = (SELECT n_nationkey FROM nation
        |  QUALIFY row_number() OVER (ORDER BY n_nationkey DESC) <= 1)""".stripMargin)
      .collect().map(_.getAs[Number](0).longValue).toSeq
    assert(got == Seq(24L))
  }
}

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

  test("QUALIFY referencing a NAMED window binds it (duck-probed; r13 self-review #1)") {
    Engine.registerAll(spark, dir)
    // duck: WINDOW w AS (...) QUALIFY row_number() OVER w = 1 — the
    // aliased __qN column must ride the inner select, where the WINDOW
    // clause still lives and Spark resolves the name
    val got = SqlDialect.sql(spark,
      """SELECT n_regionkey, n_name FROM nation
        |WINDOW w AS (PARTITION BY n_regionkey ORDER BY n_name)
        |QUALIFY row_number() OVER w = 1""".stripMargin)
      .collect().map(r => (r.getAs[Number](0).longValue, r.getString(1))).sortBy(_._1).toSeq
    assert(got.map(_._1) == Seq(0L, 1L, 2L, 3L, 4L))
    assert(got.head == ((0L, "NATION_0")))
    // two named references where one window name PREFIXES the other —
    // the longest-first replacement order must keep them distinct
    val two = SqlDialect.sql(spark,
      """SELECT n_regionkey, n_name FROM nation
        |WINDOW w AS (PARTITION BY n_regionkey ORDER BY n_name),
        |       w2 AS (PARTITION BY n_regionkey ORDER BY n_name DESC)
        |QUALIFY row_number() OVER w = 1 OR row_number() OVER w2 = 1""".stripMargin)
      .collect()
    assert(two.length == 10) // first and last per region, 5 regions
  }

  test("alias substitution skips QUALIFIER positions (duck-probed)") {
    Engine.registerAll(spark, dir)
    // output alias `n` collides with the TABLE alias `n`: the
    // substitution must not rewrite `n.n_nationkey`'s qualifier
    val got = SqlDialect.sql(spark,
      """SELECT DISTINCT ON (n_regionkey) n.n_nationkey AS n FROM nation n
        |ORDER BY n.n_nationkey DESC LIMIT 2""".stripMargin)
      .collect().map(_.getAs[Number](0).longValue).sorted.toSeq
    assert(got == Seq(23L, 24L))
  }

  test("QUALIFY on the middle member of a three-way set-op chain (duck-probed)") {
    Engine.registerAll(spark, dir)
    val got = SqlDialect.sql(spark,
      """SELECT n_nationkey AS k FROM nation WHERE n_nationkey < 2
        |UNION ALL
        |SELECT n_nationkey FROM nation
        |QUALIFY row_number() OVER (ORDER BY n_nationkey DESC) <= 2
        |UNION ALL
        |SELECT n_nationkey FROM nation WHERE n_nationkey = 10""".stripMargin)
      .collect().map(_.getAs[Number](0).longValue).sorted.toSeq
    assert(got == Seq(0L, 1L, 10L, 23L, 24L))
  }

  test("DISTINCT ON composes with a NAMED-window QUALIFY in one core (duck-probed)") {
    Engine.registerAll(spark, dir)
    // qualify applies BEFORE the distinct (reference clause order); the
    // distinct window rides the QUALIFY-wrapped output
    val got = SqlDialect.sql(spark,
      """SELECT DISTINCT ON (n_regionkey) n_regionkey, n_name FROM nation
        |WINDOW w AS (PARTITION BY n_regionkey ORDER BY n_nationkey)
        |QUALIFY row_number() OVER w <= 3 ORDER BY n_name LIMIT 3""".stripMargin)
      .collect().map(r => (r.getAs[Number](0).longValue, r.getString(1))).sortBy(_._1).toSeq
    assert(got == Seq((0L, "NATION_0"), (1L, "NATION_1"), (2L, "NATION_12")))
  }

  test("DISTINCT ON binds OUTPUT aliases in keys and ORDER BY (duck-probed; r13 self-review #2)") {
    Engine.registerAll(spark, dir)
    // duck: `SELECT -k AS k … ORDER BY k` orders by the ALIAS value; the
    // spliced window must see the defining expression, not the bare name
    val got = SqlDialect.sql(spark,
      """SELECT DISTINCT ON (rk) n_regionkey AS rk, -n_nationkey AS nk
        |FROM nation ORDER BY nk LIMIT 3""".stripMargin)
      .collect().map(r => (r.getAs[Number](0).longValue, r.getAs[Number](1).longValue)).toSeq
    // per region the min of -n_nationkey = -(max nationkey); limit keeps
    // the 3 smallest (duck-replayed): regions of nations 24, 23, 22
    assert(got.map(_._2) == got.map(_._2).sorted, s"output order: $got")
    assert(got.length == 3)
    assert(got.map(_._2).head == -24L)
    // alias INSIDE an order expression substitutes too
    val expr = SqlDialect.sql(spark,
      """SELECT DISTINCT ON (n_regionkey) n_nationkey AS nk, n_regionkey
        |FROM nation ORDER BY -nk LIMIT 2""".stripMargin)
      .collect().map(_.getAs[Number](0).longValue).toSeq
    assert(expr == Seq(24L, 23L), s"got $expr")
  }

  test("QUALIFY filters BEFORE DISTINCT dedups the projection (duck-probed; ADVICE r13 #3)") {
    Engine.registerAll(spark, dir)
    // two rows share the projection value but differ in window value;
    // the old splicer dedup'd (item + __qN) before the filter, letting
    // the duplicate survive. duck: filter keeps both rows, DISTINCT
    // collapses them → exactly one 'a' and one 'b'.
    val got = SqlDialect.sql(spark,
      """SELECT DISTINCT s FROM (VALUES (1,'a'),(2,'a'),(3,'b')) v(k,s)
        |QUALIFY row_number() OVER (ORDER BY k) <= 3""".stripMargin)
      .collect().map(_.getString(0)).sorted.toSeq
    assert(got == Seq("a", "b"), s"got $got")
    // and the filter still runs first: rank the duplicate away and the
    // value must vanish entirely
    val got2 = SqlDialect.sql(spark,
      """SELECT DISTINCT s FROM (VALUES (1,'a'),(2,'b'),(3,'b')) v(k,s)
        |QUALIFY row_number() OVER (PARTITION BY s ORDER BY k) = 2""".stripMargin)
      .collect().map(_.getString(0)).toSeq
    assert(got2 == Seq("b"), s"got $got2")
  }

  test("DISTINCT ON + QUALIFY resolves source-only key/order columns (duck-probed; ADVICE r13 #4)") {
    Engine.registerAll(spark, dir)
    // s (the key) and n (the order) are NOT projected; the row_number
    // window rides the qualify-wrapped output where they no longer
    // exist — they must splice as hidden columns into the innermost
    // select. duck-replayed: representatives per s picked by n asc are
    // k=1(a,10), k=2(A,20), k=3(b,30), k=4(B,5); output ordered by n,
    // LIMIT 3 → k = 4, 1, 2.
    val got = SqlDialect.sql(spark,
      """SELECT DISTINCT ON (s) k
        |FROM (VALUES (1,'a',10),(2,'A',20),(3,'b',30),(4,'B',5),(5,'a',20)) v(k,s,n)
        |QUALIFY row_number() OVER (PARTITION BY s ORDER BY k) >= 1
        |ORDER BY n LIMIT 3""".stripMargin)
      .collect().map(_.getAs[Number](0).longValue).toSeq
    assert(got == Seq(4L, 1L, 2L), s"got $got")
  }

  test("star EXCLUDE then EXCEPT(SELECT …) keeps the set operation (ADVICE r13 #2)") {
    // EXCEPT( whose interior is query-headed is the set op, not a second
    // modifier group — duck parses SELECT * EXCEPT (SELECT …) as EXCEPT
    val out = SqlSelect.rewrite("SELECT * EXCLUDE (a) EXCEPT (SELECT 1)")
    assert(out.replaceAll("\\s+", " ").contains("* EXCEPT (a) EXCEPT (SELECT 1)"), out)
    // plain-name interiors stay modifiers
    val mod = SqlSelect.rewrite("SELECT * EXCEPT (a, b) FROM t")
    assert(mod.replaceAll("\\s+", " ").contains("* EXCEPT (a, b) FROM t"), mod)
  }

  test("double-quoted identifier containing a quote cannot desync the raw-region scan (ADVICE r13 #1)") {
    // the "o'brien" alias precedes a QUALIFY subquery in the same FROM
    // slice; an un-tracked " would leave the walker inside a bogus
    // string and the subquery unrewritten
    val out = SqlSelect.rewrite(
      """SELECT 1 FROM t "o'brien", (SELECT a FROM u QUALIFY row_number() OVER (ORDER BY a) = 1) x""")
    assert(!out.contains("QUALIFY"), out) // the keyword (uppercase in the
    // input) must be rewritten away; only the lowercase __qualify alias
    // of the wrap may remain
    assert(out.contains("__q0"), out)
  }

  test("""strict WINDOW scope: sibling set-op redefinition raises "already defined" (duck-probed)""") {
    Engine.registerAll(spark, dir)
    val q =
      """SELECT n_nationkey, row_number() OVER w AS rn FROM nation WINDOW w AS (ORDER BY n_nationkey)
        |UNION ALL
        |SELECT n_nationkey, row_number() OVER w FROM nation WINDOW w AS (ORDER BY n_nationkey DESC)""".stripMargin
    val e = intercept[IllegalArgumentException] { SqlDialect.sql(spark, q) }
    assert(e.getMessage.contains("window \"w\" is already defined"), e.getMessage)
    // parenthesized members share the statement scope too (duck-probed)
    val qp =
      """(SELECT n_nationkey, row_number() OVER w AS rn FROM nation WINDOW w AS (ORDER BY n_nationkey))
        |UNION ALL
        |(SELECT n_nationkey, row_number() OVER w FROM nation WINDOW w AS (ORDER BY n_nationkey DESC))""".stripMargin
    val ep = intercept[IllegalArgumentException] { SqlDialect.sql(spark, qp) }
    assert(ep.getMessage.contains("already defined"), ep.getMessage)
    // duplicate inside ONE clause raises as well (duck-probed)
    val ed = intercept[IllegalArgumentException] { SqlDialect.sql(spark,
      "SELECT n_nationkey FROM nation WINDOW w AS (ORDER BY n_nationkey), w AS (ORDER BY n_name)") }
    assert(ed.getMessage.contains("already defined"), ed.getMessage)
    // FROM-subquery and CTE scopes do NOT collide (duck-probed)
    val ok = SqlDialect.sql(spark,
      """WITH c AS (SELECT n_nationkey AS k, row_number() OVER w AS rn FROM nation WINDOW w AS (ORDER BY n_nationkey))
        |SELECT k, row_number() OVER w FROM c WINDOW w AS (ORDER BY k DESC)""".stripMargin)
    assert(ok.count() == 25)
    // conf off restores Spark's per-member scope
    spark.conf.set("spark.graft.strictWindowScope", "false")
    try assert(SqlDialect.sql(spark, q).count() == 50)
    finally spark.conf.unset("spark.graft.strictWindowScope")
  }

  test("IS [NOT] DISTINCT FROM at depth 0 is not the FROM clause boundary (r14b fuzz find)") {
    Engine.registerAll(spark, dir)
    // projection item: the old scan stopped at the operator's FROM and
    // lost the rest of the item to a phantom FROM clause
    val r = SqlDialect.sql(spark,
      "SELECT n_nationkey AS k, n_name IS DISTINCT FROM 'x' AS d " +
        "FROM nation WHERE n_nationkey <= 2").collect()
    assert(r.length == 3 && r.forall(_.getBoolean(1)))
    // WHERE position, negated form, composed with QUALIFY so the spine
    // parser must slice every clause correctly
    val q = SqlDialect.sql(spark,
      "SELECT n_nationkey AS k FROM nation " +
        "WHERE n_name IS NOT DISTINCT FROM n_name AND n_regionkey IS DISTINCT FROM 99 " +
        "QUALIFY row_number() OVER (ORDER BY n_nationkey) <= 4").collect()
    assert(q.length == 4 && q.map(_.getInt(0)).toSeq == Seq(0, 1, 2, 3))
  }
}

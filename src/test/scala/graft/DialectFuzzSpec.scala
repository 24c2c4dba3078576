package graft

/** Dialect-shim fuzz harness (round-8 verdict item #2): compose the
  * shim's rewritten constructs (QUALIFY, DISTINCT ON, star EXCLUDE/
  * REPLACE, SIMILAR TO, macros, PREPARE/EXECUTE, LIMIT n%) inside
  * CTEs, derived tables, string literals full of trap keywords, and
  * line/block comments, and assert every generated statement's result
  * equals a hand-paired plain-Spark-SQL formulation of the same
  * semantics. The reference parses these with a full Postgres grammar
  * (duckdb-libpg_query.cpp, Parser::ParseQuery duckdb-8.cpp:7252); the
  * shim is textual, so composition contexts — not the constructs
  * themselves — are where rewrite bugs live.
  *
  * Deterministic: seeded RNG, ≥250 statements per run, failures print
  * the offending dialect SQL.
  */
class DialectFuzzSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  /** (dialect SQL, equivalent plain Spark SQL). */
  private type Pair = (String, String)

  private def qualifyAliased(m: Int): Pair = {
    val core = "SELECT n_regionkey AS rk, n_nationkey AS k, " +
      "row_number() OVER (PARTITION BY n_regionkey ORDER BY n_nationkey) AS rn FROM nation"
    (s"$core QUALIFY rn <= $m",
      s"SELECT * FROM ($core) __x WHERE rn <= $m")
  }

  private def qualifyInline(m: Int): Pair = {
    val win = "row_number() OVER (PARTITION BY n_regionkey ORDER BY n_nationkey DESC)"
    (s"SELECT n_regionkey AS rk, n_name FROM nation QUALIFY $win <= $m",
      s"SELECT rk, n_name FROM (SELECT n_regionkey AS rk, n_name, $win AS __w " +
        s"FROM nation) __x WHERE __w <= $m")
  }

  private def distinctOn(desc: Boolean): Pair = {
    val ord = if (desc) "DESC" else "ASC"
    ("SELECT DISTINCT ON (n_regionkey) n_regionkey AS rk, n_nationkey AS k, n_name " +
      s"FROM nation ORDER BY n_regionkey, n_nationkey $ord",
      "SELECT rk, k, n_name FROM (SELECT n_regionkey AS rk, n_nationkey AS k, n_name, " +
        s"row_number() OVER (PARTITION BY n_regionkey ORDER BY n_regionkey, n_nationkey $ord) AS __rn " +
        "FROM nation) __x WHERE __rn = 1")
  }

  private def starExclude(): Pair = {
    ("SELECT * EXCLUDE (n_name) FROM nation",
      "SELECT n_nationkey, n_regionkey FROM nation")
  }

  private def starReplace(k: Int): Pair = {
    (s"SELECT * EXCLUDE (n_name) REPLACE (n_nationkey * $k AS n_nationkey) FROM nation",
      s"SELECT n_regionkey, n_nationkey * $k AS n_nationkey FROM nation")
  }

  private def similarTo(pat: String): Pair = {
    (s"SELECT n_name FROM nation WHERE n_name SIMILAR TO '$pat'",
      s"SELECT n_name FROM nation WHERE n_name RLIKE '^(?:$pat)$$'")
  }

  private def macroCall(i: Int, a: Int): Pair = {
    SqlDialect.sql(spark, s"CREATE OR REPLACE MACRO fz_m$i(x, y := 7) AS x * 100 + y")
    (s"SELECT n_nationkey AS k, fz_m$i(n_regionkey, y := $a) AS v FROM nation",
      s"SELECT n_nationkey AS k, n_regionkey * 100 + $a AS v FROM nation")
  }

  private def collate(lit: String): Pair = {
    (s"SELECT n_nationkey AS k, n_name FROM nation WHERE n_name = '$lit' COLLATE NOCASE",
      s"SELECT n_nationkey AS k, n_name FROM nation WHERE lower(n_name) = lower('$lit')")
  }

  private def prepareExec(i: Int, m: Int): Pair = {
    SqlDialect.sql(spark,
      s"PREPARE fz_p$i AS SELECT n_nationkey AS k, n_name FROM nation WHERE n_nationkey <= $$1")
    (s"EXECUTE fz_p$i($m)",
      s"SELECT n_nationkey AS k, n_name FROM nation WHERE n_nationkey <= $m")
  }

  // ---- composition contexts ----

  private def ctxDerived(p: Pair): Pair =
    (s"SELECT * FROM (${p._1}) __d WHERE 1 = 1",
      s"SELECT * FROM (${p._2}) __d WHERE 1 = 1")

  private def ctxCte(p: Pair): Pair =
    (s"WITH __c AS (${p._1}) SELECT * FROM __c",
      s"WITH __c AS (${p._2}) SELECT * FROM __c")

  private def ctxCteChain(p: Pair): Pair =
    (s"WITH __c AS (${p._1}), __c2 AS (SELECT * FROM __c) SELECT * FROM __c2",
      s"WITH __c AS (${p._2}), __c2 AS (SELECT * FROM __c) SELECT * FROM __c2")

  /** String literal stuffed with every trap the textual rewriters must
    * NOT trigger on — keywords, comment markers, a doubled quote, an
    * unbalanced paren. Added to BOTH sides (it must survive verbatim). */
  private val trapLit =
    "QUALIFY rn <= 1 -- LIMIT 5% /* DISTINCT ON (x) */ it''s a (test SIMILAR TO"

  private def ctxTrapString(p: Pair): Pair =
    (s"SELECT *, '$trapLit' AS __trap FROM (${p._1}) __t",
      s"SELECT *, '$trapLit' AS __trap FROM (${p._2}) __t")

  /** Parenthesized set-operation branches: each operand is its own
    * rewrite level, so a QUALIFY/DISTINCT ON inside either branch must
    * rewrite independently. */
  private def ctxUnion(p: Pair): Pair =
    (s"(${p._1}) UNION ALL (${p._1})", s"(${p._2}) UNION ALL (${p._2})")

  /** Comments injected into the DIALECT side only — they are whitespace
    * to the grammar, so the plain side stays clean. */
  private def ctxComments(p: Pair): Pair = {
    val d = p._1
    val withInline =
      if (d.toUpperCase.startsWith("SELECT"))
        "SELECT /* QUALIFY trap LIMIT 9% */ " + d.substring(6)
      else d
    // the trailing line comment ends with a NEWLINE: without it, an
    // outer wrapping context's ')' would land on the comment line and
    // be commented out — invalid SQL on any engine, not a shim trap
    (s"-- DISTINCT ON (zzz) QUALIFY junk\n$withInline\n-- LIMIT 44% trailing\n",
      p._2)
  }

  test("fuzz: 250+ composed dialect statements match plain-Spark equivalents") {
    Engine.registerAll(spark, dir)
    val rnd = new scala.util.Random(20260814L)
    val contexts: Seq[Pair => Pair] = Seq(ctxDerived, ctxCte, ctxCteChain,
      ctxTrapString, ctxComments, ctxUnion)
    var checked = 0
    val failures = scala.collection.mutable.Buffer.empty[String]
    for (i <- 0 until 250) {
      val base: Pair = rnd.nextInt(9) match {
        case 0 => qualifyAliased(1 + rnd.nextInt(4))
        case 1 => qualifyInline(1 + rnd.nextInt(4))
        case 2 => distinctOn(rnd.nextBoolean())
        case 3 => starExclude()
        case 4 => starReplace(1 + rnd.nextInt(9))
        case 5 => similarTo(Seq(".*A.*", "[A-Z]+", ".*(IA|AN)").apply(rnd.nextInt(3)))
        case 6 => macroCall(i, rnd.nextInt(50))
        case 7 => prepareExec(i, 1 + rnd.nextInt(20))
        case 8 => collate(Seq("algeria", "France", "KENYA").apply(rnd.nextInt(3)))
      }
      // EXECUTE cannot nest inside a context (statement-level construct)
      val nestable = !base._1.toUpperCase.startsWith("EXECUTE")
      val wrapped = if (!nestable) base
      else rnd.nextInt(3) match {
        case 0 => base
        case 1 => contexts(rnd.nextInt(contexts.length))(base)
        case 2 =>
          val c1 = contexts(rnd.nextInt(contexts.length))
          val c2 = contexts(rnd.nextInt(contexts.length))
          c2(c1(base))
      }
      val (d, s) = wrapped
      try {
        val got = SqlDialect.sql(spark, d).collect()
          .map(_.toString).sorted.toSeq
        val want = spark.sql(s).collect().map(_.toString).sorted.toSeq
        if (got != want)
          failures += s"MISMATCH (${got.length} vs ${want.length} rows):\n  $d"
        checked += 1
      } catch {
        case e: Throwable =>
          failures += s"ERROR ${e.getClass.getSimpleName}: ${e.getMessage}\n  $d"
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

package graft.tools

/** Seeded generator behind the dialect-composition fuzz (round-8
  * verdict #2). Every emitted construct is NATIVE DuckDB syntax
  * (QUALIFY, DISTINCT ON, star EXCLUDE/REPLACE, SIMILAR TO, COLLATE,
  * macros, PREPARE/EXECUTE), so the same statement text runs on both
  * engines: the ScalaTest spec checks the shim's rewrite against a
  * hand-paired plain-Spark formulation in-process, and
  * [[FuzzDump]] + tools/fuzz_compare.py replay the IDENTICAL
  * statements on DuckDB for the cross-engine differential — the full
  * "rewrite ≡ oracle" loop the reference's Postgres grammar
  * (duckdb-libpg_query.cpp, Parser::ParseQuery duckdb-8.cpp:7252)
  * makes unnecessary there.
  *
  * Determinism: a fixed seed drives construct + context choice; every
  * construct's result is total-order deterministic (complete ORDER BY
  * keys under row_number / DISTINCT ON), so engines can't disagree by
  * tie-break.
  */
object DialectFuzzGen {

  /** One generated case: session-state setup statements (macros,
    * prepares — DuckDB runs them in the same script), the dialect
    * statement, and a plain-Spark-SQL equivalent for the in-process
    * spec. */
  final case class Case(name: String, setup: Seq[String],
                        dialectSql: String, sparkSql: String)

  private type Pair = (String, String)

  private def qualifyAliased(m: Int): (Seq[String], Pair) = {
    val core = "SELECT n_regionkey AS rk, n_nationkey AS k, " +
      "row_number() OVER (PARTITION BY n_regionkey ORDER BY n_nationkey) AS rn FROM nation"
    (Nil, (s"$core QUALIFY rn <= $m",
      s"SELECT * FROM ($core) __x WHERE rn <= $m"))
  }

  private def qualifyInline(m: Int): (Seq[String], Pair) = {
    val win = "row_number() OVER (PARTITION BY n_regionkey ORDER BY n_nationkey DESC)"
    (Nil, (s"SELECT n_regionkey AS rk, n_name FROM nation QUALIFY $win <= $m",
      s"SELECT rk, n_name FROM (SELECT n_regionkey AS rk, n_name, $win AS __w " +
        s"FROM nation) __x WHERE __w <= $m"))
  }

  private def distinctOn(desc: Boolean): (Seq[String], Pair) = {
    val ord = if (desc) "DESC" else "ASC"
    (Nil, ("SELECT DISTINCT ON (n_regionkey) n_regionkey AS rk, n_nationkey AS k, n_name " +
      s"FROM nation ORDER BY n_regionkey, n_nationkey $ord",
      "SELECT rk, k, n_name FROM (SELECT n_regionkey AS rk, n_nationkey AS k, n_name, " +
        s"row_number() OVER (PARTITION BY n_regionkey ORDER BY n_regionkey, n_nationkey $ord) AS __rn " +
        "FROM nation) __x WHERE __rn = 1"))
  }

  private def starExclude(): (Seq[String], Pair) =
    (Nil, ("SELECT * EXCLUDE (n_name) FROM nation",
      "SELECT n_nationkey, n_regionkey FROM nation"))

  private def starReplace(k: Int): (Seq[String], Pair) =
    (Nil, (s"SELECT * EXCLUDE (n_name) REPLACE (n_nationkey * $k AS n_nationkey) FROM nation",
      s"SELECT n_regionkey, n_nationkey * $k AS n_nationkey FROM nation"))

  private def similarTo(pat: String): (Seq[String], Pair) =
    (Nil, (s"SELECT n_name FROM nation WHERE n_name SIMILAR TO '$pat'",
      s"SELECT n_name FROM nation WHERE n_name RLIKE '^(?:$pat)$$'"))

  private def collate(lit: String): (Seq[String], Pair) =
    (Nil, (s"SELECT n_nationkey AS k, n_name FROM nation WHERE n_name = '$lit' COLLATE NOCASE",
      s"SELECT n_nationkey AS k, n_name FROM nation WHERE lower(n_name) = lower('$lit')"))

  /** Parenthesized / concatenation-chain comparison operands: the fold
    * must wrap the WHOLE side, not the nearest atom. */
  private def collateParen(lit: String): (Seq[String], Pair) =
    (Nil, (s"SELECT n_nationkey AS k, n_name FROM nation " +
      s"WHERE (n_name || '!') = '$lit!' COLLATE NOCASE",
      s"SELECT n_nationkey AS k, n_name FROM nation " +
        s"WHERE lower(n_name || '!') = lower('$lit!')"))

  /** Projected + sort-key COLLATE: the annotation must NOT change the
    * returned value (DuckDB returns the original case), only the sort
    * key folds. */
  private def collateProjected(lit: String): (Seq[String], Pair) =
    (Nil, (s"SELECT n_nationkey AS k, n_name COLLATE NOCASE AS nm FROM nation " +
      s"WHERE n_name = '$lit' COLLATE NOCASE ORDER BY n_name COLLATE NOCASE",
      s"SELECT n_nationkey AS k, n_name AS nm FROM nation " +
        s"WHERE lower(n_name) = lower('$lit') ORDER BY lower(n_name)"))

  /** Nested CASE in the projection, then projected + sort-key COLLATE:
    * the classifier must restore the enclosing clause after each END
    * (a real stack — r11 lexer), so the trailing COLLATEs still
    * classify as select (drop) / sort (fold). */
  private def collateNestedCase(k: Int): (Seq[String], Pair) = {
    val cse = s"CASE WHEN n_nationkey > $k THEN " +
      s"CASE WHEN n_regionkey > 2 THEN 'hi' ELSE 'mid' END ELSE 'lo' END"
    (Nil, (s"SELECT $cse AS band, n_name COLLATE NOCASE AS nm, n_nationkey AS key " +
      "FROM nation ORDER BY n_name COLLATE NOCASE, n_nationkey",
      s"SELECT $cse AS band, n_name AS nm, n_nationkey AS key " +
        "FROM nation ORDER BY lower(n_name), n_nationkey"))
  }

  /** Double-quoted identifiers (the reference's standard form; Spark
    * would read them as string literals) — the shim rewrites them to
    * backticks, and names that ARE clause keywords ("order", "group")
    * must not confuse the clause classifier. */
  private def quotedIdent(desc: Boolean): (Seq[String], Pair) = {
    val ord = if (desc) "DESC" else "ASC"
    (Nil, ("SELECT n_nationkey AS \"order\", n_name AS \"group by\" FROM nation " +
      s"WHERE n_regionkey >= 1 ORDER BY n_name COLLATE NOCASE $ord, n_nationkey",
      "SELECT n_nationkey AS `order`, n_name AS `group by` FROM nation " +
        s"WHERE n_regionkey >= 1 ORDER BY lower(n_name) $ord, n_nationkey"))
  }

  /** Quoted CTE name exercising the token-structural WITH splitter
    * (a name ending in "as"/containing spaces must parse as a NAME). */
  private def quotedCte(m: Int): (Seq[String], Pair) =
    (Nil, (s"""WITH "c 1" AS (SELECT n_nationkey AS k, n_name FROM nation WHERE n_nationkey <= $m) """ +
      s"""SELECT * FROM "c 1" QUALIFY row_number() OVER (ORDER BY k) <= $m""",
      s"WITH `c 1` AS (SELECT n_nationkey AS k, n_name FROM nation WHERE n_nationkey <= $m) " +
        s"SELECT k, n_name FROM (SELECT *, row_number() OVER (ORDER BY k) AS __w FROM `c 1`) __x " +
        s"WHERE __w <= $m"))

  /** QUALIFY inside a set-operation member binds to ITS select core
    * (r13 parser — duck-probed; the old splicer wrapped everything left
    * of the keyword). */
  private def qualifyInUnion(m: Int): (Seq[String], Pair) =
    (Nil, (s"SELECT n_nationkey AS k FROM nation WHERE n_nationkey < $m " +
      "UNION ALL SELECT n_nationkey FROM nation " +
      s"QUALIFY row_number() OVER (ORDER BY n_nationkey) <= $m",
      s"SELECT n_nationkey AS k FROM nation WHERE n_nationkey < $m " +
        "UNION ALL SELECT k FROM (SELECT n_nationkey AS k, " +
        "row_number() OVER (ORDER BY n_nationkey) AS __w FROM nation) __x " +
        s"WHERE __w <= $m"))

  /** `expr * replace(…)` is multiplication by a function call, never a
    * star modifier (r13 parser — the old `\\*\\s+REPLACE\\(` regex
    * mangled it). */
  private def mulReplace(m: Int): (Seq[String], Pair) =
    (Nil, (s"SELECT n_nationkey AS k, n_nationkey * " +
      s"replace('${m}0','0','1')::BIGINT AS v FROM nation WHERE n_regionkey >= 1",
      s"SELECT n_nationkey AS k, n_nationkey * " +
        s"CAST(replace('${m}0','0','1') AS BIGINT) AS v FROM nation " +
        "WHERE n_regionkey >= 1"))

  /** DISTINCT ON with a trailing LIMIT: the limit applies AFTER the
    * distinct (r13 parser — duck-probed; the old splicer swallowed it
    * into the window's ORDER BY text). */
  private def distinctOnLimit(m: Int): (Seq[String], Pair) =
    (Nil, (s"SELECT DISTINCT ON (n_regionkey) n_regionkey AS r, n_name AS nm " +
      s"FROM nation ORDER BY n_regionkey, n_name LIMIT $m",
      s"SELECT r, nm FROM (SELECT n_regionkey AS r, n_name AS nm, " +
        "row_number() OVER (PARTITION BY n_regionkey ORDER BY n_regionkey, n_name) " +
        "AS __w FROM nation) __x WHERE __w = 1 ORDER BY r LIMIT " + m))

  /** QUALIFY referencing a NAMED window (r13 self-review #1,
    * duck-probed): the aliased __qN column rides the inner select,
    * where the WINDOW clause still lives and both engines resolve the
    * name. */
  private def qualifyNamedWindow(m: Int): (Seq[String], Pair) =
    (Nil, ("SELECT n_regionkey AS r, n_name FROM nation " +
      "WINDOW w AS (PARTITION BY n_regionkey ORDER BY n_name) " +
      s"QUALIFY row_number() OVER w <= $m",
      "SELECT r, n_name FROM (SELECT n_regionkey AS r, n_name, " +
        "row_number() OVER (PARTITION BY n_regionkey ORDER BY n_name) AS __w " +
        s"FROM nation) __x WHERE __w <= $m"))

  /** DISTINCT ON binding OUTPUT aliases (r13 self-review #2,
    * duck-probed: `SELECT -k AS k … ORDER BY k` orders by the ALIAS
    * value): the splice substitutes the defining expression into the
    * window. Half the instances put the alias INSIDE an order
    * expression. */
  private def distinctOnAliasOrder(m: Int): (Seq[String], Pair) =
    if (m % 2 == 0)
      (Nil, ("SELECT DISTINCT ON (rk) n_regionkey AS rk, -n_nationkey AS nk " +
        s"FROM nation ORDER BY nk LIMIT $m",
        "SELECT rk, nk FROM (SELECT n_regionkey AS rk, -n_nationkey AS nk, " +
          "row_number() OVER (PARTITION BY n_regionkey ORDER BY -n_nationkey) AS __w " +
          s"FROM nation) __x WHERE __w = 1 ORDER BY nk LIMIT $m"))
    else
      (Nil, ("SELECT DISTINCT ON (n_regionkey) n_nationkey AS nk, n_regionkey " +
        s"FROM nation ORDER BY -nk LIMIT $m",
        "SELECT nk, n_regionkey FROM (SELECT n_nationkey AS nk, n_regionkey, " +
          "row_number() OVER (PARTITION BY n_regionkey ORDER BY -n_nationkey) AS __w " +
          s"FROM nation) __x WHERE __w = 1 ORDER BY -nk LIMIT $m"))

  /** COLLATE in a FUNCTION-ARGUMENT position (r12): the annotation is
    * dropped — reference-probed pass-through (`lower(x COLLATE NOCASE)`
    * = lower(x); `greatest('B' COLLATE NOCASE,'a')` = 'a', byte order —
    * collation binds only at comparison/sort sites). */
  private def collateFuncArg(lit: String): (Seq[String], Pair) =
    (Nil, (s"SELECT n_nationkey AS k, upper(n_name COLLATE NOCASE) AS u, " +
      s"greatest(n_name COLLATE NOCASE, '$lit') AS g FROM nation " +
      "WHERE n_regionkey >= 1",
      s"SELECT n_nationkey AS k, upper(n_name) AS u, " +
        s"greatest(n_name, '$lit') AS g FROM nation WHERE n_regionkey >= 1"))

  /** A CTE literally NAMED `recursive` — the bare-keyword/name ambiguity
    * the WITH splitter disambiguates by `as (` lookahead (r12); half the
    * instances carry a column list `(k, nm)` (r13 — the skip loop used
    * to overshoot it and never quote the definition site). */
  private def cteNamedRecursive(m: Int): (Seq[String], Pair) =
    if (m % 2 == 0)
      (Nil, (s"WITH recursive (k, nm) AS (SELECT n_nationkey, n_name " +
        s"FROM nation WHERE n_nationkey <= $m) " +
        "SELECT * FROM recursive QUALIFY row_number() OVER (ORDER BY k) <= 3",
        s"WITH `recursive` (k, nm) AS (SELECT n_nationkey, n_name " +
          s"FROM nation WHERE n_nationkey <= $m) " +
          "SELECT k, nm FROM (SELECT *, row_number() OVER (ORDER BY k) " +
          "AS __w FROM recursive) __x WHERE __w <= 3"))
    else
      (Nil, (s"WITH recursive AS (SELECT n_nationkey AS k, n_name FROM nation " +
        s"WHERE n_nationkey <= $m) " +
        "SELECT * FROM recursive QUALIFY row_number() OVER (ORDER BY k) <= 3",
        s"WITH `recursive` AS (SELECT n_nationkey AS k, n_name FROM nation " +
          s"WHERE n_nationkey <= $m) " +
          "SELECT k, n_name FROM (SELECT *, row_number() OVER (ORDER BY k) " +
          "AS __w FROM recursive) __x WHERE __w <= 3"))

  /** COLLATE through BETWEEN and IS [NOT] DISTINCT FROM (r14b,
    * duck-probed: both fold every side of the comparison). */
  private def collateBetween(lit: String, m: Int): (Seq[String], Pair) =
    (Nil, (s"SELECT n_nationkey AS k, n_name, " +
      s"n_name COLLATE NOCASE IS DISTINCT FROM '$lit' AS d FROM nation " +
      s"WHERE n_name COLLATE NOCASE BETWEEN '$lit' AND 'zz' AND n_nationkey <= $m",
      s"SELECT n_nationkey AS k, n_name, " +
        s"lower(n_name) IS DISTINCT FROM lower('$lit') AS d FROM nation " +
        s"WHERE lower(n_name) BETWEEN lower('$lit') AND lower('zz') AND n_nationkey <= $m"))

  /** COLLATE through IN — annotation on the OPERAND or on a list
    * ELEMENT triggers the same whole-membership fold (r14b,
    * duck-probed: `'B' IN ('b' COLLATE NOCASE,'x')` is true). */
  private def collateIn(lit: String, elemSide: Boolean): (Seq[String], Pair) = {
    val folded = s"SELECT n_nationkey AS k, n_name FROM nation " +
      s"WHERE lower(n_name) IN (lower('$lit'), lower('zz'))"
    if (elemSide)
      (Nil, (s"SELECT n_nationkey AS k, n_name FROM nation " +
        s"WHERE n_name IN ('$lit' COLLATE NOCASE, 'zz')", folded))
    else
      (Nil, (s"SELECT n_nationkey AS k, n_name FROM nation " +
        s"WHERE n_name COLLATE NOCASE IN ('$lit', 'zz')", folded))
  }

  /** Simple-CASE operand COLLATE folds operand + WHEN comparands;
    * LIKE ignores the annotation on either side (r14b, duck-probed). */
  private def collateCaseLike(lit: String): (Seq[String], Pair) =
    (Nil, (s"SELECT n_nationkey AS k, " +
      s"CASE n_name COLLATE NOCASE WHEN '$lit' THEN 1 ELSE 0 END AS hit, " +
      s"n_name COLLATE NOCASE LIKE '${lit.take(2)}%' AS lk FROM nation",
      s"SELECT n_nationkey AS k, " +
        s"CASE lower(n_name) WHEN lower('$lit') THEN 1 ELSE 0 END AS hit, " +
        s"n_name LIKE '${lit.take(2)}%' AS lk FROM nation"))

  // ---- r15 arithmetic-edge shapes (ARITH_BATTERY_r15.json): zero
  // divisors are NULL, / is double, // truncates, ^/** exponentiate,
  // shifts are range-checked, default null order is NULLS LAST ----

  private def arithDivEdge(k: Int): (Seq[String], Pair) =
    (Nil, (s"SELECT n_nationkey AS k, n_nationkey / $k AS d, " +
      "n_nationkey % (n_regionkey - n_regionkey) AS mz, " +
      s"n_nationkey // $k AS fd FROM nation",
      s"SELECT n_nationkey AS k, CAST(n_nationkey AS DOUBLE) / $k AS d, " +
        "CAST(NULL AS INT) AS mz, " +
        s"CAST(FLOOR(CAST(n_nationkey AS DOUBLE) / $k) AS BIGINT) AS fd FROM nation"))

  private def arithPowEdge(): (Seq[String], Pair) =
    (Nil, ("SELECT n_nationkey AS k, n_nationkey ^ 2 AS p, " +
      "2 ** (n_regionkey + 1) AS q FROM nation",
      "SELECT n_nationkey AS k, power(n_nationkey, 2) AS p, " +
        "power(2, n_regionkey + 1) AS q FROM nation"))

  private def arithShiftEdge(m: Int): (Seq[String], Pair) =
    (Nil, (s"SELECT n_nationkey AS k, (n_nationkey % 16) << $m AS sl, " +
      "n_nationkey >> 1 AS sr FROM nation",
      s"SELECT n_nationkey AS k, shiftleft(n_nationkey % 16, $m) AS sl, " +
        "shiftright(n_nationkey, 1) AS sr FROM nation"))

  private def orderNullsEdge(m: Int): (Seq[String], Pair) =
    (Nil, ("SELECT CASE WHEN n_nationkey % 3 = 0 THEN NULL ELSE n_nationkey END AS x " +
      s"FROM nation ORDER BY x LIMIT $m",
      "SELECT CASE WHEN n_nationkey % 3 = 0 THEN NULL ELSE n_nationkey END AS x " +
        s"FROM nation ORDER BY x NULLS LAST LIMIT $m"))

  // ---- r16 tranche-5 shapes (BATTERY5_r16.json): projection-position
  // 3VL for IN-subqueries, window FILTER + empty literal frames, and
  // the column-DEFAULT machinery ----

  /** IN (subquery with NULL members) in PROJECTION position: NULL when
    * unmatched (reference MARK joins); the native side spells the
    * 3-branch CASE explicitly over Spark's 2-valued ExistenceJoin. */
  private def proj3vl(m: Int): (Seq[String], Pair) = {
    val sub = "SELECT CASE WHEN n_nationkey % 5 = 0 THEN NULL " +
      s"ELSE n_regionkey END AS y FROM nation WHERE n_nationkey < $m"
    (Nil, (s"SELECT n_nationkey AS k, n_regionkey IN ($sub) AS f FROM nation",
      s"SELECT n_nationkey AS k, CASE WHEN n_regionkey IN ($sub) THEN TRUE " +
        s"WHEN (SELECT count(*) FROM ($sub)) = 0 THEN FALSE " +
        s"WHEN (SELECT count(*) > count(y) FROM ($sub)) THEN CAST(NULL AS BOOLEAN) " +
        "ELSE FALSE END AS f FROM nation"))
  }

  /** Window FILTER with an explicit frame + an EMPTY literal frame:
    * both Spark analysis errors without rewriteWindowEdges. */
  private def winEdgeFuzz(p: Int): (Seq[String], Pair) =
    (Nil, ("SELECT n_nationkey AS k, " +
      "CAST(sum(n_nationkey) FILTER (WHERE n_nationkey % 2 = 0) OVER " +
      s"(PARTITION BY n_regionkey ORDER BY n_nationkey ROWS BETWEEN $p " +
      "PRECEDING AND CURRENT ROW) AS BIGINT) AS f, " +
      "CAST(sum(n_nationkey) OVER (ORDER BY n_nationkey ROWS BETWEEN " +
      "2 FOLLOWING AND 1 FOLLOWING) AS BIGINT) AS e FROM nation",
      "SELECT n_nationkey AS k, " +
        "CAST(sum(CASE WHEN n_nationkey % 2 = 0 THEN n_nationkey END) OVER " +
        s"(PARTITION BY n_regionkey ORDER BY n_nationkey ROWS BETWEEN $p " +
        "PRECEDING AND CURRENT ROW) AS BIGINT) AS f, " +
        "CAST(NULL AS BIGINT) AS e FROM nation"))

  /** Column DEFAULTs: column-list INSERT, VALUES DEFAULT, reordered
    * lists — final state vs the literal rows they must produce. */
  private def defaultsFuzz(i: Int, a: Int): (Seq[String], Pair) =
    (Seq(s"DROP TABLE IF EXISTS fz_d$i",
      s"CREATE TABLE fz_d$i(a INT DEFAULT $a, b INT, c VARCHAR DEFAULT 'd$i')",
      s"INSERT INTO fz_d$i(b) VALUES (1), (2)",
      s"INSERT INTO fz_d$i VALUES (DEFAULT, 3, 'x')",
      s"INSERT INTO fz_d$i(b, a) VALUES (4, ${a + 1})"),
      (s"SELECT a, b, c FROM fz_d$i ORDER BY b",
        s"SELECT * FROM (VALUES ($a, 1, 'd$i'), ($a, 2, 'd$i'), " +
          s"($a, 3, 'x'), (${a + 1}, 4, 'd$i')) v(a, b, c) ORDER BY b"))

  /** r17 set-op member-type coercion: mixed INT / VARCHAR / BOOLEAN
    * members widen in the REFERENCE's direction (VARCHAR; duck-probed
    * matrix in SqlSelect.duckSetOpType). The native side spells the
    * duck-widened casts explicitly — integer and boolean renderings
    * are engine-identical, so plain CAST…AS STRING is the equivalent. */
  private def setopCoerceFuzz(m: Int): (Seq[String], Pair) =
    (Nil, (s"SELECT x, count(*) AS n FROM (" +
      s"SELECT CAST(n_nationkey % $m AS INTEGER) AS x FROM nation " +
      "UNION ALL SELECT substr(n_name, 1, 2) FROM nation " +
      "UNION ALL SELECT n_nationkey % 3 = 0 FROM nation) t GROUP BY x",
      s"SELECT x, count(*) AS n FROM (" +
        s"SELECT CAST(n_nationkey % $m AS STRING) AS x FROM nation " +
        "UNION ALL SELECT substr(n_name, 1, 2) FROM nation " +
        "UNION ALL SELECT CAST(n_nationkey % 3 = 0 AS STRING) FROM nation) t " +
        "GROUP BY x"))

  /** r17 tranche-7 shape: nested casts (BY-NAME struct match reordered
    * to target order, leaf TRY), the two-LIST MAP constructor, and the
    * reference's complex→VARCHAR rendering — the native side spells
    * duck's semantics with Spark primitives. */
  private def nestedCastFuzz(m: Int): (Seq[String], Pair) =
    (Nil, (s"SELECT n_nationkey AS k, " +
      s"(CAST({'b': n_nationkey + $m, 'a': n_regionkey} AS STRUCT(a BIGINT, b VARCHAR))).a AS sa, " +
      s"(CAST({'b': n_nationkey + $m, 'a': n_regionkey} AS STRUCT(a BIGINT, b VARCHAR))).b AS sb, " +
      "CAST(TRY_CAST([CAST(n_nationkey AS VARCHAR), 'x'] AS INT[]) AS VARCHAR) AS l_s, " +
      s"CAST(cardinality(MAP([n_name], [n_regionkey + $m])) AS BIGINT) AS mp_n, " +
      "CAST([n_regionkey, NULL] AS VARCHAR) AS r FROM nation",
      s"SELECT n_nationkey AS k, " +
        "CAST(n_regionkey AS BIGINT) AS sa, " +
        s"CAST(n_nationkey + $m AS STRING) AS sb, " +
        "concat('[', n_nationkey, ', NULL]') AS l_s, " +
        "CAST(1 AS BIGINT) AS mp_n, " +
        "concat('[', n_regionkey, ', NULL]') AS r FROM nation"))

  private def macroCall(i: Int, a: Int): (Seq[String], Pair) =
    (Seq(s"CREATE OR REPLACE MACRO fz_m$i(x, y := 7) AS x * 100 + y"),
      (s"SELECT n_nationkey AS k, fz_m$i(n_regionkey, y := $a) AS v FROM nation",
        s"SELECT n_nationkey AS k, n_regionkey * 100 + $a AS v FROM nation"))

  private def prepareExec(i: Int, m: Int): (Seq[String], Pair) =
    (Seq(s"PREPARE fz_p$i AS SELECT n_nationkey AS k, n_name FROM nation " +
      s"WHERE n_nationkey <= $$1"),
      (s"EXECUTE fz_p$i($m)",
        s"SELECT n_nationkey AS k, n_name FROM nation WHERE n_nationkey <= $m"))

  // ---- composition contexts (applied to both sides) ----

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
    * unbalanced paren. */
  val trapLit: String =
    "QUALIFY rn <= 1 -- LIMIT 5% /* DISTINCT ON (x) */ it''s a (test SIMILAR TO"

  private def ctxTrapString(alias: String)(p: Pair): Pair =
    (s"SELECT *, '$trapLit' AS $alias FROM (${p._1}) __t",
      s"SELECT *, '$trapLit' AS $alias FROM (${p._2}) __t")

  /** Comments injected into the DIALECT side only (whitespace to the
    * grammar; the trailing line comment ends with a newline so an
    * outer wrapper's ')' survives). */
  private def ctxComments(p: Pair): Pair = {
    val d = p._1
    val withInline =
      if (d.toUpperCase.startsWith("SELECT"))
        "SELECT /* QUALIFY trap LIMIT 9% */ " + d.substring(6)
      else d
    (s"-- DISTINCT ON (zzz) QUALIFY junk\n$withInline\n-- LIMIT 44% trailing\n",
      p._2)
  }

  private def ctxUnion(p: Pair): Pair =
    (s"(${p._1}) UNION ALL (${p._1})", s"(${p._2}) UNION ALL (${p._2})")

  /** duck scopes WINDOW names across SIBLING set-op members (probed:
    * the same name defined in two members is "already defined") — and
    * since r14 graft enforces the same rule (strictWindowScope, the
    * collision error is spec-pinned in SqlSelectSpec), so the union
    * context no longer derive-wraps WINDOW statements. Instead the
    * duplicated member's window names get a FRESH per-application
    * prefix (injective under context stacking: every name in the copy
    * moves to a namespace no other member uses), which makes the union
    * a REAL cross-member named-window exercise on both engines. */
  private def renameWindows(s: String, n: Int): String =
    s.replaceAll("(?i)\\b(OVER|WINDOW)(\\s+)([A-Za-z_]\\w*)", s"$$1$$2q${n}_$$3")

  private def unionRenamed(n: Int)(p: Pair): Pair =
    (s"(${p._1}) UNION ALL (${renameWindows(p._1, n)})",
      s"(${p._2}) UNION ALL (${renameWindows(p._2, n)})")

  /** The deterministic case list: `n` cases from the given seed. */
  def cases(n: Int, seed: Long = 20260815L): Seq[Case] = {
    val rnd = new scala.util.Random(seed)
    (0 until n).map { i =>
      // trap-string aliases are unique PER APPLICATION: two stacked
      // trap contexts would otherwise emit duplicate column names,
      // which collect() tolerates but any sink (parquet) rejects
      var trapN = 0
      def freshTrap(p: Pair): Pair = {
        trapN += 1
        ctxTrapString(s"__trap${trapN}")(p)
      }
      var unionN = 0
      def freshUnion(p: Pair): Pair = {
        unionN += 1
        // ANY-depth check (not keywordIndex's depth-0): a prior union
        // application leaves its members' WINDOW names at paren depth 1,
        // where they still bubble to the statement scope (duck-probed:
        // parenthesized members collide) — renaming a scope-hidden name
        // (FROM subquery / CTE) is harmless, missing a bubbling one is a
        // cross-engine parse error
        val hasWin = graft.SqlLex.tokenize(p._1)
          .exists(t => t.kind == graft.SqlLex.Ident && t.lower == "window")
        if (hasWin) unionRenamed(unionN)(p) else ctxUnion(p)
      }
      val contexts: Seq[Pair => Pair] = Seq(ctxDerived, ctxCte, ctxCteChain,
        freshTrap, ctxComments, freshUnion)
      val (setup, base) = rnd.nextInt(33) match {
        case 0 => qualifyAliased(1 + rnd.nextInt(4))
        case 1 => qualifyInline(1 + rnd.nextInt(4))
        case 2 => distinctOn(rnd.nextBoolean())
        case 3 => starExclude()
        case 4 => starReplace(1 + rnd.nextInt(9))
        case 5 => similarTo(Seq(".*A.*", "[A-Z]+", ".*(IA|AN)").apply(rnd.nextInt(3)))
        case 6 => macroCall(i, rnd.nextInt(50))
        case 7 => prepareExec(i, 1 + rnd.nextInt(20))
        case 8 => collate(Seq("algeria", "France", "KENYA").apply(rnd.nextInt(3)))
        case 9 => collateProjected(Seq("algeria", "France", "KENYA").apply(rnd.nextInt(3)))
        case 10 => collateParen(Seq("algeria", "France", "KENYA").apply(rnd.nextInt(3)))
        case 11 => collateNestedCase(1 + rnd.nextInt(20))
        case 12 => quotedIdent(rnd.nextBoolean())
        case 13 => quotedCte(2 + rnd.nextInt(15))
        case 14 => cteNamedRecursive(2 + rnd.nextInt(15))
        case 15 => collateFuncArg(Seq("MOROCCO", "India", "peru").apply(rnd.nextInt(3)))
        case 16 => qualifyInUnion(1 + rnd.nextInt(4))
        case 17 => mulReplace(1 + rnd.nextInt(9))
        case 18 => distinctOnLimit(1 + rnd.nextInt(5))
        case 19 => qualifyNamedWindow(1 + rnd.nextInt(3))
        case 20 => distinctOnAliasOrder(1 + rnd.nextInt(5))
        case 21 => collateBetween(
          Seq("algeria", "France", "KENYA").apply(rnd.nextInt(3)), 5 + rnd.nextInt(20))
        case 22 => collateIn(
          Seq("algeria", "France", "KENYA").apply(rnd.nextInt(3)), rnd.nextBoolean())
        case 23 => collateCaseLike(
          Seq("algeria", "France", "KENYA").apply(rnd.nextInt(3)))
        case 24 => arithDivEdge(1 + rnd.nextInt(7))
        case 25 => arithPowEdge()
        case 26 => arithShiftEdge(rnd.nextInt(4))
        case 27 => orderNullsEdge(3 + rnd.nextInt(12))
        case 28 => proj3vl(2 + rnd.nextInt(20))
        case 29 => winEdgeFuzz(1 + rnd.nextInt(4))
        case 30 => defaultsFuzz(i, 1 + rnd.nextInt(90))
        case 31 => setopCoerceFuzz(2 + rnd.nextInt(9))
        case 32 => nestedCastFuzz(1 + rnd.nextInt(50))
      }
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
      Case(f"fuzz_$i%03d", setup, wrapped._1, wrapped._2)
    }
  }
}

/** Dump every fuzz case's Spark result (through the dialect shim) as
  * parquet plus a manifest of the statements, for the DuckDB
  * differential (tools/fuzz_compare.py — DuckDB executes the SAME
  * dialect text natively). Usage:
  *   runMain graft.tools.FuzzDump <sfDir> <outDir> [nCases]
  */
object FuzzDump {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.01"
    val outDir = if (args.length > 1) args(1) else "target/fuzz_out"
    val n = if (args.length > 2) args(2).toInt else 250
    // fresh seed per round (protocol): args(3), default the spec's seed
    val seed = if (args.length > 3) args(3).toLong else 20260815L
    val spark = graft.Engine.session(
      s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")}]")
    spark.sparkContext.setLogLevel("WARN")
    graft.Engine.registerAll(spark, sfDir)
    val cs = DialectFuzzGen.cases(n, seed)
    val manifest = new StringBuilder("{\n")
    var failed = 0
    cs.zipWithIndex.foreach { case (c, i) =>
      try {
        c.setup.foreach(graft.SqlDialect.sql(spark, _))
        graft.SqlDialect.sql(spark, c.dialectSql)
          .write.mode("overwrite").parquet(s"$outDir/${c.name}")
      } catch {
        case e: Throwable =>
          failed += 1
          System.err.println(s"[fuzzdump] ${c.name} failed: ${e.getMessage}")
          // delete any PREVIOUS run's dump for this case: a stale parquet
          // under the same name makes fuzz_compare report a misleading
          // cross-case mismatch instead of this failure (r12: the
          // recursive-CTE shape's 16 failures first surfaced as stale
          // column diffs from the prior seed's cases)
          val dir = new java.io.File(s"$outDir/${c.name}")
          if (dir.isDirectory) {
            dir.listFiles().foreach(_.delete())
            dir.delete()
          }
      }
      def js(s: String) = "\"" + s.replace("\\", "\\\\").replace("\"", "\\\"")
        .replace("\n", "\\n") + "\""
      manifest.append(s"  ${js(c.name)}: {\"setup\": [${c.setup.map(js).mkString(", ")}], ")
        .append(s"\"sql\": ${js(c.dialectSql)}}")
        .append(if (i == cs.length - 1) "\n" else ",\n")
    }
    manifest.append("}\n")
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(outDir))
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"$outDir/fuzz_manifest.json"), manifest.toString)
    println(s"FUZZDUMP cases=${cs.length} failed=$failed out=$outDir")
    spark.stop()
  }
}

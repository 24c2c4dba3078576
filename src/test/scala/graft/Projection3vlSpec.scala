package graft

/** r16 projection-position three-valued logic (the last known
  * silent-divergence class, VERDICT r15 #3): every expected value below
  * duck-probed this round on the same statement text (reference MARK
  * joins, duckdb.hpp:13906-13911). Spark's ExistenceJoin returns FALSE
  * where the reference returns NULL for unmatched probes with a NULL
  * left operand or a NULL subquery member; [[SqlSelect.rewrite3vl]]
  * corrects projection items while predicate positions keep the fast
  * existence probes.
  */
class Projection3vlSpec extends SparkSpec {

  private def one(sql: String) = SqlDialect.sql(spark, sql).head()

  // subquery fixtures: s1 = {1,2}, s2 = {1,NULL}, s0 = {} (empty)
  private val s1 = "SELECT y FROM (VALUES (1),(2)) t(y)"
  private val s2 = "SELECT y FROM (VALUES (1),(CAST(NULL AS INT))) t(y)"
  private val s0 = "SELECT y FROM (VALUES (1)) t(y) WHERE y > 99"

  private def b(sql: String, exp: Option[Boolean], hint: String): Unit = {
    val r = one(s"SELECT $sql AS v")
    exp match {
      case None => assert(r.isNullAt(0), s"$hint: expected NULL, got ${r.get(0)}")
      case Some(x) => assert(!r.isNullAt(0) && r.getBoolean(0) == x,
        s"$hint: expected $x, got ${if (r.isNullAt(0)) "NULL" else r.get(0)}")
    }
  }

  test("IN (subquery) in projection position (duck-probed r16)") {
    b(s"1 IN ($s1)", Some(true), "match")
    b(s"3 IN ($s1)", Some(false), "no match, no nulls")
    b(s"3 IN ($s2)", None, "no match + null member")
    b(s"1 IN ($s2)", Some(true), "match despite null member")
    b(s"NULL IN ($s1)", None, "null probe, non-empty")
    b(s"NULL IN ($s0)", Some(false), "null probe, EMPTY set is false")
    b(s"1 IN ($s0)", Some(false), "empty set")
  }

  test("NOT IN (subquery) in projection position (duck-probed r16)") {
    b(s"3 NOT IN ($s2)", None, "no match + null member")
    b(s"1 NOT IN ($s2)", Some(false), "match")
    b(s"NULL NOT IN ($s0)", Some(true), "null probe, empty set is true")
    b(s"3 NOT IN ($s1)", Some(true), "no match, no nulls")
  }

  test("quantified ANY in projection position (duck-probed r16)") {
    b(s"3 = ANY ($s2)", None, "= ANY no match + null")
    b(s"1 = ANY ($s2)", Some(true), "= ANY match")
    b(s"3 > ANY ($s2)", Some(true), "> ANY: any true wins over null")
    b(s"0 > ANY ($s2)", None, "> ANY: no true, null comparison")
    b(s"3 = ANY ($s0)", Some(false), "ANY over empty is false")
    b(s"0 > ANY ($s1)", Some(false), "> ANY all false, no nulls")
  }

  test("quantified ALL in projection position (duck-probed r16)") {
    b(s"3 > ALL ($s2)", None, "no false, null present")
    b(s"3 > ALL ($s0)", Some(true), "ALL over empty is true")
    b(s"0 > ALL ($s2)", Some(false), "any false wins even with nulls")
    b(s"NULL > ALL ($s0)", Some(true), "null probe, empty set")
    b(s"5 <> ALL ($s2)", None, "<> ALL (NOT IN) null member")
    b(s"3 > ALL ($s1)", Some(true), "all true, no nulls")
  }

  test("predicate positions keep filtering identically (incl. the ALL null-probe fix)") {
    // NULL > ALL (SELECT 2) is NULL on the reference — falsy — so the
    // NULL row must NOT survive (the two-clause NOT EXISTS form kept it)
    val r = SqlDialect.sql(spark,
      s"SELECT x FROM (VALUES (CAST(NULL AS INT)),(5)) t(x) WHERE x > ALL (SELECT 2)")
      .collect()
    assert(r.map(_.getInt(0)).toSeq == Seq(5), s"got ${r.mkString(",")}")
    // plain IN predicates unchanged
    val r2 = SqlDialect.sql(spark,
      s"SELECT x FROM (VALUES (1),(3)) t(x) WHERE x IN ($s2)").collect()
    assert(r2.map(_.getInt(0)).toSeq == Seq(1))
  }

  test("compositions: alias survives, CASE nesting, value-list IN untouched") {
    val a = one(s"SELECT 3 IN ($s2) AS flag, 7 AS k")
    assert(a.isNullAt(0) && a.getInt(1) == 7)
    val c = one(s"SELECT CASE WHEN 1 IN ($s1) THEN 'y' ELSE 'n' END AS v")
    assert(c.getString(0) == "y")
    // IN over a literal list is not a subquery form — left alone
    val l = one("SELECT 3 IN (1, 2) AS v")
    assert(!l.getBoolean(0))
    // a scalar subquery's own WHERE-IN stays a predicate (two-valued)
    val s = one(s"SELECT (SELECT count(*) FROM (VALUES (1),(3)) t(x) " +
      s"WHERE x IN ($s2)) AS n")
    assert(s.getLong(0) == 1L)
  }

  test("row-value IN (subquery) in projection raises the named error") {
    val e = intercept[Exception](one(
      "SELECT (1, 2) IN (SELECT y, y FROM (VALUES (1)) t(y)) AS v"))
    assert(e.getMessage != null && e.getMessage.contains("row-value IN"),
      s"got: ${e.getMessage}")
  }

  test("SET spark.graft.projection3vl=false restores the plain probe") {
    spark.conf.set("spark.graft.projection3vl", "false")
    try {
      val r = one(s"SELECT 3 IN ($s2) AS v")
      assert(!r.isNullAt(0) && !r.getBoolean(0),
        "two-valued probe returns false when disabled")
    } finally spark.conf.set("spark.graft.projection3vl", "true")
  }
}

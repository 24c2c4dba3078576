package graft

/** r17 set-op member coercion (`SqlSelect.coerceSetOpMembers`): the
  * reference's binder unifies member types over its own lattice
  * (duckdb-9.cpp set-op bind), probed as a full 15×15 pair matrix
  * against the oracle this round (BATTERY7 set-op tranche). Every
  * expected value below is the duck probe's output on the same text.
  */
class SetOpCoerceSpec extends SparkSpec {

  private def df(sql: String) = SqlDialect.sql(spark, sql)
  private def tyOf(sql: String): String =
    df(sql).schema.fields.head.dataType.simpleString

  test("INT UNION VARCHAR widens to VARCHAR (probed: duck picks the string side)") {
    val r = df("SELECT x FROM (SELECT 1 AS x UNION ALL SELECT 'a') t ORDER BY x")
    assert(r.schema.head.dataType.simpleString == "string")
    assert(r.collect().map(_.getString(0)).toSeq == Seq("1", "a"))
  }

  test("BOOL UNION INT widens to the int (probed; Spark refuses natively)") {
    val r = df("SELECT x FROM (SELECT true AS x UNION ALL SELECT 0) t ORDER BY x")
    assert(r.schema.head.dataType.simpleString == "int")
    assert(r.collect().map(_.getInt(0)).toSeq == Seq(0, 1))
  }

  test("DECIMAL UNION FLOAT is FLOAT, not Spark's DOUBLE (probed)") {
    assert(tyOf("SELECT x FROM (SELECT CAST(1.5 AS DECIMAL(11,1)) AS x " +
      "UNION ALL SELECT CAST(2.5 AS FLOAT)) t") == "float")
  }

  test("DECIMAL UNION BIGINT widens precision by the int's width (probed: DECIMAL(20,1))") {
    assert(tyOf("SELECT x FROM (SELECT CAST(1 AS BIGINT) AS x " +
      "UNION ALL SELECT CAST(2.5 AS DECIMAL(11,1))) t") == "decimal(20,1)")
  }

  test("VARCHAR UNION BLOB is BLOB — the one pair where VARCHAR loses (probed)") {
    assert(tyOf("SELECT x FROM (SELECT 'ab' AS x " +
      "UNION ALL SELECT BLOB '\\x01') t") == "binary")
  }

  test("DOUBLE member renders through duck_str when widened to VARCHAR") {
    // shortest-round-trip rendering, not Java's Double.toString
    val r = df("SELECT x FROM (SELECT 0.1::DOUBLE AS x UNION ALL SELECT 'z') t " +
      "ORDER BY x").collect().map(_.getString(0))
    assert(r.toSeq == Seq("0.1", "z"))
  }

  test("coercion binds members through the statement's WITH prefix") {
    val r = df("WITH c AS (SELECT 7 AS x) SELECT x FROM c " +
      "UNION ALL SELECT 'q' ORDER BY x").collect().map(_.getString(0))
    assert(r.toSeq == Seq("7", "q"))
  }

  test("set-op-scope trailing ORDER BY / LIMIT survive the member wrap") {
    val r = df("SELECT 1 AS x UNION ALL SELECT 'c' UNION ALL SELECT 'b' " +
      "ORDER BY x DESC LIMIT 2").collect().map(_.getString(0))
    assert(r.toSeq == Seq("c", "b"))
  }

  test("three-member chains fold the lattice (INT, VARCHAR, BOOL -> VARCHAR)") {
    val r = df("SELECT x FROM (SELECT 1 AS x UNION ALL SELECT 'a' " +
      "UNION ALL SELECT true) t ORDER BY x").collect().map(_.getString(0))
    assert(r.toSeq == Seq("1", "a", "true"))
  }

  test("same-type members pass through untouched (no wrap, no cast)") {
    val rewritten = SqlSelect.rewrite(
      "SELECT 1 AS x UNION ALL SELECT 2")
    assert(!rewritten.contains("__graft_soc"),
      s"no-op chain must not be wrapped: $rewritten")
  }

  test("unprobed pairs fall back to native behavior (loud error stands)") {
    // INTERVAL UNION INTEGER errors on BOTH engines — the guardrail
    // class; the coercion pass must not invent a cast here
    val e = intercept[Exception] {
      df("SELECT x FROM (SELECT INTERVAL 1 DAY AS x UNION ALL SELECT 1) t")
        .collect()
    }
    assert(e.getMessage != null)
  }

  test("SET spark.graft.setopCoerce=false disables the pass") {
    spark.conf.set("spark.graft.setopCoerce", "false")
    try {
      val rewritten = SqlSelect.rewrite("SELECT 1 AS x UNION ALL SELECT 'a'")
      assert(!rewritten.contains("duck_str"), rewritten)
    } finally spark.conf.set("spark.graft.setopCoerce", "true")
  }

  test("nested types unify recursively (probed: lists, positional structs, maps)") {
    val l = df("SELECT x FROM (SELECT [1,2] AS x UNION ALL SELECT ['a']) t " +
      "ORDER BY 1")
    assert(l.schema.head.dataType.simpleString == "array<string>")
    assert(l.collect().map(_.getSeq[String](0)).toSeq ==
      Seq(Seq("1", "2"), Seq("a")))
    val st = df("SELECT x FROM (SELECT {'a': 1} AS x " +
      "UNION ALL SELECT {'a': 'z'}) t")
    assert(st.schema.head.dataType.simpleString == "struct<a:string>")
    val m = df("SELECT x FROM (SELECT MAP(['k'],[1]) AS x " +
      "UNION ALL SELECT MAP(['k'],['v'])) t")
    assert(m.schema.head.dataType.simpleString == "map<string,string>")
    // different struct field NAMES stay a loud error (duck Mismatch)
    intercept[Exception] {
      df("SELECT x FROM (SELECT {'a': 1} AS x UNION ALL SELECT {'b': 1}) t")
        .collect()
    }
  }

  test("a last-member alias named `limit` is not split as a set-op tail (r18 advice)") {
    // before the fix, splitTrailingSetopTail treated the trailing AS-alias
    // `limit` as the LIMIT clause; the orphaned core failed to bind and
    // coercion silently bailed — now the member coerces like any other
    val r = df("SELECT v FROM (SELECT 1 AS limit UNION ALL SELECT 'a' AS limit) " +
      "t(v) ORDER BY v").collect().map(_.getString(0))
    assert(r.toSeq == Seq("1", "a"))
    // ...and a REAL trailing LIMIT (operand present) still splits
    val lim = df("SELECT 2 AS x UNION ALL SELECT 'b' ORDER BY x LIMIT 1")
      .collect().map(_.getString(0))
    assert(lim.toSeq == Seq("2"))
  }

  test("members with duplicate output column names skip coercion (r18 advice)") {
    // Spark allows duplicate names in set-op members; a by-name wrap
    // would raise an ambiguous reference, so when a cast WOULD fire
    // (INT vs BIGINT here) coercion must stand down and let Spark's
    // native widening run the statement
    val r = df("SELECT 1 AS a, 2 AS a UNION ALL SELECT CAST(3 AS BIGINT), 4")
    assert(r.collect().length == 2)
  }

  test("EXCEPT / INTERSECT coerce the same way as UNION (probed)") {
    val ex = df("SELECT x FROM (SELECT 1 AS x UNION ALL SELECT 'a' " +
      "EXCEPT SELECT '1') t ORDER BY x").collect().map(_.getString(0))
    assert(ex.toSeq == Seq("a"))
    val in = df("SELECT x FROM (SELECT 1 AS x INTERSECT SELECT '1') t")
      .collect().map(_.getString(0))
    assert(in.toSeq == Seq("1"))
  }
}

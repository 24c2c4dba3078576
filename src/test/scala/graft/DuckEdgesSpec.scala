package graft

/** r15 battery-tranche-2 pins — every value duck-probed (DuckDB 1.0)
  * on the same statement text; per-case table BATTERY2_r15.json.
  * Headline: the reference's bracket subscripts are 1-BASED (0 and
  * out-of-range are NULL, negative from the end) where Spark's are
  * 0-based — a silently-shifted-value class on shared-text SQL. */
class DuckEdgesSpec extends SparkSpec {

  private def one(sql: String) = SqlDialect.sql(spark, sql).head()

  test("bracket subscripts are 1-based with NULL at 0/out-of-range") {
    val r = one("SELECT ([10,20,30])[1] AS a, ([10,20,30])[0] AS b, " +
      "([10,20,30])[4] AS c, ([10,20,30])[-1] AS d, " +
      "'abcdef'[2] AS e, 'abcdef'[9] AS f, 'abcdef'[-1] AS g")
    assert(r.getInt(0) == 10)
    assert(r.isNullAt(1) && r.isNullAt(2))
    assert(r.getInt(3) == 30, "negative indexes from the end")
    assert(r.getString(4) == "b" && r.getString(5) == "" && r.getString(6) == "f")
  }

  test("slices are 1-based inclusive with negative/open bounds") {
    val r = one("SELECT ([1,2,3,4,5])[2:4] AS a, ([1,2,3,4,5])[2:-1] AS b, " +
      "([1,2,3,4,5])[:3] AS c, ([1,2,3,4,5])[4:2] AS d, ([1,2,3])[5:9] AS e, " +
      "'abcdef'[2:4] AS f, 'abcdef'[3:] AS g, 'abcdef'[2:-2] AS h")
    assert(r.getSeq[Int](0) == Seq(2, 3, 4))
    assert(r.getSeq[Int](1) == Seq(2, 3, 4, 5), "end -1 reaches the last element")
    assert(r.getSeq[Int](2) == Seq(1, 2, 3))
    assert(r.getSeq[Int](3) == Seq() && r.getSeq[Int](4) == Seq())
    assert(r.getString(5) == "bcd" && r.getString(6) == "cdef" &&
      r.getString(7) == "bcde")
  }

  test("struct/map literals, struct_pack, and dotted access") {
    val r = one("SELECT ({'a': 1, 'b': 'x'}).a AS a, ({'o': {'i': 42}}).o.i AS b, " +
      "struct_pack(x := 5, y := 'z').x AS c, (MAP {'k1': 1, 'k2': 2})['k1'] AS d")
    assert(r.getInt(0) == 1)
    assert(r.getInt(1) == 42)
    assert(r.getInt(2) == 5)
    // duck map subscripts return a LIST of matches (probed)
    assert(r.getSeq[Int](3) == Seq(1))
    val miss = one("SELECT (MAP {'a': 1})['zz'] AS m")
    assert(miss.getSeq[Int](0) == Seq(), "missing key is an empty list (probed)")
  }

  test("DATE - DATE is an integer day count; other minus forms keep Spark") {
    val r = one("SELECT DATE '1994-02-01' - DATE '1994-01-01' AS d, " +
      "DATE '1994-01-10' - 3 AS dd, 5 - 2 AS i, 5.5 - 1 AS f, " +
      "9223372036854775807 - 1 AS big")
    assert(r.getInt(0) == 31, "day count, not an interval (duck-probed)")
    assert(r.getDate(1).toString == "1994-01-07")
    assert(r.getInt(2) == 3)
    assert(r.getDecimal(3).doubleValue == 4.5)
    assert(r.getLong(4) == Long.MaxValue - 1)
    // the minus rewrite must not break scientific literals or arrows
    val s = one("SELECT 1e-7 AS sci, CAST(1e-7::DOUBLE AS VARCHAR) AS sv")
    assert(s.getString(1) == "1e-07")
  }

  test("e-strings, dollar quotes, nested comments, multi-statement") {
    assert(one("SELECT e'a\\nb' AS r").getString(0) == "a\nb")
    assert(one("SELECT e'a\\tb' AS r").getString(0) == "a\tb")
    assert(one("SELECT $tag$it's raw$tag$ AS r").getString(0) == "it's raw")
    assert(one("SELECT /* outer /* inner */ still */ 1 AS r").getInt(0) == 1)
    assert(one("SELECT 1 AS a; SELECT 2 AS b").getInt(0) == 2,
      "a multi-statement script returns the LAST result (probed)")
  }

  test("r16 advice fixes: ts-date minus, struct brackets, cast/trim contexts") {
    // mixed timestamp/date minus yields an interval (probed r16)
    val r = one("SELECT CAST(TIMESTAMP '2024-01-02 03:00:00' - DATE '2024-01-01' " +
      "AS VARCHAR) AS a, " +
      "CAST(DATE '2024-01-05' - TIMESTAMP '2024-01-01 06:00:00' AS VARCHAR) AS b")
    assert(r.getString(0) == "1 day 03:00:00")
    assert(r.getString(1) == "3 days 18:00:00")
    // struct bracket access is field extraction (probed: 42)
    val s = one("SELECT ({'key': 42, 'b': 'x'})['key'] AS k")
    assert(s.getInt(0) == 42)
    // CHAR/VARCHAR length modifiers are ignored by the reference —
    // no padding, no truncation (probed 'abcZ'/'abcdefZ')
    val c = one("SELECT CAST('abc' AS CHAR(10)) || 'Z' AS a, " +
      "CAST('abcdef' AS VARCHAR(3)) || 'Z' AS b, " +
      "CAST('abc' AS CHARACTER VARYING(2)) || 'Z' AS c, " +
      "'abc'::CHAR(10) || 'Z' AS d, CAST('ab' AS CHAR) || 'Z' AS e, " +
      "CAST('abcdef' AS BPCHAR(2)) || 'Z' AS f")
    assert((0 to 5).map(i => c.getString(i)) ==
      Seq("abcZ", "abcdefZ", "abcZ", "abcZ", "abZ", "abcdefZ"))
    // the parser-special TRIM forms survive the trim rename
    val t = one("SELECT TRIM(BOTH 'x' FROM 'xxaxx') AS a, " +
      "TRIM(LEADING 'x' FROM 'xxaxx') AS b, TRIM(TRAILING 'x' FROM 'xxaxx') AS c")
    assert(t.getString(0) == "a" && t.getString(1) == "axx" &&
      t.getString(2) == "xxa")
    // quoted-form interval keeps interval division (probed 02:00:00)
    val iv = one("SELECT CAST(INTERVAL '4 hours' / 2 AS VARCHAR) AS v")
    assert(iv.getString(0) == "02:00:00")
  }

  test("r16 TIMESTAMP_NTZ minus pairs (parquet timestamps; duck-probed)") {
    // parquet timestamp columns arrive as TIMESTAMP_NTZ — every minus
    // pairing must yield the reference's interval (probed on orders:
    // '1006 days' / '2404 days' / '-1308 days')
    val r = one("SELECT " +
      "CAST(CAST('2024-01-05 03:00:00' AS TIMESTAMP_NTZ) - DATE '2024-01-01' AS VARCHAR) AS a, " +
      "CAST(CAST('2024-01-05' AS TIMESTAMP_NTZ) - CAST('2024-01-01 06:00:00' AS TIMESTAMP_NTZ) AS VARCHAR) AS b, " +
      "CAST(DATE '2024-01-05' - CAST('2024-01-01 06:00:00' AS TIMESTAMP_NTZ) AS VARCHAR) AS c, " +
      "CAST(CAST('2024-01-05' AS TIMESTAMP_NTZ) - INTERVAL 3 DAY AS VARCHAR) AS d")
    assert(r.getString(0) == "4 days 03:00:00")
    assert(r.getString(1) == "3 days 18:00:00")
    assert(r.getString(2) == "3 days 18:00:00")
    assert(r.getString(3) == "2024-01-02 00:00:00")
  }

  test("r16 e-string hex/unicode/octal escapes (duck-probed)") {
    assert(one("SELECT e'\\x41' AS r").getString(0) == "A")
    assert(one("SELECT e'\\x4.' AS r").getString(0) == ".")
    assert(one("SELECT e'\\x' AS r").getString(0) == "x",
      "bare \\x keeps the literal x (probed)")
    assert(one("SELECT e'\\u0041' AS r").getString(0) == "A")
    assert(one("SELECT e'\\101' AS r").getString(0) == "A")
    assert(one("SELECT e'\\7' AS r").getString(0) == "")
    assert(one("SELECT e'\\18' AS r").getString(0) == "8")
    assert(one("SELECT e'\\479' AS r").getString(0) == "'9",
      "octal stops at 3 digits / first non-octal (probed)")
    // non-ASCII / malformed escapes are named errors on the reference
    for (bad <- Seq("SELECT e'\\xff'", "SELECT e'\\0'", "SELECT e'\\u004'",
      "SELECT e'\\u00e9'", "SELECT e'\\U00000041'", "SELECT e'\\uD800'"))
      intercept[Exception](one(bad))
  }

  test("concat skips NULLs and stringifies; substr edges match") {
    val r = one("SELECT concat('a', NULL, 'b') AS a, " +
      "concat('a', 1.5, DATE '1994-01-01') AS b, " +
      "substr('abcdef', 0, 3) AS c, substr('abcdef', 2, -1) AS d, " +
      "substr('abcdef', -2, 10) AS e, 'x' || NULL AS f")
    assert(r.getString(0) == "ab")
    assert(r.getString(1) == "a1.51994-01-01")
    assert(r.getString(2) == "ab", "start 0 consumes one unit of length")
    assert(r.getString(3) == "a", "negative length reaches back")
    assert(r.getString(4) == "ef")
    assert(r.isNullAt(5), "|| stays null-propagating (probed)")
  }

  test("mixed interval literals, epoch, age, interval rendering") {
    val r = one("SELECT DATE '1994-01-01' + INTERVAL '1 year 2 months 3 days' AS d, " +
      "epoch(TIMESTAMP '1970-01-02 00:00:00') AS e, " +
      "epoch(TIMESTAMP '1970-01-01 00:00:00.5') AS e2, " +
      "CAST(INTERVAL 90 MINUTE AS VARCHAR) AS iv, " +
      "CAST(INTERVAL '1 year 2 months' AS VARCHAR) AS ym, " +
      "CAST(INTERVAL '26 hours' AS VARCHAR) AS hh")
    assert(r.get(0).toString.startsWith("1995-03-04"))
    assert(r.getDouble(1) == 86400.0 && r.getDouble(2) == 0.5)
    assert(r.getString(3) == "01:30:00")
    assert(r.getString(4) == "1 year 2 months")
    assert(r.getString(5) == "26:00:00")
  }

  test("array casts: T[] targets and string parsing") {
    val r = one("SELECT TRY_CAST('[1,2]' AS INTEGER[]) AS a, " +
      "CAST([1, 2] AS BIGINT[]) AS b, TRY_CAST('nope' AS INTEGER[]) AS c")
    assert(r.getSeq[Int](0) == Seq(1, 2))
    assert(r.getSeq[Long](1) == Seq(1L, 2L))
    assert(r.isNullAt(2))
  }

  test("list comprehensions [e FOR x IN l IF c] (duck-probed)") {
    val r = one("SELECT [x*2 FOR x IN [1,2,3] IF x > 1] AS a, " +
      "[upper(s) FOR s IN split('a_b','_')] AS b, " +
      "[x * -3 - 1 FOR x IN [1]] AS c, [1, 2] AS plain")
    assert(r.getSeq[Int](0) == Seq(4, 6))
    assert(r.getSeq[String](1) == Seq("A", "B"))
    assert(r.getSeq[Int](2) == Seq(-4))
    assert(r.getSeq[Int](3) == Seq(1, 2))
  }

  test("quantified comparisons, USE, and CALL (r15 grammar census)") {
    val r = one("SELECT 3 = ANY (SELECT x FROM (VALUES (1),(3)) t(x)) AS a, " +
      "5 <> ALL (SELECT x FROM (VALUES (1),(3)) t(x)) AS b, " +
      "5 > ANY (SELECT x FROM (VALUES (1),(9)) t(x)) AS c, " +
      "5 > ALL (SELECT x FROM (VALUES (1),(3)) t(x)) AS d, " +
      "5 > ALL (SELECT x FROM (VALUES (1),(9)) t(x)) AS e, " +
      "3 = SOME (SELECT 3) AS f")
    assert(r.getBoolean(0) && r.getBoolean(1) && r.getBoolean(2))
    assert(r.getBoolean(3) && !r.getBoolean(4) && r.getBoolean(5))
    assert(SqlDialect.sql(spark, "USE main").isEmpty)
    Engine.registerAll(spark, "/root/testdata/sf0.001")
    val ti = SqlDialect.sql(spark, "CALL pragma_table_info('nation')")
    assert(ti.count() == 3)
    // CREATE TYPE carries a NAMED guardrail (census §15.1)
    val e = intercept[UnsupportedOperationException](
      SqlDialect.sql(spark, "CREATE TYPE mood AS ENUM ('a')"))
    assert(e.getMessage.contains("CREATE TYPE"))
  }

  test("TIME literal takes the engine's documented micros encoding") {
    // TypeHelpers TIME surface = LongType micros since midnight
    // (fn_time); Spark 4 has no TIME type, so the literal lowers into
    // that encoding rather than erroring
    val r = one("SELECT TIME '13:45:30' AS t")
    assert(r.getLong(0) == (13L * 3600 + 45 * 60 + 30) * 1000000L)
  }
}

package graft

/** r16 battery-tranche-5 pins — window/frame edges vs the reference's
  * segment-tree executor (duckdb-3.cpp:10800-12291), typeof names, and
  * the column-DEFAULT machinery; every expected value duck-probed on
  * the same statement text (per-case table BATTERY5_r16.json).
  */
class Battery5Spec extends SparkSpec {

  private def one(sql: String) = SqlDialect.sql(spark, sql).head()
  private def rows(sql: String) = SqlDialect.sql(spark, sql).collect()

  test("descending RANGE frames and interval RANGE bounds (probed)") {
    val r = rows("SELECT v, CAST(sum(v) OVER (ORDER BY v DESC " +
      "RANGE BETWEEN 2 PRECEDING AND CURRENT ROW) AS BIGINT) AS s " +
      "FROM (VALUES (1),(3),(4),(8)) t(v) ORDER BY v")
    assert(r.map(x => (x.getInt(0), x.getLong(1))).toSeq ==
      Seq((1, 4L), (3, 7L), (4, 4L), (8, 8L)))
    val ts = rows("SELECT ts, CAST(sum(v) OVER (ORDER BY ts RANGE BETWEEN " +
      "INTERVAL 2 HOUR PRECEDING AND INTERVAL 1 HOUR FOLLOWING) AS BIGINT) AS s " +
      "FROM (VALUES (TIMESTAMP '2024-01-01 00:00:00', 1)," +
      "(TIMESTAMP '2024-01-01 01:30:00', 2)," +
      "(TIMESTAMP '2024-01-01 02:00:00', 4)," +
      "(TIMESTAMP '2024-01-01 09:00:00', 8)) t(ts, v) ORDER BY ts")
    assert(ts.map(_.getLong(1)).toSeq == Seq(1L, 7L, 7L, 8L))
  }

  test("empty literal frames are NULL (0 for count), not errors (probed)") {
    val r = rows("SELECT v, sum(v) OVER (ORDER BY v ROWS BETWEEN 2 FOLLOWING " +
      "AND 1 FOLLOWING) AS s, CAST(count(*) OVER (ORDER BY v ROWS BETWEEN " +
      "2 FOLLOWING AND 1 FOLLOWING) AS BIGINT) AS c " +
      "FROM (VALUES (1),(2),(3)) t(v) ORDER BY v")
    assert(r.forall(_.isNullAt(1)), "empty-frame sum is NULL")
    assert(r.forall(_.getLong(2) == 0L), "empty-frame count is 0")
  }

  test("window FILTER composes with explicit frames (probed)") {
    val r = rows("SELECT v, CAST(sum(v) FILTER (WHERE v % 2 = 0) OVER " +
      "(ORDER BY v ROWS BETWEEN 1 PRECEDING AND CURRENT ROW) AS BIGINT) AS s " +
      "FROM (VALUES (1),(2),(3),(4)) t(v) ORDER BY v")
    assert(r.map(x => if (x.isNullAt(1)) -1L else x.getLong(1)).toSeq ==
      Seq(-1L, 2L, 2L, 4L))
  }

  test("nth_value nonpositive offsets are NULL; OVER () ranks (probed)") {
    val r = one("SELECT nth_value(v, 0) OVER (ORDER BY v) AS a, " +
      "nth_value(v, -1) OVER (ORDER BY v) AS b " +
      "FROM (VALUES (1)) t(v)")
    assert(r.isNullAt(0) && r.isNullAt(1))
    val rn = one("SELECT v, row_number() OVER () AS r FROM (VALUES (5)) t(v)")
    assert(rn.getInt(1) == 1)
    val rk = rows("SELECT v, CAST(rank() OVER () AS BIGINT) AS r " +
      "FROM (VALUES (1),(2)) t(v) ORDER BY v")
    assert(rk.map(_.getLong(1)).toSeq == Seq(1L, 1L),
      "constant-key rank ties every row (the reference's any-order contract)")
  }

  test("typeof renders the reference's type names (probed)") {
    val r = one("SELECT typeof(1) AS a, typeof(100000000000) AS b, " +
      "typeof('x') AS c, typeof(1.5) AS d, typeof([1,2]) AS e, " +
      "typeof({'a': 1}) AS f, typeof(CAST(1.5 AS FLOAT)) AS g, " +
      "typeof(DATE '2024-01-01') AS h")
    assert((0 to 7).map(r.getString) == Seq("INTEGER", "BIGINT", "VARCHAR",
      "DECIMAL(2,1)", "INTEGER[]", "STRUCT(a INTEGER)", "FLOAT", "DATE"))
  }

  test("column DEFAULTs: column-list INSERT, VALUES DEFAULT, DEFAULT VALUES, UPDATE (probed)") {
    val r = rows(
      """DROP TABLE IF EXISTS b5d;
        |CREATE TABLE b5d(a INT DEFAULT 7, b INT, c VARCHAR DEFAULT 'x');
        |INSERT INTO b5d(b) VALUES (1);
        |INSERT INTO b5d VALUES (DEFAULT, 2, 'y');
        |INSERT INTO b5d(b, a) VALUES (3, 30);
        |INSERT INTO b5d DEFAULT VALUES;
        |UPDATE b5d SET a = DEFAULT WHERE b = 3;
        |SELECT a, b, c FROM b5d ORDER BY b NULLS LAST""".stripMargin)
    def cell(i: Int, j: Int): Any = if (r(i).isNullAt(j)) null else r(i).get(j)
    assert(r.length == 4)
    assert((cell(0, 0), cell(0, 1), cell(0, 2)) == ((7, 1, "x")))
    assert((cell(1, 0), cell(1, 1), cell(1, 2)) == ((7, 2, "y")))
    assert((cell(2, 0), cell(2, 1), cell(2, 2)) == ((7, 3, "x")),
      "UPDATE SET a = DEFAULT restores the declared default")
    assert((cell(3, 0), cell(3, 1), cell(3, 2)) == ((7, null, "x")),
      "DEFAULT VALUES fills defaults and NULLs")
    // expression defaults + unknown-column named error
    val e = rows(
      """DROP TABLE IF EXISTS b5e;
        |CREATE TABLE b5e(x INT DEFAULT 2+3, y INT);
        |INSERT INTO b5e(y) VALUES (1);
        |SELECT x, y FROM b5e""".stripMargin)
    assert(e.head.getInt(0) == 5)
    val err = intercept[Exception](rows(
      "INSERT INTO b5e(zz) VALUES (1)"))
    assert(err.getMessage.contains("does not exist"))
  }
}

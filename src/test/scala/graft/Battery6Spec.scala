package graft

/** r16 battery-tranche-6 pins — strftime/strptime specifier long tail,
  * printf/format families, list/map/json tails, numeric misc; every
  * expected value duck-probed on the same statement text (per-case
  * table BATTERY6_r16.json).
  */
class Battery6Spec extends SparkSpec {

  private def one(sql: String) = SqlDialect.sql(spark, sql).head()

  test("strftime week-number and locale specifiers (duck-probed)") {
    val r = one("SELECT strftime(TIMESTAMP '2024-03-09 14:05:06.007', " +
      "'%a %A %b %B') AS a, strftime(DATE '2024-03-09', '%j %W %U %w') AS b, " +
      "strftime(TIMESTAMP '2024-03-09 14:05:06', '%I %p %H:%M:%S') AS c, " +
      "strftime(DATE '2024-01-01', '%G %V %u') AS d, " +
      "strftime(DATE '2023-01-01', '%G-%V-%u') AS e, " +
      "strftime(TIMESTAMP '2024-03-09 14:05:06.007', '%c|%x|%X|%z|%n') AS f")
    assert(r.getString(0) == "Sat Saturday Mar March")
    assert(r.getString(1) == "069 10 09 6")
    assert(r.getString(2) == "02 PM 14:05:06")
    assert(r.getString(3) == "2024 01 1")
    assert(r.getString(4) == "2022-52-7", "ISO year/week/dow")
    assert(r.getString(5) == "2024-03-09 14:05:06|2024-03-09|14:05:06|+00|007000000")
    intercept[Exception](one("SELECT strftime(DATE '2024-01-01', '%e') AS x"))
  }

  test("strptime: %j parses-and-discards, %f scales by width (duck-probed)") {
    val r = one("SELECT strptime('09/03/2024 14:05', '%d/%m/%Y %H:%M') AS a, " +
      "strptime('2024-068', '%Y-%j') AS b, " +
      "strptime('06.12', '%S.%f') AS c")
    assert(r.getTimestamp(0).toInstant.toString == "2024-03-09T14:05:00Z")
    assert(r.getTimestamp(1).toInstant.toString == "2024-01-01T00:00:00Z",
      "the reference discards %j (probed)")
    assert(r.getTimestamp(2).toInstant.toString.endsWith("00:00:06.120Z"),
      "fractional seconds scale by consumed width")
  }

  test("printf C conversions and format fmt-specs (duck-probed)") {
    val r = one("SELECT printf('%d|%5d|%-5d|%05.2f|%x|%s', 42, 42, 42, " +
      "3.14159, 255, 'ok') AS a, printf('%.3f|%e|%g', 2.5, 12345.678, 0.0001) AS b, " +
      "format('{} {} {:.2f} {:04d}', 'a', 7, 2.71828, 42) AS c")
    assert(r.getString(0) == "42|   42|42   |03.14|ff|ok")
    assert(r.getString(1) == "2.500|1.234568e+04|0.0001", "C %g trims zeros")
    assert(r.getString(2) == "a 7 2.72 0042")
  }

  test("format_bytes truncates at probed boundaries; even; bit_count widths") {
    val r = one("SELECT format_bytes(1126) AS a, format_bytes(1127) AS b, " +
      "format_bytes(1234567) AS c, format_bytes(1023) AS d, " +
      "format_bytes(-2048) AS e, even(2.5) AS f, even(-0.5) AS g, even(3) AS h, " +
      "bit_count(CAST(-1 AS TINYINT)) AS i, bit_count(CAST(-1 AS SMALLINT)) AS j, " +
      "bit_count(5) AS k")
    assert(r.getString(0) == "1.0 KiB" && r.getString(1) == "1.1 KiB",
      "tenths truncate, not round (probed)")
    assert(r.getString(2) == "1.1 MiB" && r.getString(3) == "1023 bytes" &&
      r.getString(4) == "-2.0 KiB")
    assert(r.getDouble(5) == 4.0 && r.getDouble(6) == -2.0 && r.getDouble(7) == 4.0)
    assert(r.getInt(8) == 8 && r.getInt(9) == 16 && r.getInt(10) == 2,
      "popcount at the input width (probed; Spark promotes to 64)")
  }

  test("dayofweek Sunday=0; date_trunc long tail returns DATE (duck-probed)") {
    val r = one("SELECT dayofweek(DATE '2024-03-09') AS a, " +
      "weekday(DATE '2024-03-10') AS b, " +
      "CAST(date_trunc('decade', DATE '2024-05-15') AS VARCHAR) AS c, " +
      "CAST(date_trunc('century', TIMESTAMP '2024-05-15 10:00:00') AS VARCHAR) AS d, " +
      "CAST(date_trunc('millennium', DATE '2024-05-15') AS VARCHAR) AS e, " +
      "CAST(date_trunc('quarter', TIMESTAMP '2024-05-15 10:30:00') AS VARCHAR) AS f, " +
      "CAST(date_trunc('hour', DATE '2024-05-15') AS VARCHAR) AS g")
    assert(r.getInt(0) == 6 && r.getInt(1) == 0, "Sunday=0 (probed; Spark 1/Mon-0)")
    assert(r.getString(2) == "2020-01-01" && r.getString(3) == "2000-01-01" &&
      r.getString(4) == "2000-01-01")
    assert(r.getString(5) == "2024-04-01", "day-or-coarser units return DATE")
    assert(r.getString(6) == "2024-05-15 00:00:00", "sub-day keeps TIMESTAMP")
  }

  test("age is the symbolic calendar decomposition (duck-probed borrows)") {
    def age(a: String, b: String): String =
      one(s"SELECT CAST(age(TIMESTAMP '$a', TIMESTAMP '$b') AS VARCHAR) AS v")
        .getString(0)
    assert(age("2024-03-10 00:00:00", "2024-02-20 00:00:00") == "19 days")
    assert(age("2024-03-31 00:00:00", "2024-01-31 00:00:00") == "2 months")
    assert(age("2024-03-01 00:00:00", "2024-01-31 00:00:00") == "1 month 1 day",
      "borrows use the earlier date's month length")
    assert(age("2024-01-10 05:00:00", "2023-12-20 10:30:00") == "20 days 18:30:00")
    assert(age("2023-01-10 00:00:00", "2024-03-15 00:00:00") ==
      "-1 year -2 months -5 days", "sign-symmetric")
    assert(age("2025-03-01 00:00:00", "2024-02-29 00:00:00") == "1 year 1 day")
  }

  test("mixed interval minus, BLOB literals, name tail (duck-probed)") {
    val r = one("SELECT CAST(INTERVAL '1 month' - INTERVAL '10 days' AS VARCHAR) AS a, " +
      "CAST(INTERVAL 1 DAY + INTERVAL 3 HOUR AS VARCHAR) AS b, " +
      "to_base64(BLOB 'abc') AS c, CAST(from_base64('YWJj') AS VARCHAR) AS d, " +
      "to_binary(5) AS e, list_reduce([1,2,3,4], (x, y) -> x + y) AS f, " +
      "list_any_value([NULL, 4, 5]) AS g, regexp_full_match('abc', '[a-c]+') AS h, " +
      "regexp_escape('a.b') AS i, json_type('[1,2]') AS j, " +
      "json_structure('{\"a\": 1, \"b\": [1.5]}') AS k, " +
      "json_merge_patch('{\"a\":1,\"b\":2}', '{\"b\":3,\"c\":4}') AS l")
    assert(r.getString(0) == "1 month -10 days")
    assert(r.getString(1) == "1 day 03:00:00")
    assert(r.getString(2) == "YWJj" && r.getString(3) == "abc")
    assert(r.getString(4) == "101")
    assert(r.getInt(5) == 10)
    assert(r.getInt(6) == 4)
    assert(r.getBoolean(7))
    assert(r.getString(8) == "a\\.b")
    assert(r.getString(9) == "ARRAY")
    assert(r.getString(10) == "{\"a\":\"UBIGINT\",\"b\":[\"DOUBLE\"]}")
    assert(r.getString(11) == "{\"a\":1,\"b\":3,\"c\":4}")
    val e = intercept[Exception](
      one("SELECT list_reduce(list_filter([1], x -> x > 5), (x, y) -> x + y) AS v"))
    assert(e.getMessage.contains("empty input list"))
  }
}

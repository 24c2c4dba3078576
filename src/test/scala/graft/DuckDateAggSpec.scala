package graft

/** r15 battery-tranche-4 pins — date-part long tail, aggregate edges,
  * struct/map function names; every value duck-probed (DuckDB 1.0) on
  * the same statement text (BATTERY4_r15.json). */
class DuckDateAggSpec extends SparkSpec {

  private def one(sql: String) = SqlDialect.sql(spark, sql).head()

  test("string_agg defaults to ',' and group_concat registers") {
    val r = one("SELECT string_agg(x) AS a, group_concat(x, '|') AS b, " +
      "string_agg(x, '') AS c FROM (VALUES ('a'),('b')) t(x)")
    assert(r.getString(0) == "a,b", "1-arg default separator is ',' (probed)")
    assert(r.getString(1) == "a|b")
    assert(r.getString(2) == "ab")
  }

  test("skewness/kurtosis are SAMPLE statistics like the reference") {
    val r = one("SELECT round(skewness(x), 6) AS a, round(kurtosis(x), 6) AS b " +
      "FROM (VALUES (1.0),(2.0),(2.0),(9.0)) t(x)")
    assert(r.getDouble(0) == 1.900104, "duck-probed sample skewness")
    assert(r.getDouble(1) == 3.708507, "duck-probed sample excess kurtosis")
  }

  test("chr handles full codepoints; day/month names are full words") {
    val r = one("SELECT chr(8364) AS a, chr(97) AS b, " +
      "dayname(DATE '1994-05-03') AS c, monthname(DATE '1994-05-03') AS d")
    assert(r.getString(0) == "€", "Spark's chr truncates to a byte (probed '¬')")
    assert(r.getString(1) == "a")
    assert(r.getString(2) == "Tuesday", "full day name (Spark's dayname is 'Tue')")
    assert(r.getString(3) == "May")
  }

  test("date_part long tail (epoch/decade/century/millennium/micros/iso)") {
    val r = one("SELECT date_part('epoch', TIMESTAMP '1970-01-02 00:00:00') AS a, " +
      "date_part('decade', DATE '1994-05-03') AS b, " +
      "date_part('century', DATE '1994-05-03') AS c, " +
      "date_part('millennium', DATE '1994-05-03') AS d, " +
      "date_part('microseconds', TIMESTAMP '1994-01-01 00:00:01.5') AS e, " +
      "date_part('milliseconds', TIMESTAMP '1994-01-01 00:00:01.5') AS f, " +
      "date_part('isodow', DATE '1994-05-03') AS g, " +
      "isoyear(DATE '1994-01-01') AS h, century(TIMESTAMP '2001-01-01 00:00:00') AS i, " +
      "date_part('year', DATE '1994-05-03') AS j")
    assert(r.getDouble(0) == 86400.0)
    assert(r.getInt(1) == 199 && r.getInt(2) == 20 && r.getInt(3) == 2)
    assert(r.getLong(4) == 1500000L, "micros WITHIN the minute (probed)")
    assert(r.getInt(5) == 1500)
    assert(r.getInt(6) == 2, "Tuesday isodow = 2")
    assert(r.getInt(7) == 1993, "ISO year of 1994-01-01 is 1993")
    assert(r.getInt(8) == 21)
    assert(r.getInt(9) == 1994, "standard fields still delegate to Spark")
  }

  test("date_diff counts boundary crossings; date_sub complete intervals") {
    val r = one("SELECT date_diff('day', DATE '1994-01-01', DATE '1994-03-01') AS a, " +
      "date_diff('month', DATE '1994-01-01', DATE '1994-03-15') AS b, " +
      "date_diff('week', DATE '1994-01-01', DATE '1994-02-01') AS c, " +
      "date_diff('year', DATE '1993-12-31', DATE '1994-01-01') AS d, " +
      "date_diff('hour', TIMESTAMP '1994-01-01 00:00:00', TIMESTAMP '1994-01-01 05:30:00') AS e, " +
      "date_sub('day', DATE '1994-01-01', DATE '1994-03-01') AS f, " +
      "date_sub('month', DATE '1994-01-15', DATE '1994-03-10') AS g")
    assert(r.getLong(0) == 59 && r.getInt(1) == 2)
    assert(r.getLong(2) == 5, "Monday boundaries crossed (probed)")
    assert(r.getInt(3) == 1, "year boundary crossing (probed)")
    assert(r.getLong(4) == 5)
    assert(r.getLong(5) == 59)
    assert(r.getLong(6) == 1, "COMPLETE months only (Jan 15 -> Mar 10)")
  }

  test("date_add with intervals; time_bucket epoch-aligned") {
    val r = one("SELECT date_add(DATE '1994-01-01', INTERVAL 5 DAY) AS a, " +
      "date_add(DATE '1994-01-01', 5) AS b, " +
      "time_bucket(INTERVAL 15 MINUTE, TIMESTAMP '1994-01-01 10:37:00') AS c, " +
      "time_bucket(INTERVAL 2 HOUR, TIMESTAMP '1994-01-01 05:30:00') AS d, " +
      "time_bucket(INTERVAL 1 MONTH, DATE '1994-05-20') AS e")
    assert(r.get(0).toString.startsWith("1994-01-06"))
    assert(r.getDate(1).toString == "1994-01-06")
    assert(r.getTimestamp(2).toString.contains("10:30:00"))
    assert(r.getTimestamp(3).toString.contains("04:00:00"))
    assert(r.getDate(4).toString == "1994-05-01")
  }

  test("struct_insert/struct_extract/row; element_at wraps map hits in a list") {
    val r = one("SELECT struct_insert({'a': 1}, b := 2).b AS a, " +
      "struct_extract({'a': 7}, 'a') AS b, row(1, 'x') AS c, " +
      "element_at(MAP {'a': 1}, 'a') AS d, element_at([10, 20], 1) AS e")
    assert(r.getInt(0) == 2)
    assert(r.getInt(1) == 7)
    assert(r.getStruct(2).getInt(0) == 1)
    assert(r.getSeq[Int](3) == Seq(1), "map element_at is a LIST on the reference")
    assert(r.getInt(4) == 10)
  }

  test("bitstring_agg, arg_min/max, product, favg, to_hex, ord") {
    val r = one("SELECT bitstring_agg(x, 0, 5) AS a, " +
      "arg_min(s, y) AS b, arg_max(s, y) AS c, " +
      "product(d) AS p, favg(d) AS f, to_hex(255) AS h, ord('A') AS o " +
      "FROM (VALUES (1, 'lo', 1, CAST(2.0 AS DOUBLE)), " +
      "(3, 'hi', 9, CAST(3.0 AS DOUBLE))) t(x, s, y, d)")
    assert(r.getString(0) == "010100", "bit positions 1 and 3 of [0,5] (probed)")
    assert(r.getString(1) == "lo" && r.getString(2) == "hi")
    assert(r.getDouble(3) == 6.0)
    assert(r.getDouble(4) == 2.5)
    assert(r.getString(5) == "FF")
    assert(r.getInt(6) == 65)
  }
}

package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Engine
import graft.functions.DuckFunctions

/** Scalar-function surface (SURVEY.md §2.8): string, math, trig,
  * date/time, conditional/cast, nested list/struct expression queries.
  * Everything stays in Catalyst builtins except the [custom] UDFs from
  * [[graft.functions.DuckFunctions]] (strip_accents, jaccard,
  * jaro_winkler, hamming, unicode).
  */
object ScalarFns {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Engine.table(s, dir, name)

  /** even(x): round away from zero to the next even integer
    * (reference: duckdb-5.cpp:16306 math list). */
  private def even(c: Column): Column = signum(c) * lit(2.0) * ceil(abs(c) / 2).cast("double")

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    "fn_string_basic" -> ((s, dir) => {
      t(s, dir, "part").select(
        col("p_partkey"),
        upper(col("p_name")).as("up_name"),
        lower(col("p_brand")).as("lo_brand"),
        substring(col("p_name"), 3, 8).as("sub_name"),
        length(col("p_name")).cast("long").as("len_name"),
        concat_ws("|", col("p_brand"), col("p_type")).as("cat"),
        lpad(col("p_brand"), 12, "*").as("lpadded"),
        rpad(col("p_brand"), 12, "#").as("rpadded"),
        trim(concat(lit("  "), col("p_name"), lit("  "))).as("trimmed"),
        regexp_replace(col("p_type"), "BRUSHED", "X").as("repl"),
        translate(col("p_brand"), "#123", "_abc").as("trans"),
        reverse(col("p_name")).as("rev"),
        expr("left(p_name, 5)").as("l5"),
        expr("right(p_name, 4)").as("r4"),
        repeat(col("p_brand"), 2).as("rep"),
        instr(col("p_name"), "a").cast("long").as("pos_a"),
        ascii(col("p_name")).cast("long").as("first_code"),
        col("p_name").startsWith("a").as("sw_a"),
        col("p_type").contains("STEEL").as("has_steel"))
    }),

    "fn_string_similarity" -> ((s, dir) => {
      // levenshtein native; jaccard/jaro_winkler/hamming/strip_accents are
      // graft UDFs (reference: duckdb-6.cpp:5993-6041)
      t(s, dir, "part").filter(col("p_partkey") <= 300).select(
        col("p_partkey"),
        levenshtein(col("p_brand"), lit("Brand#13")).cast("long").as("lev"),
        round(callUDF("jaccard", col("p_brand"), col("p_type")), 6).as("jac"),
        round(callUDF("jaro_winkler_similarity", col("p_name"), col("p_type")), 6).as("jw"),
        callUDF("hamming", expr("left(p_name, 5)"), expr("left(p_type, 5)")).as("ham"),
        callUDF("strip_accents", col("p_name")).as("plain"),
        callUDF("unicode", col("p_name")).cast("long").as("cp0"),
        md5(col("p_name")).as("md5h"),
        base64(encode(col("p_name"), "UTF-8")).as("b64"))
    }),

    "fn_string_pattern" -> ((s, dir) => {
      t(s, dir, "part").select(
        col("p_partkey"),
        regexp_extract(col("p_type"), "([A-Z]+) ([A-Z]+)", 2).as("second_word"),
        regexp_replace(col("p_name"), "[aeiou]", "_").as("devoweled"),
        col("p_type").rlike("^STANDARD").as("re_std"),
        col("p_type").like("%BRASS%").as("like_brass"),
        col("p_type").ilike("%brass%").as("ilike_brass"),
        col("p_name").rlike(DuckFunctions.globToRegex("a*")).as("glob_a"),
        size(split(col("p_name"), " ", -1)).cast("long").as("n_tokens"))
    }),

    "fn_math" -> ((s, dir) => {
      t(s, dir, "lineitem").filter(col("l_orderkey") <= 200).select(
        col("l_orderkey"), col("l_linenumber").cast("long").as("l_linenumber"),
        abs(col("l_quantity") - 25).as("a"),
        ceil(col("l_extendedprice") / 1000).cast("double").as("c"),
        floor(col("l_extendedprice") / 1000).cast("double").as("f"),
        round(col("l_extendedprice") / 7, 3).as("r3"),
        round(sqrt(col("l_quantity")), 8).as("sq"),
        round(exp(col("l_discount")), 8).as("ex"),
        round(log(col("l_extendedprice")), 8).as("lnp"),
        round(log2(col("l_quantity")), 8).as("lg2"),
        round(log(10.0, col("l_extendedprice")), 8).as("lg10"),
        round(pow(col("l_quantity"), 2), 4).as("p2"),
        round(cbrt(col("l_quantity")), 6).as("cb"),
        signum(col("l_quantity") - 25).as("sg"),
        even(col("l_quantity") / 3).as("ev"),
        factorial(col("l_linenumber")).cast("long").as("fact"),
        shiftleft(col("l_suppkey"), 2).as("shl"),
        shiftright(col("l_suppkey"), 1).as("shr"),
        col("l_suppkey").bitwiseAND(lit(255L)).as("band"),
        col("l_suppkey").bitwiseOR(lit(16L)).as("bor"),
        col("l_suppkey").bitwiseXOR(lit(85L)).as("bxor"),
        expr("~l_suppkey").as("bnot"))
    }),

    "fn_trig" -> ((s, dir) => {
      t(s, dir, "lineitem").filter(col("l_orderkey") <= 100).select(
        col("l_orderkey"), col("l_linenumber").cast("long").as("l_linenumber"),
        round(sin(col("l_quantity")), 8).as("sn"),
        round(cos(col("l_quantity")), 8).as("cs"),
        round(tan(col("l_discount")), 8).as("tn"),
        round(asin(col("l_discount")), 8).as("asn"),
        round(acos(col("l_discount")), 8).as("acs"),
        round(atan(col("l_quantity")), 8).as("atn"),
        round(atan2(col("l_quantity"), col("l_extendedprice")), 8).as("at2"),
        round(degrees(col("l_discount")), 8).as("dg"),
        round(radians(col("l_quantity")), 8).as("rd"),
        round(lit(1.0) / tan(col("l_quantity")), 8).as("cot"))
    }),

    "fn_datetime" -> ((s, dir) => {
      val ts = col("o_orderdate")
      t(s, dir, "orders").filter(col("o_orderkey") <= 500).select(
        col("o_orderkey"),
        year(ts).cast("long").as("y"),
        month(ts).cast("long").as("mo"),
        dayofmonth(ts).cast("long").as("d"),
        quarter(ts).cast("long").as("q"),
        hour(ts).cast("long").as("h"),
        minute(ts).cast("long").as("mi"),
        second(ts).cast("long").as("sec"),
        (dayofweek(ts) - 1).cast("long").as("dow"),          // Sunday=0 (reference semantics)
        (weekday(ts) + 1).cast("long").as("isodow"),          // Monday=1
        dayofyear(ts).cast("long").as("doy"),
        weekofyear(ts).cast("long").as("wk"),
        ts.cast("timestamp").cast("double").as("epoch_s"),
        to_date(date_trunc("month", ts)).as("trunc_month"),
        date_trunc("hour", ts).as("trunc_hour"),
        last_day(ts.cast("date")).as("lastday"),
        datediff(lit("1998-01-01").cast("date"), ts.cast("date")).cast("long").as("ddiff"),
        date_format(ts, "EEEE").as("dname"),
        date_format(ts, "MMMM").as("mname"),
        DuckFunctions.strftime(ts, "%Y/%m/%d %H:%M").as("fmt"),
        (ts + expr("INTERVAL 3 MONTH")).as("plus3mo"),
        DuckFunctions.timeBucket(86400L * 7, ts).as("wbucket"))
    }),

    "fn_conditional" -> ((s, dir) => {
      t(s, dir, "orders").select(
        col("o_orderkey"),
        when(col("o_totalprice") > 300000, "big")
          .when(col("o_totalprice") > 150000, "mid")
          .otherwise("small").as("size_class"),
        nullif(col("o_orderstatus"), lit("O")).as("nn_status"),
        coalesce(nullif(col("o_orderstatus"), lit("O")), lit("open")).as("coal"),
        greatest(col("o_totalprice"), lit(150000.0)).as("gr"),
        least(col("o_totalprice"), lit(150000.0)).as("le"),
        (col("o_orderstatus") === "F" || col("o_totalprice") < 1000).as("flag"),
        round(col("o_totalprice")).cast("long").as("price_int"),
        col("o_orderkey").cast("string").as("key_str"),
        expr("try_cast(o_orderstatus AS INT)").as("bad_cast"),
        col("o_totalprice").cast("int").cast("double").as("price_trunc"))
    }),

    "fn_nested_list" -> ((s, dir) => {
      // nested/HOF surface; list outputs are rendered with array_join —
      // the driver's canonical compare cannot sort list columns
      val base = t(s, dir, "lineitem").groupBy(col("l_returnflag"))
        .agg(sort_array(collect_set(col("l_linenumber").cast("long"))).as("arr"))
      base.select(
        col("l_returnflag"), array_join(col("arr"), ",").as("arr_s"),
        array_join(transform(col("arr"), x => x * 2), ",").as("arr2"),
        array_join(filter(col("arr"), x => x % 2 === 0), ",").as("evens"),
        array_join(slice(col("arr"), 2, 3), ",").as("sl"),
        array_contains(col("arr"), 3L).as("has3"),
        array_position(col("arr"), 4L).cast("long").as("pos4"),
        element_at(col("arr"), 2).as("el2"),
        array_join(flatten(array(col("arr"), array(lit(99L)))), ",").as("flat"),
        aggregate(col("arr"), lit(0L), (a, x) => a + x).as("tot"),
        size(col("arr")).cast("long").as("sz"),
        array_join(sequence(lit(1L), lit(5L)), ",").as("seq"))
    }),

    "fn_struct" -> ((s, dir) => {
      // struct_pack + struct_extract round-trip; final columns are the
      // extracted scalars (driver compare cannot sort struct columns)
      val n = t(s, dir, "nation"); val r = t(s, dir, "region")
      n.join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
        .groupBy(col("r_name"))
        .agg(min(col("n_name")).as("lo"), max(col("n_name")).as("hi"),
          count(lit(1)).as("n"))
        .select(col("r_name"),
          struct(col("lo"), col("hi"), col("n")).as("s"))
        .select(col("r_name"),
          col("s").getField("lo").as("s_lo"),
          col("s").getField("hi").as("s_hi"),
          col("s").getField("n").as("s_n"))
    })
  )

  val oracle: Map[String, String] = Map(
    "fn_string_basic" ->
      """SELECT p_partkey, upper(p_name) AS up_name, lower(p_brand) AS lo_brand,
        |  substring(p_name, 3, 8) AS sub_name, length(p_name) AS len_name,
        |  concat_ws('|', p_brand, p_type) AS cat,
        |  lpad(p_brand, 12, '*') AS lpadded, rpad(p_brand, 12, '#') AS rpadded,
        |  trim('  ' || p_name || '  ') AS trimmed,
        |  replace(p_type, 'BRUSHED', 'X') AS repl,
        |  translate(p_brand, '#123', '_abc') AS trans,
        |  reverse(p_name) AS rev, left(p_name, 5) AS l5, right(p_name, 4) AS r4,
        |  repeat(p_brand, 2) AS rep, instr(p_name, 'a') AS pos_a,
        |  CAST(ascii(p_name) AS BIGINT) AS first_code,
        |  starts_with(p_name, 'a') AS sw_a, contains(p_type, 'STEEL') AS has_steel
        |FROM part""".stripMargin,

    "fn_string_similarity" ->
      """SELECT p_partkey,
        |  levenshtein(p_brand, 'Brand#13') AS lev,
        |  round(jaccard(p_brand, p_type), 6) AS jac,
        |  round(jaro_winkler_similarity(p_name, p_type), 6) AS jw,
        |  hamming(left(p_name, 5), left(p_type, 5)) AS ham,
        |  strip_accents(p_name) AS plain,
        |  CAST(unicode(p_name) AS BIGINT) AS cp0,
        |  md5(p_name) AS md5h,
        |  base64(encode(p_name)) AS b64
        |FROM part WHERE p_partkey <= 300""".stripMargin,

    "fn_string_pattern" ->
      """SELECT p_partkey,
        |  regexp_extract(p_type, '([A-Z]+) ([A-Z]+)', 2) AS second_word,
        |  regexp_replace(p_name, '[aeiou]', '_', 'g') AS devoweled,
        |  regexp_matches(p_type, '^STANDARD') AS re_std,
        |  p_type LIKE '%BRASS%' AS like_brass,
        |  p_type ILIKE '%brass%' AS ilike_brass,
        |  p_name GLOB 'a*' AS glob_a,
        |  len(string_split(p_name, ' ')) AS n_tokens
        |FROM part""".stripMargin,

    "fn_math" ->
      """SELECT l_orderkey, CAST(l_linenumber AS BIGINT) AS l_linenumber,
        |  abs(l_quantity - 25) AS a,
        |  ceil(l_extendedprice / 1000) AS c, floor(l_extendedprice / 1000) AS f,
        |  round(l_extendedprice / 7, 3) AS r3,
        |  round(sqrt(l_quantity), 8) AS sq, round(exp(l_discount), 8) AS ex,
        |  round(ln(l_extendedprice), 8) AS lnp, round(log2(l_quantity), 8) AS lg2,
        |  round(log10(l_extendedprice), 8) AS lg10,
        |  round(pow(l_quantity, 2), 4) AS p2, round(cbrt(l_quantity), 6) AS cb,
        |  CAST(sign(l_quantity - 25) AS DOUBLE) AS sg,
        |  even(l_quantity / 3) AS ev,
        |  CAST(factorial(l_linenumber) AS BIGINT) AS fact,
        |  l_suppkey << 2 AS shl, l_suppkey >> 1 AS shr,
        |  l_suppkey & 255 AS band, l_suppkey | 16 AS bor,
        |  xor(l_suppkey, 85) AS bxor, ~l_suppkey AS bnot
        |FROM lineitem WHERE l_orderkey <= 200""".stripMargin,

    "fn_trig" ->
      """SELECT l_orderkey, CAST(l_linenumber AS BIGINT) AS l_linenumber,
        |  round(sin(l_quantity), 8) AS sn, round(cos(l_quantity), 8) AS cs,
        |  round(tan(l_discount), 8) AS tn, round(asin(l_discount), 8) AS asn,
        |  round(acos(l_discount), 8) AS acs, round(atan(l_quantity), 8) AS atn,
        |  round(atan2(l_quantity, l_extendedprice), 8) AS at2,
        |  round(degrees(l_discount), 8) AS dg, round(radians(l_quantity), 8) AS rd,
        |  round(cot(l_quantity), 8) AS cot
        |FROM lineitem WHERE l_orderkey <= 100""".stripMargin,

    "fn_datetime" ->
      """SELECT o_orderkey,
        |  year(o_orderdate) AS y, month(o_orderdate) AS mo,
        |  day(o_orderdate) AS d, quarter(o_orderdate) AS q,
        |  hour(o_orderdate) AS h, minute(o_orderdate) AS mi,
        |  second(o_orderdate) AS sec,
        |  dayofweek(o_orderdate) AS dow, isodow(o_orderdate) AS isodow,
        |  dayofyear(o_orderdate) AS doy, week(o_orderdate) AS wk,
        |  epoch(o_orderdate) AS epoch_s,
        |  date_trunc('month', o_orderdate) AS trunc_month,
        |  date_trunc('hour', o_orderdate) AS trunc_hour,
        |  last_day(o_orderdate) AS lastday,
        |  date_diff('day', CAST(o_orderdate AS DATE), DATE '1998-01-01') AS ddiff,
        |  dayname(o_orderdate) AS dname, monthname(o_orderdate) AS mname,
        |  strftime(o_orderdate, '%Y/%m/%d %H:%M') AS fmt,
        |  o_orderdate + INTERVAL 3 MONTH AS plus3mo,
        |  CAST(to_timestamp(floor(epoch(o_orderdate) / 604800) * 604800) AS TIMESTAMP) AS wbucket
        |FROM orders WHERE o_orderkey <= 500""".stripMargin,

    "fn_conditional" ->
      """SELECT o_orderkey,
        |  CASE WHEN o_totalprice > 300000 THEN 'big'
        |       WHEN o_totalprice > 150000 THEN 'mid' ELSE 'small' END AS size_class,
        |  nullif(o_orderstatus, 'O') AS nn_status,
        |  coalesce(nullif(o_orderstatus, 'O'), 'open') AS coal,
        |  greatest(o_totalprice, 150000.0) AS gr,
        |  least(o_totalprice, 150000.0) AS le,
        |  (o_orderstatus = 'F' OR o_totalprice < 1000) AS flag,
        |  CAST(round(o_totalprice) AS BIGINT) AS price_int,
        |  CAST(o_orderkey AS VARCHAR) AS key_str,
        |  TRY_CAST(o_orderstatus AS INT) AS bad_cast,
        |  CAST(CAST(trunc(o_totalprice) AS INT) AS DOUBLE) AS price_trunc
        |FROM orders""".stripMargin,

    "fn_nested_list" ->
      """WITH b AS (
        |  SELECT l_returnflag,
        |    list_sort(list(DISTINCT CAST(l_linenumber AS BIGINT))) AS arr
        |  FROM lineitem GROUP BY l_returnflag)
        |SELECT l_returnflag, array_to_string(arr, ',') AS arr_s,
        |  array_to_string(list_transform(arr, x -> x * 2), ',') AS arr2,
        |  array_to_string(list_filter(arr, x -> x % 2 = 0), ',') AS evens,
        |  array_to_string(list_slice(arr, 2, 4), ',') AS sl,
        |  list_contains(arr, 3) AS has3,
        |  CAST(list_position(arr, 4) AS BIGINT) AS pos4,
        |  arr[2] AS el2,
        |  array_to_string(flatten([arr, [CAST(99 AS BIGINT)]]), ',') AS flat,
        |  CAST(list_aggregate(arr, 'sum') AS BIGINT) AS tot,
        |  len(arr) AS sz,
        |  array_to_string(generate_series(CAST(1 AS BIGINT), CAST(5 AS BIGINT)), ',') AS seq
        |FROM b""".stripMargin,

    "fn_struct" ->
      """WITH b AS (
        |  SELECT r_name,
        |    struct_pack(lo := min(n_name), hi := max(n_name), n := count(*)) AS s
        |  FROM nation JOIN region ON n_regionkey = r_regionkey
        |  GROUP BY r_name)
        |SELECT r_name,
        |  struct_extract(s, 'lo') AS s_lo,
        |  struct_extract(s, 'hi') AS s_hi,
        |  CAST(struct_extract(s, 'n') AS BIGINT) AS s_n
        |FROM b""".stripMargin
  )
}

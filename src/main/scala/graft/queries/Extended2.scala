package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Engine

/** Second extended batch: constructor/interval date functions, JSON
  * property extraction (events.props), discrete quantiles + sem,
  * LIKE-ESCAPE, dynamic list_aggregate dispatch.
  */
object Extended2 {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Engine.table(s, dir, name)

  /** list_aggregate(name) dynamic dispatch (reference:
    * duckdb-5.cpp:16351 nested list; the name selects the aggregate). */
  def listAggregate(arr: Column, name: String): Column = name match {
    case "sum" => aggregate(arr, lit(0.0), (a, x) => a + x)
    case "avg" => aggregate(arr, lit(0.0), (a, x) => a + x) / size(arr)
    case "min" => array_min(arr)
    case "max" => array_max(arr)
    case "count" => size(arr).cast("long")
    case other => throw new IllegalArgumentException(s"unsupported list aggregate: $other")
  }

  /** bar(x, min, max, width): unicode bar chart (duckdb-5.cpp:12022
    * generic list) — full blocks + one partial block char, right-padded
    * with spaces to `width` UTF-8 BYTES (reference quirk: the pad target
    * counts bytes, so multi-byte block chars usually exceed it; verified
    * char-exact vs the reference over a 400-value sweep). */
  def bar(x: Double, lo: Double, hi: Double, width: Double): String = {
    if (x.isNaN || hi <= lo) return ""
    // Mirror the oracle's fp operation order exactly: w = width*(x-lo)/(hi-lo)
    // clamped to [0,width], then eighth-blocks from int(w*8) — a different
    // order can pick a different partial-block char at boundary values.
    val w = math.max(0.0, math.min(width, width * (x - lo) / (hi - lo)))
    val wi = (w * 8).toInt
    val full = wi / 8
    val rem = wi % 8
    val partials = " ▏▎▍▌▋▊▉"
    val s = "█" * full + (if (rem > 0) partials(rem).toString else "")
    val bytes = s.getBytes(java.nio.charset.StandardCharsets.UTF_8).length
    s + " " * math.max(0, width.toInt - bytes)
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    "fn_datetime_make" -> ((s, dir) => {
      val ts = col("o_orderdate")
      t(s, dir, "orders").filter(col("o_orderkey") <= 300).select(
        col("o_orderkey"),
        make_date(year(ts), month(ts), dayofmonth(ts)).as("made_date"),
        make_timestamp(year(ts), month(ts), dayofmonth(ts),
          hour(ts), minute(ts), lit(0).cast("decimal(8,6)")).as("made_ts"),
        unix_millis(ts.cast("timestamp")).as("epoch_ms"),
        date_add(ts.cast("date"), 30).as("plus30d"),
        (ts - expr("INTERVAL 90 DAY")).as("minus90d"),
        // month-boundary count (reference date_diff('month') semantics,
        // NOT months_between's fractional months)
        ((lit(1998) - year(ts)) * 12 + (lit(1) - month(ts))).cast("long").as("months_to_98"))
    }),

    "fn_json_props" -> ((s, dir) => {
      // events.props is a JSON string (reference treats JSON as an
      // extension; Spark has it native)
      t(s, dir, "events")
        .withColumn("k", get_json_object(col("props"), "$.k").cast("long"))
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"), sum(col("k")).as("sum_k"),
          min(col("k")).as("min_k"), max(col("k")).as("max_k"))
    }),

    "agg_quantile_disc_sem" -> ((s, dir) => {
      t(s, dir, "lineitem").groupBy(col("l_linestatus")).agg(
        expr("percentile_disc(0.5) WITHIN GROUP (ORDER BY l_extendedprice)").as("med_disc"),
        expr("percentile_disc(0.9) WITHIN GROUP (ORDER BY l_quantity)").as("p90_disc"),
        round((stddev_pop(col("l_quantity")) / sqrt(count(col("l_quantity")))), 8).as("sem_qty"))
    }),

    "fn_math_special" -> ((s, dir) => {
      // nextafter / signbit / gamma / lgamma (graft UDFs vs reference
      // natives); gamma kept to small args so rounding parity holds
      t(s, dir, "lineitem").filter(col("l_orderkey") <= 100).select(
        col("l_orderkey"), col("l_linenumber").cast("long").as("l_linenumber"),
        callUDF("nextafter", col("l_discount"), lit(1.0)).as("nxt"),
        callUDF("signbit", col("l_quantity") - 25.0).as("sb"),
        round(callUDF("gamma", col("l_linenumber").cast("double")), 6).as("gam"),
        round(callUDF("lgamma", col("l_quantity")), 8).as("lgam"))
    }),

    "agg_approx_quantile" -> ((s, dir) => {
      // approx_quantile analog (reference: holistic list,
      // duckdb-5.cpp:12-17). Sketches differ across engines, so the
      // oracle checks the sketch CONTRACT: each engine's own estimate
      // must sit within 2% (relative, price) / ±1 unit (discrete
      // quantity) of the exact interpolated quantile, which itself IS
      // cross-engine comparable
      t(s, dir, "lineitem").groupBy(col("l_returnflag")).agg(
        round(expr("percentile(l_extendedprice, 0.5)"), 4).as("exact_med"),
        (abs(percentile_approx(col("l_extendedprice"), lit(0.5), lit(1000))
          - expr("percentile(l_extendedprice, 0.5)"))
          <= expr("percentile(l_extendedprice, 0.5)") * 0.02).as("med_ok"),
        (abs(percentile_approx(col("l_quantity"), lit(0.1), lit(1000))
          - expr("percentile(l_quantity, 0.1)")) <= 1.0).as("p10_ok"),
        (abs(percentile_approx(col("l_quantity"), lit(0.9), lit(1000))
          - expr("percentile(l_quantity, 0.9)")) <= 1.0).as("p90_ok"))
    }),

    "fn_typeof" -> ((s, dir) => {
      // typeof (generic fn list, duckdb-5.cpp:12022) via schema
      // reflection, reported in the reference's type names
      def duckName(dt: org.apache.spark.sql.types.DataType): String = dt.sql match {
        case "STRING" => "VARCHAR"
        case "INT" => "INTEGER"
        case "TIMESTAMP_NTZ" => "TIMESTAMP"
        case other => other
      }
      val l = t(s, dir, "lineitem")
      val cols = Seq("l_orderkey", "l_linenumber", "l_quantity", "l_returnflag", "l_shipdate")
      import s.implicits._
      cols.map(c => (c, duckName(l.schema(c).dataType))).toDF("col_name", "type_name")
    }),

    "dedup_fuzzy_names" -> ((s, dir) => {
      // thresholded fuzzy matching with the banded-Levenshtein codegen
      // expression (plans.LevenshteinWithin) vs the oracle's full
      // levenshtein comparison
      graft.functions.DuckFunctions.register(s)
      val a = t(s, dir, "supplier").select(col("s_suppkey").as("id_a"), col("s_name").as("n_a"))
      val b = t(s, dir, "supplier").select(col("s_suppkey").as("id_b"), col("s_name").as("n_b"))
      a.crossJoin(b).filter(col("id_a") < col("id_b"))
        .select(col("id_a"), col("id_b"),
          expr("levenshtein_within(n_a, n_b, 2)").as("within2"))
        .groupBy(col("within2")).agg(count(lit(1)).as("n_pairs"))
    }),

    "fn_string_split2" -> ((s, dir) => {
      // string_split_regex + trim-with-chars (reference duckdb-6.cpp:5993)
      t(s, dir, "part").select(
        col("p_partkey"),
        array_join(split(col("p_type"), "[ ]+", -1), "|").as("words"),
        size(split(col("p_name"), "[aeiou]+", -1)).cast("long").as("n_vowel_splits"),
        expr("trim(BOTH 'SD' FROM p_type)").as("trimmed_chars"),
        expr("ltrim('ST', p_type)").as("ltrimmed"),
        substring_index(col("p_type"), " ", 1).as("first_word"))
    }),

    "fn_printf_chr" -> ((s, dir) => {
      // printf → format_string (C-style dialect shared with the
      // reference), chr, position
      t(s, dir, "nation").select(
        col("n_nationkey").cast("long").as("nk"),
        format_string("%d|%s", col("n_nationkey"), col("n_name")).as("tagged"),
        expr("char(65 + n_nationkey % 26)").as("letter"),
        expr("position('a' IN n_name)").cast("long").as("pos_a"),
        concat_ws("", reverse(split(col("n_name"), "")), lit("!")).as("rev_bang"))
    }),

    "fn_like_escape" -> ((s, dir) => {
      // LIKE … ESCAPE (reference like_escape, duckdb-6.cpp:5993)
      t(s, dir, "part").select(
        col("p_partkey"),
        expr("p_type LIKE '%!%%' ESCAPE '!'").as("has_pct"),
        expr("p_name LIKE '%a!_%' ESCAPE '!'").as("has_underscore"),
        expr("p_type LIKE 'STANDARD%'").as("std"))
    }),

    "join_asof_backward" -> ((s, dir) => {
      // for each view event, the most recent click by the same user
      val ev = t(s, dir, "events")
      val views = ev.filter(col("event_type") === "view")
        .select(col("event_id"), col("user_id"), col("ts"))
      val clicks = ev.filter(col("event_type") === "click")
        .select(col("user_id"), col("ts"), col("value"))
      graft.operators.AsofJoin.lastValueBefore(
        views, clicks, "user_id", "ts", "value", "prev_click")
        .select(col("event_id"), col("user_id"),
          round(col("prev_click"), 2).as("prev_click_value"))
    }),

    "join_asof_forward" -> ((s, dir) => {
      // for each view event, the next click by the same user at or after
      // it (reference ASOF's other inequality direction)
      val ev = t(s, dir, "events")
      val views = ev.filter(col("event_type") === "view")
        .select(col("event_id"), col("user_id"), col("ts"))
      val clicks = ev.filter(col("event_type") === "click")
        .select(col("user_id"), col("ts"), col("value"))
      graft.operators.AsofJoin.firstValueAfter(
        views, clicks, "user_id", "ts", "value", "next_click")
        .select(col("event_id"), col("user_id"),
          round(col("next_click"), 2).as("next_click_value"))
    }),

    "tpch_q18ish" -> ((s, dir) => {
      // large-order shape: join + GROUP BY + HAVING + top-k
      val o = t(s, dir, "orders"); val l = t(s, dir, "lineitem")
      o.join(l, col("o_orderkey") === col("l_orderkey"))
        .groupBy(col("o_orderkey"))
        .agg(round(sum(col("l_quantity")), 2).as("total_qty"),
          round(first(col("o_totalprice")), 2).as("price"))
        .filter(col("total_qty") > 150)
        .orderBy(col("total_qty").desc, col("o_orderkey").asc)
        .limit(20)
    }),

    "tpch_q2ish" -> ((s, dir) => {
      // min-cost-per-part shape: correlated scalar MIN subquery
      Engine.registerAll(s, dir)
      s.sql(
        """SELECT l1.l_partkey, l1.l_suppkey, l1.l_extendedprice
          |FROM lineitem l1
          |WHERE l1.l_extendedprice = (SELECT min(l2.l_extendedprice)
          |  FROM lineitem l2 WHERE l2.l_partkey = l1.l_partkey)""".stripMargin)
    }),

    "tpch_q7ish" -> ((s, dir) => {
      // nation-pair volume shape: two dimension roles + OR pair filter
      val l = t(s, dir, "lineitem"); val o = t(s, dir, "orders")
      val su = broadcast(t(s, dir, "supplier")); val c = broadcast(t(s, dir, "customer"))
      val n1 = broadcast(t(s, dir, "nation").select(
        col("n_nationkey").as("s_nk"), col("n_name").as("supp_nation")))
      val n2 = broadcast(t(s, dir, "nation").select(
        col("n_nationkey").as("c_nk"), col("n_name").as("cust_nation")))
      l.join(o, col("l_orderkey") === col("o_orderkey"))
        .join(su, col("l_suppkey") === col("s_suppkey"))
        .join(c, col("o_custkey") === col("c_custkey"))
        .join(n1, col("s_nationkey") === col("s_nk"))
        .join(n2, col("c_nationkey") === col("c_nk"))
        .filter((col("s_nk") === 1 && col("c_nk") === 2) ||
          (col("s_nk") === 2 && col("c_nk") === 1))
        .groupBy(col("supp_nation"), col("cust_nation"),
          year(col("l_shipdate")).cast("long").as("yr"))
        .agg(round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 2).as("revenue"),
          count(lit(1)).as("n"))
    }),

    "join_range_autorewrite" -> ((s, dir) => {
      // the SAME plain inequality join as join_range_inequality, but with
      // the RangeJoinRule active: the optimizer itself rewrites it to the
      // bucketed equi-join (plans.RangeJoinRule)
      graft.functions.DuckFunctions.register(s)
      s.conf.set("spark.graft.rangeJoin.bucketWidth", "10.0")
      val su = t(s, dir, "supplier"); val c = t(s, dir, "customer")
      su.join(c, col("c_acctbal") > col("s_acctbal") - 10.0 &&
        col("c_acctbal") <= col("s_acctbal"))
        .groupBy(col("s_suppkey")).agg(count(lit(1)).as("n_in_band"))
    }),

    "join_range_bucketed" -> ((s, dir) => {
      // same semantics as join_range_inequality, but via the bucketed
      // equi-join plan (RangeJoin) — one shuffle instead of BNLJ
      val su = t(s, dir, "supplier")
        .withColumn("lo", col("s_acctbal") - 10.0)
        .withColumn("hi", col("s_acctbal"))
      val c = t(s, dir, "customer")
      graft.operators.RangeJoin.pointInRange(c, "c_acctbal", su, "lo", "hi", 10.0)
        .groupBy(col("s_suppkey")).agg(count(lit(1)).as("n_in_band"))
    }),

    "stream_stateful_totals" -> ((s, dir) => {
      // flatMapGroupsWithState custom state, driven by a real streaming
      // run (update mode, one emission per user in the single batch)
      graft.streaming.EventStreams.runToBatchAppend(
        s, dir, s"st_${System.nanoTime()}",
        graft.streaming.EventStreams.statefulUserTotals, mode = "update")
        .select(col("user_id"), col("n_events"),
          round(col("total_value"), 2).as("total_value"))
    }),

    "fn_list_aggregate" -> ((s, dir) => {
      val base = t(s, dir, "lineitem").filter(col("l_orderkey") <= 2000)
        .groupBy(col("l_orderkey"))
        .agg(sort_array(collect_list(col("l_quantity"))).as("arr"))
      base.select(
        col("l_orderkey"),
        round(listAggregate(col("arr"), "sum"), 2).as("l_sum"),
        round(listAggregate(col("arr"), "avg"), 6).as("l_avg"),
        listAggregate(col("arr"), "min").as("l_min"),
        listAggregate(col("arr"), "max").as("l_max"),
        listAggregate(col("arr"), "count").as("l_n"))
    })
  )

  val oracle: Map[String, String] = Map(
    "fn_datetime_make" ->
      """SELECT o_orderkey,
        |  make_date(CAST(year(o_orderdate) AS INT), CAST(month(o_orderdate) AS INT),
        |    CAST(day(o_orderdate) AS INT)) AS made_date,
        |  make_timestamp(CAST(year(o_orderdate) AS BIGINT), month(o_orderdate),
        |    day(o_orderdate), hour(o_orderdate), minute(o_orderdate), 0.0) AS made_ts,
        |  epoch_ms(o_orderdate) AS epoch_ms,
        |  CAST(o_orderdate AS DATE) + 30 AS plus30d,
        |  o_orderdate - INTERVAL 90 DAY AS minus90d,
        |  CAST(date_diff('month', CAST(o_orderdate AS DATE), DATE '1998-01-01') AS BIGINT)
        |    AS months_to_98
        |FROM orders WHERE o_orderkey <= 300""".stripMargin,

    "fn_json_props" ->
      """SELECT event_type, count(*) AS n,
        |  CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
        |  min(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS min_k,
        |  max(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS max_k
        |FROM events GROUP BY event_type""".stripMargin,

    "agg_quantile_disc_sem" ->
      """SELECT l_linestatus,
        |  quantile_disc(l_extendedprice, 0.5) AS med_disc,
        |  quantile_disc(l_quantity, 0.9) AS p90_disc,
        |  round(sem(l_quantity), 8) AS sem_qty
        |FROM lineitem GROUP BY l_linestatus""".stripMargin,

    "fn_math_special" ->
      """SELECT l_orderkey, CAST(l_linenumber AS BIGINT) AS l_linenumber,
        |  nextafter(l_discount, 1.0) AS nxt,
        |  signbit(l_quantity - 25.0) AS sb,
        |  round(gamma(CAST(l_linenumber AS DOUBLE)), 6) AS gam,
        |  round(lgamma(l_quantity), 8) AS lgam
        |FROM lineitem WHERE l_orderkey <= 100""".stripMargin,

    "agg_approx_quantile" ->
      """SELECT l_returnflag,
        |  round(quantile_cont(l_extendedprice, 0.5), 4) AS exact_med,
        |  abs(approx_quantile(l_extendedprice, 0.5) - quantile_cont(l_extendedprice, 0.5))
        |    <= quantile_cont(l_extendedprice, 0.5) * 0.02 AS med_ok,
        |  abs(approx_quantile(l_quantity, 0.1) - quantile_cont(l_quantity, 0.1)) <= 1.0 AS p10_ok,
        |  abs(approx_quantile(l_quantity, 0.9) - quantile_cont(l_quantity, 0.9)) <= 1.0 AS p90_ok
        |FROM lineitem GROUP BY l_returnflag""".stripMargin,

    "fn_typeof" ->
      """SELECT col_name, type_name FROM (VALUES
        |  ('l_orderkey', typeof((SELECT l_orderkey FROM lineitem LIMIT 1))),
        |  ('l_linenumber', typeof((SELECT l_linenumber FROM lineitem LIMIT 1))),
        |  ('l_quantity', typeof((SELECT l_quantity FROM lineitem LIMIT 1))),
        |  ('l_returnflag', typeof((SELECT l_returnflag FROM lineitem LIMIT 1))),
        |  ('l_shipdate', typeof((SELECT l_shipdate FROM lineitem LIMIT 1)))
        |) AS v(col_name, type_name)""".stripMargin,

    "dedup_fuzzy_names" ->
      """SELECT levenshtein(a.s_name, b.s_name) <= 2 AS within2,
        |  count(*) AS n_pairs
        |FROM supplier a JOIN supplier b ON a.s_suppkey < b.s_suppkey
        |GROUP BY 1""".stripMargin,

    "fn_string_split2" ->
      """SELECT p_partkey,
        |  array_to_string(string_split_regex(p_type, '[ ]+'), '|') AS words,
        |  len(string_split_regex(p_name, '[aeiou]+')) AS n_vowel_splits,
        |  trim(p_type, 'SD') AS trimmed_chars,
        |  ltrim(p_type, 'ST') AS ltrimmed,
        |  string_split(p_type, ' ')[1] AS first_word
        |FROM part""".stripMargin,

    "fn_printf_chr" ->
      """SELECT CAST(n_nationkey AS BIGINT) AS nk,
        |  printf('%d|%s', n_nationkey, n_name) AS tagged,
        |  chr(65 + n_nationkey % 26) AS letter,
        |  CAST(position('a' IN n_name) AS BIGINT) AS pos_a,
        |  reverse(n_name) || '!' AS rev_bang
        |FROM nation""".stripMargin,

    "fn_like_escape" ->
      """SELECT p_partkey,
        |  like_escape(p_type, '%!%%', '!') AS has_pct,
        |  like_escape(p_name, '%a!_%', '!') AS has_underscore,
        |  p_type LIKE 'STANDARD%' AS std
        |FROM part""".stripMargin,

    "join_asof_backward" ->
      """SELECT v.event_id, v.user_id, round(c.value, 2) AS prev_click_value
        |FROM (SELECT * FROM events WHERE event_type = 'view') v
        |ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c
        |  ON v.user_id = c.user_id AND v.ts >= c.ts""".stripMargin,

    "join_asof_forward" ->
      """SELECT v.event_id, v.user_id, round(c.value, 2) AS next_click_value
        |FROM (SELECT * FROM events WHERE event_type = 'view') v
        |ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c
        |  ON v.user_id = c.user_id AND v.ts <= c.ts""".stripMargin,

    "tpch_q18ish" ->
      """SELECT o_orderkey, round(sum(l_quantity), 2) AS total_qty,
        |  round(first(o_totalprice), 2) AS price
        |FROM orders JOIN lineitem ON o_orderkey = l_orderkey
        |GROUP BY o_orderkey
        |HAVING sum(l_quantity) > 150
        |ORDER BY total_qty DESC, o_orderkey ASC LIMIT 20""".stripMargin,

    "tpch_q2ish" ->
      """SELECT l1.l_partkey, l1.l_suppkey, l1.l_extendedprice
        |FROM lineitem l1
        |WHERE l1.l_extendedprice = (SELECT min(l2.l_extendedprice)
        |  FROM lineitem l2 WHERE l2.l_partkey = l1.l_partkey)""".stripMargin,

    "tpch_q7ish" ->
      """SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
        |  CAST(year(l_shipdate) AS BIGINT) AS yr,
        |  round(sum(l_extendedprice * (1.0 - l_discount)), 2) AS revenue,
        |  count(*) AS n
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN supplier ON l_suppkey = s_suppkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation n1 ON s_nationkey = n1.n_nationkey
        |JOIN nation n2 ON c_nationkey = n2.n_nationkey
        |WHERE (n1.n_nationkey = 1 AND n2.n_nationkey = 2)
        |   OR (n1.n_nationkey = 2 AND n2.n_nationkey = 1)
        |GROUP BY 1, 2, 3""".stripMargin,

    "join_range_autorewrite" ->
      """SELECT s_suppkey, count(*) AS n_in_band
        |FROM supplier JOIN customer
        |  ON c_acctbal > s_acctbal - 10.0 AND c_acctbal <= s_acctbal
        |GROUP BY s_suppkey""".stripMargin,

    "join_range_bucketed" ->
      """SELECT s_suppkey, count(*) AS n_in_band
        |FROM supplier JOIN customer
        |  ON c_acctbal > s_acctbal - 10.0 AND c_acctbal <= s_acctbal
        |GROUP BY s_suppkey""".stripMargin,

    "stream_stateful_totals" ->
      """SELECT user_id, count(*) AS n_events,
        |  round(sum(value), 2) AS total_value
        |FROM events GROUP BY user_id""".stripMargin,

    "fn_list_aggregate" ->
      """WITH b AS (SELECT l_orderkey, list_sort(list(l_quantity)) AS arr
        |  FROM lineitem WHERE l_orderkey <= 2000 GROUP BY l_orderkey)
        |SELECT l_orderkey,
        |  round(CAST(list_aggregate(arr, 'sum') AS DOUBLE), 2) AS l_sum,
        |  round(CAST(list_aggregate(arr, 'avg') AS DOUBLE), 6) AS l_avg,
        |  list_aggregate(arr, 'min') AS l_min,
        |  list_aggregate(arr, 'max') AS l_max,
        |  CAST(list_aggregate(arr, 'count') AS BIGINT) AS l_n
        |FROM b""".stripMargin
  )
}

package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.{Engine, SqlDialect}
import graft.operators.{Dedup, Similarity}
import graft.sources.Csv

/** Round-3 batch: scale-safe replacements for the all-pairs dedup
  * baselines. Both queries compute the SAME answer as their exact
  * counterparts would on the candidate set, but generate candidates with
  * a linear key-shuffle instead of a cross product:
  *
  *  - `dedup_fuzzy_names_blocked`: delete-neighborhood (SymSpell)
  *    blocking is COMPLETE for Levenshtein ≤ k, so the oracle is the
  *    plain brute-force distance join — a green row proves the blocked
  *    plan loses nothing.
  *  - `dedup_embedding_cosine_lsh`: quantized sign-LSH buckets are
  *    integer-exact, so the oracle SQL replays the identical algorithm
  *    (same literal hyperplanes) in DuckDB — a green row proves the
  *    bucketed plan is reproducible cross-engine end to end.
  */
object Round3 {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Engine.table(s, dir, name)

  /** Shared LSH configuration: 8 bands × 8 bits = 64 ±1 hyperplanes
    * (Similarity.hyperplanes seed 42), bucket skew cap 250. */
  private val LshBands = 8
  private val LshBits = 8
  private val LshMaxBucket = 250
  private[graft] lazy val lshPlanes: Array[Array[Double]] =
    Similarity.hyperplanes(LshBands * LshBits, 64)

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    "dedup_fuzzy_names_blocked" -> ((s, dir) => {
      // scale path for dedup_fuzzy_names: one equi-join shuffle on
      // delete-neighborhood keys replaces the supplier×supplier cross
      // join; exact-levenshtein refine keeps the answer identical
      Dedup.fuzzyPairs(t(s, dir, "supplier"), "s_suppkey", "s_name", 2)
        .groupBy(col("dist").cast("long").as("d"))
        .agg(count(lit(1)).as("n_pairs"),
          sum(col("id_a") + col("id_b")).cast("long").as("id_sum"))
    }),

    "dedup_embedding_cosine_lsh" -> ((s, dir) => {
      // scale path for dedup_embedding_cosine: banded sign-LSH candidate
      // generation (one band-key shuffle, skew-capped, codegen banding
      // kernel) with the exact-cosine refine FUSED into the band join —
      // vectors + labels ride the single banded exchange, no
      // post-candidate id-joins. Buckets are integer-exact (quantized
      // vectors, ±1 planes) so the oracle replays the same bucketing in
      // SQL.
      //
      // TWO-barrier plan (was three): the pair-dedup shuffle is folded
      // into the label aggregate — each joined row carries its pair's
      // band-collision count k and weighs L/k with L = lcm(1..16), so
      // the per-label sums are EXACTLY L x the distinct-pair counts
      // (integer arithmetic throughout; each pair's k rows contribute
      // k·(L/k) = L). max_cos is duplicate-insensitive already. The
      // in-plan assert_true fires if the summed weight is not divisible
      // by L — the hot-bucket-overlap case where the weighted form
      // under-counts (see cosineLshScoredPairsWeighted scaladoc) —
      // so degenerate data fails loudly instead of silently drifting.
      val e = t(s, dir, "embeddings")
        .select(col("vec_id"), col("label").cast("long").as("label"),
          col("embedding").cast("array<double>").as("v"))
      val L = 720720L // lcm(1..16) >= lcm(1..LshBands)
      Dedup.cosineLshScoredPairsWeighted(e, "vec_id", "v", lshPlanes,
        numBands = LshBands, bitsPerBand = LshBits, maxBucket = LshMaxBucket,
        carry = Seq("label"))
        .withColumn("w", expr(s"$L div band_collisions"))
        .groupBy(col("label_a").as("la"), col("label_b").as("lb"))
        .agg(sum(when(col("cos") >= 0.35, col("w")).otherwise(lit(0L))).as("wsim"),
          sum(col("w")).as("wcand"),
          round(max(col("cos")), 6).as("max_cos"))
        .select(col("la"), col("lb"),
          when(assert_true(col("wsim") % L === 0 && col("wcand") % L === 0,
            lit("LSH weighted pair-dedup undercounted: a pair overlaps a " +
              "capped hot bucket — use the dropDuplicates variant for this " +
              "corpus")).isNull,
            expr(s"wsim div $L")).as("n_sim"),
          expr(s"wcand div $L").as("n_cand"),
          col("max_cos"))
    }),

    "dialect_macro" -> ((s, dir) => {
      // CREATE MACRO: bind-time inlining (reference ScalarMacroFunction
      // duckdb-internal.hpp:9920) — nested macro reference + named
      // default parameter, exercised through an aggregate
      Engine.registerAll(s, dir)
      SqlDialect.sql(s, "CREATE OR REPLACE MACRO disc_price(p, d) AS p * (1 - d)")
      SqlDialect.sql(s,
        "CREATE OR REPLACE MACRO taxed(p, d, t := 0.05) AS disc_price(p, d) * (1 + t)")
      SqlDialect.sql(s,
        """SELECT l_returnflag,
          |  round(sum(disc_price(l_extendedprice, l_discount)), 2) AS sum_disc,
          |  round(sum(taxed(l_extendedprice, l_discount)), 2) AS sum_taxed,
          |  round(avg(taxed(l_extendedprice, l_discount, t := 0.10)), 2) AS avg_taxed10
          |FROM lineitem GROUP BY l_returnflag""".stripMargin)
    }),

    "join_lateral" -> ((s, dir) => {
      // correlated LATERAL join (reference LATERAL binder,
      // duckdb-9.cpp:1099; duckdb-internal.hpp:73153) — top-2 customers
      // per nation via a correlated, limited lateral subquery; Catalyst
      // decorrelates to a ranked window, the plan a 100 TB run wants
      Engine.registerAll(s, dir)
      s.sql(
        """SELECT n.n_name, t.c_custkey, round(t.c_acctbal, 2) AS acctbal
          |FROM nation n, LATERAL (
          |  SELECT c_custkey, c_acctbal FROM customer
          |  WHERE c_nationkey = n.n_nationkey
          |  ORDER BY c_acctbal DESC, c_custkey LIMIT 2) t""".stripMargin)
    }),

    "win_named" -> ((s, dir) => {
      // named WINDOW clause shared by several functions (reference
      // window binder; same text runs on both engines)
      Engine.registerAll(s, dir)
      s.sql(Round3.winNamedSql)
    }),

    "dialect_group_by_all" -> ((s, dir) => {
      // GROUP BY ALL (reference duckdb-8.cpp:7745) — native in both
      // engines; groups by every non-aggregated select item
      Engine.registerAll(s, dir)
      s.sql(
        """SELECT o_orderstatus, o_orderpriority, count(*) AS n,
          |  round(sum(o_totalprice), 2) AS total
          |FROM orders GROUP BY ALL""".stripMargin)
    }),

    "set_union_by_name" -> ((s, dir) => {
      // UNION ALL BY NAME (reference duckdb-8.cpp:7905): by-name column
      // matching with null fill for missing columns
      Engine.registerAll(s, dir)
      SqlDialect.sql(s,
        """SELECT n_nationkey AS k, n_name AS name FROM nation
          |UNION ALL BY NAME
          |SELECT r_name AS name, r_regionkey AS k, 1 AS extra FROM region""".stripMargin)
        .agg(count(lit(1)).as("n"), sum(col("k")).as("k_sum"),
          count(col("extra")).as("n_extra"))
    }),

    "mm_frames" -> ((s, dir) => {
      // video-frame sampling dataflow (explode payload → strided chunks):
      // the oracle recomputes chunk counts/bytes arithmetically from the
      // payload length — the dataflow shape is what's under test
      val media = graft.operators.Multimodal.mediaFromDocuments(
        s, t(s, dir, "documents"))
      graft.operators.Multimodal.sampleFrames(media, frameBytes = 32, stride = 2)
        .groupBy(col("id"))
        .agg(count(lit(1)).as("n_frames"),
          sum(length(col("frame"))).as("kept_bytes"))
    }),

    "scan_glob" -> ((s, dir) => {
      // glob table function (reference duckdb-6.cpp:9491) — file listing
      // compared against DuckDB's native glob() (Hadoop paths carry a
      // file: scheme; stripped for the comparison)
      graft.functions.TypeHelpers.glob(s, s"$dir/*.parquet")
        .select(regexp_replace(col("file"), "^file:", "").as("file"))
    }),

    "catalog_export" -> ((s, dir) => {
      // EXPORT DATABASE → IMPORT DATABASE round-trip (reference
      // duckdb-4.cpp:9722): re-imported tables must aggregate identically
      // to the source (oracle computes from the source directly). Runs in
      // a child session so EXPORT sees only this query's tables, not the
      // whole shared-session catalog.
      val ns = s.newSession()
      Engine.createTable(ns, "exp_nation",
        t(ns, dir, "nation").select(col("n_nationkey"), col("n_name")))
      Engine.createTable(ns, "exp_region",
        t(ns, dir, "region").select(col("r_regionkey"), col("r_name")))
      Engine.exportDatabase(ns, "/root/repo/target/exp_db")
      Engine.createTable(ns, "exp_nation", ns.range(0).toDF())  // clobber
      Engine.importDatabase(ns, "/root/repo/target/exp_db")
      ns.table("exp_nation").agg(
        count(lit(1)).as("n_nation"),
        sum(col("n_nationkey")).cast("long").as("key_sum"))
        .crossJoin(ns.table("exp_region").agg(count(lit(1)).as("n_region")))
    }),

    "catalog_dml" -> ((s, dir) => {
      // INSERT/UPDATE/DELETE over the temp-view catalog (reference
      // PhysicalInsert/Delete/Update duckdb-4.cpp:9996-10015) — the
      // oracle replays the identical DML natively and compares the
      // final table state
      Engine.registerAll(s, dir)
      val base = t(s, dir, "nation")
        .select(col("n_nationkey"), col("n_name"), col("n_regionkey"))
      Engine.createTable(s, "dml_demo", base)
      Engine.insertInto(s, "dml_demo",
        base.filter(col("n_nationkey") === 0)
          .withColumn("n_nationkey", col("n_nationkey") + 100)
          .withColumn("n_name", lit("NEWLAND")))
      Engine.updateWhere(s, "dml_demo", col("n_regionkey") === 0,
        Map("n_name" -> concat(col("n_name"), lit("_X"))))
      Engine.deleteWhere(s, "dml_demo", col("n_nationkey") % 7 === 3)
      s.table("dml_demo").agg(
        count(lit(1)).as("n"),
        sum(col("n_nationkey")).cast("long").as("key_sum"),
        count(when(col("n_name").endsWith("_X"), 1)).as("n_upd"))
    }),

    "catalog_table_info" -> ((s, dir) => {
      // pragma_table_info analog (reference duckdb-6.cpp:14150): schema
      // reflection reported in the reference's type names
      Engine.registerAll(s, dir)
      val duckType = Map("bigint" -> "BIGINT", "int" -> "INTEGER",
        "string" -> "VARCHAR", "double" -> "DOUBLE",
        "timestamp_ntz" -> "TIMESTAMP", "timestamp" -> "TIMESTAMP",
        "date" -> "DATE", "boolean" -> "BOOLEAN")
      import s.implicits._
      Engine.tableInfo(s, "nation").collect()
        .map(r => (r.getInt(0), r.getString(1),
          duckType.getOrElse(r.getString(2), r.getString(2).toUpperCase)))
        .toSeq.toDF("cid", "name", "type")
    }),

    "win_filtered" -> ((s, dir) => {
      // FILTER clause on window aggregates (reference window binder
      // accepts agg FILTER (...) OVER w) — Spark rewrite: agg(CASE)
      val w = org.apache.spark.sql.expressions.Window.partitionBy(col("n_regionkey"))
      t(s, dir, "nation").select(
        col("n_regionkey"), col("n_nationkey"),
        count(when(col("n_nationkey") % 2 === 0, 1)).over(w).cast("long").as("n_even"),
        sum(when(col("n_nationkey") > 10, col("n_nationkey"))).over(w).cast("long").as("s_hi"))
    }),

    "fn_list_ops" -> ((s, dir) => {
      // list-function aliases over an ordered per-group list:
      // list_reverse_sort / list_unique (count) / flatten / list_position
      val sorted = transform(
        array_sort(collect_list(struct(col("n_nationkey"), col("n_name")))),
        x => x.getField("n_name"))
      t(s, dir, "nation").groupBy(col("n_regionkey"))
        .agg(sorted.as("l"))
        .select(col("n_regionkey"),
          array_join(sort_array(col("l"), asc = false), "|").as("rs"),
          size(array_distinct(concat(col("l"), col("l")))).cast("long").as("uniq"),
          array_join(flatten(array(col("l"), col("l"))), "|").as("fl"),
          array_position(col("l"), "NATION_5").cast("long").as("pos5"))
    }),

    "fn_long_tail" -> ((s, dir) => {
      // remaining reference scalar surface: interval constructors
      // (to_days/to_hours/…, duckdb-5.cpp), bit_length,
      // regexp_full_match (anchored rlike), jaro_similarity, and the
      // grapheme-cluster family (BreakIterator ≙ utf8proc clusters);
      // é is built decomposed (e + U+0301) on both sides
      graft.functions.DuckFunctions.register(s)
      val ts = lit("1996-03-05 07:08:09").cast("timestamp")
      val cafe = concat(lit("cafe"), lit("\u0301"))
      s.range(1).select(
        (ts + expr("INTERVAL 5 DAYS")).as("d5"),
        (ts + expr("INTERVAL 30 HOURS")).as("h30"),
        (ts + expr("INTERVAL 90 MINUTES")).as("m90"),
        (ts + expr("INTERVAL 3661 SECONDS")).as("s3661"),
        (ts + expr("INTERVAL 14 MONTHS")).as("mo14"),
        (ts + expr("INTERVAL 2 YEARS")).as("y2"),
        bit_length(lit("abc")).cast("long").as("bl"),
        lit("banana").rlike("^(?:b.n.*)$").as("rfm1"),
        lit("banana").rlike("^(?:an)$").as("rfm2"),
        round(callUDF("jaro_similarity", lit("MARTHA"), lit("MARHTA")), 6).as("js"),
        callUDF("length_grapheme", cafe).cast("long").as("lg"),
        callUDF("left_grapheme", cafe, lit(4)).as("leftg"),
        callUDF("right_grapheme", cafe, lit(2)).as("rightg"),
        callUDF("substring_grapheme", concat(cafe, lit("xyz")), lit(4), lit(2)).as("subg"))
    }),

    "fn_string_predicates" -> ((s, dir) => {
      // prefix/suffix/contains/starts_with + mismatches (hamming) +
      // editdist3 (levenshtein alias) — reference duckdb-2.cpp string
      // predicate and distance registrations
      graft.functions.DuckFunctions.register(s)
      t(s, dir, "supplier").select(
        col("s_suppkey"),
        col("s_name").startsWith("Supplier").as("p"),
        col("s_name").endsWith("1").as("sx"),
        col("s_name").contains("#00").as("c"),
        col("s_name").startsWith("Supp").as("sw"),
        callUDF("mismatches", col("s_name"), lit("Supplier#000000000"))
          .cast("long").as("mm"),
        levenshtein(col("s_name"), lit("Supplier#000000000")).cast("long").as("ed"))
    }),

    "agg_mad" -> ((s, dir) => {
      // median absolute deviation (reference mad, duckdb-5.cpp holistic
      // aggregates): two exact-percentile passes — group median
      // broadcast back, then median of absolute deviations
      val li = t(s, dir, "lineitem")
      val med = li.groupBy("l_returnflag")
        .agg(expr("percentile(l_quantity, 0.5)").as("med"))
      li.join(med, "l_returnflag").groupBy("l_returnflag")
        .agg(round(expr("percentile(abs(l_quantity - med), 0.5)"), 2).as("mad_qty"))
    }),

    "fn_bitstring" -> ((s, dir) => {
      // BIT-string surface (reference BIT type duckdb.hpp:932, bit fns
      // duckdb-5.cpp): bit_count/get_bit/set_bit/bit_position plus
      // bitwise AND/NOT/XOR — Spark side over 0/1 strings + integer
      // bitwise ops; oracle uses DuckDB's native BIT type
      val b = bin(col("id"))
      s.range(5, 200).select(
        col("id").as("i"),
        b.as("b"),
        (length(b) - length(translate(b, "1", ""))).cast("long").as("n_ones"),
        substring(b, 1, 1).cast("int").as("first_bit"),
        overlay(b, lit("1"), lit(1), lit(1)).as("set0"),
        instr(b, "101").cast("long").as("pos101"),
        lpad(bin(col("id").bitwiseAND(col("id") + 1)), 8, "0").as("band"),
        lpad(bin(col("id").bitwiseXOR(lit(255))), 8, "0").as("bnot"),
        lpad(bin(col("id").bitwiseXOR(col("id") + 1)), 8, "0").as("bxor"))
    }),

    "fn_blob" -> ((s, dir) => {
      // BLOB surface (reference blob casts duckdb-5.cpp + base64/hex
      // functions): encode/decode round-trip, base64, hex, octet_length
      t(s, dir, "documents").select(
        col("doc_id"),
        // Spark base64 emits MIME 76-char line chunking; strip to the
        // unchunked canonical form
        regexp_replace(base64(col("text").cast("binary")), "[\\r\\n]", "").as("b64"),
        md5(col("text").cast("binary")).as("m5"),
        expr("octet_length(text)").cast("long").as("nbytes"),
        upper(hex(substring(col("text"), 1, 4).cast("binary"))).as("hx"),
        (unbase64(base64(col("text").cast("binary"))).cast("string") === col("text")).as("rt"))
    }),

    "agg_list" -> ((s, dir) => {
      // ordered list aggregation (reference list(x ORDER BY y),
      // duckdb-5.cpp ListFunction + ORDER BY modifier): deterministic
      // via sort-by-key-then-project (the distributed shape: one
      // groupBy shuffle, order restored inside each group)
      val sorted = array_sort(collect_list(struct(col("n_nationkey"), col("n_name"))))
      t(s, dir, "nation").groupBy(col("n_regionkey"))
        .agg(transform(sorted, x => x.getField("n_name")).as("nm"))
        .select(col("n_regionkey"),
          array_join(col("nm"), "|").as("names"),
          array_join(slice(col("nm"), 1, 2), "|").as("first2"),
          size(col("nm")).cast("long").as("n"))
    }),

    "catalog_sql_dml" -> ((s, dir) => {
      // the full SQL-level DML statement surface (INSERT positional /
      // UPDATE assignments / DELETE / ALTER TABLE RENAME COLUMN) —
      // identical statement text runs natively on the oracle
      Engine.registerAll(s, dir)
      Round3.sqlDmlStatements.foreach(stmt => SqlDialect.sql(s, stmt))
      SqlDialect.sql(s, Round3.sqlDmlSelect)
    }),

    "agg_grouping_fn" -> ((s, dir) => {
      // GROUPING() marker function over ROLLUP (distinguishes "NULL
      // because superaggregate" from data NULLs — reference GroupingFn)
      t(s, dir, "lineitem")
        .rollup(col("l_returnflag"), col("l_linestatus"))
        .agg(count(lit(1)).as("n"),
          grouping(col("l_returnflag")).cast("long").as("g_rf"),
          grouping(col("l_linestatus")).cast("long").as("g_ls"))
        .orderBy(col("l_returnflag"), col("l_linestatus"))
    }),

    "dialect_create_view" -> ((s, dir) => {
      // CREATE OR REPLACE VIEW (reference CreateViewInfo, duckdb-9.cpp)
      // — plan-level view, re-evaluated per query (vs the CTAS snapshot)
      Engine.registerAll(s, dir)
      dialectViewStatements.foreach(stmt => SqlDialect.sql(s, stmt))
      SqlDialect.sql(s, dialectViewSelect)
    }),

    "dialect_with_recursive" -> ((s, dir) => {
      // SQL-level WITH RECURSIVE — native in Spark 4 (recursive CTE
      // resolution); identical statement text runs on both engines
      Engine.registerAll(s, dir)
      SqlDialect.sql(s, withRecursiveSql)
    }),

    "dialect_pivot" -> ((s, dir) => {
      // PIVOT (DuckDB dialect statement → Spark's native groupBy().pivot;
      // explicit value list keeps the plan single-pass: no distinct-scan)
      t(s, dir, "orders")
        .groupBy(col("o_orderpriority"))
        .pivot("o_orderstatus", Seq("F", "O", "P"))
        .agg(sum(col("o_totalprice")))
        .select(col("o_orderpriority"),
          round(col("F"), 2).as("f"), round(col("O"), 2).as("o"),
          round(col("P"), 2).as("p"))
        .orderBy(col("o_orderpriority"))
    }),

    "dialect_unpivot" -> ((s, dir) => {
      // UNPIVOT round-trips the pivoted frame back to long form
      val priorities = Seq("1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW")
      val wide = t(s, dir, "orders")
        .groupBy(col("o_orderstatus"))
        .pivot("o_orderpriority", priorities)
        .agg(sum(col("o_totalprice")))
      wide.unpivot(
          Array(col("o_orderstatus")), priorities.map(col).toArray, "k", "v")
        .select(col("o_orderstatus"), col("k"), round(col("v"), 2).as("v"))
        .orderBy(col("o_orderstatus"), col("k"))
    }),

    "fn_json_wide" -> ((s, dir) => {
      // JSON function long tail beyond fn_json_props: nested-path
      // extraction, array length, validity — over a constructed
      // integer-only document (float rendering differs cross-engine)
      val j = concat(
        lit("{\"a\": {\"b\": "), (col("event_id") % 97).cast("string"),
        lit("}, \"arr\": [1, 2, "), (col("event_id") % 10).cast("string"),
        lit("]}"))
      t(s, dir, "events")
        .withColumn("j", j)
        .groupBy(col("event_type"))
        .agg(
          count(lit(1)).as("n"),
          sum(get_json_object(col("j"), "$.a.b").cast("long")).as("sum_b"),
          sum(expr("json_array_length(get_json_object(j, '$.arr'))")).cast("long")
            .as("sum_arr_len"),
          sum(when(get_json_object(col("props"), "$.k").isNotNull, 1L)
            .otherwise(0L)).as("n_valid"),
          sum(get_json_object(col("props"), "$.k").cast("long")).as("sum_k"))
        .orderBy(col("event_type"))
    }),

    "fn_list_setops" -> ((s, dir) => {
      // list set algebra + regexp_extract_all (order-normalized: Spark
      // preserves first-argument order where DuckDB's list_intersect is
      // unordered — both sides sort before rendering)
      val a = array((col("event_id") % 5).cast("int"),
        (col("event_id") % 7).cast("int"), (col("event_id") % 11).cast("int"))
      val b = array((col("event_id") % 3).cast("int"),
        (col("event_id") % 7).cast("int"), lit(4).cast("int"))
      val txt = concat(lit("a"), col("event_id").cast("string"),
        lit(" b"), (col("event_id") % 7).cast("string"))
      t(s, dir, "events")
        .filter(col("event_id") < 2000)
        .select(col("event_id"), a.as("a"), b.as("b"), txt.as("txt"))
        .select(
          col("event_id"),
          array_join(array_sort(array_intersect(col("a"), col("b"))), ",").as("inter"),
          array_join(array_sort(array_except(col("a"), col("b"))), ",").as("exc"),
          array_join(array_sort(array_distinct(concat(col("a"), col("b")))), ",").as("uni"),
          arrays_overlap(col("a"), col("b")).as("has_any"),
          forall(col("b"), x => array_contains(col("a"), x)).as("has_all"),
          array_join(regexp_extract_all(col("txt"), lit("[0-9]+"), lit(0)), ",").as("nums"))
        .orderBy(col("event_id"))
    }),

    "arrow_roundtrip" -> ((s, dir) => {
      // Arrow IPC export + import (reference ArrowTableFunction surface,
      // duckdb-6.cpp:7612): write a slice of orders as a directory of
      // IPC files (one per partition, executor-side), read it back, and
      // aggregate — must match the parquet source. Exercises int64,
      // double, varchar, and timestamp columns through the IPC boundary.
      val sub = t(s, dir, "orders").filter(col("o_orderkey") <= 2000)
      graft.sources.ArrowIpc.write(sub, "target/graft_arrow/orders")
      graft.sources.ArrowIpc.read(s, "target/graft_arrow/orders")
        .groupBy(col("o_orderstatus"))
        .agg(
          count(lit(1)).as("n"),
          round(sum(col("o_totalprice")), 2).as("total"),
          min(col("o_orderdate")).as("first_dt"),
          max(col("o_orderpriority")).as("top_pri"))
        .orderBy(col("o_orderstatus"))
    }),

    "catalog_ctas" -> ((s, dir) => {
      // SQL-level CREATE TABLE AS (reference CreateTableAs binder,
      // duckdb-9.cpp) — snapshot semantics into the temp catalog
      Engine.registerAll(s, dir)
      SqlDialect.sql(s,
        """CREATE OR REPLACE TABLE ctas_demo AS
          |SELECT l_returnflag, round(sum(l_quantity), 2) AS qty
          |FROM lineitem GROUP BY l_returnflag""".stripMargin)
      SqlDialect.sql(s, "SELECT l_returnflag, qty FROM ctas_demo")
    }),

    "catalog_summarize" -> ((s, dir) => {
      // SUMMARIZE (reference duckdb-6.cpp:9493) — deterministic column
      // subset; approx_unique/quantiles are engine-specific sketches and
      // stay out of the oracle on both sides
      Engine.summarizeTable(s, t(s, dir, "orders"))
    }),

    "catalog_sequence" -> ((s, dir) => {
      // CREATE SEQUENCE / nextval (reference duckdb-6.cpp:2012) —
      // driver-side monotonic counter, the same single-node catalog
      // semantics as the reference; oracle replays a native sequence
      import s.implicits._
      graft.functions.TypeHelpers.createSequence("r3seq", start = 100, incrementBy = 7)
      (1L to 6L).map(i => (i, graft.functions.TypeHelpers.nextval("r3seq")))
        .toDF("i", "v")
    }),

    "fn_collate" -> ((s, dir) => {
      // NOCASE collation (reference collation registry
      // duckdb-5.cpp:5156) as expression rewrite + strip_accents
      graft.functions.DuckFunctions.register(s)
      t(s, dir, "nation").agg(
        countDistinct(lower(col("n_name"))).as("n_nocase"),
        min(struct(lower(col("n_name")).as("k"), col("n_name").as("v")))
          .getField("v").as("first_name"),
        first(callUDF("strip_accents", lit("Málagà"))).as("stripped"))
    }),

    // ---- further TPC-H-shaped optimizer stress (same SQL text runs on
    // both engines; adapted to the driver schema — no mktsegment/
    // commitdate/partsupp, filters substituted with shape preserved) ----

    "tpch_q3ish" -> ((s, dir) => {
      Engine.registerAll(s, dir)
      s.sql(Round3.q3Sql)
    }),

    "tpch_q5ish" -> ((s, dir) => {
      // local-supplier volume: 6-way join (2 broadcast dims + region),
      // customer and supplier constrained to the same nation
      Engine.registerAll(s, dir)
      s.sql(Round3.q5Sql)
    }),

    "tpch_q8ish" -> ((s, dir) => {
      // market-share: conditional share of a two-level aggregate
      Engine.registerAll(s, dir)
      s.sql(Round3.q8Sql)
    }),

    "tpch_q9ish" -> ((s, dir) => {
      // profit by nation/year: 5-way join + LIKE filter + derived amount
      Engine.registerAll(s, dir)
      s.sql(Round3.q9Sql)
    }),

    "tpch_q11ish" -> ((s, dir) => {
      // scalar subquery over a reused CTE (global threshold)
      Engine.registerAll(s, dir)
      s.sql(Round3.q11Sql)
    }),

    "tpch_q15ish" -> ((s, dir) => {
      // argmax via scalar MAX subquery over a derived revenue view
      Engine.registerAll(s, dir)
      s.sql(Round3.q15Sql)
    }),

    "tpch_q20ish" -> ((s, dir) => {
      // nested IN over a grouped HAVING subquery
      Engine.registerAll(s, dir)
      s.sql(Round3.q20Sql)
    }),

    "tpch_q6ish" -> ((s, dir) => {
      Engine.registerAll(s, dir)
      s.sql(Round3.q6Sql)
    }),

    "tpch_q17ish" -> ((s, dir) => {
      // correlated scalar subquery on the join key — Catalyst
      // decorrelates to an aggregate join (reference: delim join)
      Engine.registerAll(s, dir)
      s.sql(Round3.q17Sql)
    }),

    "tpch_q19ish" -> ((s, dir) => {
      // disjunction of conjunctive range predicates across the join
      Engine.registerAll(s, dir)
      s.sql(Round3.q19Sql)
    }),

    "tpch_q21ish" -> ((s, dir) => {
      // double-correlated EXISTS + NOT EXISTS on the same relation.
      // Catalyst decorrelates the SQL form into a semi + anti join —
      // three shuffles of lineitem. Both correlations are per-order
      // scalars, so fold them into ONE aggregate pass instead:
      //   NOT EXISTS (l3.l_shipdate > l1.l_shipdate)
      //     ⟺ l1.l_shipdate = max(l_shipdate) over the order
      //   EXISTS (l2.l_suppkey <> l1.l_suppkey)
      //     ⟺ the order has ≥ 2 distinct suppliers
      // lineitem shuffles on l_orderkey twice (agg + join-back, AQE
      // co-partitions) instead of three times, and the anti join's
      // row-at-a-time probe disappears.
      // ≥2 distinct suppliers ⟺ min(suppkey) ≠ max(suppkey): a one-phase
      // window aggregate, no countDistinct expand. The window is the ONLY
      // lineitem shuffle; the orders join reuses its hash(l_orderkey)
      // partitioning (orders alone shuffles), supplier broadcasts.
      val ow = org.apache.spark.sql.expressions.Window.partitionBy(col("l_orderkey"))
      val waiting = Engine.table(s, dir, "lineitem")
        .select(col("l_orderkey"), col("l_suppkey"), col("l_shipdate"))
        .withColumn("max_ship", max(col("l_shipdate")).over(ow))
        .withColumn("supp_lo", min(col("l_suppkey")).over(ow))
        .withColumn("supp_hi", max(col("l_suppkey")).over(ow))
        .filter(col("l_shipdate") === col("max_ship") && col("supp_lo") =!= col("supp_hi"))
      val o = Engine.table(s, dir, "orders")
        .filter(col("o_orderstatus") === "F")
        .select(col("o_orderkey"))
      val su = broadcast(Engine.table(s, dir, "supplier")
        .select(col("s_suppkey"), col("s_name")))
      waiting.join(o, col("o_orderkey") === col("l_orderkey"))
        .join(su, col("s_suppkey") === col("l_suppkey"))
        .groupBy(col("s_name"))
        .agg(count(lit(1)).as("numwait"))
        .orderBy(col("numwait").desc, col("s_name").asc)
        .limit(20)
    }),

    "sql_copy_parquet" -> ((s, dir) => {
      // SQL-level COPY … TO (FORMAT PARQUET) + read_parquet replacement
      // scan (reference PhysicalCopyToFile duckdb-4.cpp:4689): each
      // engine round-trips through its own parquet file; the aggregates
      // must agree because the source rows do
      Engine.registerAll(s, dir)
      SqlDialect.sql(s,
        """COPY (SELECT l_orderkey, l_quantity, l_extendedprice
          |      FROM lineitem WHERE l_orderkey <= 2000)
          |TO '/root/repo/target/copy_spark_li' (FORMAT PARQUET)""".stripMargin)
      SqlDialect.sql(s,
        """SELECT count(*) AS n, round(sum(l_quantity), 2) AS sum_qty,
          |  round(sum(l_extendedprice), 2) AS sum_price
          |FROM read_parquet('/root/repo/target/copy_spark_li')""".stripMargin)
    }),

    "dialect_prepare" -> ((s, dir) => {
      // PREPARE / EXECUTE (reference PrepareStatement duckdb-8.cpp:8942):
      // $n placeholders bound at execute time, run through the dialect
      Engine.registerAll(s, dir)
      SqlDialect.sql(s,
        """PREPARE qty_cut AS
          |SELECT l_returnflag, count(*) AS n,
          |  round(sum(l_extendedprice), 2) AS total
          |FROM lineitem WHERE l_quantity <= $1 AND l_partkey % $2 = 0
          |GROUP BY l_returnflag""".stripMargin)
      SqlDialect.sql(s, "EXECUTE qty_cut(10, 3)")
    }),

    "scan_repeat" -> ((s, dir) => {
      // repeat(val, n) table function (reference RepeatTableFunction,
      // duckdb-6.cpp:10510-10530)
      Engine.repeatTable(s, "ab", 4).agg(
        count(lit(1)).as("n"),
        count(when(col("value") === "ab", 1)).as("n_ab"))
    }),

    "csv_options" -> ((s, dir) => {
      // CSV option long tail (reference read_csv named options,
      // duckdb-6.cpp:10273-10299): skip + normalize_names,
      // union_by_name, hive_partitioning — DuckDB reads the
      // byte-identical files with its native options
      import java.nio.file.{Files, Paths}
      val base = Paths.get("/root/repo/target/csv_opts")
      Files.createDirectories(base.resolve("pt/key=1"))
      Files.createDirectories(base.resolve("pt/key=2"))
      val nation = t(s, dir, "nation")
        .select(col("n_nationkey").cast("long"), col("n_name"),
          col("n_regionkey").cast("long"))
        .orderBy(col("n_nationkey")).collect()
      def put(rel: String, lines: Seq[String]): Unit =
        Files.write(base.resolve(rel), (lines.mkString("\n") + "\n").getBytes)
      put("skip_demo.csv",
        Seq("# generated demo file", "# second preamble line", "N_NationKey|N_Name") ++
          nation.map(r => s"${r.getLong(0)}|${r.getString(1)}"))
      val (ua, ub) = nation.splitAt(13)
      put("u_a.csv", "n_nationkey,n_name" +: ua.map(r => s"${r.getLong(0)},${r.getString(1)}"))
      put("u_b.csv", "n_nationkey,n_regionkey" +: ub.map(r => s"${r.getLong(0)},${r.getLong(2)}"))
      val (p1, p2) = nation.partition(_.getLong(0) % 2 == 0)
      put("pt/key=1/data.csv", "n_nationkey" +: p1.map(r => s"${r.getLong(0)}"))
      put("pt/key=2/data.csv", "n_nationkey" +: p2.map(r => s"${r.getLong(0)}"))
      val skipped = Csv.read(s, "/root/repo/target/csv_opts/skip_demo.csv",
        Map("skip" -> "2", "delim" -> "|", "normalize_names" -> "true"))
        .agg(count(lit(1)).as("n_skip"), sum(col("n_nationkey")).as("key_sum"))
      val unioned = Csv.read(s, "/root/repo/target/csv_opts/u_*.csv",
        Map("union_by_name" -> "true"))
        .agg(count(lit(1)).as("n_union"), count(col("n_name")).as("n_name_rows"),
          count(col("n_regionkey")).as("n_region_rows"))
      val hp = Csv.read(s, "/root/repo/target/csv_opts/pt",
        Map("hive_partitioning" -> "true"))
        .agg(count(lit(1)).as("n_hive"),
          sum(col("key").cast("long")).as("key_part_sum"))
      skipped.crossJoin(unioned).crossJoin(hp)
    }),

    "fn_datetime_parts" -> ((s, dir) => {
      // date_part long tail (reference date-part registration,
      // duckdb-5.cpp date funcs): quarter/week/doy/century/decade +
      // last_day + quarter truncation
      t(s, dir, "orders")
        .filter(col("o_orderkey") <= 500)
        .select(col("o_orderkey"), to_date(col("o_orderdate")).as("d"))
        .select(col("o_orderkey"),
          expr("extract(quarter FROM d)").cast("long").as("qtr"),
          expr("extract(week FROM d)").cast("long").as("wk"),
          expr("extract(doy FROM d)").cast("long").as("doy"),
          ceil(year(col("d")) / 100.0).cast("long").as("century"),
          floor(year(col("d")) / 10.0).cast("long").as("decade"),
          last_day(col("d")).as("month_end"),
          to_date(date_trunc("quarter", col("d"))).as("qtr_start"))
    }),

    "fn_enum" -> ((s, dir) => {
      // ENUM categorical end-to-end (reference duckdb.hpp:944; enum
      // registration duckdb-5.cpp:11590): dictionary-order code +
      // enum_first/enum_last boundaries vs DuckDB's native ENUM type
      import graft.functions.TypeHelpers._
      val prios = Seq("1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW")
      t(s, dir, "orders")
        .groupBy(col("o_orderpriority").as("prio"))
        .agg(count(lit(1)).as("n"))
        .select(col("prio"),
          enumCode(prios, col("prio")).as("code"),
          enumFirst(prios).as("first_val"),
          enumLast(prios).as("last_val"),
          col("n"))
    }),

    "dialect_table_macro" -> ((s, dir) => {
      // CREATE MACRO … AS TABLE (reference TableMacroFunction
      // duckdb-internal.hpp:9955) — call site in FROM with an alias
      Engine.registerAll(s, dir)
      SqlDialect.sql(s,
        """CREATE OR REPLACE MACRO top_parts(n) AS TABLE
          |SELECT p_partkey, p_type, p_retailprice FROM part
          |ORDER BY p_partkey LIMIT n""".stripMargin)
      SqlDialect.sql(s,
        """SELECT t.p_type, count(*) AS n, round(sum(t.p_retailprice), 2) AS price_sum
          |FROM top_parts(50) t GROUP BY t.p_type""".stripMargin)
    })
  )

  /** The literal hyperplane rows for the oracle's VALUES clause. */
  private lazy val planesSqlRows: String = Dedup.planesSqlValues(lshPlanes)

  // Same-text SQL shared by the Spark query and the DuckDB oracle.
  private[queries] val q3Sql =
    """SELECT l_orderkey, round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
      |FROM customer, orders, lineitem
      |WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
      |  AND c_nationkey % 5 = 0
      |  AND o_orderdate < TIMESTAMP '1996-06-01 00:00:00'
      |  AND l_shipdate > TIMESTAMP '1996-06-01 00:00:00'
      |GROUP BY l_orderkey, o_orderdate
      |ORDER BY sum(l_extendedprice * (1 - l_discount)) DESC, l_orderkey
      |LIMIT 10""".stripMargin

  // Shared CREATE VIEW statement sequence (identical text both engines)
  private[queries] val dialectViewStatements = Seq(
    """CREATE OR REPLACE VIEW nation_per_region AS
      |SELECT n_regionkey, count(*) AS n, min(n_name) AS first_name
      |FROM nation GROUP BY n_regionkey""".stripMargin)
  private[queries] val dialectViewSelect =
    """SELECT CAST(n_regionkey AS BIGINT) AS rk, CAST(n AS BIGINT) AS n, first_name
      |FROM nation_per_region ORDER BY rk""".stripMargin

  // Shared WITH RECURSIVE text — native recursive CTE resolution on both
  // engines (Spark 4 UnionLoop; reference RecursiveCTENode duckdb-9.cpp)
  private[queries] val withRecursiveSql =
    """WITH RECURSIVE seq(k) AS (
      |  SELECT CAST(0 AS BIGINT) UNION ALL SELECT k + 1 FROM seq WHERE k < 24
      |)
      |SELECT CAST(count(*) AS BIGINT) AS n, CAST(sum(k) AS BIGINT) AS sum_k,
      |  CAST(sum(n_regionkey) AS BIGINT) AS sum_region
      |FROM seq JOIN nation ON n_nationkey = k""".stripMargin

  // Shared DML statement sequence — the Spark side routes each through
  // SqlDialect; the oracle executes the identical text natively.
  private[queries] val sqlDmlStatements = Seq(
    """CREATE OR REPLACE TABLE sdml AS
      |SELECT n_nationkey AS k, n_name AS name, CAST(0 AS BIGINT) AS flag
      |FROM nation""".stripMargin,
    "INSERT INTO sdml VALUES (100, 'X_NATION', CAST(5 AS BIGINT))",
    "UPDATE sdml SET flag = flag + 9 WHERE k % 5 = 0",
    "DELETE FROM sdml WHERE k BETWEEN 10 AND 14",
    "ALTER TABLE sdml RENAME COLUMN flag TO mark")
  private[queries] val sqlDmlSelect =
    "SELECT CAST(k AS BIGINT) AS k, name, CAST(mark AS BIGINT) AS mark FROM sdml"

  private[queries] val q5Sql =
    """SELECT n_name, round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
      |FROM customer, orders, lineitem, supplier, nation, region
      |WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
      |  AND l_suppkey = s_suppkey AND c_nationkey = s_nationkey
      |  AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
      |  AND r_name = 'ASIA'
      |  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      |  AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
      |GROUP BY n_name
      |ORDER BY revenue DESC, n_name""".stripMargin

  private[queries] val q6Sql =
    """SELECT round(sum(l_extendedprice * l_discount), 2) AS revenue, count(*) AS n
      |FROM lineitem
      |WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      |  AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
      |  AND l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24""".stripMargin

  private[queries] val q17Sql =
    """SELECT round(sum(l.l_extendedprice) / 7.0, 2) AS avg_yearly, count(*) AS n
      |FROM lineitem l, part p
      |WHERE p.p_partkey = l.l_partkey AND p.p_brand = 'Brand#23'
      |  AND l.l_quantity < (SELECT 0.2 * avg(l2.l_quantity)
      |                      FROM lineitem l2 WHERE l2.l_partkey = l.l_partkey)""".stripMargin

  private[queries] val q19Sql =
    """SELECT round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
      |  count(*) AS n
      |FROM lineitem, part
      |WHERE p_partkey = l_partkey AND (
      |     (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 5
      |        AND l_quantity BETWEEN 1 AND 11)
      |  OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 10
      |        AND l_quantity BETWEEN 10 AND 20)
      |  OR (p_brand = 'Brand#34' AND p_size BETWEEN 1 AND 15
      |        AND l_quantity BETWEEN 20 AND 30))""".stripMargin

  // run_avg accumulates EXACT integer cents, then ONE shared division —
  // bit-identical doubles on both engines, so no final round() is needed
  // (and none would be safe: the engines' round() pipelines disagree on
  // rational half-cent boundaries — observed 5937.405 → .41 vs .40)
  private[queries] val winNamedSql =
    """SELECT c_custkey,
      |  CAST(row_number() OVER w AS BIGINT) AS rn,
      |  CAST(rank() OVER w AS BIGINT) AS rnk,
      |  CAST(sum(CAST(round(c_acctbal * 100) AS BIGINT)) OVER w AS DOUBLE)
      |    / (100.0 * count(*) OVER w) AS run_avg
      |FROM customer
      |WINDOW w AS (PARTITION BY c_nationkey
      |             ORDER BY c_acctbal DESC, c_custkey)""".stripMargin

  private[queries] val q8Sql =
    """SELECT o_year,
      |  round(sum(CASE WHEN nation = 'BRAZIL' THEN revenue ELSE 0 END)
      |    / sum(revenue), 6) AS mkt_share
      |FROM (SELECT extract(year FROM o_orderdate) AS o_year,
      |        l_extendedprice * (1 - l_discount) AS revenue, n_name AS nation
      |      FROM lineitem, orders, customer, nation
      |      WHERE l_orderkey = o_orderkey AND o_custkey = c_custkey
      |        AND c_nationkey = n_nationkey)
      |GROUP BY o_year""".stripMargin

  private[queries] val q9Sql =
    """SELECT nation, o_year, round(sum(amount), 2) AS sum_profit
      |FROM (SELECT n_name AS nation,
      |        extract(year FROM o_orderdate) AS o_year,
      |        l_extendedprice * (1 - l_discount) - 0.5 * l_quantity AS amount
      |      FROM lineitem, orders, supplier, nation, part
      |      WHERE l_orderkey = o_orderkey AND l_suppkey = s_suppkey
      |        AND s_nationkey = n_nationkey AND l_partkey = p_partkey
      |        AND p_name LIKE 'red%')
      |GROUP BY nation, o_year""".stripMargin

  private[queries] val q11Sql =
    """WITH pv AS (SELECT l_partkey,
      |              sum(l_extendedprice * l_quantity) AS part_value
      |            FROM lineitem GROUP BY l_partkey)
      |SELECT l_partkey, round(part_value, 2) AS part_value
      |FROM pv
      |WHERE part_value > (SELECT sum(part_value) * 0.0006 FROM pv)
      |ORDER BY part_value DESC, l_partkey LIMIT 100""".stripMargin

  private[queries] val q15Sql =
    """WITH revenue AS (
      |  SELECT l_suppkey AS supplier_no,
      |    sum(l_extendedprice * (1 - l_discount)) AS total_revenue
      |  FROM lineitem
      |  WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      |    AND l_shipdate < TIMESTAMP '1996-04-01 00:00:00'
      |  GROUP BY l_suppkey)
      |SELECT s_suppkey, s_name, round(total_revenue, 2) AS total_revenue
      |FROM supplier, revenue
      |WHERE s_suppkey = supplier_no
      |  AND total_revenue = (SELECT max(total_revenue) FROM revenue)
      |ORDER BY s_suppkey""".stripMargin

  private[queries] val q20Sql =
    """SELECT s_suppkey, s_name FROM supplier
      |WHERE s_suppkey IN (
      |  SELECT l_suppkey FROM lineitem, part
      |  WHERE l_partkey = p_partkey AND p_name LIKE 'red%'
      |  GROUP BY l_suppkey, l_partkey
      |  HAVING sum(l_quantity) > 100)
      |ORDER BY s_suppkey""".stripMargin

  private[queries] val q21Sql =
    """SELECT s_name, count(*) AS numwait
      |FROM supplier, lineitem l1, orders
      |WHERE s_suppkey = l1.l_suppkey AND o_orderkey = l1.l_orderkey
      |  AND o_orderstatus = 'F'
      |  AND EXISTS (SELECT * FROM lineitem l2
      |              WHERE l2.l_orderkey = l1.l_orderkey
      |                AND l2.l_suppkey <> l1.l_suppkey)
      |  AND NOT EXISTS (SELECT * FROM lineitem l3
      |                  WHERE l3.l_orderkey = l1.l_orderkey
      |                    AND l3.l_shipdate > l1.l_shipdate)
      |GROUP BY s_name
      |ORDER BY numwait DESC, s_name LIMIT 20""".stripMargin

  val oracle: Map[String, String] = Map(
    "dedup_fuzzy_names_blocked" ->
      """SELECT CAST(levenshtein(a.s_name, b.s_name) AS BIGINT) AS d,
        |  count(*) AS n_pairs,
        |  CAST(sum(a.s_suppkey + b.s_suppkey) AS BIGINT) AS id_sum
        |FROM supplier a JOIN supplier b ON a.s_suppkey < b.s_suppkey
        |WHERE levenshtein(a.s_name, b.s_name) <= 2
        |GROUP BY 1""".stripMargin,

    "dedup_embedding_cosine_lsh" ->
      s"""WITH e AS (SELECT vec_id, CAST(label AS BIGINT) AS label,
         |             CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
         |q AS (SELECT vec_id, list_transform(v, x -> floor(x*1000 + 0.5)) AS w FROM e),
         |planes(pid, pv) AS (VALUES
         |    $planesSqlRows),
         |bb AS (SELECT q.vec_id, p.pid // $LshBits AS band,
         |         CASE WHEN list_dot_product(q.w, p.pv) >= 0
         |           THEN 1 << (p.pid % $LshBits) ELSE 0 END AS bit
         |       FROM q CROSS JOIN planes p),
         |bk AS (SELECT vec_id, band, CAST(sum(bit) AS BIGINT) AS bucket
         |       FROM bb GROUP BY 1, 2),
         |capped AS (SELECT * FROM bk
         |           QUALIFY count(*) OVER (PARTITION BY band, bucket) <= $LshMaxBucket),
         |cand AS (SELECT DISTINCT a.vec_id AS id_a, b.vec_id AS id_b
         |         FROM capped a JOIN capped b
         |           ON a.band = b.band AND a.bucket = b.bucket AND a.vec_id < b.vec_id),
         |sc AS (SELECT ea.label AS la, eb.label AS lb,
         |         list_cosine_similarity(ea.v, eb.v) AS cos
         |       FROM cand JOIN e ea ON cand.id_a = ea.vec_id
         |                 JOIN e eb ON cand.id_b = eb.vec_id)
         |SELECT la, lb,
         |  count(*) FILTER (WHERE cos >= 0.35) AS n_sim,
         |  count(*) AS n_cand,
         |  round(max(cos), 6) AS max_cos
         |FROM sc GROUP BY 1, 2""".stripMargin,

    "dialect_macro" ->
      """CREATE OR REPLACE MACRO disc_price(p, d) AS p * (1 - d);
        |CREATE OR REPLACE MACRO taxed(p, d, t := 0.05) AS disc_price(p, d) * (1 + t);
        |SELECT l_returnflag,
        |  round(sum(disc_price(l_extendedprice, l_discount)), 2) AS sum_disc,
        |  round(sum(taxed(l_extendedprice, l_discount)), 2) AS sum_taxed,
        |  round(avg(taxed(l_extendedprice, l_discount, t := 0.10)), 2) AS avg_taxed10
        |FROM lineitem GROUP BY l_returnflag""".stripMargin,

    "join_lateral" ->
      """SELECT n.n_name, t.c_custkey, round(t.c_acctbal, 2) AS acctbal
        |FROM nation n, LATERAL (
        |  SELECT c_custkey, c_acctbal FROM customer
        |  WHERE c_nationkey = n.n_nationkey
        |  ORDER BY c_acctbal DESC, c_custkey LIMIT 2) t""".stripMargin,

    "dialect_group_by_all" ->
      """SELECT o_orderstatus, o_orderpriority, count(*) AS n,
        |  round(sum(o_totalprice), 2) AS total
        |FROM orders GROUP BY ALL""".stripMargin,

    "set_union_by_name" ->
      """SELECT count(*) AS n, CAST(sum(k) AS BIGINT) AS k_sum,
        |  count(extra) AS n_extra
        |FROM (SELECT n_nationkey AS k, n_name AS name FROM nation
        |      UNION ALL BY NAME
        |      SELECT r_name AS name, r_regionkey AS k, 1 AS extra FROM region)""".stripMargin,

    "mm_frames" ->
      """WITH b AS (SELECT doc_id, octet_length(encode(text)) AS n FROM documents),
        |f AS (SELECT doc_id, n,
        |        list_filter(range(CAST(ceil(n / 32.0) AS BIGINT)),
        |                    i -> i % 2 = 0) AS kept
        |      FROM b)
        |SELECT doc_id AS id, CAST(len(kept) AS BIGINT) AS n_frames,
        |  CAST(list_sum(list_transform(kept, i -> least(32, n - i * 32))) AS BIGINT)
        |    AS kept_bytes
        |FROM f""".stripMargin,

    // the driver's correctness gate always runs at sf0.01 (TESTDATA.md)
    "scan_glob" ->
      "SELECT file FROM glob('/root/testdata/sf0.01/*.parquet')",

    "catalog_export" ->
      """SELECT * FROM
        |(SELECT count(*) AS n_nation, CAST(sum(n_nationkey) AS BIGINT) AS key_sum
        | FROM nation)
        |CROSS JOIN (SELECT count(*) AS n_region FROM region)""".stripMargin,

    "catalog_dml" ->
      """CREATE OR REPLACE TABLE dml_demo AS
        |  SELECT n_nationkey, n_name, n_regionkey FROM nation;
        |INSERT INTO dml_demo
        |  SELECT n_nationkey + 100, 'NEWLAND', n_regionkey
        |  FROM nation WHERE n_nationkey = 0;
        |UPDATE dml_demo SET n_name = n_name || '_X' WHERE n_regionkey = 0;
        |DELETE FROM dml_demo WHERE n_nationkey % 7 = 3;
        |SELECT count(*) AS n, CAST(sum(n_nationkey) AS BIGINT) AS key_sum,
        |  count(*) FILTER (WHERE n_name LIKE '%!_X' ESCAPE '!') AS n_upd
        |FROM dml_demo""".stripMargin,

    "catalog_table_info" ->
      """SELECT CAST(cid AS INTEGER) AS cid, name, CAST(type AS VARCHAR) AS type
        |FROM pragma_table_info('nation')""".stripMargin,

    "fn_collate" ->
      """SELECT count(DISTINCT lower(n_name)) AS n_nocase,
        |  min(n_name COLLATE NOCASE) AS first_name,
        |  strip_accents('Málagà') AS stripped
        |FROM nation""".stripMargin,

    "win_filtered" ->
      """SELECT n_regionkey, n_nationkey,
        |  CAST(count(*) FILTER (WHERE n_nationkey % 2 = 0)
        |    OVER (PARTITION BY n_regionkey) AS BIGINT) AS n_even,
        |  CAST(sum(n_nationkey) FILTER (WHERE n_nationkey > 10)
        |    OVER (PARTITION BY n_regionkey) AS BIGINT) AS s_hi
        |FROM nation""".stripMargin,

    "fn_list_ops" ->
      """WITH g AS (SELECT n_regionkey,
        |             list(n_name ORDER BY n_nationkey) AS l
        |           FROM nation GROUP BY n_regionkey)
        |SELECT n_regionkey,
        |  array_to_string(list_reverse_sort(l), '|') AS rs,
        |  CAST(list_unique(list_concat(l, l)) AS BIGINT) AS uniq,
        |  array_to_string(flatten([l, l]), '|') AS fl,
        |  CAST(list_position(l, 'NATION_5') AS BIGINT) AS pos5
        |FROM g""".stripMargin,

    "fn_long_tail" ->
      """SELECT
        |  TIMESTAMP '1996-03-05 07:08:09' + to_days(5) AS d5,
        |  TIMESTAMP '1996-03-05 07:08:09' + to_hours(30) AS h30,
        |  TIMESTAMP '1996-03-05 07:08:09' + to_minutes(90) AS m90,
        |  TIMESTAMP '1996-03-05 07:08:09' + to_seconds(3661) AS s3661,
        |  TIMESTAMP '1996-03-05 07:08:09' + to_months(14) AS mo14,
        |  TIMESTAMP '1996-03-05 07:08:09' + to_years(2) AS y2,
        |  CAST(bit_length('abc') AS BIGINT) AS bl,
        |  regexp_full_match('banana', 'b.n.*') AS rfm1,
        |  regexp_full_match('banana', 'an') AS rfm2,
        |  round(jaro_similarity('MARTHA', 'MARHTA'), 6) AS js,
        |  CAST(length_grapheme('cafe' || chr(769)) AS BIGINT) AS lg,
        |  left_grapheme('cafe' || chr(769), 4) AS leftg,
        |  right_grapheme('cafe' || chr(769), 2) AS rightg,
        |  substring_grapheme('cafe' || chr(769) || 'xyz', 4, 2) AS subg""".stripMargin,

    "fn_string_predicates" ->
      """SELECT s_suppkey,
        |  prefix(s_name, 'Supplier') AS p,
        |  suffix(s_name, '1') AS sx,
        |  contains(s_name, '#00') AS c,
        |  starts_with(s_name, 'Supp') AS sw,
        |  CAST(mismatches(s_name, 'Supplier#000000000') AS BIGINT) AS mm,
        |  CAST(editdist3(s_name, 'Supplier#000000000') AS BIGINT) AS ed
        |FROM supplier""".stripMargin,

    "agg_mad" ->
      """SELECT l_returnflag,
        |  round(CAST(mad(l_quantity) AS DOUBLE), 2) AS mad_qty
        |FROM lineitem GROUP BY l_returnflag""".stripMargin,

    "fn_bitstring" ->
      """SELECT i, bin(i) AS b,
        |  CAST(bit_count(CAST(bin(i) AS BIT)) AS BIGINT) AS n_ones,
        |  CAST(get_bit(CAST(bin(i) AS BIT), 0) AS INTEGER) AS first_bit,
        |  CAST(set_bit(CAST(bin(i) AS BIT), 0, 1) AS VARCHAR) AS set0,
        |  CAST(strpos(bin(i), '101') AS BIGINT) AS pos101,
        |  CAST(CAST(lpad(bin(i), 8, '0') AS BIT)
        |    & CAST(lpad(bin(i + 1), 8, '0') AS BIT) AS VARCHAR) AS band,
        |  CAST(~CAST(lpad(bin(i), 8, '0') AS BIT) AS VARCHAR) AS bnot,
        |  CAST(xor(CAST(lpad(bin(i), 8, '0') AS BIT),
        |           CAST(lpad(bin(i + 1), 8, '0') AS BIT)) AS VARCHAR) AS bxor
        |FROM range(5, 200) t(i)""".stripMargin,

    "fn_blob" ->
      """SELECT doc_id, base64(encode(text)) AS b64, md5(text) AS m5,
        |  CAST(octet_length(encode(text)) AS BIGINT) AS nbytes,
        |  upper(hex(encode(substring(text, 1, 4)))) AS hx,
        |  decode(from_base64(base64(encode(text)))) = text AS rt
        |FROM documents""".stripMargin,

    "agg_list" ->
      """SELECT n_regionkey,
        |  array_to_string(list(n_name ORDER BY n_nationkey), '|') AS names,
        |  array_to_string(list_slice(list(n_name ORDER BY n_nationkey), 1, 2), '|') AS first2,
        |  CAST(count(*) AS BIGINT) AS n
        |FROM nation GROUP BY n_regionkey""".stripMargin,

    "catalog_sql_dml" ->
      (sqlDmlStatements :+ sqlDmlSelect).mkString(";\n"),

    "agg_grouping_fn" ->
      """SELECT l_returnflag, l_linestatus, CAST(count(*) AS BIGINT) AS n,
        |  CAST(grouping(l_returnflag) AS BIGINT) AS g_rf,
        |  CAST(grouping(l_linestatus) AS BIGINT) AS g_ls
        |FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,

    "dialect_create_view" ->
      (dialectViewStatements :+ dialectViewSelect).mkString(";\n"),

    "dialect_with_recursive" -> withRecursiveSql,

    "dialect_pivot" ->
      """SELECT o_orderpriority, round(F, 2) AS f, round(O, 2) AS o, round(P, 2) AS p
        |FROM (PIVOT orders ON o_orderstatus USING sum(o_totalprice) GROUP BY o_orderpriority)
        |ORDER BY o_orderpriority""".stripMargin,

    "dialect_unpivot" ->
      """SELECT o_orderstatus, k, round(v, 2) AS v
        |FROM (UNPIVOT (PIVOT orders ON o_orderpriority USING sum(o_totalprice)
        |               GROUP BY o_orderstatus)
        |      ON COLUMNS(* EXCLUDE (o_orderstatus)) INTO NAME k VALUE v)
        |ORDER BY o_orderstatus, k""".stripMargin,

    "fn_json_wide" ->
      """SELECT event_type, CAST(count(*) AS BIGINT) AS n,
        |  CAST(sum(CAST(json_extract_string(j, '$.a.b') AS BIGINT)) AS BIGINT) AS sum_b,
        |  CAST(sum(json_array_length(j, '$.arr')) AS BIGINT) AS sum_arr_len,
        |  CAST(sum(CASE WHEN json_extract_string(props, '$.k') IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_valid,
        |  CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k
        |FROM (SELECT event_type, props,
        |        concat('{"a": {"b": ', CAST(event_id % 97 AS VARCHAR),
        |               '}, "arr": [1, 2, ', CAST(event_id % 10 AS VARCHAR), ']}') AS j
        |      FROM events)
        |GROUP BY event_type ORDER BY event_type""".stripMargin,

    "fn_list_setops" ->
      """SELECT event_id,
        |  coalesce(array_to_string(list_sort(list_intersect(a, b)), ','), '') AS inter,
        |  coalesce(array_to_string(list_sort(list_distinct(list_filter(a, x -> NOT list_contains(b, x)))), ','), '') AS exc,
        |  coalesce(array_to_string(list_sort(list_distinct(list_concat(a, b))), ','), '') AS uni,
        |  list_has_any(a, b) AS has_any,
        |  list_has_all(a, b) AS has_all,
        |  array_to_string(regexp_extract_all(txt, '[0-9]+'), ',') AS nums
        |FROM (SELECT event_id,
        |        [CAST(event_id % 5 AS INTEGER), CAST(event_id % 7 AS INTEGER),
        |         CAST(event_id % 11 AS INTEGER)] AS a,
        |        [CAST(event_id % 3 AS INTEGER), CAST(event_id % 7 AS INTEGER),
        |         CAST(4 AS INTEGER)] AS b,
        |        concat('a', CAST(event_id AS VARCHAR), ' b',
        |               CAST(event_id % 7 AS VARCHAR)) AS txt
        |      FROM events WHERE event_id < 2000)
        |ORDER BY event_id""".stripMargin,

    "arrow_roundtrip" ->
      """SELECT o_orderstatus, CAST(count(*) AS BIGINT) AS n,
        |  round(sum(o_totalprice), 2) AS total,
        |  min(o_orderdate) AS first_dt,
        |  max(o_orderpriority) AS top_pri
        |FROM orders WHERE o_orderkey <= 2000
        |GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin,

    "catalog_ctas" ->
      """CREATE OR REPLACE TABLE ctas_demo AS
        |SELECT l_returnflag, round(sum(l_quantity), 2) AS qty
        |FROM lineitem GROUP BY l_returnflag;
        |SELECT l_returnflag, qty FROM ctas_demo""".stripMargin,

    "catalog_summarize" ->
      """SELECT column_name, column_type, min, max,
        |  CAST(count AS BIGINT) AS count,
        |  CAST(null_percentage AS DOUBLE) AS null_pct
        |FROM (SUMMARIZE orders)""".stripMargin,

    "catalog_sequence" ->
      """DROP SEQUENCE IF EXISTS r3seq;
        |CREATE SEQUENCE r3seq START 100 INCREMENT 7;
        |SELECT CAST(i AS BIGINT) AS i, CAST(nextval('r3seq') AS BIGINT) AS v
        |FROM range(1, 7) t(i)""".stripMargin,

    "win_named" -> winNamedSql,
    "tpch_q3ish" -> q3Sql,
    "tpch_q5ish" -> q5Sql,
    "tpch_q6ish" -> q6Sql,
    "tpch_q8ish" -> q8Sql,
    "tpch_q9ish" -> q9Sql,
    "tpch_q11ish" -> q11Sql,
    "tpch_q15ish" -> q15Sql,
    "tpch_q17ish" -> q17Sql,
    "tpch_q19ish" -> q19Sql,
    "tpch_q20ish" -> q20Sql,
    "tpch_q21ish" -> q21Sql,

    "sql_copy_parquet" ->
      """COPY (SELECT l_orderkey, l_quantity, l_extendedprice
        |      FROM lineitem WHERE l_orderkey <= 2000)
        |TO '/root/repo/target/copy_duck_li.parquet' (FORMAT PARQUET);
        |SELECT count(*) AS n, round(sum(l_quantity), 2) AS sum_qty,
        |  round(sum(l_extendedprice), 2) AS sum_price
        |FROM read_parquet('/root/repo/target/copy_duck_li.parquet')""".stripMargin,

    "dialect_prepare" ->
      """PREPARE qty_cut AS
        |SELECT l_returnflag, count(*) AS n,
        |  round(sum(l_extendedprice), 2) AS total
        |FROM lineitem WHERE l_quantity <= $1 AND l_partkey % $2 = 0
        |GROUP BY l_returnflag;
        |EXECUTE qty_cut(10, 3)""".stripMargin,

    "scan_repeat" ->
      """SELECT count(*) AS n, count(*) FILTER (WHERE ab = 'ab') AS n_ab
        |FROM repeat('ab', 4)""".stripMargin,

    "csv_options" ->
      """SELECT * FROM
        |(SELECT count(*) AS n_skip, CAST(sum(n_nationkey) AS BIGINT) AS key_sum
        | FROM read_csv('/root/repo/target/csv_opts/skip_demo.csv',
        |               skip=2, delim='|', header=true, normalize_names=true))
        |CROSS JOIN
        |(SELECT count(*) AS n_union, count(n_name) AS n_name_rows,
        |        count(n_regionkey) AS n_region_rows
        | FROM read_csv(['/root/repo/target/csv_opts/u_a.csv',
        |                '/root/repo/target/csv_opts/u_b.csv'],
        |               union_by_name=true, header=true))
        |CROSS JOIN
        |(SELECT count(*) AS n_hive,
        |        CAST(sum(CAST(key AS BIGINT)) AS BIGINT) AS key_part_sum
        | FROM read_csv('/root/repo/target/csv_opts/pt/*/*.csv',
        |               hive_partitioning=true, header=true))""".stripMargin,

    "fn_datetime_parts" ->
      """SELECT o_orderkey,
        |  CAST(date_part('quarter', d) AS BIGINT) AS qtr,
        |  CAST(date_part('week', d) AS BIGINT) AS wk,
        |  CAST(date_part('doy', d) AS BIGINT) AS doy,
        |  CAST(century(d) AS BIGINT) AS century,
        |  CAST(decade(d) AS BIGINT) AS decade,
        |  last_day(d) AS month_end,
        |  CAST(date_trunc('quarter', d) AS DATE) AS qtr_start
        |FROM (SELECT o_orderkey, CAST(o_orderdate AS DATE) AS d
        |      FROM orders WHERE o_orderkey <= 500)""".stripMargin,

    "fn_enum" ->
      """DROP TYPE IF EXISTS prio_t;
        |CREATE TYPE prio_t AS ENUM ('1-URGENT','2-HIGH','3-MEDIUM','4-NOT SPECIFIED','5-LOW');
        |SELECT CAST(p AS VARCHAR) AS prio,
        |  CAST(list_position(enum_range(NULL::prio_t), CAST(p AS VARCHAR)) - 1 AS INTEGER) AS code,
        |  enum_first(NULL::prio_t) AS first_val,
        |  enum_last(NULL::prio_t) AS last_val,
        |  n
        |FROM (SELECT CAST(o_orderpriority AS prio_t) AS p, count(*) AS n
        |      FROM orders GROUP BY 1)""".stripMargin,

    "dialect_table_macro" ->
      """CREATE OR REPLACE MACRO top_parts(n) AS TABLE
        |SELECT p_partkey, p_type, p_retailprice FROM part
        |ORDER BY p_partkey LIMIT n;
        |SELECT t.p_type, count(*) AS n, round(sum(t.p_retailprice), 2) AS price_sum
        |FROM top_parts(50) t GROUP BY t.p_type""".stripMargin
  )
}

package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.{Engine, SqlDialect}

/** Round-4 additions: automatic range-join planning coverage, the
  * remaining DuckDB v0.7 surface gaps (ON CONFLICT, system sampling,
  * duckdb_functions()), and three training-data curation operators —
  * benchmark decontamination, sequence packing, stratified quota
  * sampling — each with an exact SQL oracle.
  */
object Round4 {

  /** Whitespace tokens, lowercased, empties dropped — the shared
    * tokenization for the curation ops (identical regex semantics in
    * Spark and the DuckDB oracle, so gram strings compare exactly). */
  private def wsTokens(text: Column): Column =
    filter(split(lower(text), "\\s+"), x => x =!= "")

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Engine.table(s, dir, name)

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    "join_range_autoplan" -> ((s, dir) => {
      // the SAME plain band join as join_range_inequality with NO conf at
      // all: RangeJoinRule derives quantile bucket boundaries from the
      // point distribution at plan time (reference picks its range
      // operators from the condition shape alone, duckdb-4.cpp:9054).
      // bucketWidth is pinned to 0 because verify/bench share one session
      // and join_range_autorewrite sets a width — this query must prove
      // the statistics path specifically.
      graft.functions.DuckFunctions.register(s)
      val before = s.conf.getOption("spark.graft.rangeJoin.bucketWidth")
      s.conf.set("spark.graft.rangeJoin.bucketWidth", "0")
      try {
        val su = t(s, dir, "supplier"); val c = t(s, dir, "customer")
        val joined = su.join(c, col("c_acctbal") > col("s_acctbal") - 10.0 &&
            col("c_acctbal") <= col("s_acctbal"))
          .groupBy(col("s_suppkey")).agg(count(lit(1)).as("n_in_band"))
        // materialize the plan under the pinned conf (optimization is
        // lazy; restoring the conf first would re-enable the width path)
        joined.queryExecution.executedPlan
        joined
      } finally before match {
        case Some(w) => s.conf.set("spark.graft.rangeJoin.bucketWidth", w)
        case None => s.conf.unset("spark.graft.rangeJoin.bucketWidth")
      }
    }),

    "catalog_on_conflict" -> ((s, dir) => {
      // INSERT OR REPLACE + ON CONFLICT DO NOTHING / DO UPDATE SET with
      // excluded.* (reference conflict binding, duckdb-4.cpp:9996-10015)
      // — identical statement text runs natively on the oracle
      Engine.registerAll(s, dir)
      onConflictStatements.foreach(stmt => SqlDialect.sql(s, stmt))
      SqlDialect.sql(s, onConflictSelect)
    }),

    "sample_system" -> ((s, dir) => {
      // USING SAMPLE p% (system, seed): block-granular sampling
      // (reference SampleMethod::SYSTEM_SAMPLE, duckdb.hpp:20017). RNG
      // streams are engine-local, so the oracle checks the contract:
      // non-empty proper subset, sampled fraction within a loose
      // block-variance bound, and seeded determinism (same seed twice =
      // same count). Each engine verifies its OWN sample.
      Engine.registerAll(s, dir)
      SqlDialect.sql(s, sampleSystemSql)
    }),

    "catalog_explain_analyze" -> ((s, dir) => {
      // EXPLAIN ANALYZE (reference QueryProfiler, duckdb-7.cpp:5536):
      // profiler output itself is engine-specific, so the oracle checks
      // the plan-independent invariant — the topmost operator that
      // reports an output-row metric emits exactly the query's result
      // cardinality, whatever physical plan either engine picked.
      Engine.registerAll(s, dir)
      val prof = SqlDialect.sql(s,
        "EXPLAIN ANALYZE SELECT o_orderpriority, count(*) AS n " +
          "FROM orders GROUP BY o_orderpriority")
      prof.filter(col("output_rows").isNotNull)
        .orderBy(col("operator_id"))
        .limit(1)
        .select(col("output_rows").cast("long").as("top_rows"))
    }),

    "catalog_functions" -> ((s, dir) => {
      // duckdb_functions() catalog fn (duckdb-6.cpp:14150-14176): the
      // probe list is a fixed set of DuckDB function names graft claims —
      // a name missing from EITHER engine's registry drops a row and
      // fails the hash compare, so this catches registry drift both ways
      Engine.registerAll(s, dir)
      SqlDialect.sql(s, functionsSql)
    }),

    "text_decontaminate" -> ((s, dir) => {
      // Benchmark decontamination: flag training docs whose word 8-grams
      // overlap a held-out eval source (src0 plays the benchmark). The
      // eval gram set is tiny by nature (benchmarks are MBs, corpora are
      // TBs) so it is BROADCAST — the corpus is never shuffled for the
      // probe; grams of a doc stay in the doc's input partition, so the
      // per-doc hit count partial-aggregates to one row per doc before
      // the only shuffle.
      val docs = t(s, dir, "documents")
      val grams = docs.select(col("doc_id"), col("source"), wsTokens(col("text")).as("w"))
        .filter(size(col("w")) >= 8)
        .select(col("doc_id"), col("source"),
          explode(array_distinct(transform(sequence(lit(0), size(col("w")) - 8),
            i => array_join(slice(col("w"), i + 1, lit(8)), " ")))).as("g"))
      val ev = grams.filter(col("source") === "src0")
        .select(col("g")).distinct().withColumn("hit", lit(1))
      grams.filter(col("source") =!= "src0")
        .join(broadcast(ev), Seq("g"), "left")
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_grams"), count(col("hit")).as("n_hit"))
        .filter(col("n_hit") > 0)
        .withColumn("contam", round(col("n_hit") / col("n_grams"), 6))
        .orderBy(col("doc_id"))
    }),

    "pipeline_pack_sequences" -> ((s, dir) => {
      // Concatenate-and-chunk sequence packing (GPT-style): per
      // (source, shard) the token stream is laid out in doc_id order and
      // cut every 512 tokens; each doc is assigned the sequence its first
      // token lands in. Sharding by doc_id % 8 bounds every window
      // partition — the scale answer to "a total order per source is a
      // one-reducer sort at 100 TB".
      val docs = t(s, dir, "documents")
      val toksz = docs.select(col("doc_id"), col("source"),
          size(wsTokens(col("text"))).cast("long").as("tok"))
        .withColumn("shard", pmod(col("doc_id"), lit(8L)))
      val w = Window.partitionBy(col("source"), col("shard")).orderBy(col("doc_id"))
      toksz.withColumn("seq_id",
          floor((sum(col("tok")).over(w) - col("tok")) / lit(512.0)).cast("long"))
        .groupBy(col("source"), col("shard"), col("seq_id"))
        .agg(count(lit(1)).as("n_docs"), sum(col("tok")).as("n_tokens"),
          min(col("doc_id")).as("first_doc"), max(col("doc_id")).as("last_doc"))
        .orderBy(col("source"), col("shard"), col("seq_id"))
    }),

    "pipeline_quota_sample" -> ((s, dir) => {
      // Stratified quota sampling: exactly 10 docs per source, chosen by
      // a seedless arithmetic hash (LCG over doc_id) both engines compute
      // bit-identically — deterministic curation sampling without
      // engine-local RNG. One window shuffle on the strata key; rank
      // truncation is a TopK per stratum, not a global sort.
      val docs = t(s, dir, "documents")
      val h = pmod(pmod(col("doc_id"), lit(1000003L)) * lit(1103515245L) + lit(12345L),
        lit(2147483647L))
      val w = Window.partitionBy(col("source")).orderBy(h.asc, col("doc_id").asc)
      docs.withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 10)
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_sampled"), sum(col("n_chars")).as("sampled_chars"),
          min(col("doc_id")).as("min_doc"), max(col("doc_id")).as("max_doc"))
        .orderBy(col("source"))
    })
  )

  private[queries] val onConflictStatements = Seq(
    "DROP TABLE IF EXISTS conf_t",
    "CREATE TABLE conf_t (id INTEGER PRIMARY KEY, name VARCHAR, qty INTEGER)",
    "INSERT INTO conf_t VALUES (1, 'a', 10), (2, 'b', 20), (3, 'c', 30)",
    // key 2 exists: replaced; key 4 fresh: inserted
    "INSERT OR REPLACE INTO conf_t VALUES (2, 'B2', 200), (4, 'd', 40)",
    // key 1 exists: skipped; key 5 fresh: inserted
    "INSERT INTO conf_t VALUES (1, 'dup', 999), (5, 'e', 50) ON CONFLICT DO NOTHING",
    // key 3 exists: assignments applied (excluded.* = incoming row);
    // key 6 fresh: inserted
    "INSERT INTO conf_t VALUES (3, 'c3', 5), (6, 'f', 60) " +
      "ON CONFLICT (id) DO UPDATE SET qty = qty + excluded.qty, name = excluded.name")

  private[queries] val onConflictSelect =
    "SELECT id, name, qty FROM conf_t ORDER BY id"

  private[queries] val sampleSystemSql =
    """WITH pop AS (SELECT count(*) AS n_total FROM lineitem),
      |s1 AS (SELECT count(*) AS n1
      |       FROM (SELECT * FROM lineitem USING SAMPLE 50% (system, 7))),
      |s2 AS (SELECT count(*) AS n2
      |       FROM (SELECT * FROM lineitem USING SAMPLE 50% (system, 7)))
      |SELECT CAST(n_total AS BIGINT) AS n_total,
      |  (n1 > 0 AND n1 < n_total) AS nonempty_proper,
      |  (abs(n1 / CAST(n_total AS DOUBLE) - 0.5) <= 0.45) AS frac_ok,
      |  (n1 = n2) AS repeat_ok
      |FROM pop, s1, s2""".stripMargin

  private[queries] val functionsSql =
    """SELECT DISTINCT function_name FROM duckdb_functions()
      |WHERE function_name IN (
      |  'abs','acos','asin','atan','atan2','bar','bit_count','bit_position',
      |  'cbrt','ceil','chr','concat','contains','corr','cos','date_part',
      |  'date_trunc','dayname','degrees','exp','factorial','floor','gamma',
      |  'get_bit','greatest','hamming','instr','jaccard','jaro_similarity',
      |  'jaro_winkler_similarity','kurtosis','least','left_grapheme',
      |  'length_grapheme','levenshtein','lgamma','ln','log10','log2','lower',
      |  'lpad','ltrim','make_date','make_timestamp','md5','median','mismatches',
      |  'mode','monthname','nextafter','nfc_normalize','pi','position','printf',
      |  'radians','regexp_extract','regexp_replace','regr_slope','repeat',
      |  'reverse','round','rpad','rtrim','set_bit','sign','signbit','sin',
      |  'skewness','split_part','sqrt','stddev','strip_accents',
      |  'substring_grapheme','tan','translate','trim','typeof','upper')
      |ORDER BY function_name""".stripMargin

  val oracle: Map[String, String] = Map(

    "join_range_autoplan" ->
      """SELECT s_suppkey, count(*) AS n_in_band
        |FROM supplier JOIN customer
        |  ON c_acctbal > s_acctbal - 10.0 AND c_acctbal <= s_acctbal
        |GROUP BY s_suppkey""".stripMargin,

    "catalog_on_conflict" ->
      (onConflictStatements :+ onConflictSelect).mkString(";\n"),

    "sample_system" -> sampleSystemSql,

    "catalog_explain_analyze" ->
      """SELECT CAST(count(*) AS BIGINT) AS top_rows
        |FROM (SELECT o_orderpriority FROM orders GROUP BY o_orderpriority)""".stripMargin,

    "catalog_functions" -> functionsSql,

    "text_decontaminate" ->
      """WITH toks AS (
        |  SELECT doc_id, source,
        |    list_filter(regexp_split_to_array(lower(text), '\s+'), x -> x <> '') AS w
        |  FROM documents),
        |grams AS (
        |  SELECT DISTINCT doc_id, source, array_to_string(w[i:i+7], ' ') AS g
        |  FROM toks, unnest(range(1, len(w)-6)) AS t(i) WHERE len(w) >= 8),
        |ev AS (SELECT DISTINCT g FROM grams WHERE source = 'src0')
        |SELECT doc_id, count(*) AS n_grams,
        |  count(*) FILTER (g IN (SELECT g FROM ev)) AS n_hit,
        |  round(count(*) FILTER (g IN (SELECT g FROM ev)) / CAST(count(*) AS DOUBLE), 6) AS contam
        |FROM grams WHERE source <> 'src0'
        |GROUP BY doc_id HAVING n_hit > 0 ORDER BY doc_id""".stripMargin,

    "pipeline_pack_sequences" ->
      """WITH toksz AS (
        |  SELECT doc_id, source,
        |    CAST(len(list_filter(regexp_split_to_array(lower(text), '\s+'), x -> x <> '')) AS BIGINT) AS tok,
        |    doc_id % 8 AS shard
        |  FROM documents),
        |seq AS (
        |  SELECT source, shard, doc_id, tok,
        |    CAST(floor((sum(tok) OVER (PARTITION BY source, shard ORDER BY doc_id)
        |                - tok) / 512.0) AS BIGINT) AS seq_id
        |  FROM toksz)
        |SELECT source, shard, seq_id, count(*) AS n_docs,
        |  CAST(sum(tok) AS BIGINT) AS n_tokens,
        |  min(doc_id) AS first_doc, max(doc_id) AS last_doc
        |FROM seq GROUP BY source, shard, seq_id
        |ORDER BY source, shard, seq_id""".stripMargin,

    "pipeline_quota_sample" ->
      """WITH ranked AS (
        |  SELECT source, doc_id, n_chars,
        |    row_number() OVER (PARTITION BY source
        |      ORDER BY ((doc_id % 1000003) * 1103515245 + 12345) % 2147483647, doc_id) AS rn
        |  FROM documents)
        |SELECT source, count(*) AS n_sampled,
        |  CAST(sum(n_chars) AS BIGINT) AS sampled_chars,
        |  min(doc_id) AS min_doc, max(doc_id) AS max_doc
        |FROM ranked WHERE rn <= 10
        |GROUP BY source ORDER BY source""".stripMargin
  )
}

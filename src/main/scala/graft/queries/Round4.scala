package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.{Engine, SqlDialect}
import graft.operators.Curation

/** Round-4 additions: automatic range-join planning coverage, the
  * remaining DuckDB v0.7 surface gaps (ON CONFLICT, system sampling,
  * duckdb_functions()), and three training-data curation operators —
  * benchmark decontamination, sequence packing, stratified quota
  * sampling — each with an exact SQL oracle.
  */
object Round4 {

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
      // Benchmark decontamination (operators.Curation.decontaminate):
      // flag training docs whose word 8-grams overlap a held-out eval
      // source (src0 plays the benchmark). Eval gram set broadcast;
      // the corpus is never shuffled for the probe.
      val docs = t(s, dir, "documents")
      Curation.decontaminate(
        docs.filter(col("source") =!= "src0"), "doc_id", "text",
        Curation.evalGrams(docs.filter(col("source") === "src0"), "text"))
        .orderBy(col("doc_id"))
    }),

    "pipeline_pack_sequences" -> ((s, dir) => {
      // Concatenate-and-chunk sequence packing
      // (operators.Curation.packSequences): per (source, doc_id%8 shard)
      // the token stream is cut every 512 tokens; sharding bounds every
      // window partition at any corpus size.
      Curation.packSequences(t(s, dir, "documents"), "doc_id", "source",
          "text", budget = 512, numShards = 8)
        .orderBy(col("source"), col("shard"), col("seq_id"))
    }),

    "pipeline_quota_sample" -> ((s, dir) => {
      // Stratified quota sampling (operators.Curation.quotaSample):
      // exactly 10 docs per source by a seedless LCG hash both engines
      // compute bit-identically; two-phase sharded rank, no one-reducer
      // stratum sort.
      Curation.quotaSample(t(s, dir, "documents"), "doc_id", "source",
          quota = 10, numShards = 8)
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_sampled"), sum(col("n_chars")).as("sampled_chars"),
          min(col("doc_id")).as("min_doc"), max(col("doc_id")).as("max_doc"))
        .orderBy(col("source"))
    }),

    "pipeline_semantic_cluster" -> ((s, dir) => {
      // Integer-exact distributed k-means (Similarity.semanticClusters):
      // the semantic-clustering step of a curation pipeline. Quantized
      // vectors + exact int64 distances + floor-division centroid update
      // make the full per-row assignment bit-replayable by the SQL
      // oracle — the strongest possible check for an iterative operator.
      graft.operators.Similarity.semanticClusters(
          t(s, dir, "embeddings"), "vec_id", "embedding",
          k = 8, iterations = 2)
        .select(col("id").as("vec_id"), col("cid"))
        .orderBy(col("vec_id"))
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
        |      ORDER BY (((doc_id % 2147483647) * 48271 + 12345) % 2147483647) * 2147483629
        |               + (((doc_id % 2147483629) * 16807 + 67890) % 2147483629), doc_id) AS rn
        |  FROM documents)
        |SELECT source, count(*) AS n_sampled,
        |  CAST(sum(n_chars) AS BIGINT) AS sampled_chars,
        |  min(doc_id) AS min_doc, max(doc_id) AS max_doc
        |FROM ranked WHERE rn <= 10
        |GROUP BY source ORDER BY source""".stripMargin,

    "pipeline_semantic_cluster" -> semanticClusterSql(k = 8, iterations = 2)
  )

  /** DuckDB replay of [[graft.operators.Similarity.semanticClusters]]:
    * every step is exact integer math (quantized vectors; squared-L2
    * distances as exact-integer-valued doubles via the dot-product
    * identity |w-c|² = w·w - 2w·c + c·c, all < 2^53; centroid update =
    * floor division written as the floorMod identity
    * `(s - ((s % n) + n) % n) // n` over DuckDB's exact HUGEINT sums,
    * which equals Math.floorDiv at ANY magnitude — a floor(double/count)
    * form would diverge once a cluster's per-dim sum neared 2^52), so
    * the full per-row assignment matches the engine bit for bit. One
    * `aN`/`cN` CTE pair per Lloyd iteration, built by this helper to
    * keep the two iterations textually identical. */
  private def semanticClusterSql(k: Int, iterations: Int): String = {
    def cdCte(i: Int) =
      s"""cd$i AS (
         |  SELECT j, c, CAST(c AS DOUBLE[]) AS cd,
         |    list_dot_product(CAST(c AS DOUBLE[]), CAST(c AS DOUBLE[])) AS cc
         |  FROM c$i)""".stripMargin
    def assignCte(name: String, ci: Int) =
      s"""$name AS (
         |  SELECT ed.vec_id,
         |    min(CAST(ed.ww - 2*list_dot_product(ed.wd, cd$ci.cd) + cd$ci.cc AS BIGINT)
         |        * $k + cd$ci.j) % $k AS cid
         |  FROM ed CROSS JOIN cd$ci
         |  GROUP BY ed.vec_id)""".stripMargin
    def updateCtes(i: Int) =
      s"""s$i AS (
         |  SELECT j, dim,
         |    CAST((sum(val) - (((sum(val) % count(*)) + count(*)) % count(*)))
         |         // count(*) AS BIGINT) AS cdim
         |  FROM (
         |    SELECT a$i.cid AS j, unnest(e.w) AS val, unnest(range(1, len(e.w)+1)) AS dim
         |    FROM a$i JOIN e USING (vec_id))
         |  GROUP BY j, dim),
         |c$i AS (
         |  SELECT c${i - 1}.j, COALESCE(u.c, c${i - 1}.c) AS c
         |  FROM c${i - 1} LEFT JOIN
         |    (SELECT j, list(cdim ORDER BY dim) AS c FROM s$i GROUP BY j) u USING (j))""".stripMargin
    val iterCtes = (1 to iterations).map { i =>
      s"${assignCte(s"a$i", i - 1)},\n${updateCtes(i)},\n${cdCte(i)}"
    }.mkString(",\n")
    s"""WITH e AS (
       |  SELECT vec_id,
       |    list_transform(CAST(embedding AS DOUBLE[]),
       |      x -> CAST(floor(x*1000 + 0.5) AS BIGINT)) AS w
       |  FROM embeddings),
       |ed AS (
       |  SELECT vec_id, CAST(w AS DOUBLE[]) AS wd,
       |    list_dot_product(CAST(w AS DOUBLE[]), CAST(w AS DOUBLE[])) AS ww
       |  FROM e),
       |c0 AS (
       |  SELECT row_number() OVER (ORDER BY vec_id) - 1 AS j, w AS c
       |  FROM (SELECT vec_id, w FROM e ORDER BY vec_id LIMIT $k)),
       |${cdCte(0)},
       |$iterCtes,
       |${assignCte("afinal", iterations)}
       |SELECT vec_id, cid FROM afinal ORDER BY vec_id""".stripMargin
  }
}

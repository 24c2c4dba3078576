package graft.plans

import graft.SparkSpec

/** Shuffle-budget contract: each query's physical plan may not exceed
  * its documented shuffle count. At 100 TB an accidental extra exchange
  * is the difference between one pass over the data and two — this spec
  * makes that regression a test failure instead of a bench surprise.
  * (Broadcast exchanges are excluded: they move dimension-sized data.)
  */
class ShuffleBudgetSpec extends SparkSpec {
  private val dir = "/root/testdata/sf0.001"

  // query -> max shuffle exchanges (the documented plan inventory)
  private val budgets = Seq(
    "scan_project_filter" -> 0, // pushdown only, no wide op
    "sort_topn" -> 0, // TakeOrderedAndProject: per-partition heaps + driver merge
    "dedup_exact" -> 1, // one window partitionBy(text)
    "agg_grouping_sets" -> 1, // partial agg before the exchange
    "win_share_of_total" -> 1, // one window partitionBy
    "text_tokens_top" -> 1, // explode is narrow; one groupBy(tok)
    "join_multiway_broadcast" -> 1, // 5 dims broadcast, one fact shuffle
    "agg_q1_pricing" -> 2, // agg exchange + output range sort
    "tpch_q5ish" -> 2, // one fact-side shuffle + output range sort
    "sim_cosine_topk" -> 1, // corpus scanned once; queries broadcast
    "dedup_minhash_pairs" -> 3, // band key + two scoring re-joins
    // round-3 pipeline batch
    "text_pii_scrub" -> 2, // scrub is a projection; groupBy + output sort
    "text_chunk" -> 0, // sequence+explode+slice: fully narrow
    "text_repetition" -> 4, // word agg, doc agg, source agg, output sort
    "pipeline_train_split" -> 2, // md5 bucket is a projection; agg + sort
    "emb_quantize" -> 2, // per-row quantize; label agg + output sort
    "text_unigram_lm" -> 6, // vocab agg + per-doc agg are the two wide ones
    "dialect_pivot" -> 3, // pivot agg + output sort (AQE coalesce counted)
    "fn_list_setops" -> 1, // projection + output range sort
    "arrow_roundtrip" -> 2, // IPC scan → agg + output sort
    "dialect_with_recursive" -> 1, // UnionLoop + final global agg
    // round-4 curation ops
    "text_decontaminate" -> 3, // eval-gram distinct (MB-sized) + per-doc agg + output sort; corpus probe is map-side
    "pipeline_pack_sequences" -> 2, // (strata,shard) window reused by the agg + output sort
    "pipeline_quota_sample" -> 3, // sharded rank + per-stratum re-rank (≤ shards·quota rows) + output sort
    "pipeline_semantic_cluster" -> 1) // assignment is map-only (centroid literals); output sort only

  for ((name, budget) <- budgets) {
    test(s"$name stays within $budget shuffle(s)") {
      val plan = graft.SparkEntry.queries(name)(spark, dir)
        .queryExecution.executedPlan.toString
      val shuffles = "Exchange".r.findAllIn(plan).size -
        "BroadcastExchange".r.findAllIn(plan).size
      assert(shuffles <= budget,
        s"$name plans $shuffles shuffles (budget $budget):\n$plan")
    }
  }
}

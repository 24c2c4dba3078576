package graft.plans

import graft.SparkSpec

/** Regression guard pinning the shuffle budgets won in round 6: the
  * embedding-dedup scored path folded its weighted dedup into the band
  * aggregate (3 → 2 shuffles) and the IVF serving path collapsed to one
  * corpus scan + one (qid) exchange. Both were previously asserted only
  * by wall-clock — a Catalyst upgrade (or a careless edit) could
  * silently re-inflate them and the bench would just read "a bit
  * slower". This spec fails loudly instead. Counted by WALKING the
  * final adaptive plan (string matching lies: ReusedExchange's
  * rendering repeats the referenced Exchange on its own line), where a
  * ReusedExchange is a read of an already-materialized shuffle, not a
  * new one.
  */
class ShuffleBudgetSpec extends SparkSpec {

  import org.apache.spark.sql.execution.SparkPlan
  import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
  import org.apache.spark.sql.execution.exchange.{ReusedExchangeExec, ShuffleExchangeLike}

  private def materializedShuffles(name: String): (Int, SparkPlan) =
    materializedShufflesOf(
      graft.SparkEntry.queries(name)(spark, "/root/testdata/sf0.001"))

  private def materializedShufflesOf(df: org.apache.spark.sql.DataFrame): (Int, SparkPlan) = {
    df.collect()
    val seen = scala.collection.mutable.Set[Int]()
    def walk(p: SparkPlan): Unit = p match {
      case a: AdaptiveSparkPlanExec => walk(a.executedPlan)
      case q: QueryStageExec => walk(q.plan)
      case _: ReusedExchangeExec => () // reads an existing materialization
      case e: ShuffleExchangeLike => seen += e.id; e.children.foreach(walk)
      case other => other.children.foreach(walk)
    }
    val root = df.queryExecution.executedPlan
    walk(root)
    (seen.size, root)
  }

  test("dedup_embedding_cosine_lsh materializes at most 2 shuffles") {
    val (n, plan) = materializedShuffles("dedup_embedding_cosine_lsh")
    assert(n <= 2, s"scored LSH path re-inflated to $n shuffles (budget 2):\n$plan")
  }

  test("sim_ivf_topk materializes at most 2 shuffles") {
    val (n, plan) = materializedShuffles("sim_ivf_topk")
    assert(n <= 2, s"IVF serving path re-inflated to $n shuffles (budget 2):\n$plan")
  }

  // The remaining headline scale paths with tight, stable budgets
  // (measured at the round-7 plans; each number is the documented
  // shuffle inventory of the operator, not an observed accident):
  // minhash = banded exchange (reused by both join sides) + pair
  // scoring agg; prefix filter = prefix-token exchange + pair agg;
  // brute cosine top-k = ONE per-query-id aggregation exchange, the
  // corpus itself never shuffles; exact dedup = the one groupBy(text).
  // bm25 (r13 SpaceTermCounts rebuild) = the one (id, dl, tfs) base
  // repartition (reused by the stats branch) + the 1-row stats+df agg;
  // scoring is a pure projection and top-k is TakeOrderedAndProject,
  // not a shuffle.
  // incremental = one banded exchange per side (each side's hot-bucket
  // cap rides its OWN exchange) + the emitted-pair dropDuplicates; the
  // shingle-refine joins ride broadcast/reuse, never a new shuffle.
  // epoch shuffle = (epoch, shard) rank window + shard-count agg + the
  // epochs·shards offset window + the QUERY's presentation orderBy.
  // hybrid = the bm25 arm's tf/stats/final + the two bounded rank
  // windows + the tiny full-outer fusion join, 5 after reuse.
  // r18: the production prefix-filter path materializes its shingled
  // corpus + prefix relation via localCheckpoint, which moves the
  // pipeline's stages into the checkpoint jobs and out of the FINAL
  // plan — a budget assert on the row would pin an ExistingRDD stub.
  // The pipeline's shuffle inventory is pinned on the INLINE form
  // (materialize = false), which is the same stage graph computed once.
  test("dedup_prefix_filter (inline pipeline) materializes at most 2 shuffles") {
    val docs = graft.Engine.table(spark, "/root/testdata/sf0.001", "documents")
    val (n, plan) = materializedShufflesOf(
      graft.operators.Dedup.jaccardThresholdPairs(
          docs, "doc_id", "text", shingleN = 3, threshold = 0.8,
          materialize = false)
        .select(org.apache.spark.sql.functions.col("id_a"),
          org.apache.spark.sql.functions.col("id_b")))
    assert(n <= 2, s"dedup_prefix_filter inline: $n shuffles\n$plan")
  }

  for ((name, budget) <- Seq(
    "dedup_minhash_pairs" -> 2,
    "sim_cosine_topk" -> 1,
    "dedup_exact" -> 1,
    "text_bm25_topk" -> 2,
    "dedup_incremental" -> 3,
    "pipeline_epoch_shuffle" -> 4,
    "sim_hybrid_rrf" -> 5,
    // dup spans = one gram exchange (in-partition min/max window) +
    // the doc-id island window; the island fold is ONE groupBy riding
    // the window's exchange and there is no presentation sort (r13)
    "text_dup_spans" -> 2,
    // semdedup = one cid exchange (the pair join's other side reuses
    // it) + the pruned-id distinct agg + the presentation orderBy;
    // the anti-join's pruned side broadcasts at this scale
    "pipeline_semdedup" -> 4,
    // boilerplate mining = (g, doc) collapse + per-gram agg + the
    // ≤ k-row presentation orderBy; top-k is TakeOrdered and the
    // reconstruction join broadcasts the k rows
    "text_boilerplate_topk" -> 4,
    // bigram LM = (doc,a,b) collapse + the (a,b) and (a) count
    // windows (c2/c1 attach in place — no join-back, no second pair
    // explode) + the 2-stage distinct context count for V + the
    // per-doc agg + the presentation orderBy = 6; the agg+join form
    // this replaced materialized 9 and ran the explode twice
    "text_bigram_lm" -> 6,
    // unigram LM (r16 rebuild) = the word-keyed count window + the
    // per-doc agg + the k-row per-source agg + the k-row global-total
    // window = 4; the freq-join form this replaced ran the
    // scan+explode twice and force-broadcast the full vocabulary
    "text_unigram_lm" -> 4)) {
    test(s"$name materializes at most $budget shuffle(s)") {
      val (n, plan) = materializedShuffles(name)
      assert(n <= budget,
        s"$name re-inflated to $n shuffles (budget $budget):\n$plan")
    }
  }
}

package graft.plans

import graft.SparkSpec

/** Plan contract for the scale-path dedup/similarity queries: none of
  * them may plan a BroadcastNestedLoopJoin or CartesianProduct — their
  * entire point is replacing the quadratic product with a key shuffle.
  * (The deliberate exact baselines — dedup_fuzzy_names,
  * dedup_embedding_cosine, dedup_ngram_jaccard — are NOT in this list;
  * each has a scale-path twin that is.)
  */
class ScalePathSpec extends SparkSpec {
  private val dir = "/root/testdata/sf0.001"

  private val scalePaths = Seq(
    "dedup_exact", "dedup_minhash_pairs", "dedup_prefix_filter",
    "dedup_simhash", "dedup_fuzzy_names_blocked",
    "dedup_embedding_cosine_lsh", "sim_lsh_ann",
    "dedup_components", "pipeline_end2end",
    // auto range-join planning: written as PLAIN inequality joins, the
    // optimizer rule must supply the bucketed shape with no conf set
    "join_interval_overlap", "join_range_autoplan")

  for (name <- scalePaths) {
    test(s"$name plans without BNLJ or cartesian product") {
      val plan = graft.SparkEntry.queries(name)(spark, dir)
        .queryExecution.executedPlan.toString
      assert(!plan.contains("BroadcastNestedLoopJoin"),
        s"$name plans a BNLJ:\n$plan")
      assert(!plan.contains("CartesianProduct"),
        s"$name plans a cartesian product:\n$plan")
    }
  }
}

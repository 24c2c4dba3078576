package graft.plans

import graft.SparkSpec

/** Runtime proof of the single-pass LSH banding design: the self-join's
  * two sides and the window skew cap must all read ONE materialized
  * shuffle of the banded rows. The static plan cannot show this — AQE
  * performs exchange reuse while materializing query stages — so the
  * contract is asserted on the FINAL adaptive plan after execution.
  */
class LshExchangeReuseSpec extends SparkSpec {

  private def finalPlan(name: String): String = {
    val df = graft.SparkEntry.queries(name)(spark, "/root/testdata/sf0.001")
    df.collect()
    // AdaptiveSparkPlanExec prints "== Final Plan ==" then
    // "== Initial Plan ==" — only the final section reflects what ran
    df.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
  }

  test("cosine-LSH self-join reuses the banded exchange at runtime") {
    val plan = finalPlan("dedup_embedding_cosine_lsh")
    assert(plan.contains("ReusedExchange"),
      s"expected the second join side to reuse the banded shuffle:\n$plan")
    // the banding subtree (explode of the kernel output) materialized once
    val explodes = "posexplode".r.findAllIn(plan).size
    assert(explodes == 1,
      s"banded subtree executed $explodes times (want 1):\n$plan")
    // the banding kernel is the codegen sign_lsh_buckets expression — a
    // ScalaUDF anywhere in this plan means the hot map stage regressed
    // to boxed per-row interpretation (round-4 verdict finding #1)
    assert(!plan.contains("UDF") && plan.contains("sign_lsh_buckets"),
      s"banding stage is not the codegen kernel:\n$plan")
    // r12 exchange-diet pins: vectors ride the banded exchange UN-WIDENED
    // (the float dot kernel at the join output — a plain array_dot here
    // means a cast-to-double array is being carried at twice the bytes),
    // and the 8-long bucket array is packed into ONE long below the
    // exchange (shiftleft compose) with masked bit-field compares
    // (shiftright) at the join output instead of array getItems
    assert(plan.contains("array_dot_float"),
      s"join-output cosine is not the float kernel (double carry?):\n$plan")
    assert(plan.contains("shiftleft") && plan.contains("shiftright"),
      s"bucket array is not packed through the exchange:\n$plan")
  }

  test("minhash band join reuses the banded exchange at runtime") {
    val plan = finalPlan("dedup_minhash_pairs")
    assert(plan.contains("ReusedExchange"),
      s"expected the second join side to reuse the banded shuffle:\n$plan")
    val explodes = "posexplode".r.findAllIn(plan).size
    assert(explodes == 1,
      s"banded subtree executed $explodes times (want 1):\n$plan")
  }

  test("bigram LM scale form derives V from the reused pair exchange (one corpus scan)") {
    // r11: with vocabFromPairs=true (the 100 TB form; the local default
    // keeps the shadowed second scan, measured faster here) the
    // vocabulary count is a second consumer of the same explicit
    // repartition(__a) exchange the c1/c2 windows sit on; the
    // prune-guard conditional keeps both consumers' subtrees
    // canonically identical so ReuseExchange fires and the corpus is
    // scanned + exploded exactly once
    val df = graft.operators.TextAnalysis.bigramLmScores(
      graft.Engine.table(spark, "/root/testdata/sf0.001", "documents"),
      "doc_id", "text", alpha = 0.1, vocabFromPairs = true)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
    assert(plan.contains("ReusedExchange"),
      s"expected the vocab branch to reuse the pair shuffle:\n$plan")
    val scans = "Scan parquet".r.findAllIn(plan).size
    assert(scans == 1,
      s"corpus scanned $scans times in the final plan (want 1):\n$plan")
    // and the two formulations compute the identical result
    val viaScan = graft.operators.TextAnalysis.bigramLmScores(
      graft.Engine.table(spark, "/root/testdata/sf0.001", "documents"),
      "doc_id", "text", alpha = 0.1)
    assert(df.collect().map(_.toString).sorted.toSeq ==
      viaScan.collect().map(_.toString).sorted.toSeq)
  }
}

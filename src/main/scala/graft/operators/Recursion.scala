package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col

/** Recursive-CTE evaluation (reference: LogicalRecursiveCTE
  * duckdb.hpp:9302, PhysicalRecursiveCTE duckdb-4.cpp:7608-7790 — iterate
  * the recursive term until no new rows, deduplicating against the union
  * so far).
  *
  * Spark has no native WITH RECURSIVE, so this is a driver-side fixpoint
  * loop. Each iteration is a distributed job; the driver only checks the
  * (cheap) new-row count. Lineage is truncated with localCheckpoint every
  * few rounds so deep recursions don't blow up the plan.
  */
object Recursion {

  /** UNION-semantics recursion: dedup new rows against everything seen.
    *
    * Both the frontier and the accumulator are eagerly localCheckpoint'ed
    * every iteration — without this the accumulator's plan grows by one
    * union+except per round and each `isEmpty` recomputes the whole
    * history (O(n²) jobs).
    */
  def fixpoint(seed: DataFrame, step: DataFrame => DataFrame,
               maxIterations: Int = 100): DataFrame = {
    val spark = seed.sparkSession
    // AQE re-plans every micro-iteration (several jobs per round) — for
    // the small per-step frames of a recursion that's pure overhead.
    val aqeBefore = spark.conf.get("spark.sql.adaptive.enabled", "true")
    val partsBefore = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "1")
    try fixpointLoop(seed, step, maxIterations)
    finally {
      spark.conf.set("spark.sql.adaptive.enabled", aqeBefore)
      spark.conf.set("spark.sql.shuffle.partitions", partsBefore)
    }
  }

  private def fixpointLoop(seed: DataFrame, step: DataFrame => DataFrame,
                           maxIterations: Int): DataFrame = {
    var acc = seed.distinct().localCheckpoint()
    var frontier = acc
    var i = 0
    var done = false
    val cols = seed.columns
    while (!done && i < maxIterations) {
      // new rows not yet in the accumulated result (UNION dedup
      // semantics). Null-safe anti join — lighter plan than exceptAll
      // (AQE broadcasts the small side instead of shuffling both).
      val stepped = step(frontier).distinct()
      // rename the acc side to fresh attributes — a step that re-joins the
      // same base relations would otherwise collide attribute ids
      val accR = acc.toDF(cols.map(c => s"__acc_$c"): _*)
      val next = stepped
        .join(accR, cols.map(c => stepped.col(c) <=> accR.col(s"__acc_$c")).reduce(_ && _), "left_anti")
        .localCheckpoint()
      if (next.isEmpty) done = true
      else {
        // acc stays a plain union of already-checkpointed pieces — no
        // recompute risk, and no extra job per iteration
        acc = acc.unionAll(next)
        frontier = next
      }
      i += 1
    }
    acc
  }

  /** UNION ALL-semantics recursion (no dedup), bounded. */
  def iterateAll(seed: DataFrame, step: DataFrame => DataFrame,
                 maxIterations: Int): DataFrame = {
    var acc = seed
    var frontier = seed
    var i = 0
    var done = false
    while (!done && i < maxIterations) {
      val next = step(frontier).cache()
      if (next.isEmpty) done = true
      else { acc = acc.unionAll(next); frontier = next }
      i += 1
    }
    acc
  }
}

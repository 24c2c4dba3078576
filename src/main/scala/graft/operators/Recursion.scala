package graft.operators

import org.apache.spark.sql.DataFrame

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
    var acc = seed.distinct().localCheckpoint()
    var frontier = acc
    var i = 0
    var done = false
    while (!done && i < maxIterations) {
      // new rows not yet in the accumulated result (UNION dedup semantics)
      val next = step(frontier).distinct().exceptAll(acc).localCheckpoint()
      if (next.isEmpty) done = true
      else {
        acc = acc.unionAll(next).localCheckpoint()
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

package graft

import org.scalatest.funsuite.AnyFunSuite

/** Driver-contract invariants. Map concatenation silently drops
  * duplicate keys, so a query name accidentally reused across modules
  * would shadow an earlier query without any visible failure — these
  * assertions make that (and oracle drift) a red test instead.
  */
class ContractSpec extends AnyFunSuite {
  import graft.queries._

  private val queryModules = Seq(
    "Relational" -> Relational.queries, "ScalarFns" -> ScalarFns.queries,
    "Pipeline" -> Pipeline.queries, "Catalog" -> Catalog.queries,
    "Tpch" -> Tpch.queries, "TpcDs" -> TpcDs.queries,
    "SqlScripts" -> SqlScripts.queries, "PipelineOps" -> PipelineOps.queries)

  private val oracleModules = Seq(
    "Relational" -> Relational.oracle, "ScalarFns" -> ScalarFns.oracle,
    "Pipeline" -> Pipeline.oracle, "Catalog" -> Catalog.oracle,
    "Tpch" -> Tpch.oracle, "TpcDs" -> TpcDs.oracle,
    "SqlScripts" -> SqlScripts.oracle, "PipelineOps" -> PipelineOps.oracle)

  test("no duplicate query names across modules") {
    val all = queryModules.flatMap { case (m, qs) => qs.keys.map(_ -> m) }
    val dups = all.groupBy(_._1).filter(_._2.size > 1)
    assert(dups.isEmpty, s"duplicated query names: ${dups.keys.mkString(", ")}")
    assert(queryModules.map(_._2.size).sum == SparkEntry.queries.size)
  }

  test("no duplicate oracle names across modules") {
    val all = oracleModules.flatMap { case (m, qs) => qs.keys.map(_ -> m) }
    val dups = all.groupBy(_._1).filter(_._2.size > 1)
    assert(dups.isEmpty, s"duplicated oracle names: ${dups.keys.mkString(", ")}")
  }

  test("every oracle references a defined query") {
    val orphans = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(orphans.isEmpty, s"oracles without queries: ${orphans.mkString(", ")}")
  }

  test("every query is oracle-backed — no rows-only residuals") {
    val rowsOnly = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    assert(rowsOnly.isEmpty,
      s"undocumented rows-only queries: ${rowsOnly.mkString(", ")}")
  }
}

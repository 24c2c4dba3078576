package graft.plans

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Builds a SEPARATE session with GraftExtensions config-injected (the
  * production path: spark.sql.extensions=graft.plans.GraftExtensions)
  * and checks both injection points. */
class ExtensionsSpec extends AnyFunSuite {

  test("config-injected extensions: array_dot function + pow(x,2) optimizer rule") {
    val default = graft.TestSession.spark // ensure base session/context exists
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    try {
      val ext = SparkSession.builder()
        .master("local[2]")
        .appName("graft-ext-test")
        .config("spark.ui.enabled", "false")
        .withExtensions(new GraftExtensions)
        .getOrCreate()
      // injected function resolves without runtime registration
      assert(ext.sql("SELECT array_dot(array(1.0d, 2.0d), array(3.0d, 4.0d)) AS d")
        .head().getDouble(0) == 11.0)
      // optimizer rule rewrites pow(x,2) to multiplication (x = cheap column ref)
      val df = ext.sql("SELECT pow(id, 2) AS sq FROM range(5)")
      val optimized = df.queryExecution.optimizedPlan.toString
      assert(!optimized.toUpperCase.contains("POWER"), optimized)
      assert(df.collect().map(_.getDouble(0)).sorted.toSeq == Seq(0.0, 1.0, 4.0, 9.0, 16.0))
      // …but never duplicates non-deterministic or expensive bases
      val nd = ext.sql("SELECT pow(rand(), 2) AS sq FROM range(5)")
      assert(nd.queryExecution.optimizedPlan.toString.toUpperCase.contains("POW("))
      val exp = ext.sql("SELECT pow(id * 3 + 1, 2) AS sq FROM range(5)")
      assert(exp.queryExecution.optimizedPlan.toString.toUpperCase.contains("POW("))
      // custom operator stack: hint → analyzer rule → strategy → SparkPlan
      val base = ext.range(0, 10000).toDF("id").repartition(6)
      val sampled = base.hint("graft_reservoir", 100, 7L)
      assert(sampled.queryExecution.executedPlan.toString.contains("ReservoirSample"))
      val rows = sampled.collect().map(_.getLong(0))
      assert(rows.length == 100)
      assert(rows.distinct.length == 100)
      // deterministic for a fixed seed, different for another
      val again = base.hint("graft_reservoir", 100, 7L).collect().map(_.getLong(0))
      assert(rows.sorted.toSeq == again.sorted.toSeq)
      val other = base.hint("graft_reservoir", 100, 8L).collect().map(_.getLong(0))
      assert(rows.sorted.toSeq != other.sorted.toSeq)
      // roughly uniform: mean of a 100-sample from 0..9999 near 5000
      val mean = rows.sum.toDouble / rows.length
      assert(mean > 3500 && mean < 6500, s"mean=$mean")
    } finally {
      SparkSession.clearActiveSession()
      SparkSession.setDefaultSession(default)
      SparkSession.setActiveSession(default)
    }
  }
}

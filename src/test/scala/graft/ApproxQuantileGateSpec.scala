package graft

import org.apache.spark.sql.functions._

/** The agg_approx_quantile rank contract must be a GENUINE gate (the
  * r10 self-review caught a tautological rewrite): the med_ok check
  * counts raw data rows against the estimate, so feeding a garbage
  * estimate through the same fused probe shape must FAIL it. */
class ApproxQuantileGateSpec extends SparkSpec {

  private def li = Engine.table(spark, "/root/testdata/sf0.001", "lineitem")
    .select(col("l_returnflag"), col("l_extendedprice"), col("l_quantity"))

  test("honest head-sample estimate passes the rank gate") {
    val rows = graft.queries.Relational.approxQuantileContract(li).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Boolean]("med_ok"), s"med_ok false for $r")
      assert(r.getAs[Boolean]("p10_ok") && r.getAs[Boolean]("p90_ok"), r.toString)
    }
  }

  test("a garbage estimate fails med_ok (the probe is independent of the sketch)") {
    // estimate far below every real price: cum(<v) = cum(<=v) = 0,
    // which can never cover rank 0.5n within 2%
    val garbage = li.select(col("l_returnflag")).distinct()
      .withColumn("__ep_v", lit(-1.0))
    val rows = graft.queries.Relational.fusedQuantileProbe(li, garbage).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(!r.getAs[Boolean]("med_ok"),
        s"garbage estimate passed the gate — tautology regression: $r")
    }
  }
}

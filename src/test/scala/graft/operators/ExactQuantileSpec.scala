package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** r16: the bin-refinement exact quantile (verdict r15 #4 — promote
  * the lab prototype to an engine operator). Equality is asserted
  * against Spark's buffered exact `percentile` on the real lineitem
  * data at sf0.001 and sf0.01, plus adversarial shapes the refinement
  * must survive: tiny tailLimit (forces multiple passes), values AT
  * bin boundaries, all-equal groups (degenerate cells), NULLs, and an
  * empty group result.
  */
class ExactQuantileSpec extends SparkSpec {

  private def li(sf: String) =
    spark.read.parquet(s"/root/testdata/$sf/lineitem.parquet")

  private def pctOracle(sf: String, vcol: String, qs: Seq[Double]) =
    li(sf).groupBy("l_returnflag")
      .agg(expr(s"percentile($vcol, array(${qs.mkString(",")}))").as("p"))
      .collect().map(r => r.getString(0) -> r.getSeq[Double](1)).toMap

  private def binRefine(sf: String, vcol: String, qs: Seq[Double],
      tailLimit: Long = 1L << 20, bins: Int = 1024) =
    ExactQuantile.quantiles(li(sf), "l_returnflag", vcol, qs,
      bins = bins, tailLimit = tailLimit)
      .collect().map(r => r.getString(0) -> r.getSeq[Double](1)).toMap

  test("equals exact percentile on lineitem prices (sf0.001 + sf0.01)") {
    for (sf <- Seq("sf0.001", "sf0.01")) {
      val want = pctOracle(sf, "l_extendedprice", Seq(0.25, 0.5, 0.75))
      val got = binRefine(sf, "l_extendedprice", Seq(0.25, 0.5, 0.75))
      assert(got.keySet == want.keySet)
      want.foreach { case (g, ws) =>
        ws.zip(got(g)).foreach { case (w, v) =>
          assert(v == w, s"$sf/$g: bin-refine $v != percentile $w")
        }
      }
    }
  }

  test("multi-pass refinement (tiny tailLimit) stays exact") {
    // tailLimit 50 forces the 600-row sf0.001 groups through several
    // bin passes with small bins — every boundary-bookkeeping error
    // shows up as an off-by-one order statistic here
    val want = pctOracle("sf0.001", "l_extendedprice", Seq(0.1, 0.25, 0.75, 0.9))
    val got = binRefine("sf0.001", "l_extendedprice", Seq(0.1, 0.25, 0.75, 0.9),
      tailLimit = 50, bins = 8)
    want.foreach { case (g, ws) =>
      ws.zip(got(g)).foreach { case (w, v) =>
        assert(v == w, s"$g: multi-pass $v != percentile $w")
      }
    }
  }

  test("integer-valued column (values at bin boundaries) stays exact") {
    val want = pctOracle("sf0.01", "l_quantity", Seq(0.0, 0.5, 1.0))
    val got = binRefine("sf0.01", "l_quantity", Seq(0.0, 0.5, 1.0),
      tailLimit = 100, bins = 7)
    want.foreach { case (g, ws) =>
      ws.zip(got(g)).foreach { case (w, v) =>
        assert(v == w, s"$g: boundary case $v != percentile $w")
      }
    }
  }

  test("degenerate cells, NULLs, and empty groups") {
    import spark.implicits._
    val df = Seq[(String, java.lang.Double)](
      ("a", 5.0), ("a", 5.0), ("a", 5.0), ("a", 5.0), // all-equal group
      ("b", 1.0), ("b", null), ("b", 3.0),            // nulls ignored
      ("c", null)                                     // all-null group
    ).toDF("g", "v")
    val got = ExactQuantile.quantiles(df, "g", "v", Seq(0.5),
      tailLimit = 1, bins = 4, maxPasses = 4)
      .collect().map(r => r.getString(0) ->
        (if (r.isNullAt(1)) null else r.getSeq[Double](1))).toMap
    assert(got("a") == Seq(5.0), "all-equal group (degenerate cell)")
    assert(got("b") == Seq(2.0), "median interpolates over non-nulls")
    assert(got("c") == null, "all-null group yields NULL")
  }

  test("the agg_quantile row matches itself under the binRefine conf") {
    val off = graft.SparkEntry.queries("agg_quantile")(
      spark, "/root/testdata/sf0.01").collect()
      .map(r => r.getString(0) -> r.toSeq.drop(1)).toMap
    spark.conf.set("spark.graft.exactQuantile.binRefine", "true")
    try {
      val on = graft.SparkEntry.queries("agg_quantile")(
        spark, "/root/testdata/sf0.01").collect()
        .map(r => r.getString(0) -> r.toSeq.drop(1)).toMap
      assert(on == off, s"conf path diverged:\noff=$off\non=$on")
    } finally spark.conf.set("spark.graft.exactQuantile.binRefine", "auto")
  }

  test("auto self-selects on MEASURED rows/group vs the documented crossover (r17)") {
    val li = graft.Engine.table(spark, "/root/testdata/sf0.001", "lineitem")
    // sf0.001 lineitem: ~600 rows in the largest l_returnflag group —
    // far below the 10M crossover, so the default stays buffered
    assert(ExactQuantile.maxGroupRows(li, "l_returnflag") < 10000L)
    assert(!ExactQuantile.shouldBinRefine(li, "l_returnflag"))
    // ...and a forced-low crossover engages the refinement operator
    assert(ExactQuantile.shouldBinRefine(li, "l_returnflag", crossover = 100L))
    val buffered = ExactQuantile.auto(li, "l_returnflag", "l_extendedprice",
      Seq(0.25, 0.75)) // default crossover → buffered Percentile
    assert(buffered.queryExecution.analyzed.toString.contains("percentile"),
      "below crossover the plan is the buffered Percentile aggregate")
    val refined = ExactQuantile.auto(li, "l_returnflag", "l_extendedprice",
      Seq(0.25, 0.75), crossover = 100L) // forced over → bin refinement
    assert(!refined.queryExecution.analyzed.toString.contains("percentile"),
      "over crossover the plan is the operator's assembled frame")
    // both paths produce BIT-identical quantiles
    def m(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => r.getString(0) -> r.getSeq[Double](1)).toMap
    assert(m(buffered) == m(refined))
  }
}

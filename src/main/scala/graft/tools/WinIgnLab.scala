package graft.tools

import org.apache.spark.sql.{DataFrame, Encoders, Row, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.Engine

/** Dev lab: win_ignore_nulls is the nearest production row to the 2x bar
  * (r13 artifact 1.92x, 0.225 s vs duck 0.117 s) and ROSE while the rest
  * of the r13 cohort closed. It has never had a structural look — the
  * round-14 charge is to decide between "frame evaluation is fusable"
  * and "the row is floor-bound like its win_lead_lag sibling".
  *
  * Shape: 150k orders rows, one hash exchange on o_custkey (~100k tiny
  * partitions), one sort, ONE WindowExec carrying THREE frame objects:
  * two frameless offset frames (lag 1 / lead -1, both IGNORE NULLS
  * skip-scan) + one unbounded frame (first/last IGNORE NULLS share the
  * same UNBOUNDED..UNBOUNDED processor). Variants isolate which frame
  * machinery the 2x lives in:
  *   v1 running-prev  — lag(v,1 IGN) replaced by last(v,true) over
  *       ROWS[unbounded,-1] (UnboundedPrecedingWindowFunctionFrame is a
  *       running accumulate; tests whether the offset skip-scan frame is
  *       the expensive one). lead stays an offset frame: its running twin
  *       (first over [1,unbounded]) is an O(n^2) recompute frame — the
  *       mirror trick only exists on the preceding side.
  *   v2 aggjoin-fl    — first_nn/last_nn via groupBy(o_custkey) min_by/
  *       max_by over non-null rows + shuffle-hash join-back; WindowExec
  *       keeps only the two offset frames. Costs one extra exchange +
  *       join; wins only if the unbounded frame dominates.
  *   v3 onepass-floor — repartition(custkey) + sortWithinPartitions +
  *       mapPartitions: one imperative sweep computes all four values
  *       (buffer one custkey group, forward fill + backward fill). This
  *       is the fused-frame FLOOR: if even this is ~duck-speed, the gap
  *       is frame count; if it is not, the gap is exchange+sort+group
  *       machinery and the row is floor-bound.
  *   v4 nofirstlast   — shipped minus the unbounded frame entirely (only
  *       lag+lead, NOT semantics-preserving) — reads the marginal cost of
  *       the unbounded frame directly.
  *   v5 noround       — shipped minus the four round() calls (projection
  *       cost check; round is codegen so expected ~free).
  * Run: SPARK_GRAFT_CPUS=32 sbt "runMain graft.tools.WinIgnLab /root/testdata/sf0.1"
  */
object WinIgnLab {

  private def base(spark: SparkSession, dir: String): DataFrame = {
    val v = when(col("o_orderkey") % 3 === 0, null).otherwise(col("o_totalprice"))
    Engine.table(spark, dir, "orders").withColumn("v", v)
  }
  private def w = Window.partitionBy(col("o_custkey"))
    .orderBy(col("o_orderdate").asc, col("o_orderkey").asc)

  private def shipped(spark: SparkSession, dir: String): DataFrame =
    graft.SparkEntry.queries("win_ignore_nulls")(spark, dir)

  private def v1RunningPrev(spark: SparkSession, dir: String): DataFrame = {
    val wPrev = w.rowsBetween(Window.unboundedPreceding, -1)
    val wf = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    base(spark, dir).select(
      col("o_custkey"), col("o_orderkey"),
      round(last(col("v"), ignoreNulls = true).over(wPrev), 2).as("prev_nn"),
      round(lead(col("v"), 1, null, ignoreNulls = true).over(w), 2).as("next_nn"),
      round(first(col("v"), ignoreNulls = true).over(wf), 2).as("first_nn"),
      round(last(col("v"), ignoreNulls = true).over(wf), 2).as("last_nn"))
  }

  private def v2AggJoin(spark: SparkSession, dir: String): DataFrame = {
    val b = base(spark, dir)
    val fl = b.filter(col("v").isNotNull).groupBy(col("o_custkey")).agg(
      min_by(col("v"), struct(col("o_orderdate"), col("o_orderkey"))).as("__f"),
      max_by(col("v"), struct(col("o_orderdate"), col("o_orderkey"))).as("__l"))
    b.select(
        col("o_custkey"), col("o_orderkey"),
        round(lag(col("v"), 1, null, ignoreNulls = true).over(w), 2).as("prev_nn"),
        round(lead(col("v"), 1, null, ignoreNulls = true).over(w), 2).as("next_nn"))
      .join(fl.hint("shuffle_hash"), Seq("o_custkey"), "left")
      .select(col("o_custkey"), col("o_orderkey"), col("prev_nn"), col("next_nn"),
        round(col("__f"), 2).as("first_nn"), round(col("__l"), 2).as("last_nn"))
  }

  private val outSchema = StructType(Seq(
    StructField("o_custkey", LongType), StructField("o_orderkey", LongType),
    StructField("prev_nn", DoubleType), StructField("next_nn", DoubleType),
    StructField("first_nn", DoubleType), StructField("last_nn", DoubleType)))

  private def v3OnePass(spark: SparkSession, dir: String): DataFrame = {
    def r2(d: java.lang.Double): java.lang.Double =
      if (d == null) null
      else java.lang.Double.valueOf(BigDecimal(d.doubleValue())
        .setScale(2, BigDecimal.RoundingMode.HALF_UP).toDouble)
    val in = base(spark, dir)
      .select(col("o_custkey"), col("o_orderkey"), col("o_orderdate"), col("v"))
      .repartition(col("o_custkey"))
      .sortWithinPartitions(col("o_custkey"), col("o_orderdate"), col("o_orderkey"))
    in.mapPartitions { it =>
      val out = scala.collection.mutable.ArrayBuffer[Row]()
      val grp = scala.collection.mutable.ArrayBuffer[(Long, Long, Any)]()
      def flush(): Unit = {
        val n = grp.length
        if (n == 0) return
        val prev = new Array[java.lang.Double](n)
        val next = new Array[java.lang.Double](n)
        var run: java.lang.Double = null
        var i = 0
        while (i < n) { // forward: prev_nn = last non-null strictly before
          prev(i) = run
          grp(i)._3 match { case d: java.lang.Double => run = d; case _ => }
          i += 1
        }
        val lastNn = r2(run)
        run = null
        i = n - 1
        while (i >= 0) { // backward: next_nn = first non-null strictly after
          next(i) = run
          grp(i)._3 match { case d: java.lang.Double => run = d; case _ => }
          i -= 1
        }
        val firstNn = r2(run)
        i = 0
        while (i < n) {
          out += Row(grp(i)._1, grp(i)._2, r2(prev(i)), r2(next(i)), firstNn, lastNn)
          i += 1
        }
        grp.clear()
      }
      var cur = Long.MinValue
      it.foreach { r =>
        val k = r.getLong(0)
        if (k != cur && grp.nonEmpty) flush()
        cur = k
        grp += ((k, r.getLong(1), if (r.isNullAt(3)) null else r.getDouble(3)))
      }
      flush()
      out.iterator
    }(Encoders.row(outSchema))
  }

  private def v4NoFirstLast(spark: SparkSession, dir: String): DataFrame =
    base(spark, dir).select(
      col("o_custkey"), col("o_orderkey"),
      round(lag(col("v"), 1, null, ignoreNulls = true).over(w), 2).as("prev_nn"),
      round(lead(col("v"), 1, null, ignoreNulls = true).over(w), 2).as("next_nn"))

  private def v5NoRound(spark: SparkSession, dir: String): DataFrame = {
    val wf = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    base(spark, dir).select(
      col("o_custkey"), col("o_orderkey"),
      lag(col("v"), 1, null, ignoreNulls = true).over(w).as("prev_nn"),
      lead(col("v"), 1, null, ignoreNulls = true).over(w).as("next_nn"),
      first(col("v"), ignoreNulls = true).over(wf).as("first_nn"),
      last(col("v"), ignoreNulls = true).over(wf).as("last_nn"))
  }

  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = Engine.session(
      s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
    val variants = Seq[(String, () => DataFrame, Boolean)](
      ("v0_shipped", () => shipped(spark, dir), true),
      ("v1_runningprev", () => v1RunningPrev(spark, dir), true),
      ("v2_aggjoin", () => v2AggJoin(spark, dir), true),
      ("v3_onepass", () => v3OnePass(spark, dir), true),
      ("v4_nofirstlast", () => v4NoFirstLast(spark, dir), false),
      ("v5_noround", () => v5NoRound(spark, dir), false))
    variants.foreach { case (_, f, _) =>
      f().write.format("noop").mode("overwrite").save() }
    val ref = variants.head._2().collect().map(_.toString).sorted
    variants.drop(1).foreach { case (nm, f, checked) =>
      if (checked) {
        val got = f().collect().map(_.toString).sorted
        println(s"MATCH $nm = ${ref.sameElements(got)}")
      } else println(s"MATCH $nm = skipped (semantics-reduced probe)")
    }
    val stages = scala.collection.mutable.Buffer[(Int, Long, Int)]()
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onStageCompleted(
          sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
        val si = sc.stageInfo
        stages += ((si.stageId,
          si.completionTime.getOrElse(0L) - si.submissionTime.getOrElse(0L),
          si.numTasks))
      }
    })
    variants.foreach { case (nm, f, _) =>
      // 12 reps, late-rep stage capture (BASELINE.md round-13 WarmLab note)
      val times = (1 to 12).map { i =>
        if (i == 12) { Thread.sleep(300); stages.clear() }
        val t0 = System.nanoTime()
        f().write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e6
      }
      Thread.sleep(300)
      println(f"TIME $nm%-15s min=${times.min}%7.1f ms  all=${times.map(t => f"$t%.0f").mkString(",")}")
      stages.sortBy(_._1).foreach { case (id, ms, nt) =>
        println(f"  STAGE $id%4d ${ms}%5d ms tasks=$nt") }
    }
    spark.stop()
  }
}

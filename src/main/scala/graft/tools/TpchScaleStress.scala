package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Engine

/** r17: the ScaleStress tier for the RELATIONAL (tpch) family — the
  * one operator family whose 100× story rested on sf0.1 plan asserts
  * alone (r16 verdict #4). Scales the TPC-H tables x4/x16/x64 with
  * key-remapped replicas (referential integrity preserved: every
  * replica r remaps ALL key columns by k·mult+r, so joins land on the
  * same multiplicity as the base), writes real parquet, and runs the
  * three join-heaviest shapes (`tpch_q5ish` 6-way with 3 dims,
  * `tpch_q9ish` 5-way + LIKE, `tpch_q21ish` window-fold + 2 joins)
  * through the UNCHANGED production queries.
  *
  * Per query × multiplier it records wall (warm pass then min-of-2 —
  * the Bench protocol), shuffle bytes/records, and the POST-AQE plan
  * shape: BroadcastHashJoin / SortMergeJoin / ShuffledHashJoin counts,
  * and a hard assert that no BroadcastNestedLoopJoin or
  * CartesianProduct appears at any tier. The per-tier join-node counts
  * are the artifact's record of where AQE flips a broadcast to a
  * shuffle join as the build side outgrows the threshold.
  *
  * Usage: runMain graft.tools.TpchScaleStress [baseDir] [mults] [qfilter]
  */
object TpchScaleStress {

  /** Replicate a table `mult`×, remapping every column in `keys` by
    * k·mult+r (original column TYPE preserved — sf0.1 keys stay well
    * inside int at x64). Non-key columns are copied verbatim. */
  private def scaled(spark: SparkSession, baseDir: String, name: String,
                     keys: Seq[String], mult: Int): DataFrame = {
    val base = Engine.table(spark, baseDir, name)
    val rep = base.select(col("*"),
      explode(sequence(lit(0), lit(mult - 1))).as("__r"))
    val remapped = keys.foldLeft(rep) { (df, k) =>
      val dt = base.schema(k).dataType
      df.withColumn(k, (col(k).cast("long") * mult + col("__r")).cast(dt))
    }
    remapped.drop("__r")
  }

  /** Write the scaled database under outDir (nation/region are true
    * dims and copy verbatim). */
  def writeScaled(spark: SparkSession, baseDir: String, outDir: String,
                  mult: Int): Unit = {
    def w(df: DataFrame, name: String): Unit =
      df.write.mode("overwrite").parquet(s"$outDir/$name.parquet")
    w(scaled(spark, baseDir, "customer", Seq("c_custkey"), mult), "customer")
    w(scaled(spark, baseDir, "orders", Seq("o_orderkey", "o_custkey"), mult),
      "orders")
    w(scaled(spark, baseDir, "lineitem",
      Seq("l_orderkey", "l_suppkey", "l_partkey"), mult), "lineitem")
    w(scaled(spark, baseDir, "supplier", Seq("s_suppkey"), mult), "supplier")
    w(scaled(spark, baseDir, "part", Seq("p_partkey"), mult), "part")
    w(Engine.table(spark, baseDir, "nation"), "nation")
    w(Engine.table(spark, baseDir, "region"), "region")
    // non-tpch tables copied verbatim: the queries never touch them,
    // but Engine.registerAll resolves every sf-dir table at bind time
    Seq("events", "documents", "embeddings").foreach(n =>
      w(Engine.table(spark, baseDir, n), n))
  }

  private def countNode(plan: String, node: String): Int =
    node.r.findAllMatchIn(plan).length

  def main(args: Array[String]): Unit = {
    val baseDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val mults = (if (args.length > 1) args(1) else "4,16,64")
      .split(",").map(_.toInt)
    val only = if (args.length > 2) args(2).split(",").toSet
      else Set("tpch_q5ish", "tpch_q9ish", "tpch_q21ish")
    val spark = Engine.session(
      s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")}]")
    spark.sparkContext.setLogLevel("WARN")
    val meter = new ScaleStress.ShuffleMeter
    spark.sparkContext.addSparkListener(meter)

    val sections = mults.map { m =>
      val dir = s"target/tpch_scale/x$m"
      writeScaled(spark, baseDir, dir, m)
      val items = only.toSeq.sorted.map { q =>
        val df = graft.SparkEntry.queries(q)(spark, dir)
        df.count() // warm pass: JIT + AQE final plan settled
        var wall = Double.MaxValue
        var snap = (0L, 0L)
        for (_ <- 1 to 2) {
          meter.reset()
          val t0 = System.nanoTime()
          df.count()
          val w = (System.nanoTime() - t0) / 1e9
          if (w < wall) { wall = w; snap = meter.snapshot }
        }
        val plan = df.queryExecution.executedPlan.toString
        val bhj = countNode(plan, "BroadcastHashJoin")
        val smj = countNode(plan, "SortMergeJoin")
        val shj = countNode(plan, "ShuffledHashJoin")
        val bnlj = countNode(plan, "BroadcastNestedLoopJoin")
        val cart = countNode(plan, "CartesianProduct")
        require(bnlj == 0 && cart == 0,
          s"$q x$m: BNLJ/Cartesian in plan!\n$plan")
        f""""$q":{"wall_sec":$wall%.3f,"shuffle_mb":${snap._1 / 1e6}%.2f,""" +
          s""""shuffle_records":${snap._2},"bhj":$bhj,"smj":$smj,""" +
          s""""shj":$shj,"bnlj":$bnlj,"cartesian":$cart}"""
      }.mkString(",")
      s""""x$m":{$items}"""
    }
    println(s"""{"tpch_scale_stress":{${sections.mkString(",")}},""" +
      s""""base":"$baseDir"}""")
    spark.stop()
  }
}

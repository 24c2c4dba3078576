package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev diagnostic: compare alternative plan shapes for the sub-second
  * fact-fact join queries against the bench session (cached tables,
  * warm pass, min-of-N). Prints wall + exchange counts per variant.
  */
object JoinShape {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.files.maxPartitionBytes", (1024 * 1024).toString)
      .config("spark.sql.codegen.cache.maxEntries", "5000")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.ui.explainMode", "simple")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def t(n: String) = graft.Engine.table(spark, dir, n)
    Seq("orders", "lineitem", "customer").foreach(n => t(n).cache().count())

    val variants: Seq[(String, () => DataFrame)] = Seq(
      "q18_current" -> (() => {
        val o = t("orders"); val l = t("lineitem")
        o.join(l, col("o_orderkey") === col("l_orderkey"))
          .groupBy(col("o_orderkey"))
          .agg(round(sum(col("l_quantity")), 2).as("total_qty"),
            round(first(col("o_totalprice")), 2).as("price"))
          .filter(col("total_qty") > 150)
          .orderBy(col("total_qty").desc, col("o_orderkey").asc)
          .limit(20)
      }),
      "q18_preagg" -> (() => {
        // aggregate the fact side FIRST: sum(l_quantity) by l_orderkey is
        // a map-side-combined single narrow shuffle; the >150 filter cuts
        // it to a handful of rows which then broadcast-join orders
        val o = t("orders"); val l = t("lineitem")
        l.groupBy(col("l_orderkey"))
          .agg(round(sum(col("l_quantity")), 2).as("total_qty"))
          .filter(col("total_qty") > 150)
          .join(o, col("o_orderkey") === col("l_orderkey"))
          .select(col("o_orderkey"), col("total_qty"),
            round(col("o_totalprice"), 2).as("price"))
          .orderBy(col("total_qty").desc, col("o_orderkey").asc)
          .limit(20)
      }),
      "q10_current" -> (() => {
        val c = t("customer"); val o = t("orders")
        val l = t("lineitem").filter(col("l_returnflag") === "R")
        val rev = col("l_extendedprice") * (lit(1.0) - col("l_discount"))
        val perCust = l.select(col("l_orderkey"), rev.as("rev"))
          .join(o.select(col("o_orderkey"), col("o_custkey")),
            col("o_orderkey") === col("l_orderkey"))
          .groupBy(col("o_custkey")).agg(sum(col("rev")).as("raw_rev"))
        perCust
          .join(c.select(col("c_custkey"), col("c_name"), col("c_acctbal")),
            col("c_custkey") === col("o_custkey"))
          .select(col("c_custkey"), col("c_name"),
            round(col("raw_rev"), 2).as("revenue"),
            round(col("c_acctbal"), 2).as("c_acctbal"))
          .orderBy(col("revenue").desc, col("c_custkey").asc)
          .limit(20)
      }),
      "q10_preagg" -> (() => {
        // per-order rollup first (single narrow shuffle), then the order
        // table attaches custkey, then per-customer rollup of ~|orders|
        // narrow rows
        val c = t("customer"); val o = t("orders")
        val l = t("lineitem").filter(col("l_returnflag") === "R")
        val rev = col("l_extendedprice") * (lit(1.0) - col("l_discount"))
        val perOrder = l.select(col("l_orderkey"), rev.as("rev"))
          .groupBy(col("l_orderkey")).agg(sum(col("rev")).as("orev"))
        val perCust = perOrder
          .join(o.select(col("o_orderkey"), col("o_custkey")),
            col("o_orderkey") === col("l_orderkey"))
          .groupBy(col("o_custkey")).agg(sum(col("orev")).as("raw_rev"))
        perCust
          .join(c.select(col("c_custkey"), col("c_name"), col("c_acctbal")),
            col("c_custkey") === col("o_custkey"))
          .select(col("c_custkey"), col("c_name"),
            round(col("raw_rev"), 2).as("revenue"),
            round(col("c_acctbal"), 2).as("c_acctbal"))
          .orderBy(col("revenue").desc, col("c_custkey").asc)
          .limit(20)
      }),
      "intersect_current" -> (() => {
        graft.Engine.registerAll(spark, dir)
        spark.sql(
          """SELECT CAST(count(*) AS BIGINT) AS n FROM (
            |  SELECT o_custkey FROM orders JOIN lineitem ON l_orderkey = o_orderkey
            |    WHERE l_returnflag = 'A'
            |  INTERSECT
            |  SELECT o_custkey FROM orders JOIN lineitem ON l_orderkey = o_orderkey
            |    WHERE l_returnflag = 'R'
            |  EXCEPT
            |  SELECT o_custkey FROM orders WHERE o_orderstatus = 'P'
            |) t""".stripMargin)
      }))

    def timeOne(f: () => DataFrame): Double = {
      val t0 = System.nanoTime(); f().count(); (System.nanoTime() - t0) / 1e9
    }
    variants.foreach { case (n, f) => timeOne(f) } // warm
    val mins = variants.map { case (n, f) =>
      n -> (1 to 6).map(_ => timeOne(f)).min
    }
    mins.foreach { case (n, w) => println(f"SHAPE $n%-20s ${w}%.3f s") }
    // show what AQE actually executed for the interesting ones
    Seq("q18_preagg", "q10_preagg").foreach { n =>
      val f = variants.toMap.apply(n)
      val df = f(); df.count()
      println(s"===== $n final plan =====")
      println(df.queryExecution.executedPlan.toString.take(3000))
    }
    spark.stop()
  }
}

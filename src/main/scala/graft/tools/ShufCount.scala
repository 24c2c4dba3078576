package graft.tools

/** Scratch: materialized-shuffle counts (tree walk) for named queries. */
object ShufCount {
  def main(args: Array[String]): Unit = {
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    import org.apache.spark.sql.execution.exchange.{BroadcastExchangeLike, ReusedExchangeExec, ShuffleExchangeLike}
    val spark = graft.Engine.session("local[8]")
    val dir = if (args.length > 1) args(1) else "/root/testdata/sf0.001"
    args(0).split(",").foreach { n =>
      val df = graft.SparkEntry.queries(n)(spark, dir)
      df.collect()
      val sh = scala.collection.mutable.Set[Int]()
      val bc = scala.collection.mutable.Set[Int]()
      def walk(p: SparkPlan): Unit = p match {
        case a: AdaptiveSparkPlanExec => walk(a.executedPlan)
        case q: QueryStageExec => walk(q.plan)
        case _: ReusedExchangeExec => ()
        case e: ShuffleExchangeLike => sh += e.id; e.children.foreach(walk)
        case e: BroadcastExchangeLike => bc += e.id; e.children.foreach(walk)
        case other => other.children.foreach(walk)
      }
      walk(df.queryExecution.executedPlan)
      println(s"SHUF $n shuffles=${sh.size} broadcasts=${bc.size}")
    }
    spark.stop()
  }
}

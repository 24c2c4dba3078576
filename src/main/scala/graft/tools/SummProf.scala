package graft.tools

/** Scratch profiler for catalog_summarize under bench-like conditions
  * (cached base table, 1MB splits, warm JVM): prints per-call wall for
  * repeated summarizeTable calls, plus the phase split of one call.
  */
object SummProf {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.files.maxPartitionBytes", (1024 * 1024).toString)
      .config("spark.sql.codegen.cache.maxEntries", "5000")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.ui.explainMode", "simple")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.functions.DuckFunctions.register(spark)
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val orders = graft.Engine.table(spark, dir, "orders")
    orders.cache().count()
    def timeMs[A](body: => A): Double = {
      val t0 = System.nanoTime; body; (System.nanoTime - t0) / 1e6
    }
    (1 to 3).foreach(_ => graft.Engine.summarizeTable(spark, graft.Engine.table(spark, dir, "orders")).count())
    for (i <- 1 to 8)
      println(f"call$i%d full=${timeMs(graft.Engine.summarizeTable(spark, graft.Engine.table(spark, dir, "orders")).count())}%.1f ms")
    // split: table resolve / key / head / pivot+toDF+count
    val t = timeMs(graft.Engine.table(spark, dir, "orders"))
    val df = graft.Engine.table(spark, dir, "orders")
    val k = timeMs(df.queryExecution.analyzed.canonicalized.toString)
    println(f"tableResolve=$t%.1f keyDerive=$k%.1f ms")
    // isolate the agg job: same expressions, pinned Dataset, repeated head()
    import org.apache.spark.sql.functions._
    val fields = df.schema.fields
    val aggsAll = count(lit(1)).as("__total") +: fields.zipWithIndex.flatMap {
      case (f, i) => Seq(
        min(col(f.name)).cast("string").as(s"__min_$i"),
        max(col(f.name)).cast("string").as(s"__max_$i"),
        count(col(f.name)).as(s"__n_$i"))
    }.toSeq
    val aggAllDf = df.agg(aggsAll.head, aggsAll.tail: _*)
    val aggCntDf = df.agg(count(lit(1)).as("c0"),
      fields.zipWithIndex.map { case (f, i) => count(col(f.name)).as(s"c$i") }: _*)
    val strFields = fields.filter(_.dataType.typeName == "string")
    val aggStrDf = df.agg(min(col(strFields.head.name)).as("m0"),
      strFields.tail.zipWithIndex.flatMap { case (f, i) =>
        Seq(min(col(f.name)).as(s"mn$i"), max(col(f.name)).as(s"mx$i")) }: _*)
    val numFields = fields.filter(f => f.dataType.typeName != "string")
    val aggNumDf = df.agg(min(col(numFields.head.name)).as("m0"),
      numFields.tail.zipWithIndex.flatMap { case (f, i) =>
        Seq(min(col(f.name)).as(s"mn$i"), max(col(f.name)).as(s"mx$i")) }: _*)
    Seq("all28" -> aggAllDf, "countsOnly" -> aggCntDf,
        "strMinMax" -> aggStrDf, "numMinMax" -> aggNumDf).foreach { case (nm, d) =>
      (1 to 3).foreach(_ => d.head())
      val ts = (1 to 5).map(_ => timeMs(d.head()))
      println(f"$nm min=${ts.min}%.1f med=${ts.sorted.apply(2)}%.1f ms")
    }
    println("plan:"); aggAllDf.explain("formatted")
    spark.stop()
  }
}

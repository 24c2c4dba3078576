package graft.tools

import graft.Engine
import org.apache.spark.sql.functions._

/** Dev diagnostic: prediction distribution of LangId over the documents
  * table of a given sf dir. */
object LangProbe {
  def main(args: Array[String]): Unit = {
    val spark = Engine.session("local[4]")
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.01"
    val docs = Engine.table(spark, dir, "documents")
    val pred = udf(graft.operators.LangId.classify _)
    docs.select(pred(col("text")).as("p")).groupBy("p").count()
      .orderBy(desc("count")).show(50, truncate = false)
    spark.stop()
  }
}

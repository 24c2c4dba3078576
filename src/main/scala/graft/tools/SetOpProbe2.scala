package graft.tools
object SetOpProbe2 {
  def main(args: Array[String]): Unit = {
    val spark = graft.Engine.session("local[8]", 8)
    graft.Engine.registerAll(spark, "/root/testdata/sf0.01")
    val df = graft.SparkEntry.queries("set_coercion")(spark, "/root/testdata/sf0.01")
    println("SCHEMA " + df.schema.map(f => s"${f.name}:${f.dataType.simpleString}").mkString(","))
    df.collect().foreach(r => println("ROW " + r.toSeq.mkString("|")))
    spark.stop()
  }
}

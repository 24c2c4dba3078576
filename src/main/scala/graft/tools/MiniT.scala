package graft.tools
import org.apache.spark.sql.functions._
object MiniT {
  def main(args: Array[String]): Unit = {
    val spark = graft.Engine.session("local[32]", 32)
    val dir = "/root/testdata/sf0.1"
    def run(parts: String, ckpt: Option[String], tag: String): Unit = {
      org.apache.spark.sql.execution.streaming.state.StateStore.stop()
      val before = spark.conf.get("spark.sql.shuffle.partitions")
      spark.conf.set("spark.sql.shuffle.partitions", parts)
      val name = "prof_" + tag.replaceAll("[^a-zA-Z0-9]", "_")
      val t0 = System.nanoTime
      var w = graft.streaming.EventStreams.sessions(
        graft.streaming.EventStreams.readEvents(spark, dir), "30 minutes")
        .writeStream.format("memory").queryName(name)
        .outputMode("complete")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      ckpt.foreach(c => w = w.option("checkpointLocation",
        c + "/" + name + "_" + System.nanoTime))
      val q = w.start(); q.awaitTermination()
      spark.conf.set("spark.sql.shuffle.partitions", before)
      val p = q.recentProgress.last
      val commit = p.stateOperators.map(_.commitTimeMs).sum
      println(f"$tag wall=${(System.nanoTime - t0) / 1e9}%.3f addBatch=${p.durationMs.get("addBatch")} commit=$commit")
    }
    run("8", None, "warmup")
    run("8", None, "p8-disk")
    run("4", None, "p4-disk")
    run("2", None, "p2-disk")
    run("8", Some("/dev/shm/graft_ckpt"), "p8-shm")
    run("4", Some("/dev/shm/graft_ckpt"), "p4-shm")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    run("8", None, "p8-rocksdb")
    run("4", None, "p4-rocksdb")
    spark.stop()
  }
}

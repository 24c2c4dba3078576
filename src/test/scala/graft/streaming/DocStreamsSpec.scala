package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Drives the streaming ingest-dedup path (file source → stream-static
  * band-index probes → memory sink) against sf0.001 documents. */
class DocStreamsSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("streaming incremental dedup equals the batch dedupAgainst answer") {
    val streamed = DocStreams.runToBatch(spark, dir, s"sid_${System.nanoTime()}",
        DocStreams.incrementalDedup(_, _))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val docs = graft.Engine.table(spark, dir, "documents")
    val batch = graft.operators.Dedup.dedupAgainst(
        docs.filter(pmod(col("doc_id"), lit(5)) =!= 0),
        docs.filter(pmod(col("doc_id"), lit(5)) === 0),
        "doc_id", "text", shingleN = 3, numHashes = 16, numBands = 8)
      .filter(col("jaccard") >= 0.8)
      .select(col("batch_id"), col("hist_id"), round(col("jaccard"), 6))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(streamed == batch,
      s"stream/batch divergence: stream-only ${streamed -- batch}, batch-only ${batch -- streamed}")
  }

  test("every emitted pair crosses the split and clears the threshold") {
    val out = DocStreams.runToBatch(spark, dir, s"sid2_${System.nanoTime()}",
      DocStreams.incrementalDedup(_, _))
    assert(out.filter(pmod(col("batch_id"), lit(5)) =!= 0).isEmpty)
    assert(out.filter(pmod(col("hist_id"), lit(5)) === 0).isEmpty)
    assert(out.filter(col("jac") < 0.8).isEmpty)
    // multi-band candidate multiplicity collapsed: pairs are unique
    assert(out.groupBy("batch_id", "hist_id").count().filter(col("count") > 1).isEmpty)
  }
}

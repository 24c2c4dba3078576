package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column handling: image/audio/video as opaque binary columns
  * with typed metadata.
  *
  * The Spark-side plumbing (schema, partition-parallel decode via
  * mapPartitions over a typed Dataset, batch shape) is real; the codec
  * itself is a DETERMINISTIC STUB (`fakeDecode`) because no image/audio
  * libraries ship in this environment — swap `fakeDecode` for a real
  * decoder (JavaCV/TwelveMonkeys) without touching the dataflow.
  */
object Multimodal {

  /** A media row: opaque payload + typed metadata. */
  case class MediaRecord(id: Long, payload: Array[Byte], mediaType: String,
                         width: Int, height: Int)

  /** Extracted features (what a real pipeline would feed downstream). */
  case class MediaFeatures(id: Long, mediaType: String, nBytes: Long,
                           meanByte: Double, entropyBits: Double,
                           thumbnail: Array[Byte])

  /** STUB decoder: a real implementation would decode the codec; this one
    * derives a deterministic w×h pixel grid from the payload bytes so
    * the pipeline is testable end-to-end. Decodes to the DECLARED
    * dimensions (r11 — a fixed 64-byte buffer made any record with
    * width·height > 64 throw ArrayIndexOutOfBounds inside [[resize]]'s
    * executors).
    */
  def fakeDecode(payload: Array[Byte], w: Int, h: Int): Array[Byte] = {
    val out = new Array[Byte](math.max(w * h, 0))
    if (payload.isEmpty || out.isEmpty) return out
    var i = 0
    while (i < out.length) { out(i) = payload(i % payload.length); i += 1 }
    out
  }

  /** Per-partition feature extraction — the decode runs inside executors,
    * one partition at a time (the Scala analog of mapInPandas batches).
    */
  def extractFeatures(ds: Dataset[MediaRecord]): Dataset[MediaFeatures] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions { it =>
      it.map { r =>
        val px = fakeDecode(r.payload, 8, 8) // fixed 8×8 thumbnail
        val n = r.payload.length.toLong
        val mean = if (n == 0) 0.0 else r.payload.map(b => (b & 0xff).toDouble).sum / n
        val counts = new Array[Long](256)
        r.payload.foreach(b => counts(b & 0xff) += 1)
        val ent = if (n == 0) 0.0 else -counts.filter(_ > 0).map { c =>
          val p = c.toDouble / n; p * math.log(p) / math.log(2.0)
        }.sum
        MediaFeatures(r.id, r.mediaType, n, mean, ent, px)
      }
    }
  }

  /** A resized media row (nearest-neighbor output + checksum feature). */
  case class ResizedMedia(id: Long, outW: Int, outH: Int, nBytes: Long,
                          checksum: Long, pixels: Array[Byte])

  /** Nearest-neighbor resize over the decoded pixel grid — the
    * image-resize step of a preprocessing pipeline. Runs per partition
    * inside executors (same dataflow as [[extractFeatures]]); only the
    * decode is the documented stub, the resampling math is real. */
  def resize(ds: Dataset[MediaRecord], tw: Int, th: Int): Dataset[ResizedMedia] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions { it =>
      it.map { r =>
        val src = fakeDecode(r.payload, r.width, r.height)
        val out = new Array[Byte](tw * th)
        var y = 0
        while (y < th) {
          var x = 0
          while (x < tw) {
            val sy = y * r.height / th
            val sx = x * r.width / tw
            out(y * tw + x) = src(sy * r.width + sx)
            x += 1
          }
          y += 1
        }
        var sum = 0L
        out.foreach(b => sum += (b & 0xff))
        ResizedMedia(r.id, tw, th, out.length.toLong, sum, out)
      }
    }
  }

  /** Frame sampling for "video" payloads: every `stride`-th chunk of
    * `frameBytes` — demonstrates the explode-to-frames dataflow shape. */
  def sampleFrames(ds: Dataset[MediaRecord], frameBytes: Int, stride: Int): DataFrame = {
    import ds.sparkSession.implicits._
    ds.flatMap { r =>
      r.payload.grouped(frameBytes).zipWithIndex
        .filter { case (_, i) => i % stride == 0 }
        .map { case (chunk, i) => (r.id, i, chunk) }
    }.toDF("id", "frame_idx", "frame")
  }

  /** Build a media table from documents: payload = utf-8 bytes of text
    * (deterministic fake "image"), metadata from n_chars. */
  def mediaFromDocuments(spark: SparkSession, docs: DataFrame): Dataset[MediaRecord] = {
    import spark.implicits._
    docs.select(col("doc_id").as("id"), encode(col("text"), "UTF-8").as("payload"),
      lit("image/fake").as("mediaType"),
      lit(8).as("width"), lit(8).as("height")).as[MediaRecord]
  }
}

package graft.tools

import org.apache.spark.sql.functions._

/** Round-17 decomposition lab for `mm_decode_png` — the r16 verdict's
  * one unexplained spark-side mover (1.04 s r15 → 3.08 s r16 on code
  * the round never touched, now the largest absolute non-streaming
  * row). Times each structural slice of the query (scan → PNG encode →
  * encode+decode → full resize pipeline), min-of-5 after warm-up, under
  * BOTH `ImageIO` stream-cache modes.
  *
  * Prime suspect: `javax.imageio.ImageIO` defaults to DISK-backed
  * stream caches (`getUseCache == true`), so the static convenience
  * methods `ImageIO.write(img, "png", OutputStream)` and
  * `ImageIO.read(InputStream)` each create a `FileCacheImageOutput/
  * InputStream` — a temp FILE in `java.io.tmpdir` per image. The query
  * encodes+decodes one PNG per document (2 × 60k temp files at sf0.1,
  * across 32 threads), so its wall-clock is hostage to tmpdir state —
  * exactly the profile of a regression on untouched code. The lab runs
  * the identical bodies with `ImageIO.setUseCache(false)`
  * (MemoryCache streams, zero file I/O) to separate codec CPU from
  * tmpdir churn.
  *
  * NOTE on ordering: `setUseCache` is JVM-global, so the disk-cache
  * runs come first, then the flag flips once and never back.
  *
  * Usage: SPARK_GRAFT_SF_DIR=... sbt "runMain graft.tools.MmLab"
  */
object MmLab {
  def main(args: Array[String]): Unit = {
    val spark = graft.Engine.session(
      s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]", 32)
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    graft.Engine.registerAll(spark, dir)
    import spark.implicits._

    def minMs(label: String)(body: => Unit): Unit = {
      (1 to 3).foreach(_ => body)
      val t = (1 to 5).map { _ =>
        val t0 = System.nanoTime; body; (System.nanoTime - t0) / 1e6
      }.min
      println(f"$label%-40s ${t}%8.1f ms")
    }

    def docsIds = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id")).as[Long]

    // Per-partition kernels, parameterized only by the JVM-global cache
    // flag at run time — identical bytes to the production query bodies.
    def encodeOne(id: Long): Array[Byte] = {
      val w = 16; val h = 16
      val img = new java.awt.image.BufferedImage(
        w, h, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
      var k = 0
      while (k < w * h) {
        img.getRaster.setSample(k % w, k / w, 0,
          ((id * 31 + k * 7) % 256).toInt)
        k += 1
      }
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", bos)
      bos.toByteArray
    }

    def slices(tag: String): Unit = {
      println(s"--- $tag (ImageIO.getUseCache=" +
        s"${javax.imageio.ImageIO.getUseCache}) ---")
      minMs(s"$tag scan doc_id count") { docsIds.count() }
      minMs(s"$tag encode PNG only") {
        docsIds.mapPartitions(_.map(id => encodeOne(id).length.toLong))
          .reduce(_ + _)
      }
      minMs(s"$tag encode+decode") {
        docsIds.mapPartitions(_.map { id =>
          val p = encodeOne(id)
          val (g, w, h) = graft.operators.Multimodal
            .decodeImage(p).getOrElse((Array.empty[Byte], 0, 0))
          (g.length + w + h).toLong
        }).reduce(_ + _)
      }
      minMs(s"$tag full mm_decode_png") {
        graft.SparkEntry.queries("mm_decode_png")(spark, dir).collect()
      }
    }

    slices("disk-cache")
    javax.imageio.ImageIO.setUseCache(false)
    slices("mem-cache ")

    spark.stop()
  }
}

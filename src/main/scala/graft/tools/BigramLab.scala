package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Engine

/** Dev lab: time alternate physical shapes of the bigram-LM row
  * (text_bigram_lm, the one production row over the 2x bar for three
  * rounds — VERDICT r10 #1). Each variant computes the IDENTICAL
  * result (same oracle); only the plan shape differs. Run:
  *   SPARK_GRAFT_CPUS=32 sbt "runMain graft.tools.BigramLab /root/testdata/sf0.1"
  */
object BigramLab {
  private val alpha = 0.1

  private def base(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"),
        graft.operators.Curation.wsTokens(col("text")).as("__w"))

  private def pairsOf(b: DataFrame): DataFrame = b
    .filter(size(col("__w")) >= 2)
    .select(col("doc_id"),
      explode(zip_with(
        slice(col("__w"), lit(1), size(col("__w")) - 1),
        slice(col("__w"), lit(2), size(col("__w")) - 1),
        (a, bb) => struct(a.as("a"), bb.as("b")))).as("__p"))
    .select(col("doc_id"), col("__p.a").as("__a"), col("__p.b").as("__b"))

  private def vocabScan(b: DataFrame): DataFrame = b
    .filter(size(col("__w")) >= 2)
    .select(explode(slice(col("__w"), lit(1), size(col("__w")) - 1)).as("__t"))
    .agg(countDistinct(col("__t")).as("__v"))

  private def finish(enriched: DataFrame, vocab: DataFrame): DataFrame = {
    val logp = log((col("__c2") + lit(alpha)) /
      (col("__c1") + lit(alpha) * col("__v")))
    enriched
      .crossJoin(broadcast(vocab))
      .groupBy(col("doc_id"))
      .agg(sum(col("__m")).cast("long").as("n_bigrams"),
        (-sum(col("__m") * logp) / sum(col("__m"))).as("__x"))
      .select(col("doc_id"), col("n_bigrams"),
        round(col("__x"), 4).as("bigram_xent"))
  }

  // V0: shipped default (collapse + two windows + second vocab scan)
  private def v0(spark: SparkSession, dir: String): DataFrame =
    graft.operators.TextAnalysis.bigramLmScores(
      spark.read.parquet(s"$dir/documents.parquet"), "doc_id", "text", alpha)

  // V1: V0 with the doc table round-robin spread before the explode
  private def v1(spark: SparkSession, dir: String): DataFrame = {
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .repartition(spark.sparkContext.defaultParallelism)
    graft.operators.TextAnalysis.bigramLmScores(docs, "doc_id", "text", alpha)
  }

  // V2: no within-doc collapse; windows directly over the raw pair
  // stream (m == 1 per row), spread before explode
  private def v2(spark: SparkSession, dir: String): DataFrame = {
    val b = base(spark, dir)
      .repartition(spark.sparkContext.defaultParallelism)
    val p = pairsOf(b).withColumn("__m", lit(1L))
    val wA = Window.partitionBy(col("__a"))
    val wAB = Window.partitionBy(col("__a"), col("__b"))
    val enriched = p
      .withColumn("__c1", sum(col("__m")).over(wA))
      .withColumn("__c2", sum(col("__m")).over(wAB))
    finish(enriched, vocabScan(b))
  }

  // V3: aggregate count tables + broadcast join-back (duck's own shape);
  // c1 and V derived from c2t (no second corpus scan), spread explode
  private def v3(spark: SparkSession, dir: String): DataFrame = {
    val b = base(spark, dir)
      .repartition(spark.sparkContext.defaultParallelism)
    val p = pairsOf(b)
    val c2t = p.groupBy(col("__a"), col("__b")).agg(count(lit(1)).as("__c2"))
    val c1t = c2t.groupBy(col("__a")).agg(sum(col("__c2")).as("__c1"))
    val vocab = c1t.agg(count(lit(1)).as("__v"))
    val enriched = p.withColumn("__m", lit(1L))
      .join(broadcast(c2t), Seq("__a", "__b"))
      .join(broadcast(c1t), Seq("__a"))
    finish(enriched, vocab)
  }

  // V4: V3 but with the within-doc collapse kept (smaller probe stream)
  private def v4(spark: SparkSession, dir: String): DataFrame = {
    val b = base(spark, dir)
      .repartition(spark.sparkContext.defaultParallelism)
    val p = pairsOf(b)
    val docPair = p.groupBy(col("doc_id"), col("__a"), col("__b"))
      .agg(count(lit(1)).as("__m"))
    val c2t = docPair.groupBy(col("__a"), col("__b")).agg(sum(col("__m")).as("__c2"))
    val c1t = c2t.groupBy(col("__a")).agg(sum(col("__c2")).as("__c1"))
    val vocab = c1t.agg(count(lit(1)).as("__v"))
    val enriched = docPair
      .join(broadcast(c2t), Seq("__a", "__b"))
      .join(broadcast(c1t), Seq("__a"))
    finish(enriched, vocab)
  }

  // V5: collapse + two windows (V0 shape) but spread AND vocab derived
  // from the window output's first pass? -- simplest: V0 shape + spread
  // + vocab from c1t-free second scan kept. (== V1; placeholder for a
  // window-form variant with vocab from pairs)
  private def v5(spark: SparkSession, dir: String): DataFrame = {
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .repartition(spark.sparkContext.defaultParallelism)
    graft.operators.TextAnalysis.bigramLmScores(docs, "doc_id", "text", alpha,
      vocabFromPairs = true)
  }

  // hashed-pair construction: token FNV hashes once per doc (codegen
  // WordGramHashes kernel), pairs as arrays_zip of two primitive-long
  // slices — no interpreted HOF lambda, 16-byte pair rows
  private def hashedPairs(b: DataFrame): DataFrame = {
    val th = call_function("word_gram_hashes", col("__w"), lit(1))
    b.filter(size(col("__w")) >= 2)
      .select(col("doc_id"), th.as("__th"), (size(col("__w")) - 1).as("__n"))
      .select(col("doc_id"),
        explode(arrays_zip(
          slice(col("__th"), lit(1), col("__n")).as("a"),
          slice(col("__th"), lit(2), col("__n")).as("b"))).as("__p"))
      .select(col("doc_id"), col("__p.a").as("__a"), col("__p.b").as("__b"))
  }

  // V6: v0 shape (collapse + c1/c2 windows + separate vocab scan) with
  // hashed pairs; vocab = distinct context hashes (same count)
  private def v6(spark: SparkSession, dir: String,
                 doSpread: Boolean, vocabPairs: Boolean): DataFrame = {
    val b0 = base(spark, dir)
    val b = if (doSpread) b0.repartition(spark.sparkContext.defaultParallelism) else b0
    val p = hashedPairs(b)
    val docPair = p.groupBy(col("doc_id"), col("__a"), col("__b"))
      .agg(count(lit(1)).as("__m"))
    val wA = Window.partitionBy(col("__a"))
    val wAB = Window.partitionBy(col("__a"), col("__b"))
    val enriched = docPair
      .withColumn("__c1", sum(col("__m")).over(wA))
      .withColumn("__c2", sum(col("__m")).over(wAB))
    val vocab =
      if (vocabPairs)
        docPair.agg(countDistinct(when(col("__m") >= 0 || col("__b").isNotNull,
          col("__a"))).as("__v"))
      else b
        .filter(size(col("__w")) >= 2)
        .select(explode(slice(call_function("word_gram_hashes", col("__w"), lit(1)),
          lit(1), size(col("__w")) - 1)).as("__t"))
        .agg(countDistinct(col("__t")).as("__v"))
    finish(enriched, vocab)
  }

  // V9: hashed pairs, NO within-doc collapse (m = 1 per occurrence —
  // the sf0.1 collapse only removes 3%), windows straight over the raw
  // pair stream, separate vocab scan
  private def v9(spark: SparkSession, dir: String): DataFrame = {
    val b = base(spark, dir)
    val p = hashedPairs(b).withColumn("__m", lit(1L))
    val wA = Window.partitionBy(col("__a"))
    val wAB = Window.partitionBy(col("__a"), col("__b"))
    val enriched = p
      .withColumn("__c1", sum(col("__m")).over(wA))
      .withColumn("__c2", sum(col("__m")).over(wAB))
    val vocab = b
      .filter(size(col("__w")) >= 2)
      .select(explode(slice(call_function("word_gram_hashes", col("__w"), lit(1)),
        lit(1), size(col("__w")) - 1)).as("__t"))
      .agg(countDistinct(col("__t")).as("__v"))
    finish(enriched, vocab)
  }

  // V11: duck's own shape — aggregate tiny count tables (931 c2 rows,
  // 31 c1 rows at sf0.1), broadcast them, second scan streams pairs
  // through the broadcast joins straight into the per-doc aggregate.
  // No large shuffle anywhere; cost = two scan+explode passes.
  private def v11(spark: SparkSession, dir: String): DataFrame = {
    val b = base(spark, dir)
    val p = hashedPairs(b)
    val c2t = p.groupBy(col("__a"), col("__b")).agg(count(lit(1)).as("__c2"))
    val c1t = c2t.groupBy(col("__a")).agg(sum(col("__c2")).as("__c1"))
    val vocab = c1t.agg(count(lit(1)).as("__v"))
    val enriched = hashedPairs(b).withColumn("__m", lit(1L))
      .join(broadcast(c2t), Seq("__a", "__b"))
      .join(broadcast(c1t), Seq("__a"))
    finish(enriched, vocab)
  }

  // V12: v9 shape with the fused ws_token_hashes kernel (one byte pass:
  // split + fold + hash; no lower() copy, no regex, no string array)
  private def v12(spark: SparkSession, dir: String,
                  vocabReuse: Boolean): DataFrame = {
    val b = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"),
        call_function("ws_token_hashes", col("text")).as("__th"))
    val p = b.filter(size(col("__th")) >= 2)
      .select(col("doc_id"), col("__th"), (size(col("__th")) - 1).as("__n"))
      .select(col("doc_id"),
        explode(arrays_zip(
          slice(col("__th"), lit(1), col("__n")).as("a"),
          slice(col("__th"), lit(2), col("__n")).as("b"))).as("__p"))
      .select(col("doc_id"), col("__p.a").as("__a"), col("__p.b").as("__b"))
      .withColumn("__m", lit(1L))
    val wA = Window.partitionBy(col("__a"))
    val wAB = Window.partitionBy(col("__a"), col("__b"))
    val enriched = p
      .withColumn("__c1", sum(col("__m")).over(wA))
      .withColumn("__c2", sum(col("__m")).over(wAB))
    val vocab =
      if (vocabReuse)
        p.agg(countDistinct(when(col("__m") >= 0 || col("__b").isNotNull,
          col("__a"))).as("__v"))
      else b.filter(size(col("__th")) >= 2)
        .select(explode(slice(col("__th"), lit(1), size(col("__th")) - 1)).as("__t"))
        .agg(countDistinct(col("__t")).as("__v"))
    finish(enriched, vocab)
  }

  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = Engine.session(
      s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
    val variants = Seq[(String, () => DataFrame)](
      "v0_default" -> (() => v0(spark, dir)),
      "v6_hash" -> (() => v6(spark, dir, doSpread = false, vocabPairs = false)),
      "v9_hash_nocollapse_win" -> (() => v9(spark, dir)),
      "v12_kernel_scan2" -> (() => v12(spark, dir, vocabReuse = false)),
      "v12_kernel_reuse" -> (() => v12(spark, dir, vocabReuse = true)),
      "v13_kernel_noaqe" -> (() => {
        val child = Engine.pinnedSession(spark, "bigram-noaqe") { c =>
          c.conf.set("spark.sql.adaptive.enabled", "false")
          graft.functions.DuckFunctions.register(c)
        }
        v12(child, dir, vocabReuse = false)
      }))
    // warm-up: JIT + file listing
    variants.foreach { case (_, f) =>
      f().write.format("noop").mode("overwrite").save() }
    // verify identical results (vs v0) once
    val ref = v0(spark, dir).collect().map(r => r.toString).sorted
    variants.drop(1).foreach { case (n, f) =>
      val got = f().collect().map(_.toString).sorted
      println(s"MATCH $n = ${ref.sameElements(got)}")
    }
    // timed: 3 reps each, min
    val stages = scala.collection.mutable.Buffer[(Int, Long, Int)]()
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onStageCompleted(
          sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
        val si = sc.stageInfo
        stages += ((si.stageId,
          si.completionTime.getOrElse(0L) - si.submissionTime.getOrElse(0L),
          si.numTasks))
      }
    })
    variants.foreach { case (n, f) =>
      val times = (1 to 3).map { i =>
        if (i == 3) { Thread.sleep(500); stages.clear() }
        val t0 = System.nanoTime()
        f().write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e6
      }
      Thread.sleep(500)
      println(f"TIME $n%-24s min=${times.min}%7.1f ms  all=${times.map(t => f"$t%.0f").mkString(",")}")
      stages.sortBy(_._1).foreach { case (id, ms, nt) =>
        println(f"  STAGE $id%4d ${ms}%5d ms tasks=$nt") }
    }
    spark.stop()
  }
}

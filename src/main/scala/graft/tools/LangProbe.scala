package graft.tools

import graft.Engine
import org.apache.spark.sql.functions._

/** Dev diagnostic: prediction distribution of LangId over the documents
  * table of a given sf dir.
  *
  * r14 audit mode (`audit` arg): the round-13 verdict asked for a
  * corpus-demand check BEFORE adding tier-5 languages — per-SOURCE
  * prediction distribution, accuracy against the generator's `lang`
  * label, the script-only baseline (script block → its dominant
  * language, Latin → en) with a disagreement sample, and the set of
  * labeled languages the classifier does not know (the tier-5 demand
  * signal). Results go to BASELINE.md.
  */
object LangProbe {

  /** Script-only baseline: what a pure script detector would answer. */
  def scriptOnly(text: String): String = {
    if (text == null || text.trim.isEmpty) return "und"
    var han = 0; var kana = 0; var hangul = 0; var cyr = 0
    var arab = 0; var greek = 0; var deva = 0; var beng = 0; var thai = 0
    var tam = 0; var tel = 0; var kan = 0; var mal = 0; var letters = 0
    def in(cp: Int, lo: Int, hi: Int) = cp >= lo && cp <= hi
    text.codePoints().forEach { cp =>
      if (Character.isLetter(cp)) {
        letters += 1
        if (in(cp, 0x4E00, 0x9FFF) || in(cp, 0x3400, 0x4DBF)) han += 1
        else if (in(cp, 0x3040, 0x30FF)) kana += 1
        else if (in(cp, 0xAC00, 0xD7AF) || in(cp, 0x1100, 0x11FF)) hangul += 1
        else if (in(cp, 0x0400, 0x04FF)) cyr += 1
        else if (in(cp, 0x0600, 0x06FF) || in(cp, 0x0750, 0x077F)) arab += 1
        else if (in(cp, 0x0370, 0x03FF)) greek += 1
        else if (in(cp, 0x0900, 0x097F)) deva += 1
        else if (in(cp, 0x0980, 0x09FF)) beng += 1
        else if (in(cp, 0x0E00, 0x0E7F)) thai += 1
        else if (in(cp, 0x0B80, 0x0BFF)) tam += 1
        else if (in(cp, 0x0C00, 0x0C7F)) tel += 1
        else if (in(cp, 0x0C80, 0x0CFF)) kan += 1
        else if (in(cp, 0x0D00, 0x0D7F)) mal += 1
      }
    }
    if (letters == 0) return "und"
    val l = letters.toDouble
    if (kana / l > 0.05) "ja" else if (han / l > 0.20) "zh"
    else if (hangul / l > 0.20) "ko" else if (greek / l > 0.50) "el"
    else if (deva / l > 0.50) "hi" else if (beng / l > 0.50) "bn"
    else if (thai / l > 0.50) "th" else if (tam / l > 0.50) "ta"
    else if (tel / l > 0.50) "te" else if (kan / l > 0.50) "kn"
    else if (mal / l > 0.50) "ml" else if (cyr / l > 0.50) "ru"
    else if (arab / l > 0.50) "ar" else "en"
  }

  def main(args: Array[String]): Unit = {
    val spark = Engine.session(
      s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")}]")
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.01"
    val docs = Engine.table(spark, dir, "documents")
    val pred = udf(graft.operators.LangId.classify _)
    if (args.length > 1 && args(1) == "audit") {
      val scr = udf(scriptOnly _)
      val scored = docs.select(col("source"), col("lang"),
        pred(col("text")).as("p"), scr(col("text")).as("s"),
        substring(col("text"), 1, 60).as("head")).cache()
      println("== per-source prediction distribution ==")
      scored.groupBy("source", "p").count()
        .orderBy(col("source"), desc("count")).show(200, truncate = false)
      println("== accuracy vs generator label, per source ==")
      scored.groupBy("source").agg(
        count(lit(1)).as("n"),
        round(avg(when(col("p") === col("lang"), 1.0).otherwise(0.0)), 4).as("acc_full"),
        round(avg(when(col("s") === col("lang"), 1.0).otherwise(0.0)), 4).as("acc_script_only"))
        .orderBy("source").show(50, truncate = false)
      println("== full-vs-script disagreements (trigram tier at work) ==")
      scored.filter(col("p") =!= col("s"))
        .groupBy("lang", "s", "p").count().orderBy(desc("count"))
        .show(40, truncate = false)
      println("== disagreement sample ==")
      scored.filter(col("p") =!= col("s"))
        .select("lang", "s", "p", "head").show(12, truncate = false)
      println("== labeled languages the classifier does not know (tier-5 demand) ==")
      val known = graft.operators.LangId.knownCodes
      scored.select(col("lang")).distinct().collect().map(_.getString(0))
        .filterNot(known.contains).sorted
        .foreach(l => println(s"UNKNOWN_LABEL $l"))
      println("== misclassified sample (label != full prediction) ==")
      scored.filter(col("p") =!= col("lang"))
        .groupBy("lang", "p").count().orderBy(desc("count")).show(20, truncate = false)
    } else {
      docs.select(pred(col("text")).as("p")).groupBy("p").count()
        .orderBy(desc("count")).show(50, truncate = false)
    }
    spark.stop()
  }
}

package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text analysis for corpus pipelines: quality scoring, token counting,
  * language ID, fingerprinting. Quality/token/fingerprint are pure
  * Catalyst expressions (codegen, no UDF); language ID is a scalar UDF
  * (table-driven heuristic).
  */
object TextAnalysis {

  /** Whitespace tokens (keeps empties — reference string_split semantics). */
  def tokens(text: Column): Column = split(text, " ", -1)

  /** Token count. */
  def tokenCount(text: Column): Column = size(tokens(text)).cast("long")

  /** BPE-ish subword count estimate: words + punctuation clusters +
    * digit runs counted separately (regex heuristic, no tokenizer dep). */
  def subwordCountEstimate(text: Column): Column =
    size(filter(split(text, "(?<=[a-zA-Z])(?=[^a-zA-Z ])|(?<=[^a-zA-Z ])(?=[a-zA-Z])| ", -1),
      t => length(t) > 0)).cast("long")

  /** Stopword ratio against a small builtin english list. */
  private val stopwords = Seq("the", "a", "an", "of", "to", "and", "in", "is", "it", "for")

  def stopwordRatio(text: Column): Column = {
    val toks = tokens(text)
    val stops = array(stopwords.map(lit): _*)
    when(size(toks) === 0, 0.0)
      .otherwise(size(filter(toks, t => array_contains(stops, t))).cast("double") /
        size(toks).cast("double"))
  }

  /** Quality features: length, token stats, alpha/punct/digit ratios. */
  def qualityFeatures(df: DataFrame, textCol: String): DataFrame = {
    val t = col(textCol)
    val toks = tokens(t)
    df.withColumn("n_chars_m", length(t).cast("long"))
      .withColumn("n_tokens", tokenCount(t))
      .withColumn("avg_token_len",
        round(length(regexp_replace(t, " ", "")).cast("double") /
          greatest(size(toks), lit(1)).cast("double"), 6))
      .withColumn("alpha_ratio",
        round(length(regexp_replace(t, "[^a-zA-Z]", "")).cast("double") /
          greatest(length(t), lit(1)).cast("double"), 6))
      .withColumn("digit_ratio",
        round(length(regexp_replace(t, "[^0-9]", "")).cast("double") /
          greatest(length(t), lit(1)).cast("double"), 6))
      .withColumn("stop_ratio", round(stopwordRatio(t), 6))
  }

  /** Language-ID heuristic: CJK codepoint detection + per-language marker
    * words. Works on natural text; on the synthetic corpus it mostly
    * reports 'en', which is honest — the generator labels rows but emits
    * one shared vocabulary.
    */
  def langIdHeuristic(text: String): String = {
    if (text == null || text.isEmpty) return "und"
    var cjk = 0; var total = 0
    text.codePoints().forEach { cp =>
      total += 1
      if ((cp >= 0x4E00 && cp <= 0x9FFF) || (cp >= 0x3040 && cp <= 0x30FF)) cjk += 1
    }
    if (total > 0 && cjk.toDouble / total > 0.2) return "zh"
    val words = text.toLowerCase.split("\\s+").toSet
    val markers = Map(
      "en" -> Set("the", "and", "of", "is", "to", "a"),
      "es" -> Set("el", "la", "los", "que", "de", "y"),
      "de" -> Set("der", "die", "das", "und", "ist", "nicht"),
      "fr" -> Set("le", "la", "les", "et", "est", "une"))
    val scored = markers.view.mapValues(m => (m & words).size).toMap
    val (best, score) = scored.maxBy { case (l, s) => (s, -l(0).toInt) }
    if (score == 0) "und" else best
  }

  /** Content fingerprint: md5 of the normalized text (lowercase, collapsed
    * whitespace) — stable across engines, unlike seeded 64-bit hashes. */
  def fingerprint(text: Column): Column =
    md5(regexp_replace(lower(text), "\\s+", " "))
}

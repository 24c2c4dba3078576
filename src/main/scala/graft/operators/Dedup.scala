package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Document deduplication for large-scale corpus pipelines.
  *
  * All operators are pure DataFrame transforms: the only shuffles are the
  * ones the algorithm fundamentally needs (group-by-key or band-bucket
  * exchange), so each scales linearly with executors. No driver-side
  * collection anywhere.
  */
object Dedup {

  /** Exact dedup, keeping the lowest `orderCol` per key group —
    * deterministic, unlike dropDuplicates' arbitrary row choice.
    * One shuffle on the dedup key.
    */
  def exactKeepFirst(df: DataFrame, keys: Seq[String], orderCol: String): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*).orderBy(col(orderCol).asc)
    df.withColumn("__rn", row_number().over(w)).filter(col("__rn") === 1).drop("__rn")
  }

  /** Word n-gram shingles of a text column (distinct, order-insensitive). */
  def shingles(textCol: Column, n: Int): Column = {
    val words = split(textCol, " ", -1)
    array_distinct(
      filter(
        transform(sequence(lit(0), greatest(size(words) - n, lit(0))),
          i => when(i + n <= size(words), concat_ws(" ", slice(words, i + 1, lit(n))))),
        x => x.isNotNull))
  }

  /** MinHash signature: for each of `numHashes` seeded hash functions,
    * the minimum xxhash64 over the shingle set. All per-row expressions —
    * embarrassingly parallel, no shuffle.
    */
  def minhashSignature(shinglesCol: Column, numHashes: Int): Column =
    transform(sequence(lit(0), lit(numHashes - 1)),
      seed => array_min(transform(shinglesCol,
        sh => xxhash64(sh, seed))))

  /** LSH band keys from a minhash signature: `numBands` hashes, each over
    * `rows = numHashes / numBands` consecutive signature slots. Docs
    * sharing any band key are near-dup candidates.
    */
  def bandKeys(signatureCol: Column, numBands: Int, rows: Int): Column =
    transform(sequence(lit(0), lit(numBands - 1)),
      b => struct(b.as("band"),
        xxhash64(concat_ws("_",
          slice(signatureCol, b * rows + 1, lit(rows)).cast("array<string>")), b).as("bucket")))

  /** Exact Jaccard similarity of two (distinct-element) array columns. */
  def jaccardSets(a: Column, b: Column): Column = {
    val inter = size(array_intersect(a, b)).cast("double")
    val union = size(array_union(a, b)).cast("double")
    when(union === 0, 1.0).otherwise(inter / union)
  }

  /** MinHash+LSH near-duplicate candidate pairs, scored with exact
    * shingle Jaccard.
    *
    * Plan shape (scales to the full corpus): shingle+sign per row (no
    * shuffle) → explode bands (×numBands rows) → self-join on (band,
    * bucket) = ONE shuffle on the band key → exact-score candidates.
    * Skew guard: buckets larger than `maxBucket` are dropped (hot bucket
    * = degenerate text, e.g. empty docs — the cross product would
    * explode; same move as a salting cutoff).
    */
  def minhashCandidates(df: DataFrame, idCol: String, textCol: String,
                        shingleN: Int = 3, numHashes: Int = 16, numBands: Int = 8,
                        maxBucket: Int = 100): DataFrame = {
    val rows = numHashes / numBands
    val withBands = df
      .select(col(idCol).as("id"), shingles(col(textCol), shingleN).as("sh"))
      .filter(size(col("sh")) > 0)
      .withColumn("band", explode(bandKeys(minhashSignature(col("sh"), numHashes), numBands, rows)))
      .select(col("id"), col("sh"), col("band.band").as("band"), col("band.bucket").as("bucket"))
    val pruned = withBands
      .withColumn("bsize", count(lit(1)).over(Window.partitionBy("band", "bucket")))
      .filter(col("bsize") <= maxBucket)
    val a = pruned.select(col("band"), col("bucket"), col("id").as("id_a"), col("sh").as("sh_a"))
    val b = pruned.select(col("band"), col("bucket"), col("id").as("id_b"), col("sh").as("sh_b"))
    a.join(b, Seq("band", "bucket"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"), jaccardSets(col("sh_a"), col("sh_b")).as("jaccard"))
      .distinct()
  }

  /** 64-bit SimHash over whitespace tokens (deterministic; seed via
    * xxhash64). Scalar per-row computation — used as a UDF.
    */
  def simhash64(text: String): Long = {
    if (text == null) return 0L
    val tokens = text.split(" ")
    if (tokens.isEmpty) return 0L
    val acc = new Array[Int](64)
    tokens.foreach { tok =>
      // FNV-1a 64-bit — stable, dependency-free
      var h = 0xcbf29ce484222325L
      var i = 0
      while (i < tok.length) { h ^= tok.charAt(i); h *= 0x100000001b3L; i += 1 }
      var bit = 0
      while (bit < 64) {
        if (((h >>> bit) & 1L) == 1L) acc(bit) += 1 else acc(bit) -= 1
        bit += 1
      }
    }
    var out = 0L
    var bit = 0
    while (bit < 64) { if (acc(bit) > 0) out |= (1L << bit); bit += 1 }
    out
  }

  /** Hamming distance between two simhash values. */
  def simhashDistance(a: Long, b: Long): Int = java.lang.Long.bitCount(a ^ b)
}

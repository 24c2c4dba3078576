package graft.functions

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Encodings for reference types Spark lacks (SURVEY.md §1.2):
  * UNION (tagged sum type) and ENUM (dictionary categorical), plus
  * collation rewrites and sequences.
  */
object TypeHelpers {

  // ---- UNION type (duckdb.hpp:947; union_value/extract/tag,
  // duckdb-5.cpp:16371-16373) as sparse struct {tag, member_0..n} ----

  /** union_value: build a single-member union struct. */
  def unionValue(memberIndex: Int, memberNames: Seq[String], value: Column): Column = {
    val members = memberNames.zipWithIndex.map { case (n, i) =>
      (if (i == memberIndex) value else lit(null)).as(n)
    }
    struct((lit(memberIndex.toByte).as("tag") +: members): _*)
  }

  /** union_tag: which member is populated. */
  def unionTag(u: Column): Column = u.getField("tag")

  /** union_extract: member value (null if the tag doesn't match). */
  def unionExtract(u: Column, memberName: String): Column = u.getField(memberName)

  // ---- ENUM (duckdb.hpp:944) as dictionary table + code helpers ----

  /** Dictionary for an enum: ordered values → (code, value) DataFrame. */
  def enumDictionary(spark: SparkSession, name: String, values: Seq[String]): DataFrame = {
    import spark.implicits._
    val df = values.zipWithIndex.map { case (v, i) => (i, v) }.toDF("code", "value")
    df.createOrReplaceTempView(s"enum_$name")
    df
  }

  /** enum_code: value → code via the dictionary (broadcast join-free:
    * a literal CASE over the dictionary, fine for enum-sized domains). */
  def enumCode(values: Seq[String], c: Column): Column =
    values.zipWithIndex.foldLeft(lit(null).cast("int")) { case (acc, (v, i)) =>
      when(c === v, i).otherwise(acc)
    }

  /** enum_range boundary helpers. */
  def enumFirst(values: Seq[String]): Column = lit(values.head)
  def enumLast(values: Seq[String]): Column = lit(values.last)
  def enumRange(values: Seq[String]): Column = array(values.map(lit): _*)

  // ---- collations (duckdb-5.cpp:5156-5158) as expression rewrites ----

  /** NOCASE collation key. */
  def collateNocase(c: Column): Column = lower(c)

  /** NOACCENT collation key (uses the strip_accents UDF). */
  def collateNoaccent(c: Column): Column = callUDF("strip_accents", c)

  /** NFC collation key. */
  val nfcNormalize: String => String = s =>
    if (s == null) null
    else java.text.Normalizer.normalize(s, java.text.Normalizer.Form.NFC)

  // ---- sequences (duckdb-6.cpp:2012 nextval/currval) ----
  // Driver-side monotonic counters: documented single-driver semantics
  // (the reference's sequences are also a single-node catalog object).

  private val sequences = new java.util.concurrent.ConcurrentHashMap[String, (java.util.concurrent.atomic.AtomicLong, Long)]()

  def createSequence(name: String, start: Long = 1L, incrementBy: Long = 1L): Unit = {
    require(incrementBy != 0L, "INCREMENT BY must be non-zero")
    sequences.put(name, (new java.util.concurrent.atomic.AtomicLong(start - incrementBy), incrementBy))
  }

  def nextval(name: String): Long = {
    val seq = sequences.get(name)
    require(seq != null, s"sequence $name does not exist")
    seq._1.addAndGet(seq._2)
  }

  def currval(name: String): Long = {
    val seq = sequences.get(name)
    require(seq != null, s"sequence $name does not exist")
    seq._1.get()
  }

  // ---- glob table function (duckdb-6.cpp:9491) ----

  /** glob('pattern'): matching file paths as a DataFrame. */
  def glob(spark: SparkSession, pattern: String): DataFrame = {
    import spark.implicits._
    val path = new org.apache.hadoop.fs.Path(pattern)
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val statuses = Option(fs.globStatus(path)).getOrElse(Array.empty)
    statuses.map(s => (s.getPath.toString, s.getLen)).toSeq.toDF("file", "size")
  }
}

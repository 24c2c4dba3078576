package graft.sources

import org.apache.spark.sql.{DataFrame, DataFrameReader, SparkSession}
import org.apache.spark.sql.functions._

/** CSV source/sink with reference-style option names
  * (ReadCSVTableFunction's 30 named options, duckdb-6.cpp:10273-10299;
  * writer = PhysicalCopyToFile, duckdb-4.cpp:4689). Dialect sniffing maps
  * to Spark's schema inference; explicit options are translated 1:1;
  * options with no DataFrameReader equivalent (`skip`, `union_by_name`,
  * `filename`, `normalize_names`) are implemented as plan transforms.
  * Remaining unknown options raise instead of silently diverging.
  */
object Csv {

  /** Reference option name → Spark CSV option (full named-parameter list:
    * ReadCSVAddNamedParameters, duckdb-6.cpp:10271-10299). */
  private val optionMap = Map(
    "sep" -> "sep", "delim" -> "sep", "quote" -> "quote",
    "escape" -> "escape", "nullstr" -> "nullValue", "header" -> "header",
    "new_line" -> "lineSep", "dateformat" -> "dateFormat",
    "timestampformat" -> "timestampFormat", "compression" -> "compression",
    "ignore_errors" -> "mode", "all_varchar" -> "inferSchema")

  /** Options handled as transforms or accepted as documented no-ops:
    *  - skip=N            drop N physical lines before the header (per
    *                      path, emulated via a line-indexed text read)
    *  - union_by_name     per-file reads + unionByName(allowMissing)
    *  - filename          append the source file path column
    *  - normalize_names   lowercase + non-alphanumeric → '_'
    *  - names=[a,b,…]     positional column rename
    *  - columns={a:T,…}   explicit schema (no inference), reference
    *                      struct syntax
    *  - hive_partitioning Spark discovers key=value directories natively
    *  - auto_detect       Spark always sniffs (inferSchema)
    *  - sample_size / sample_chunk_size / sample_chunks  sniffer hints;
    *                      Spark's inference does a full pass
    *  - max_line_size / maximum_line_size / buffer_size / parallel
    *                      reader tuning knobs; Spark sizes its own
    *                      buffers and is always parallel
    *  - decimal_separator only '.' is supported (Spark's parser has no
    *                      locale separator; a non-default value raises)
    */
  private val transformKeys =
    Set("skip", "union_by_name", "filename", "normalize_names",
      "names", "columns", "hive_partitioning", "auto_detect",
      "sample_size", "sample_chunk_size", "sample_chunks",
      "max_line_size", "maximum_line_size", "buffer_size", "parallel",
      "decimal_separator")

  private def translate(opts: Map[String, String]): Map[String, String] =
    opts.map { case (k, v) =>
      optionMap.get(k.toLowerCase) match {
        case Some("mode") => "mode" -> (if (v == "true") "DROPMALFORMED" else "FAILFAST")
        case Some("inferSchema") => "inferSchema" -> (if (v == "true") "false" else "true")
        case Some(sk) => sk -> v
        case None => throw new IllegalArgumentException(
          s"unsupported CSV option: $k (supported: ${
            (optionMap.keys ++ transformKeys).toSeq.sorted.mkString(", ")})")
      }
    }

  private def normalizeName(n: String): String =
    n.map(c => if (c.isLetterOrDigit) c.toLower else '_')

  /** read_csv / read_csv_auto: header + schema inference by default
    * (the sniffer analog — Spark samples the file for dialect/type). */
  def read(spark: SparkSession, path: String,
           options: Map[String, String] = Map.empty): DataFrame = {
    val lower = options.map { case (k, v) => k.toLowerCase -> v }
    require(lower.get("decimal_separator").forall(_ == "."),
      "decimal_separator: only '.' is supported")
    val skip = lower.get("skip").map(_.toInt).getOrElse(0)
    val unionByName = lower.get("union_by_name").exists(_.toBoolean)
    val addFilename = lower.get("filename").exists(_.toBoolean)
    val normalize = lower.get("normalize_names").exists(_.toBoolean)
    // names=[a, b] / columns={a: 'TYPE', …} — reference list/struct syntax.
    // Split bracket/quote-aware (graft.SqlDialect.splitTopLevel) and on the
    // FIRST ':' only, so parenthesized types (DECIMAL(10,2), STRUCT<…>)
    // survive instead of MatchError-ing.
    val names = lower.get("names").map(
      _.stripPrefix("[").stripSuffix("]").split(",")
        .map(_.trim.stripPrefix("'").stripSuffix("'")).toSeq)
    val columns = lower.get("columns").map(c =>
      graft.SqlDialect.splitTopLevel(c.trim.stripPrefix("{").stripSuffix("}"))
        .map(_.trim).filter(_.nonEmpty).map { kv =>
          val ci = kv.indexOf(':')
          require(ci > 0, s"columns: malformed entry '$kv' (expected name: 'TYPE')")
          val n = kv.substring(0, ci).trim.stripPrefix("'").stripSuffix("'")
          val t = kv.substring(ci + 1).trim.stripPrefix("'").stripSuffix("'")
          s"$n ${duckToSparkType(t)}"
        }.mkString(", "))
    val translated = translate(lower -- transformKeys)

    def reader: DataFrameReader = {
      val base = columns.foldLeft(
        spark.read.option("header", "true")
          .option("inferSchema", columns.isEmpty.toString)) {
        case (acc, ddl) => acc.schema(ddl)
      }
      translated.foldLeft(base) { case (acc, (k, v)) => acc.option(k, v) }
    }

    require(skip == 0 || !unionByName,
      "skip cannot be combined with union_by_name (skip is applied per file " +
        "before parsing; combine them by reading each file separately)")

    var df =
      if (skip > 0) {
        // no reader-level skip in Spark: read each file's lines with their
        // in-file index (zipWithIndex preserves text-split order), drop
        // the preamble PER FILE — the reference skips N lines of every
        // input file, so a global line index over a glob would only skip
        // the first file's preamble — and parse each remainder as CSV
        import spark.implicits._
        val files = globFiles(spark, path)
        require(files.nonEmpty, s"skip: no files match $path")
        files.map { f =>
          val lines = spark.sparkContext.textFile(f)
            .zipWithIndex().filter(_._2 >= skip).map(_._1)
          reader.csv(spark.createDataset(lines))
        }.reduce(_ unionByName _)
      } else if (unionByName) {
        // schema-per-file + name-based union (reference union_by_name):
        // missing columns null-fill, like MultiFileReader's column map
        val files = globFiles(spark, path)
        require(files.nonEmpty, s"union_by_name: no files match $path")
        files.map(f => reader.csv(f))
          .reduce(_.unionByName(_, allowMissingColumns = true))
      } else reader.csv(path)

    if (addFilename) df = df.withColumn("filename", input_file_name())
    if (normalize) df = df.toDF(df.columns.map(normalizeName).toIndexedSeq: _*)
    names.foreach { ns =>
      require(ns.length <= df.columns.length, "names: more names than columns")
      df = df.toDF((ns ++ df.columns.drop(ns.length)).toIndexedSeq: _*)
    }
    df
  }

  private def globFiles(spark: SparkSession, path: String): Seq[String] = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    Option(fs.globStatus(p)).getOrElse(Array.empty)
      .map(_.getPath.toString).sorted.toSeq
  }

  /** Reference type name → Spark DDL type (shared with the dialect's
    * CREATE TABLE column-definition parsing). */
  private[graft] def duckToSparkDdl(t: String): String = duckToSparkType(t)

  private def duckToSparkType(t: String): String = t.toUpperCase match {
    case "VARCHAR" | "TEXT" => "STRING"
    case "INTEGER" | "INT" | "INT4" => "INT"
    case "BIGINT" | "INT8" | "HUGEINT" => "BIGINT"
    case "DOUBLE" | "REAL" | "FLOAT8" => "DOUBLE"
    case "BOOLEAN" | "BOOL" => "BOOLEAN"
    case "DATE" => "DATE"
    case "TIMESTAMP" => "TIMESTAMP"
    case other => other
  }

  /** COPY … TO 'path' (CSV): per-partition parallel write, like the
    * reference's per-thread CSV sink. */
  def write(df: DataFrame, path: String,
            options: Map[String, String] = Map.empty): Unit =
    translate(options.map { case (k, v) => k.toLowerCase -> v } -- transformKeys)
      .foldLeft(df.write.mode("overwrite").option("header", "true")) {
        case (acc, (k, v)) => acc.option(k, v)
      }.csv(path)
}

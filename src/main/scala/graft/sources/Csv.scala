package graft.sources

import org.apache.spark.sql.{DataFrame, DataFrameReader, SparkSession}

/** CSV source/sink with reference-style option names
  * (ReadCSVTableFunction's 30 named options, duckdb-6.cpp:10273-10299;
  * writer = PhysicalCopyToFile, duckdb-4.cpp:4689). Dialect sniffing maps
  * to Spark's schema inference; explicit options are translated 1:1.
  */
object Csv {

  /** Reference option name → Spark CSV option. Unsupported reference
    * options (`skip`, `sample_size`, …) raise instead of silently
    * diverging. */
  private val optionMap = Map(
    "sep" -> "sep", "delim" -> "sep", "quote" -> "quote",
    "escape" -> "escape", "nullstr" -> "nullValue", "header" -> "header",
    "dateformat" -> "dateFormat",
    "timestampformat" -> "timestampFormat", "compression" -> "compression",
    "ignore_errors" -> "mode", "all_varchar" -> "inferSchema")

  private def translate(opts: Map[String, String]): Map[String, String] =
    opts.map { case (k, v) =>
      optionMap.get(k.toLowerCase) match {
        case Some("mode") => "mode" -> (if (v == "true") "DROPMALFORMED" else "FAILFAST")
        case Some("inferSchema") => "inferSchema" -> (if (v == "true") "false" else "true")
        case Some(sk) => sk -> v
        case None => throw new IllegalArgumentException(
          s"unsupported CSV option: $k (supported: ${optionMap.keys.toSeq.sorted.mkString(", ")})")
      }
    }

  /** read_csv / read_csv_auto: header + schema inference by default
    * (the sniffer analog — Spark samples the file for dialect/type). */
  def read(spark: SparkSession, path: String,
           options: Map[String, String] = Map.empty): DataFrame = {
    val r: DataFrameReader = spark.read
      .option("header", "true").option("inferSchema", "true")
    translate(options).foldLeft(r) { case (acc, (k, v)) => acc.option(k, v) }
      .csv(path)
  }

  /** COPY … TO 'path' (CSV): per-partition parallel write, like the
    * reference's per-thread CSV sink. */
  def write(df: DataFrame, path: String,
            options: Map[String, String] = Map.empty): Unit =
    translate(options).foldLeft(
      df.write.mode("overwrite").option("header", "true")) {
      case (acc, (k, v)) => acc.option(k, v)
    }.csv(path)
}

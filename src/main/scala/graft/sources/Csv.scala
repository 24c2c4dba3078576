package graft.sources

import org.apache.spark.sql.{DataFrame, DataFrameReader, SparkSession}

/** CSV source/sink with reference-style option names
  * (ReadCSVTableFunction's 30 named options, duckdb-6.cpp:10273-10299;
  * writer = PhysicalCopyToFile, duckdb-4.cpp:4689). Dialect sniffing maps
  * to Spark's schema inference; explicit options are translated 1:1.
  */
object Csv {

  /** Reference option name → Spark CSV option. */
  private val optionMap = Map(
    "sep" -> "sep", "delim" -> "sep", "quote" -> "quote",
    "escape" -> "escape", "nullstr" -> "nullValue", "header" -> "header",
    "skip" -> "skipRows", "dateformat" -> "dateFormat",
    "timestampformat" -> "timestampFormat", "compression" -> "compression",
    "ignore_errors" -> "mode", "all_varchar" -> "inferSchema",
    "sample_size" -> "samplingRatio")

  private def translate(opts: Map[String, String]): Map[String, String] =
    opts.flatMap { case (k, v) =>
      optionMap.get(k.toLowerCase).map {
        case "mode" => "mode" -> (if (v == "true") "DROPMALFORMED" else "FAILFAST")
        case "inferSchema" => "inferSchema" -> (if (v == "true") "false" else "true")
        case sk => sk -> v
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

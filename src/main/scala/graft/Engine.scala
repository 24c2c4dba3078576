package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Session + catalog facade for the graft engine.
  *
  * Mirrors the reference's `Connection` entry point
  * (/root/reference/duckdb.hpp:21764 `Connection`, duckdb-7.cpp:2453
  * `ClientContext::Query`): one object that owns configuration, table
  * resolution and SQL execution. On Spark the parse/bind/optimize/execute
  * pipeline is Catalyst's; this facade only pins the session defaults that
  * make results reproducible (UTC, fixed shuffle width) and registers the
  * graft-specific functions (see [[graft.functions.DuckFunctions]]).
  */
object Engine {

  /** Canonical table names shipped by the test-data generator. */
  val TableNames: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** Build a local session with scale-conscious defaults.
    *
    * shuffle.partitions is deliberately small for local runs; on a real
    * cluster it would be sized to ~2-3x total cores (or left to AQE
    * coalescing, which is enabled).
    */
  def session(master: String = "local[*]", shufflePartitions: Int = 32): SparkSession = {
    val spark = SparkSession.builder()
      .master(master)
      .appName("graft")
      .config("spark.sql.shuffle.partitions", shufflePartitions.toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    functions.DuckFunctions.register(spark)
    spark
  }

  /** Load one driver-generated table from an sf directory.
    *
    * Plain `spark.read.parquet`: filter pushdown + column pruning into the
    * scan are automatic (the reference's zone-map skipping,
    * duckdb-10.cpp:5441, maps to Parquet row-group stats pruning).
    */
  def table(spark: SparkSession, dir: String, name: String): DataFrame = {
    functions.DuckFunctions.register(spark)
    // events.ts is TIMESTAMP(NANOS) parquet, which Spark's vectorized
    // reader rejects; read nanos as long and convert to µs TimestampType
    // (truncation documented — all graft time semantics are µs, like the
    // reference's TIMESTAMP, duckdb.hpp:915).
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = spark.read.parquet(s"$dir/$name.parquet")
    raw.schema.fields.find(f => f.name == "ts" &&
      f.dataType == org.apache.spark.sql.types.LongType) match {
      case Some(_) =>
        raw.withColumn("ts",
          org.apache.spark.sql.functions.timestamp_micros(
            org.apache.spark.sql.functions.col("ts") / 1000 cast
              org.apache.spark.sql.types.LongType))
      case None => raw
    }
  }

  /** Register every table of an sf directory as a temp view so that
    * `Engine.sql` works against it (reference analog: catalog binding in
    * Binder::BindNode, duckdb-8.cpp:18107).
    */
  def registerAll(spark: SparkSession, dir: String): Unit = {
    functions.DuckFunctions.register(spark)
    TableNames.foreach { n =>
      table(spark, dir, n).createOrReplaceTempView(n)
    }
  }

  /** SQL passthrough (the reference's Connection::Query). */
  def sql(spark: SparkSession, query: String): DataFrame = spark.sql(query)
}

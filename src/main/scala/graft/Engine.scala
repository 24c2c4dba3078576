package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions.{coalesce, col, expr, floor, hash, lit, monotonically_increasing_id, pmod, sum, when}

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
      // default 100 thrashes under a 187-query inventory: every pass
      // re-generates + re-compiles evicted classes, which then start
      // interpreted (static conf — shared JVM-wide cache)
      .config("spark.sql.codegen.cache.maxEntries", "5000")
      .config("spark.ui.enabled", "false")
      // every action (and every AQE stage update) posts a plan
      // description event whose FORMATTED rendering walks the whole plan
      // tree — measured 10-40ms per action on wide plans with the UI
      // disabled anyway; "simple" keeps the event cheap (floor profile:
      // tools/FloorProfile.scala)
      .config("spark.sql.ui.explainMode", "simple")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    functions.DuckFunctions.register(spark)
    spark
  }

  /** One pinned, conf-tweaked child session per (parent, key) — the
    * generalization of the no-broadcast child SqlScripts pins for
    * join_piecewise_merge. Weak-keyed on the parent so stopped parents
    * don't pin children for the JVM lifetime; memoized so repeat runs
    * of the same query share one child and its resolved-plan caches
    * (a fresh child per call would give table relations new identity
    * and re-run plan-time work every execution). */
  private val pinnedChildren = java.util.Collections.synchronizedMap(
    new java.util.WeakHashMap[SparkSession,
      scala.collection.concurrent.TrieMap[String, SparkSession]]())

  def pinnedSession(parent: SparkSession, key: String)
                   (configure: SparkSession => Unit): SparkSession = {
    val perKey = pinnedChildren.computeIfAbsent(parent,
      _ => new scala.collection.concurrent.TrieMap[String, SparkSession])
    // concurrent.Map.getOrElseUpdate may evaluate the thunk in two
    // racing threads but installs exactly ONE child (putIfAbsent), and
    // both callers receive the installed one; the loser's newSession is
    // a discarded lightweight SessionState wrapper (same SparkContext),
    // not a leaked context
    perKey.getOrElseUpdate(key, {
      val child = parent.newSession()
      configure(child)
      child
    })
  }

  /** Load one driver-generated table from an sf directory.
    *
    * Plain `spark.read.parquet`: filter pushdown + column pruning into the
    * scan are automatic (the reference's zone-map skipping,
    * duckdb-10.cpp:5441, maps to Parquet row-group stats pruning).
    */
  // Schema memo: spark.read.parquet without a schema re-reads footers
  // (inference) on every call — that was a ~0.2s floor under every
  // trivial query. The memo keys on (dir, name) ONLY, deliberately not on
  // the session: a session in the key would pin child/stopped sessions
  // (and their resolved plans) for the JVM lifetime. A StructType holds
  // no session reference, any number of sessions share it, and because
  // only the schema (not the file list) is memoized, data appended under
  // the same path is picked up on the next read — only an on-disk SCHEMA
  // change under a memoized path is unsupported (documented).
  // Cache-manager substitution still applies: plans for the same
  // path+schema canonicalize equal.
  private val schemaMemo = new java.util.concurrent.ConcurrentHashMap[
    (String, String), org.apache.spark.sql.types.StructType]()

  def table(spark: SparkSession, dir: String, name: String): DataFrame =
    resolveTable(spark, dir, name)

  /** Inferred (and memoized) on-disk schema of an sf-dir table. Public
    * because it is the SINGLE source of truth for both the batch reader
    * below and the streaming reader (streaming/EventStreams.readEvents),
    * so their ts-unit handling can never diverge. Inference runs with
    * nanosAsLong=true so a TIMESTAMP(NANOS) file infers as LongType
    * instead of failing — the conf must be set BEFORE the footer read,
    * which is why detection-then-set is not an option.
    */
  def tableSchema(spark: SparkSession, dir: String,
                  name: String): org.apache.spark.sql.types.StructType = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    schemaMemo.computeIfAbsent((dir, name),
      _ => spark.read.parquet(s"$dir/$name.parquet").schema)
  }

  /** True when the stored ts column is raw int64 nanoseconds (a
    * TIMESTAMP(NANOS) parquet read under nanosAsLong) rather than a
    * native TimestampType — the caller must then apply `ts div 1000` →
    * timestamp_micros. Historically the testdata generator has flipped
    * between timestamp[ns] and timestamp[us]; both paths key off THIS
    * predicate so either file layout reads correctly.
    */
  def tsIsLongNanos(schema: org.apache.spark.sql.types.StructType): Boolean =
    schema.fields.exists(f => f.name == "ts" &&
      f.dataType == org.apache.spark.sql.types.LongType)

  // Effective scan parallelism of a table = its total parquet ROW GROUP
  // count (a row group is the atomic read unit: Spark assigns it to the
  // one split covering its midpoint, so byte-range splits beyond this
  // are empty tasks). Driver-side footer reads, memoized per path —
  // queries whose first stage fuses heavy per-row work with the scan
  // use this to decide whether a redistribution is worth one shuffle.
  private val rowGroupMemo =
    new java.util.concurrent.ConcurrentHashMap[String, Integer]()

  /** One footer pass over every parquet file of a table, folding `f`
    * over the open readers — the single listing/open/close routine both
    * footer probes below share, so their file-resolution rules can
    * never diverge. */
  private def withFooters[T](spark: SparkSession, dir: String, name: String)
                            (zero: T)(f: (T, org.apache.parquet.hadoop.ParquetFileReader) => T): T = {
    val conf = spark.sparkContext.hadoopConfiguration
    val root = new org.apache.hadoop.fs.Path(s"$dir/$name.parquet")
    val fs = root.getFileSystem(conf)
    val files =
      if (fs.getFileStatus(root).isDirectory)
        fs.listStatus(root).map(_.getPath)
          .filter(p => p.getName.endsWith(".parquet")).toSeq
      else Seq(root)
    files.foldLeft(zero) { (acc, p) =>
      val r = org.apache.parquet.hadoop.ParquetFileReader.open(
        org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(p, conf))
      try f(acc, r) finally r.close()
    }
  }

  def parquetRowGroups(spark: SparkSession, dir: String, name: String): Int =
    rowGroupMemo.computeIfAbsent(s"$dir/$name", { _ =>
      Integer.valueOf(withFooters(spark, dir, name)(0)(_ + _.getRowGroups.size))
    }).intValue()

  /** Redistribute a row-group-bound source ahead of per-row-expensive
    * work (JSON parse, explode, sketch build): a single-row-group file
    * caps the scan at ONE task, so the fused projection/partial-agg
    * serializes. The repartition moves a COMPACT row shuffle ahead of
    * the expensive stage; skipped whenever the file's row groups
    * already feed half the cores — always true at cluster scale, so
    * the branch is inert there. Callers pass the pre-projection frame
    * (fewest columns) to keep the shuffle small. */
  def spread(spark: SparkSession, dir: String, name: String,
             df: DataFrame): DataFrame = {
    val cores = spark.sparkContext.defaultParallelism
    if (parquetRowGroups(spark, dir, name) < cores / 2) df.repartition(cores)
    else df
  }

  // Column [min, max] from the same parquet footers (row-group
  // statistics — the reference's zone maps, duckdb-10.cpp:5441), for
  // sketches that need a value range at PLAN time without a data pass.
  private val colRangeMemo =
    new java.util.concurrent.ConcurrentHashMap[String, (Double, Double)]()

  def parquetColumnRange(spark: SparkSession, dir: String, name: String,
                         column: String): (Double, Double) =
    colRangeMemo.computeIfAbsent(s"$dir/$name/$column", { _ =>
      // LOGICAL-type aware decoding (self-review r10): an int32/int64-
      // backed DECIMAL's statistics hold the UNSCALED value — divide by
      // 10^scale or the range is 10^scale off; byte-array-backed stats
      // (string/binary/fixed-len decimal) have no defensible numeric
      // reading here, so the column is skipped and the caller's
      // data-pass fallback below kicks in rather than crashing on
      // Binary.toString.
      var lo = Double.PositiveInfinity
      var hi = Double.NegativeInfinity
      withFooters(spark, dir, name)(()) { (_, r) =>
        r.getRowGroups.forEach { rg =>
          rg.getColumns.forEach { c =>
            if (c.getPath.toDotString == column && c.getStatistics != null &&
                c.getStatistics.hasNonNullValue) {
              val scaleDiv = {
                val lt = c.getPrimitiveType.getLogicalTypeAnnotation
                lt match {
                  case d: org.apache.parquet.schema.LogicalTypeAnnotation.DecimalLogicalTypeAnnotation =>
                    math.pow(10, d.getScale)
                  case _ => 1.0
                }
              }
              def d(v: Any): Option[Double] = v match {
                case x: java.lang.Double => Some(x.doubleValue() / scaleDiv)
                case x: java.lang.Float => Some(x.doubleValue() / scaleDiv)
                case x: java.lang.Integer => Some(x.doubleValue() / scaleDiv)
                case x: java.lang.Long => Some(x.doubleValue() / scaleDiv)
                case _ => None // binary-backed stats: no numeric reading
              }
              d(c.getStatistics.genericGetMin).foreach(v => lo = math.min(lo, v))
              d(c.getStatistics.genericGetMax).foreach(v => hi = math.max(hi, v))
            }
          }
        }
      }
      if (lo <= hi) (lo, hi)
      else {
        // fallback: one tiny min/max aggregate over the column — the
        // same plan-time data probe RangeJoinRule's bounds job runs
        val row = table(spark, dir, name)
          .agg(org.apache.spark.sql.functions.min(column).cast("double"),
            org.apache.spark.sql.functions.max(column).cast("double")).head()
        require(!row.isNullAt(0) && !row.isNullAt(1),
          s"parquetColumnRange: no stats and no values for $name.$column")
        (row.getDouble(0), row.getDouble(1))
      }
    })

  private def resolveTable(spark: SparkSession, dir: String, name: String): DataFrame = {
    functions.DuckFunctions.register(spark)
    // ts-unit handling: if the file stores TIMESTAMP(NANOS) it infers as
    // LongType (nanosAsLong, set in tableSchema) and we convert to µs
    // TimestampType here (truncation documented — all graft time
    // semantics are µs, like the reference's TIMESTAMP, duckdb.hpp:915);
    // a timestamp[us] file infers as TimestampType and passes through.
    val path = s"$dir/$name.parquet"
    val schema = tableSchema(spark, dir, name)
    val raw = spark.read.schema(schema).parquet(path)
    if (tsIsLongNanos(raw.schema)) {
      // integral div: double division loses precision at ~1.7e18 ns and
      // rounds some timestamps off by 1µs
      raw.withColumn("ts",
        org.apache.spark.sql.functions.timestamp_micros(
          org.apache.spark.sql.functions.expr("ts div 1000")))
    } else raw
  }

  /** repeat(val, n) table function (reference RepeatTableFunction,
    * duckdb-6.cpp:10510-10530): n rows of the constant `value`. */
  def repeatTable(spark: SparkSession, value: Any, n: Long): DataFrame =
    spark.range(n).select(org.apache.spark.sql.functions.lit(value).as("value"))

  /** Register every table of an sf directory as a temp view so that
    * `Engine.sql` works against it (reference analog: catalog binding in
    * Binder::BindNode, duckdb-8.cpp:18107).
    */
  // Weak-keyed on the session so stopped/child sessions don't accumulate
  // (their temp views die with the session anyway).
  private val registeredDirs = java.util.Collections.synchronizedMap(
    new java.util.WeakHashMap[SparkSession, java.util.Set[String]]())

  def registerAll(spark: SparkSession, dir: String): Unit = {
    functions.DuckFunctions.register(spark)
    // memoized per (session, dir): several queries call this and each
    // plain registration resolves 10 tables
    val dirs = registeredDirs.computeIfAbsent(spark,
      _ => java.util.concurrent.ConcurrentHashMap.newKeySet[String]())
    if (dirs.add(dir)) {
      TableNames.foreach { n =>
        table(spark, dir, n).createOrReplaceTempView(n)
      }
    }
  }

  /** SQL entry point (the reference's Connection::Query,
    * duckdb-7.cpp:2453) with dialect pre-rewrites (QUALIFY, DISTINCT ON,
    * LIMIT n%, USING SAMPLE, read_csv replacement scans). */
  def sql(spark: SparkSession, query: String): DataFrame =
    SqlDialect.sql(spark, query)

  // ---- in-memory catalog DML (reference: PhysicalInsert/Delete/Update,
  // duckdb-4.cpp:9996-10015; here emulated over temp views — Spark is not
  // a transactional store, SURVEY.md §2.11) ----

  /** CREATE TABLE name AS df. */
  def createTable(spark: SparkSession, name: String, df: DataFrame): Unit = {
    df.createOrReplaceTempView(name)
    // the programmatic CREATE TABLE path carries TABLE provenance just
    // like the SQL path — duckdb_tables() lists it, duckdb_views() not
    markAsTable(spark, name)
  }

  /** INSERT INTO name (append rows; lineage truncated so repeated inserts
    * don't stack plans). */
  def insertInto(spark: SparkSession, name: String, rows: DataFrame): Unit =
    spark.table(name).unionByName(rows).localCheckpoint().createOrReplaceTempView(name)

  /** DELETE FROM name WHERE cond. SQL DELETE removes only rows where the
    * predicate is TRUE — a NULL predicate keeps the row (filter(!cond)
    * alone would drop it, since NOT NULL = NULL filters out). */
  def deleteWhere(spark: SparkSession, name: String, cond: Column): Unit =
    spark.table(name).filter(!coalesce(cond, lit(false)))
      .localCheckpoint().createOrReplaceTempView(name)

  /** UPDATE name SET col = value WHERE cond. */
  def updateWhere(spark: SparkSession, name: String, cond: Column,
                  assignments: Map[String, Column]): Unit = {
    val t = spark.table(name)
    val updated = assignments.foldLeft(t) { case (acc, (c, v)) =>
      acc.withColumn(c, when(cond, v).otherwise(col(c)))
    }
    updated.localCheckpoint().createOrReplaceTempView(name)
  }

  // ---- declared-constraint validation (reference NotNullConstraint/
  // CheckConstraint/UniqueConstraint binding, duckdb.hpp:20267-20272;
  // PhysicalInsert verifies them per chunk). Enforcement here is a
  // validation PASS over the incoming batch (plus a key probe against
  // the stored table for uniqueness) — Spark is not a transactional
  // store, so this is the insert-time subset of the reference's
  // behavior, on by default for DECLARED constraints and switchable off
  // via `SET spark.graft.validateConstraints=false` for bulk loads
  // where the probe join is unwanted. Error wording mirrors the
  // reference's Constraint Error messages so migrated error handling
  // keeps matching.

  /** Declared constraints of one table: NOT NULL columns, labeled
    * unique keys (label = "primary key" | "unique"), CHECK expressions
    * (SQL text, evaluated over the incoming rows; NULL passes, like
    * SQL). */
  final case class TableConstraints(notNull: Seq[String] = Nil,
                                    unique: Seq[(String, Seq[String])] = Nil,
                                    checks: Seq[String] = Nil,
                                    foreignKeys: Seq[(Seq[String], String, Seq[String])] = Nil) {
    def isEmpty: Boolean =
      notNull.isEmpty && unique.isEmpty && checks.isEmpty && foreignKeys.isEmpty
  }

  final class ConstraintViolation(msg: String) extends RuntimeException(msg)

  /** Validate an incoming batch against `cons`. NOT NULL and CHECK are
    * ONE aggregate pass over the batch; each unique key adds a
    * within-batch duplicate count and (when `checkUnique`) a semi-join
    * probe against the stored table — the same work any engine pays
    * without an index. Conflict-clause inserts (OR IGNORE/OR REPLACE/
    * ON CONFLICT) pass checkUnique = false: key conflicts are their
    * RESOLUTION input, not an error, but NOT NULL/CHECK still raise
    * (verified against the reference's INSERT OR IGNORE). */
  def validateConstraints(spark: SparkSession, name: String, rows: DataFrame,
                          cons: TableConstraints, checkUnique: Boolean): Unit = {
    if (cons.notNull.nonEmpty || cons.checks.nonEmpty) {
      val aggs =
        cons.notNull.map(c =>
          sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"__nn_$c")) ++
        cons.checks.zipWithIndex.map { case (e, i) =>
          sum(when(!coalesce(expr(e), lit(true)), 1L).otherwise(0L)).as(s"__ck_$i")
        }
      val r = rows.agg(aggs.head, aggs.tail: _*).head()
      cons.notNull.zipWithIndex.foreach { case (c, i) =>
        if (!r.isNullAt(i) && r.getLong(i) > 0)
          throw new ConstraintViolation(
            s"Constraint Error: NOT NULL constraint failed: $name.$c")
      }
      cons.checks.indices.foreach { i =>
        val j = cons.notNull.length + i
        if (!r.isNullAt(j) && r.getLong(j) > 0)
          throw new ConstraintViolation(
            s"Constraint Error: CHECK constraint failed: $name")
      }
    }
    // FOREIGN KEY referential check (reference ForeignKeyConstraint,
    // duckdb.hpp:20272): every non-null FK tuple in the batch must
    // exist in the referenced table. MATCH SIMPLE semantics — a row
    // with ANY null key part skips the check, like the reference. One
    // left-anti probe per declared FK; the referenced-key projection is
    // broadcast-sized in any sane schema, so this is a map-side join.
    cons.foreignKeys.foreach { case (cols, ref, refCols) =>
      val keyed = rows.filter(cols.map(col(_).isNotNull).reduce(_ && _))
        .select(cols.map(col): _*)
      val stored = spark.table(ref)
        .select(refCols.zip(cols).map { case (rc, c) => col(rc).as(c) }: _*)
      // self-referential FK (r11): a batch may reference keys it itself
      // introduces — the parent key set is stored ∪ batch (statement-
      // level validation, like the reference's end-of-statement check)
      val parent =
        if (ref.toLowerCase == name.toLowerCase)
          stored.union(rows.select(
            refCols.zip(cols).map { case (rc, c) => col(rc).as(c) }: _*))
        else stored
      if (keyed.join(parent, cols, "left_anti").limit(1).count() > 0)
        throw new ConstraintViolation(
          s"Constraint Error: Violates foreign key constraint because the key " +
            s"does not exist in the referenced table $ref")
    }
    if (checkUnique) cons.unique.foreach { case (label, keys) =>
      // SQL UNIQUE ignores rows with any NULL key part (multiple NULLs
      // allowed); PRIMARY KEY nulls are caught by the implied NOT NULL
      val keyed = rows.filter(keys.map(col(_).isNotNull).reduce(_ && _))
      val withinDup = keyed.groupBy(keys.map(col): _*)
        .count().filter(col("count") > 1).limit(1).collect().headOption
      lazy val storedDup =
        keyed.select(keys.map(col): _*) // keys-only, so r.get(i) below
          .join(spark.table(name).select(keys.map(col): _*), // reads keys
            keys, "left_semi").limit(1).collect().headOption
      val dup = withinDup.orElse(storedDup)
      dup.foreach { r =>
        // the reference's message carries the offending key values:
        // Duplicate key "a: 1" violates primary key constraint (r17
        // BATTERY7 d05 message parity)
        val kv = keys.zipWithIndex
          .map { case (k, i) => s"$k: ${r.get(i)}" }.mkString(", ")
        throw new ConstraintViolation(
          s"""Constraint Error: Duplicate key "$kv" violates $label """ +
            "constraint")
      }
    }
  }

  // ---- conflict-clause DML (reference ON CONFLICT binding,
  // duckdb-4.cpp:9996-10015: OR REPLACE = delete-then-insert on the key,
  // DO NOTHING = skip conflicting rows, DO UPDATE = in-place assignment).
  // The key comes from the dialect's PRIMARY KEY registry — Spark has no
  // constraint enforcement, so the key is planning metadata, not an
  // integrity guarantee (documented).

  /** INSERT OR REPLACE: rows whose key already exists replace the stored
    * row (delete-then-insert). Returns the number of rows written. */
  def insertOrReplace(spark: SparkSession, name: String, rows: DataFrame,
                      keys: Seq[String]): Long = {
    val target = spark.table(name)
    val n = rows.count()
    val kept = target.join(
      rows.select(keys.map(col): _*).distinct(), keys, "left_anti")
    kept.unionByName(rows).localCheckpoint().createOrReplaceTempView(name)
    n
  }

  /** ON CONFLICT DO NOTHING: insert only rows whose key is absent.
    * Returns the number of rows actually inserted. */
  def insertOrIgnore(spark: SparkSession, name: String, rows: DataFrame,
                     keys: Seq[String]): Long = {
    val target = spark.table(name)
    val fresh = rows.join(
      target.select(keys.map(col): _*).distinct(), keys, "left_anti")
      .localCheckpoint()
    val n = fresh.count()
    target.unionByName(fresh).localCheckpoint().createOrReplaceTempView(name)
    n
  }

  /** ON CONFLICT (keys) DO UPDATE SET c = expr: conflicting target rows
    * get the assignments applied (the incoming row is visible as
    * `excluded.<col>` in the expressions, like the reference); fresh rows
    * insert as-is. Returns the number of incoming rows. */
  def insertOnConflictUpdate(spark: SparkSession, name: String, rows: DataFrame,
                             keys: Seq[String],
                             assignments: Map[String, String]): Long = {
    val target = spark.table(name)
    val n = rows.count()
    val excl = rows.select(target.columns.map(c => col(c).as(s"__excl_$c")).toSeq: _*)
    val joined = target.join(excl,
      keys.map(k => col(k) === col(s"__excl_$k")).reduce(_ && _), "left")
    val matched = keys.map(k => col(s"__excl_$k").isNotNull).reduce(_ && _)
    def rewriteExcluded(e: String): String =
      e.replaceAll("(?i)\\bexcluded\\s*\\.\\s*([A-Za-z_][A-Za-z0-9_]*)", "__excl_$1")
    val updated = assignments.foldLeft(joined) { case (acc, (c, e)) =>
      acc.withColumn(c, when(matched, expr(rewriteExcluded(e))).otherwise(col(c)))
    }.select(target.columns.map(col).toSeq: _*)
    val freshRows = rows.join(
      target.select(keys.map(col): _*).distinct(), keys, "left_anti")
    updated.unionByName(freshRows).localCheckpoint().createOrReplaceTempView(name)
    n
  }

  // ---- introspection (reference: duckdb_tables()/pragma_table_info,
  // duckdb-6.cpp:14150-14176) ----

  /** duckdb_tables() analog. Dialect-internal `__graft_*` helper views
    * are excluded — the native function would not list them either.
    * The provenance split is two-sided (ADVICE r13 #6): only names
    * CREATED as tables (CTAS / CREATE TABLE, via the registry below)
    * plus genuinely managed non-view catalog tables list here; true
    * views and the base parquet view registrations belong to
    * duckdb_views() — the same split the reference catalog keeps and
    * the oracle harness's DuckDB side shows (base tables are CREATE
    * VIEW over read_parquet there). */
  def tables(spark: SparkSession): DataFrame = {
    import spark.implicits._
    spark.catalog.listTables().collect()
      .filterNot(_.name.startsWith("__graft_"))
      .filter(t => isTableProvenance(spark, t.name) ||
        (!t.isTemporary && t.tableType != "VIEW"))
      .map(t => (t.name, t.tableType, t.isTemporary)).toSeq
      .toDF("table_name", "table_type", "temporary")
  }

  /** SHOW TABLES analog: every catalog relation, tables AND views —
    * duck-probed: SHOW TABLES lists both, duckdb_tables() only
    * table-provenance names. */
  def allRelations(spark: SparkSession): DataFrame = {
    import spark.implicits._
    spark.catalog.listTables().collect()
      .filterNot(_.name.startsWith("__graft_"))
      .map(t => (t.name, t.tableType, t.isTemporary)).toSeq
      .toDF("table_name", "table_type", "temporary")
  }

  /** pragma_table_info(name) analog. */
  def tableInfo(spark: SparkSession, name: String): DataFrame = {
    import spark.implicits._
    spark.table(name).schema.fields.zipWithIndex
      .map { case (f, i) => (i, f.name, f.dataType.simpleString, f.nullable) }.toSeq
      .toDF("cid", "name", "type", "nullable")
  }

  /** duckdb_columns() analog (duckdb-6.cpp:14150-14176): one row per
    * column of every resolvable catalog table; column_index is 1-based
    * and data_type uses the reference's type names, both matching the
    * native function so probe queries run identically on either engine. */
  def columnsTable(spark: SparkSession): DataFrame = {
    import spark.implicits._
    spark.catalog.listTables().collect().toSeq
      .filterNot(_.name.startsWith("__graft_"))
      .flatMap { t =>
        scala.util.Try(spark.table(t.name)).toOption.toSeq.flatMap { df =>
          df.schema.fields.zipWithIndex.map { case (f, i) =>
            (t.name, f.name, i + 1, duckTypeName(f.dataType))
          }
        }
      }.toDF("table_name", "column_name", "column_index", "data_type")
  }

  /** duckdb_schemas() analog (duckdb-6.cpp:14150-14176): one row per
    * schema; Spark's `default` database surfaces under the reference's
    * default schema name `main`, so probe queries written against the
    * reference resolve identically. */
  def schemasTable(spark: SparkSession): DataFrame = {
    import spark.implicits._
    spark.catalog.listDatabases().collect().toSeq
      .map(d => (if (d.name == "default") "main" else d.name, false))
      .toDF("schema_name", "internal")
  }

  // ---- table-provenance registry (r13, closes r12 self-review #5):
  // graft's storage model backs CTAS snapshots and CREATE TABLE
  // definitions with temp views, but the reference catalog lists them
  // only in duckdb_tables() — duckdb_views() must not show them
  // (probed). The dialect marks names at their creation sites; DROP /
  // CREATE VIEW over the same name unmarks.
  private val snapshotTables = java.util.Collections.synchronizedMap(
    new java.util.WeakHashMap[SparkSession, java.util.Set[String]]())

  /** Record `name` as TABLE-provenance (CTAS / CREATE TABLE). */
  def markAsTable(spark: SparkSession, name: String): Unit =
    snapshotTables.computeIfAbsent(spark,
      _ => java.util.concurrent.ConcurrentHashMap.newKeySet[String]())
      .add(name.toLowerCase)

  /** Forget `name`'s TABLE provenance (DROP, or a VIEW took the name). */
  def unmarkTable(spark: SparkSession, name: String): Unit = {
    val s = snapshotTables.get(spark)
    if (s != null) s.remove(name.toLowerCase)
  }

  /** Provenance follows ALTER TABLE … RENAME TO (no-op for a name that
    * was never marked — renaming a view must not invent a table). */
  def renameTableMark(spark: SparkSession, from: String, to: String): Unit = {
    val s = snapshotTables.get(spark)
    if (s != null && s.remove(from.toLowerCase)) s.add(to.toLowerCase)
  }

  private def isTableProvenance(spark: SparkSession, name: String): Boolean = {
    val s = snapshotTables.get(spark)
    s != null && s.contains(name.toLowerCase)
  }

  /** duckdb_views() analog: one row per resolvable view. Graft registers
    * its parquet tables as temp views — the same catalog shape the
    * oracle harness gives DuckDB (CREATE VIEW over read_parquet), so the
    * two engines' view listings probe identically. Names created as
    * TABLES (CTAS snapshots, CREATE TABLE) are excluded via the
    * provenance registry — the reference lists those only in
    * duckdb_tables(). */
  def viewsTable(spark: SparkSession): DataFrame = {
    import spark.implicits._
    spark.catalog.listTables().collect().toSeq
      .filterNot(_.name.startsWith("__graft_"))
      .filter(t => t.isTemporary || t.tableType == "VIEW")
      .filterNot(t => isTableProvenance(spark, t.name))
      .map(t => ("main", t.name, t.isTemporary))
      .toDF("schema_name", "view_name", "temporary")
  }

  /** duckdb_settings() analog: (name, value) over the session's SQL
    * conf, plus the reference's resource-setting names mapped to their
    * Spark-side equivalents (`threads` → default parallelism,
    * `memory_limit` → executor/driver heap) so reference probe queries
    * find the names they expect. */
  def settingsTable(spark: SparkSession): DataFrame = {
    import spark.implicits._
    val mapped = Seq(
      ("threads", spark.sparkContext.defaultParallelism.toString),
      ("memory_limit", Runtime.getRuntime.maxMemory().toString))
    val names = mapped.map(_._1).toSet
    (mapped ++ spark.conf.getAll.toSeq.filterNot(kv => names(kv._1))
      .sortBy(_._1)).toDF("name", "value")
  }

  /** PRAGMA database_size analog (reference shape: one row of storage
    * accounting). Graft's "database" is the set of registered parquet
    * views — database_size sums their file bytes; the block/WAL columns
    * report the parquet analog (row-group count) and zeros (no WAL by
    * design, SURVEY §2.11 non-goal). */
  def databaseSize(spark: SparkSession): DataFrame = {
    import spark.implicits._
    val dirs = Option(registeredDirs.get(spark))
      .map(s => { val b = Seq.newBuilder[String]; s.forEach(b += _); b.result() })
      .getOrElse(Seq.empty)
    val bytes = (for (d <- dirs; n <- TableNames) yield {
      val f = new java.io.File(s"$d/$n.parquet")
      if (f.isFile) f.length else 0L
    }).sum
    val groups = (for (d <- dirs; n <- TableNames) yield
      scala.util.Try(parquetRowGroups(spark, d, n)).getOrElse(0)).sum
    Seq(("graft", s"$bytes bytes", 0L, groups.toLong, groups.toLong, 0L,
      "0 bytes", s"${Runtime.getRuntime.totalMemory()} bytes",
      s"${Runtime.getRuntime.maxMemory()} bytes"))
      .toDF("database_name", "database_size", "block_size", "total_blocks",
        "used_blocks", "free_blocks", "wal_size", "memory_usage",
        "memory_limit")
  }

  /** duckdb_functions() analog (duckdb-6.cpp:14150-14176): every function
    * name resolvable in this session — Spark/graft built-ins plus the
    * DuckDB-name registry — one row per distinct name. */
  def functionsTable(spark: SparkSession): DataFrame = {
    import spark.implicits._
    functions.DuckFunctions.register(spark)
    spark.catalog.listFunctions().collect()
      .map(f => f.name.toLowerCase).distinct.sorted.toSeq
      .toDF("function_name")
  }

  /** `USING SAMPLE p% (system, seed)` analog: block-level sampling — a
    * block (2048 rows, the reference's vector granularity,
    * duckdb.hpp:20017 SampleMethod::SYSTEM_SAMPLE) is kept or dropped
    * wholesale by a seeded hash of its block id. Deterministic for a
    * fixed seed and input partitioning; zero shuffle (a pure filter, so
    * at scale it prunes before any downstream work). */
  def sampleSystem(df: DataFrame, pct: Double, seed: Long,
                   blockRows: Int = 2048): DataFrame =
    df.withColumn("__gblk", floor(monotonically_increasing_id() / blockRows))
      .filter(pmod(hash(col("__gblk"), lit(seed)), lit(100)) < lit(pct))
      .drop("__gblk")

  /** current_setting / SET analogs (duckdb.hpp:12002). */
  def currentSetting(spark: SparkSession, key: String): String =
    spark.conf.get(key)
  def setSetting(spark: SparkSession, key: String, value: String): Unit =
    spark.conf.set(key, value)

  /** SUMMARIZE analog (duckdb-6.cpp:9493). */
  def summarize(df: DataFrame): DataFrame = df.summary()

  /** Reference type name for a Spark type (shared by pragma_table_info
    * and SUMMARIZE). */
  def duckTypeName(t: org.apache.spark.sql.types.DataType): String = t.typeName match {
    case "long" | "bigint" => "BIGINT"
    case "integer" | "int" => "INTEGER"
    case "string" => "VARCHAR"
    case "double" => "DOUBLE"
    case "timestamp" | "timestamp_ntz" => "TIMESTAMP"
    case other => other.toUpperCase
  }

  // Compiled-plan memo for SUMMARIZE, keyed on the input's FULL
  // canonicalized plan text (not a 32-bit hash — a collision would serve
  // the wrong table's plan). SUMMARIZE is a catalog inspection command
  // run repeatedly against stable tables; re-deriving the same
  // physical plan (analysis + optimization + codegen + AQE bookkeeping)
  // on every call was pure driver floor (~80-90 ms, tools/FloorProfile).
  // The memoized Dataset re-executes its job from the files on every
  // collect() — results are NOT cached — but the file LISTING is captured
  // at first planning, so files added under the same path after the
  // first SUMMARIZE need a new session to be seen (same snapshot
  // contract as the schema memo above).
  private val summarizeMemo =
    new java.util.concurrent.ConcurrentHashMap[String, DataFrame]()

  /** SUMMARIZE's deterministic column subset (duckdb-6.cpp:9493 — the
    * full reference output also carries approx_unique and sampled
    * quantiles, which are engine-specific sketches by design): one
    * action computes min/max/non-null count for every column, then
    * pivots driver-side to the per-column row layout.
    *
    * Plan shape (profiled in tools/SummProf): a single combined
    * aggregate would plan as SortAggregate — a min/max over a STRING
    * column cannot live in HashAggregate's fixed-width mutable buffer,
    * and one such function demotes the whole 3N+1-function aggregate
    * out of whole-stage codegen (measured 162 ms vs 60 ms for the
    * numeric-only HashAggregate on cached sf0.1 orders). So the scan is
    * split: counts + non-string min/max run as a codegen HashAggregate,
    * string min/max as a strings-only SortAggregate, and the two
    * single-row branches are unioned as string→string maps so ONE
    * action drives both.
    */
  def summarizeTable(spark: SparkSession, df: DataFrame): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val fields = df.schema.fields
    val key = df.queryExecution.analyzed.canonicalized.toString
    val aggDf = summarizeMemo.computeIfAbsent(key, { _ =>
      // branch A (HashAggregate, codegen): row count, per-column
      // non-null counts, min/max of every non-string column
      val numAggs = count(lit(1)).cast("string").as("__total") +:
        fields.zipWithIndex.flatMap { case (f, i) =>
          val mm =
            if (f.dataType.typeName == "string") Nil
            else Seq(min(col(f.name)).cast("string").as(s"__min_$i"),
              max(col(f.name)).cast("string").as(s"__max_$i"))
          mm :+ count(col(f.name)).cast("string").as(s"__n_$i")
        }.toSeq
      def asMap(d: DataFrame): DataFrame = {
        val cols = d.columns.toSeq.flatMap(c => Seq(lit(c), col(c)))
        d.select(map(cols: _*).as("m"))
      }
      val branchA = asMap(df.agg(numAggs.head, numAggs.tail: _*))
      // branch B (SortAggregate, strings only — unavoidable buffer
      // shape, but now it carries ONLY the string columns)
      val strAggs = fields.zipWithIndex.collect {
        case (f, i) if f.dataType.typeName == "string" =>
          Seq(min(col(f.name)).as(s"__min_$i"), max(col(f.name)).as(s"__max_$i"))
      }.flatten.toSeq
      val built =
        if (strAggs.isEmpty) branchA
        else branchA.union(asMap(df.agg(strAggs.head, strAggs.tail: _*)))
      // Pin a non-adaptive physical plan: both branches are fixed
      // two-stage ungrouped aggregates, so AQE can only add per-action
      // re-planning overhead, never help. The conf is read when
      // executedPlan is first forced, so force it here under the
      // temporary setting and restore.
      val before = spark.conf.get("spark.sql.adaptive.enabled", "true")
      try {
        spark.conf.set("spark.sql.adaptive.enabled", "false")
        built.queryExecution.executedPlan
      } finally spark.conf.set("spark.sql.adaptive.enabled", before)
      built
    })
    val merged: Map[String, String] = aggDf.collect().iterator
      .flatMap(_.getMap[String, String](0).iterator).toMap
    val total = merged("__total").toLong
    fields.zipWithIndex.map { case (f, i) =>
      val nonNull = merged(s"__n_$i").toLong
      val nullPct =
        if (total == 0) 0.0
        else math.floor((total - nonNull) * 10000.0 / total + 0.5) / 100.0
      (f.name, duckTypeName(f.dataType),
        merged.get(s"__min_$i").flatMap(Option(_)).orNull,
        merged.get(s"__max_$i").flatMap(Option(_)).orNull,
        total, nullPct)
    }.toSeq.toDF("column_name", "column_type", "min", "max", "count", "null_pct")
  }

  /** EXPLAIN ANALYZE analog (reference QueryProfiler,
    * duckdb-7.cpp:5536 `QueryProfiler::StartQuery` /
    * duckdb.hpp:11996 `EXPLAIN_ANALYZE`): execute the query once and
    * report the executed physical plan tree with per-operator output-row
    * counts read back from Spark's SQLMetrics — the same numbers the
    * reference profiler prints per operator. Timings are deliberately not
    * surfaced per operator: under whole-stage codegen several operators
    * share one pipeline, so per-operator wall-clock would be fiction.
    */
  def explainAnalyze(spark: SparkSession, df: DataFrame): DataFrame = {
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    // Drive the compiled plan itself (df.count() would re-plan with a
    // different aggregate on top and leave these metrics untouched).
    df.queryExecution.toRdd.foreach(_ => ())
    val out = scala.collection.mutable.ArrayBuffer
      .empty[(Int, Int, String, java.lang.Long)]
    var nextId = 0
    def walk(p: SparkPlan, depth: Int): Unit = p match {
      case a: AdaptiveSparkPlanExec =>
        // AQE wrapper: report the final (re-optimized) plan it settled on
        walk(a.executedPlan, depth)
      case q: QueryStageExec =>
        // AQE stage bookkeeping node — its children list is empty; the
        // materialized stage plan hangs off `.plan`
        walk(q.plan, depth)
      case _ =>
        val rows: java.lang.Long =
          p.metrics.get("numOutputRows").map(m => Long.box(m.value)).orNull
        out += ((nextId, depth, p.nodeName, rows))
        nextId += 1
        p.children.foreach(walk(_, depth + 1))
    }
    walk(df.queryExecution.executedPlan, 0)
    import spark.implicits._
    out.toSeq.toDF("operator_id", "depth", "operator", "output_rows")
  }

  /** EXPORT DATABASE analog (duckdb-4.cpp:9722): dump every temp-view
    * table to parquet + a schema.sql DDL script into `outDir`. */
  def exportDatabase(spark: SparkSession, outDir: String): Unit = {
    // `__graft_`-prefixed views are dialect machinery (catalog-fn
    // snapshots, test_all_types, test-vector views), not user catalog
    // state — the reference's EXPORT DATABASE walks its catalog tables
    val names = spark.catalog.listTables().collect().filter(_.isTemporary)
      .map(_.name).filterNot(_.startsWith("__graft"))
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(outDir))
    val ddl = new StringBuilder
    names.foreach { n =>
      val df = spark.table(n)
      df.write.mode("overwrite").parquet(s"$outDir/$n.parquet")
      val cols = df.schema.fields.map(f => s"${f.name} ${f.dataType.sql}").mkString(", ")
      ddl.append(s"CREATE TABLE $n ($cols);\n")
    }
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(outDir, "schema.sql"), ddl.toString)
  }

  /** IMPORT DATABASE analog: re-register every table exported by
    * [[exportDatabase]] (table list read from schema.sql). */
  def importDatabase(spark: SparkSession, dir: String): Unit = {
    val ddl = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(dir, "schema.sql")))
    val name = """CREATE TABLE (\w+) """.r
    name.findAllMatchIn(ddl).map(_.group(1)).foreach { n =>
      spark.read.parquet(s"$dir/$n.parquet").createOrReplaceTempView(n)
    }
  }
}

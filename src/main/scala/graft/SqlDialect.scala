package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dialect shim: pre-rewrites for reference-SQL constructs Spark SQL
  * lacks (SURVEY.md §7.2 step 3). Light, paren-aware text transforms over
  * a documented subset — not a full grammar (the reference itself vendors
  * a whole Postgres parser, duckdb-libpg_query.cpp; Catalyst is ours).
  *
  * Supported rewrites:
  *  - `QUALIFY <pred>`  → wrap in a subquery and filter (pred must
  *    reference select-list aliases, the common usage)
  *  - `SELECT DISTINCT ON (k1, …) … ORDER BY s1, …` → row_number window
  *  - `LIMIT <p>%` → executed count + limit
  *  - `USING SAMPLE <n> ROWS` / `USING SAMPLE <p>%` → limit / sample
  *  - `FROM read_csv('path')` / `FROM 'x.csv'` replacement scan →
  *    registered temp view over spark.read.csv
  */
object SqlDialect {

  /** Top-level (paren-depth-0, outside quotes) index of a keyword —
    * the shared lexer's token view ([[SqlLex.keywordIndex]]): quoted
    * identifiers and dotted references can never match. */
  private def topLevelIndex(sql: String, kw: String): Int =
    SqlLex.keywordIndex(sql, kw)

  private val limitPercent = """(?is)\bLIMIT\s+([0-9.]+)\s*%\s*$""".r
  private val usingSampleRows = """(?is)\bUSING\s+SAMPLE\s+(\d+)\s+ROWS\b""".r
  private val usingSamplePct = """(?is)\bUSING\s+SAMPLE\s+([0-9.]+)\s*%""".r
  private val readCsvFn =
    """(?is)\bread_csv(?:_auto)?\s*\(\s*'([^']+)'\s*(,[^)]*)?\)""".r
  private val bareCsv = """(?is)\bFROM\s+'([^']+\.csv)'""".r
  // optional trailing options accepted (hive_partitioning is Spark's
  // native partition discovery; others raise in registerParquet)
  private val readParquetFn =
    """(?is)\bread_parquet\s*\(\s*'([^']+)'\s*(,[^)]*)?\)""".r
  private val bareParquet = """(?is)\bFROM\s+'([^']+\.parquet)'""".r
  // read_json / read_json_auto / read_ndjson: newline-delimited JSON
  // replacement scan (the reference ships these in its JSON extension;
  // Spark's json reader is NDJSON-native with full schema inference)
  private val readJsonFn =
    """(?is)\bread_(?:nd)?json(?:_auto)?\s*\(\s*'([^']+)'\s*\)""".r
  private val bareJson = """(?is)\bFROM\s+'([^']+\.(?:json|ndjson|jsonl))'""".r
  // COPY (query)|table TO 'path' [(options)] — reference PhysicalCopyToFile,
  // duckdb-4.cpp:4689
  private val copyToRe =
    """(?is)^\s*COPY\s+(.+?)\s+TO\s+'([^']+)'\s*(?:\((.*)\))?\s*$""".r
  // COPY table FROM 'path' [(options)] — the reference's bulk-ingest path
  // (BufferedCSVReader feeding PhysicalInsert, duckdb-4.cpp:1949-3700):
  // the file is read WITH THE TARGET TABLE'S SCHEMA (no inference, like
  // the reference) and appended via the INSERT primitive.
  private val copyFromRe =
    """(?is)^\s*COPY\s+([A-Za-z_][A-Za-z0-9_]*)\s+FROM\s+'([^']+)'\s*(?:\((.*)\))?\s*$""".r
  // trailing RETURNING <exprs> on DML (reference v0.7 surface, insert
  // planning duckdb-4.cpp:9996-10015): peeled before the DML regexes run,
  // evaluated over the changed-row set.
  private val returningRe = """(?is)\s+RETURNING\s+(.+)$""".r
  // expr SIMILAR TO 'pattern' → anchored rlike (the reference binds
  // SIMILAR TO to regexp_full_match — pattern-matching registration
  // region, duckdb-6.cpp:5993-6041; SURVEY §2.8 maps it to `^…$` rlike).
  private val similarToRe =
    """(?is)\b(NOT\s+)?SIMILAR\s+TO\s+('(?:[^']|'')*')""".r

  // ---- CREATE MACRO (reference ScalarMacroFunction duckdb-internal.hpp:9920,
  // TableMacroFunction duckdb-internal.hpp:9955). Macros are bind-time
  // textual inlining there and here: a scalar macro call becomes its
  // parenthesized body with parameters substituted, a table macro call
  // becomes a subquery. Session-scoped registry; macros may reference
  // other macros (expanded iteratively, depth-capped).
  private case class Macro(params: Seq[(String, Option[String])], body: String,
                           isTable: Boolean)
  // Weak-keyed per session: a stopped/child session's registry is
  // collectible (the values are plain strings — nothing references the
  // session back, so WeakHashMap semantics are sound here).
  private val macros = java.util.Collections.synchronizedMap(
    new java.util.WeakHashMap[SparkSession,
      scala.collection.concurrent.TrieMap[String, Macro]]())
  private def macrosFor(spark: SparkSession) =
    macros.computeIfAbsent(spark,
      _ => new scala.collection.concurrent.TrieMap[String, Macro])

  private val createMacroRe =
    """(?is)^\s*CREATE\s+(?:OR\s+REPLACE\s+)?MACRO\s+([A-Za-z_][A-Za-z0-9_]*)\s*\(""".r
  private val dropMacroRe =
    """(?is)^\s*DROP\s+MACRO\s+(?:IF\s+EXISTS\s+)?([A-Za-z_][A-Za-z0-9_]*)\s*$""".r
  private val namedArg = "(?s)^[A-Za-z_][A-Za-z0-9_]*\\s*:=.*"

  // ---- PREPARE / EXECUTE / DEALLOCATE (reference PrepareStatement,
  // duckdb-8.cpp:8942): statement text is stored per session; EXECUTE
  // substitutes `$n` / `?` placeholders (outside string literals) with
  // the call's literal arguments and runs the result through the full
  // dialect pipeline.
  // ---- PRIMARY KEY registry (reference: constraint binding for ON
  // CONFLICT, duckdb-4.cpp:9996). The declared key doubles as
  // conflict-resolution metadata for the OR REPLACE/ON CONFLICT path
  // and as a validated uniqueness constraint on plain INSERT (see the
  // constraint registry below).
  private val primaryKeys = java.util.Collections.synchronizedMap(
    new java.util.WeakHashMap[SparkSession,
      scala.collection.concurrent.TrieMap[String, Seq[String]]]())
  private def primaryKeysFor(spark: SparkSession) =
    primaryKeys.computeIfAbsent(spark,
      _ => new scala.collection.concurrent.TrieMap[String, Seq[String]])

  // ---- column DEFAULT registry (reference column defaults,
  // CreateTableInfo / SetToDefault, duckdb-9.cpp): DEFAULT exprs parsed
  // out of CREATE TABLE column defs and substituted on the
  // INSERT/UPDATE paths — column-list inserts fill omitted columns,
  // bare DEFAULT keywords in VALUES tuples and UPDATE assignments
  // resolve to the declared expr (NULL when none) (r16 tranche 5).
  private val columnDefaults = java.util.Collections.synchronizedMap(
    new java.util.WeakHashMap[SparkSession,
      scala.collection.concurrent.TrieMap[String, Map[String, String]]]())
  private def defaultsFor(spark: SparkSession) =
    columnDefaults.computeIfAbsent(spark,
      _ => new scala.collection.concurrent.TrieMap[String, Map[String, String]])

  // ---- declared-constraint registry (reference constraint binding,
  // duckdb.hpp:20267-20272): NOT NULL/UNIQUE/CHECK parsed out of CREATE
  // TABLE and validated by Engine.validateConstraints on the INSERT
  // paths (off-switch: SET spark.graft.validateConstraints=false).
  private val constraints = java.util.Collections.synchronizedMap(
    new java.util.WeakHashMap[SparkSession,
      scala.collection.concurrent.TrieMap[String, Engine.TableConstraints]]())
  private def constraintsFor(spark: SparkSession) =
    constraints.computeIfAbsent(spark,
      _ => new scala.collection.concurrent.TrieMap[String, Engine.TableConstraints])

  /** Catalog dependency check (reference dependency manager): dropping
    * OR replacing a table other tables reference by FOREIGN KEY raises
    * the reference's "Cannot drop entry … depend on it" — replace
    * included (r11, ADVICE): a silently replaced parent would leave
    * children holding stale resolved FKs against a vanished schema. */
  private def assertNoFkDependents(spark: SparkSession, name: String): Unit = {
    val target = name.toLowerCase
    constraintsFor(spark).foreach { case (child, ccons) =>
      if (child != target && ccons.foreignKeys.exists(_._2.toLowerCase == target))
        throw new IllegalArgumentException(
          s"""Cannot drop entry "$name" because there are entries that """ +
            s"""depend on it. table "$child" depends on table "$name".""")
    }
  }

  private def validationEnabled(spark: SparkSession): Boolean =
    spark.conf.getOption("spark.graft.validateConstraints").forall(_.toBoolean)

  private val prepared = java.util.Collections.synchronizedMap(
    new java.util.WeakHashMap[SparkSession,
      scala.collection.concurrent.TrieMap[String, String]]())
  private def preparedFor(spark: SparkSession) =
    prepared.computeIfAbsent(spark,
      _ => new scala.collection.concurrent.TrieMap[String, String])
  private val prepareRe =
    """(?is)^\s*PREPARE\s+([A-Za-z_][A-Za-z0-9_]*)\s+AS\s+(.+)$""".r
  private val executeRe =
    """(?is)^\s*EXECUTE\s+([A-Za-z_][A-Za-z0-9_]*)\s*(?:\((.*)\))?\s*$""".r
  private val deallocateRe =
    """(?is)^\s*DEALLOCATE\s+(?:PREPARE\s+)?([A-Za-z_][A-Za-z0-9_]*)\s*$""".r

  /** Replace `$n` and positional `?` placeholders outside quotes. */
  private def bindPlaceholders(stmt: String, args: Seq[String]): String = {
    val sb = new StringBuilder
    var i = 0
    var inStr = false
    var nextQ = 0
    while (i < stmt.length) {
      val c = stmt.charAt(i)
      if (inStr) { sb.append(c); if (c == '\'') inStr = false; i += 1 }
      else if (c == '\'') { sb.append(c); inStr = true; i += 1 }
      else if (c == '$' && i + 1 < stmt.length && stmt.charAt(i + 1).isDigit) {
        var j = i + 1
        while (j < stmt.length && stmt.charAt(j).isDigit) j += 1
        val idx = stmt.substring(i + 1, j).toInt
        require(idx >= 1 && idx <= args.length, s"EXECUTE: missing argument $$$idx")
        sb.append(args(idx - 1))
        i = j
      } else if (c == '?') {
        require(nextQ < args.length, "EXECUTE: not enough arguments for '?'")
        sb.append(args(nextQ)); nextQ += 1; i += 1
      } else { sb.append(c); i += 1 }
    }
    sb.toString
  }

  // Known reference constructs graft deliberately does NOT implement —
  // fail with a named error instead of letting Spark's parser produce a
  // misleading one (SURVEY §2.11 non-goals). Each entry: display name,
  // detection regex (applied outside string literals).
  private val unsupportedConstructs: Seq[(String, scala.util.matching.Regex)] = Seq(
    ("ATTACH (multi-database catalogs)", """(?is)^\s*ATTACH\b""".r),
    ("DETACH", """(?is)^\s*DETACH\b""".r),
    ("INSTALL (extensions)", """(?is)^\s*(?:FORCE\s+)?INSTALL\b""".r),
    ("LOAD (extensions)", """(?is)^\s*LOAD\b""".r),
    ("CREATE INDEX (ART indexes; pruning/broadcast subsume the query role)",
      """(?is)^\s*CREATE\s+(?:UNIQUE\s+)?INDEX\b""".r),
    ("DROP INDEX", """(?is)^\s*DROP\s+INDEX\b""".r),
    // duck pairs rows by PHYSICAL scan order (duckdb-4.cpp:10097) - not
    // stable on a distributed scan; the supported form is the explicit
    // row_number zip the join_positional inventory query demonstrates
    ("POSITIONAL JOIN (row-order pairing is not stable on a distributed " +
      "scan; zip explicitly with row_number() OVER (ORDER BY <key>))",
      """(?is)\bPOSITIONAL\s+JOIN\b""".r),
    // r15 grammar census: named CREATE TYPE (ENUM registry) — the
    // engine's ENUM surface is the documented TypeHelpers encoding
    // (enumCode/enumFirst/enumLast over an explicit value list)
    ("CREATE TYPE (use the TypeHelpers ENUM encoding: enumCode/" +
      "enum_first/enum_last over an explicit value list — SURVEY §2.8)",
      """(?is)^\s*CREATE\s+TYPE\b""".r))

  private def guardUnsupported(q: String): Unit =
    unsupportedConstructs.foreach { case (name, re) =>
      re.findFirstMatchIn(q).foreach { m =>
        if (!insideQuotes(q, m.start))
          throw new UnsupportedOperationException(
            s"unsupported DuckDB construct: $name")
      }
    }

  /** Rewrite + execute. */
  /** Strip `-- …\n` and `/* … */` comments outside string literals.
    * Comments are whitespace to the grammar, but the shim's keyword
    * scanners are textual — a `-- QUALIFY x` comment would otherwise
    * trigger the QUALIFY rewrite. Run FIRST so every downstream
    * rewrite sees comment-free text (Spark would accept the comments,
    * the rewriters are what need the normalization). Newlines of line
    * comments are kept so statement structure survives. */
  private[graft] def stripComments(sql: String): String = {
    val sb = new StringBuilder
    var i = 0
    var inStr = false
    val n = sql.length
    while (i < n) {
      val c = sql.charAt(i)
      if (inStr) { sb.append(c); if (c == '\'') inStr = false; i += 1 }
      else if (c == '\'') { sb.append(c); inStr = true; i += 1 }
      else if (c == '-' && i + 1 < n && sql.charAt(i + 1) == '-') {
        while (i < n && sql.charAt(i) != '\n') i += 1
      } else if (c == '/' && i + 1 < n && sql.charAt(i + 1) == '*') {
        // block comments NEST on the reference (probed r15:
        // `/* outer /* inner */ still */` is one comment)
        var depth = 1
        i += 2
        while (i + 1 < n && depth > 0) {
          if (sql.charAt(i) == '/' && sql.charAt(i + 1) == '*') { depth += 1; i += 2 }
          else if (sql.charAt(i) == '*' && sql.charAt(i + 1) == '/') { depth -= 1; i += 2 }
          else i += 1
        }
        if (depth > 0) i = n
        sb.append(' ')
      } else { sb.append(c); i += 1 }
    }
    sb.toString
  }

  def sql(spark: SparkSession, query: String): DataFrame = {
    var q = stripComments(convertDollarQuotes(query)).trim.stripSuffix(";").trim
    guardUnsupported(q)

    // multi-statement scripts: the reference returns the LAST
    // statement's result (probed r15: `SELECT 1; SELECT 2` → 2)
    locally {
      val toks = SqlLex.tokenize(q)
      var depth = 0
      var cut = -1
      toks.foreach { t =>
        if (t.kind == SqlLex.LParen) depth += 1
        else if (t.kind == SqlLex.RParen) depth -= 1
        else if (depth == 0 && t.kind == SqlLex.Punct && t.lower == ";" && cut < 0)
          cut = t.start
      }
      if (cut >= 0) {
        // the reference EXECUTES every script statement; a pure SELECT
        // returned lazily would skip its side effects (r17 BATTERY7
        // d07: nextval('s') in a non-final statement never ticked the
        // sequence) — drain the head statement WITHOUT buffering its
        // rows on the driver (r17 advice + guide §5: a large head
        // SELECT collect()ed here could OOM the driver; foreachPartition
        // evaluates every row executor-side and discards them)
        sql(spark, q.substring(0, cut)).foreachPartition(
          (it: Iterator[org.apache.spark.sql.Row]) =>
            while (it.hasNext) it.next())
        return sql(spark, q.substring(cut + 1))
      }
    }

    // macro DDL
    createMacroRe.findFirstMatchIn(q) match {
      case Some(m) =>
        val open = m.end - 1
        val close = matchParen(q, open)
        require(close > 0, "CREATE MACRO: unbalanced parameter list")
        val params = splitTopLevel(q.substring(open + 1, close))
          .map(_.trim).filter(_.nonEmpty).map { p =>
            val i = p.indexOf(":=")
            if (i >= 0) (p.substring(0, i).trim, Some(p.substring(i + 2).trim))
            else (p, None)
          }
        val rest = q.substring(close + 1).trim
        require(rest.toUpperCase.startsWith("AS"), "CREATE MACRO: expected AS")
        val afterAs = rest.substring(2).trim
        val isTable = afterAs.toUpperCase.startsWith("TABLE")
        val body = if (isTable) afterAs.substring("TABLE".length).trim else afterAs
        macrosFor(spark)(m.group(1).toLowerCase) = Macro(params, body, isTable)
        return spark.emptyDataFrame
      case None =>
    }
    dropMacroRe.findFirstMatchIn(q) match {
      case Some(m) =>
        macrosFor(spark).remove(m.group(1).toLowerCase)
        return spark.emptyDataFrame
      case None =>
    }
    prepareRe.findFirstMatchIn(q) match {
      case Some(m) =>
        preparedFor(spark)(m.group(1).toLowerCase) = m.group(2)
        return spark.emptyDataFrame
      case None =>
    }
    executeRe.findFirstMatchIn(q) match {
      case Some(m) =>
        val name = m.group(1).toLowerCase
        val stmt = preparedFor(spark).getOrElse(name,
          throw new IllegalArgumentException(s"prepared statement '$name' does not exist"))
        val args = Option(m.group(2))
          .map(splitTopLevel(_).map(_.trim).filter(_.nonEmpty)).getOrElse(Seq.empty)
        return sql(spark, bindPlaceholders(stmt, args))
      case None =>
    }
    deallocateRe.findFirstMatchIn(q) match {
      case Some(m) =>
        preparedFor(spark).remove(m.group(1).toLowerCase)
        return spark.emptyDataFrame
      case None =>
    }

    // statement-level surface: EXPLAIN / SET / PRAGMA / SHOW TABLES
    // (reference duckdb.hpp:11995, 12002; pragma fns duckdb-6.cpp:14150)
    val explainRe = """(?is)^\s*EXPLAIN\s+(ANALYZE\s+)?(.+)$""".r
    explainRe.findFirstMatchIn(q) match {
      case Some(m) if m.group(1) != null =>
        // EXPLAIN ANALYZE: run the query, report per-operator row counts
        // (reference QueryProfiler, duckdb-7.cpp:5536)
        return Engine.explainAnalyze(spark, sql(spark, m.group(2)))
      case Some(m) =>
        import spark.implicits._
        val plan = sql(spark, m.group(2)).queryExecution.executedPlan.toString
        return Seq(("physical_plan", plan)).toDF("explain_key", "explain_value")
      case None =>
    }
    val setRe = """(?is)^\s*SET\s+([\w.]+)\s*(?:=|TO)\s*(.+)$""".r
    setRe.findFirstMatchIn(q) match {
      case Some(m) =>
        spark.conf.set(m.group(1), m.group(2).trim.stripPrefix("'").stripSuffix("'"))
        return spark.emptyDataFrame
      case None =>
    }
    val pragmaTableInfo =
      """(?is)^\s*PRAGMA\s+table_info\s*\(\s*'([^']+)'\s*\)\s*$""".r
    pragmaTableInfo.findFirstMatchIn(q) match {
      case Some(m) => return Engine.tableInfo(spark, m.group(1))
      case None =>
    }
    // PRAGMA database_size statement form (the table fn
    // pragma_database_size() routes through the catalog-fn view rewrites
    // below, next to duckdb_tables()/duckdb_columns())
    if (q.trim.toUpperCase.matches("PRAGMA\\s+DATABASE_SIZE"))
      return Engine.databaseSize(spark)
    // SHOW TABLES lists tables AND views (duck-probed r14 — unlike
    // duckdb_tables(), which the r14 provenance split narrowed to
    // table-provenance names only)
    if (q.trim.toUpperCase.matches("SHOW\\s+TABLES")) return Engine.allRelations(spark)

    // USE <schema> (r15 grammar census): the reference's single-file
    // default schemas are main/memory/temp — an empty no-op result
    // (probed). Other names delegate to Spark's catalog.
    val useRe = """(?is)^\s*USE\s+([\w.]+)\s*$""".r
    useRe.findFirstMatchIn(q) match {
      case Some(m) if Set("main", "memory", "temp", "system")(m.group(1).toLowerCase) =>
        return spark.emptyDataFrame
      case _ =>
    }
    // CALL <table-fn>(…) invokes a table function (reference
    // T_PGCallStmt) — same surface as FROM fn(…)
    val callRe = """(?is)^\s*CALL\s+(.+)$""".r
    callRe.findFirstMatchIn(q) match {
      case Some(m) => return sql(spark, s"SELECT * FROM ${m.group(1)}")
      case None =>
    }

    // CREATE [OR REPLACE] TABLE <name> AS <select> — CTAS into the
    // temp-view catalog (reference CreateTableAs, duckdb-9.cpp binder);
    // materialized eagerly so later DML sees a stable snapshot
    val ctasRe =
      """(?is)^\s*CREATE\s+(?:OR\s+REPLACE\s+)?TABLE\s+([A-Za-z_][A-Za-z0-9_]*)\s+AS\s+(.+)$""".r
    ctasRe.findFirstMatchIn(q) match {
      case Some(m) =>
        assertNoFkDependents(spark, m.group(1))
        val df = sql(spark, m.group(2)).localCheckpoint()
        df.createOrReplaceTempView(m.group(1))
        // the replaced table's declared constraints/PK do not carry over
        // (a CTAS result has no declared constraints in the reference)
        primaryKeysFor(spark).remove(m.group(1).toLowerCase)
        constraintsFor(spark).remove(m.group(1).toLowerCase)
        defaultsFor(spark).remove(m.group(1).toLowerCase)
        Engine.markAsTable(spark, m.group(1)) // TABLE in the catalog, not a view
        return df
      case None =>
    }

    // CREATE [OR REPLACE] VIEW <name> AS <select> — LIVE view semantics
    // (re-evaluated per reference, reference CreateViewInfo duckdb-9.cpp),
    // unlike the CTAS snapshot above
    val cviewRe =
      """(?is)^\s*CREATE\s+(?:OR\s+REPLACE\s+)?VIEW\s+([A-Za-z_][A-Za-z0-9_]*)\s+AS\s+(.+)$""".r
    cviewRe.findFirstMatchIn(q) match {
      case Some(m) =>
        val df = sql(spark, m.group(2))
        df.createOrReplaceTempView(m.group(1))
        Engine.unmarkTable(spark, m.group(1)) // a VIEW took the name
        return df
      case None =>
    }

    // CREATE TABLE <name> (<column defs>) — empty typed table; PRIMARY
    // KEY columns are recorded for the conflict-clause DML below
    // (reference CreateTableInfo + constraint binding, duckdb-9.cpp)
    val createDefRe =
      """(?is)^\s*CREATE\s+(?:OR\s+REPLACE\s+)?TABLE\s+([A-Za-z_][A-Za-z0-9_]*)\s*\((.+)\)\s*$""".r
    createDefRe.findFirstMatchIn(q) match {
      case Some(m) =>
        val name = m.group(1)
        assertNoFkDependents(spark, name)
        var keys = Vector.empty[String]
        var notNull = Vector.empty[String]
        var uniques = Vector.empty[(String, Seq[String])]
        var checks = Vector.empty[String]
        var fks = Vector.empty[(Seq[String], String, Seq[String])]
        var defaults = Vector.empty[(String, String)]
        val tablePk = """(?is)^PRIMARY\s+KEY\s*\((.+)\)$""".r
        val tableUnique = """(?is)^UNIQUE\s*\((.+)\)$""".r
        val tableCheck = """(?is)^CHECK\s*\((.+)\)$""".r
        val tableFk =
          """(?is)^FOREIGN\s+KEY\s*\(([^)]+)\)\s+REFERENCES\s+([A-Za-z_][A-Za-z0-9_]*)\s*(?:\(([^)]+)\))?$""".r
        val colFk =
          """(?i)\bREFERENCES\s+([A-Za-z_][A-Za-z0-9_]*)\s*(?:\(([^)]*)\))?""".r
        // per-column CHECK (...) — greedy to the def's final ')': the
        // constraint is syntactically last in a column definition
        val colCheck = """(?is)\bCHECK\s*\((.+)\)\s*$""".r
        val fields = splitTopLevel(m.group(2)).map(_.trim).filter(_.nonEmpty).flatMap { d =>
          d match {
            case tablePk(cols) =>
              keys ++= cols.split(",").map(_.trim); None
            case tableUnique(cols) =>
              uniques :+= ("unique", cols.split(",").map(_.trim).toSeq); None
            case tableCheck(e) =>
              checks :+= e.trim; None
            case tableFk(cols, ref, refCols) =>
              fks :+= ((cols.split(",").map(_.trim).toSeq, ref,
                Option(refCols).map(_.split(",").map(_.trim).toSeq).getOrElse(Nil)))
              None
            case _ =>
              val parts = d.split("\\s+", 2)
              require(parts.length == 2, s"CREATE TABLE: malformed column '$d'")
              var tpe = parts(1)
              // REFERENCES extracts FIRST: colCheck is greedy to the
              // def's FINAL ')', so `CHECK (x > 0) REFERENCES p(id)`
              // would otherwise swallow the FK into the check text
              // (self-review r10). Quote- and paren-guarded (r11,
              // ADVICE): the word inside a DEFAULT string literal or a
              // CHECK expression is not a constraint
              colFk.findAllMatchIn(tpe).find(fm =>
                  !insideQuotes(tpe, fm.start) &&
                    parenDepth(tpe, fm.start) == 0).foreach { fm =>
                fks :+= ((Seq(parts(0)), fm.group(1),
                  Option(fm.group(2)).map(_.split(",").map(_.trim).toSeq).getOrElse(Nil)))
                tpe = tpe.substring(0, fm.start) + tpe.substring(fm.end)
              }
              // DEFAULT <expr> (r16): expr runs to the next depth-0
              // constraint keyword or the def's end; extracted BEFORE
              // colCheck so `DEFAULT 5 CHECK (…)` leaves the CHECK in
              // terminal position for the greedy check regex
              """(?i)\bDEFAULT\b""".r.findAllMatchIn(tpe).find(dm =>
                  !insideQuotes(tpe, dm.start) &&
                    parenDepth(tpe, dm.start) == 0).foreach { dm =>
                val rest = tpe.substring(dm.end)
                val stop = """(?i)\b(PRIMARY|NOT|UNIQUE|CHECK|REFERENCES)\b""".r
                  .findAllMatchIn(rest).find(sm =>
                    !insideQuotes(rest, sm.start) &&
                      parenDepth(rest, sm.start) == 0)
                  .map(_.start).getOrElse(rest.length)
                defaults :+= (parts(0).toLowerCase -> rest.substring(0, stop).trim)
                tpe = tpe.substring(0, dm.start) + rest.substring(stop)
              }
              colCheck.findFirstMatchIn(tpe).foreach { cm =>
                checks :+= cm.group(1).trim
                tpe = tpe.substring(0, cm.start) + tpe.substring(cm.end)
              }
              val isPk = """(?i)\bPRIMARY\s+KEY\b""".r.findFirstIn(tpe).isDefined
              if (isPk) keys :+= parts(0)
              if ("""(?i)\bNOT\s+NULL\b""".r.findFirstIn(tpe).isDefined)
                notNull :+= parts(0)
              if ("""(?i)\bUNIQUE\b""".r.findFirstIn(
                  tpe.replaceAll("(?i)\\bPRIMARY\\s+KEY\\b", "")).isDefined)
                uniques :+= ("unique", Seq(parts(0)))
              val cleaned = tpe.replaceAll("(?i)\\bPRIMARY\\s+KEY\\b", "")
                .replaceAll("(?i)\\bNOT\\s+NULL\\b", "")
                .replaceAll("(?i)\\bUNIQUE\\b", "").trim
              Some(s"${parts(0)} ${sources.Csv.duckToSparkDdl(cleaned)}")
          }
        }
        val schema = org.apache.spark.sql.types.StructType.fromDDL(fields.mkString(", "))
        spark.createDataFrame(java.util.Collections.emptyList[org.apache.spark.sql.Row](),
          schema).createOrReplaceTempView(name)
        Engine.markAsTable(spark, name) // TABLE in the catalog, not a view
        if (keys.nonEmpty) primaryKeysFor(spark)(name.toLowerCase) = keys
        else primaryKeysFor(spark).remove(name.toLowerCase)
        if (defaults.nonEmpty) defaultsFor(spark)(name.toLowerCase) = defaults.toMap
        else defaultsFor(spark).remove(name.toLowerCase)
        // PRIMARY KEY implies NOT NULL on its columns + a unique key
        // (the reference raises the NOT NULL error for a null PK part).
        // FK referenced columns resolve at CREATE time: an omitted
        // column list means the referenced table's declared PRIMARY KEY
        // (reference ForeignKeyConstraint binding, duckdb.hpp:20272).
        val resolvedFks = fks.map { case (cols, ref, rc) =>
          val rcols =
            if (rc.nonEmpty) rc
            else primaryKeysFor(spark).getOrElse(ref.toLowerCase,
              throw new IllegalArgumentException(
                s"FOREIGN KEY on $name: referenced table '$ref' has no declared PRIMARY KEY"))
          require(rcols.length == cols.length,
            s"FOREIGN KEY on $name: column count mismatch against $ref(${rcols.mkString(", ")})")
          (cols, ref, rcols)
        }
        val cons = Engine.TableConstraints(
          notNull = (notNull ++ keys).distinct,
          unique = (if (keys.nonEmpty) Vector(("primary key", keys: Seq[String]))
                    else Vector.empty) ++ uniques,
          checks = checks,
          foreignKeys = resolvedFks)
        if (cons.isEmpty) constraintsFor(spark).remove(name.toLowerCase)
        else constraintsFor(spark)(name.toLowerCase) = cons
        return spark.emptyDataFrame
      case None =>
    }

    // ---- SQL-level DML over the temp-view catalog (reference
    // INSERT/UPDATE/DELETE/ALTER/DROP statement types, duckdb.hpp
    // StatementType) — routed to the Engine DML primitives; DuckDB
    // semantics: INSERT is positional, statements return changed rows ----

    // trailing RETURNING <exprs> (reference duckdb-4.cpp:9996-10015):
    // peeled here so the DML regexes below see a clean statement; the
    // clause is evaluated over the changed-row DataFrame (which the DML
    // layer already computes) instead of the row count.
    val (qDml, returningCols) = returningRe.findFirstMatchIn(q) match {
      case Some(m) if !insideQuotes(q, m.start) && parenDepth(q, m.start) == 0 =>
        (q.substring(0, m.start),
          Some(splitTopLevel(m.group(1)).map(_.trim).filter(_.nonEmpty)))
      case _ => (q, None)
    }
    def returned(changed: DataFrame): DataFrame =
      changed.selectExpr(returningCols.get: _*)

    // bare DEFAULT items inside VALUES tuples → the bound column's
    // declared default expr (NULL when none) — positional by depth-1
    // comma count (r16; reference SetToDefault, duckdb-9.cpp)
    def substValuesDefaults(body: String, cols: Seq[String],
        defaults: Map[String, String]): String = {
      if (!body.trim.toLowerCase.startsWith("values") ||
        !body.toLowerCase.contains("default")) return body
      val toks = SqlLex.tokenize(body)
      val subs = scala.collection.mutable.ArrayBuffer.empty[(Int, Int, String)]
      var depth = 0
      var pos = 0
      var k = 0
      while (k < toks.length) {
        val t = toks(k)
        t.kind match {
          case SqlLex.LParen => depth += 1; if (depth == 1) pos = 0
          case SqlLex.RParen => depth -= 1
          case SqlLex.Punct if depth == 1 && t.lower == "," => pos += 1
          case SqlLex.Ident if depth == 1 && t.lower == "default" &&
            k > 0 && (toks(k - 1).kind == SqlLex.LParen ||
              (toks(k - 1).kind == SqlLex.Punct && toks(k - 1).lower == ",")) &&
            k + 1 < toks.length && (toks(k + 1).kind == SqlLex.RParen ||
              (toks(k + 1).kind == SqlLex.Punct && toks(k + 1).lower == ",")) =>
            val rep = if (pos < cols.length)
              defaults.getOrElse(cols(pos).toLowerCase, "NULL") else "NULL"
            subs += ((t.start, t.end, "(" + rep + ")"))
          case _ => ()
        }
        k += 1
      }
      if (subs.isEmpty) body
      else {
        val sb = new StringBuilder
        var last = 0
        subs.foreach { case (a, b, rep) =>
          sb.append(body.substring(last, a)).append(rep); last = b
        }
        sb.append(body.substring(last)).toString
      }
    }

    val insertRe =
      ("""(?is)^\s*INSERT\s+(OR\s+REPLACE\s+|OR\s+IGNORE\s+)?INTO\s+""" +
        """([A-Za-z_][A-Za-z0-9_]*)\s*(?:\(([^()]*)\)\s*)?""" +
        """((?:VALUES|SELECT|WITH)\b.+|DEFAULT\s+VALUES)\s*$""").r
    insertRe.findFirstMatchIn(qDml) match {
      case Some(m) =>
        import spark.implicits._
        val name = m.group(2)
        val target = spark.table(name)
        // column-list / DEFAULT machinery (r16 tranche 5; reference
        // SetToDefault + CreateTableInfo defaults): a column list binds
        // the VALUES/SELECT positionally to the LISTED columns; omitted
        // columns take their declared DEFAULT (NULL when none). A bare
        // DEFAULT keyword inside a VALUES tuple resolves the same way.
        val colList = Option(m.group(3))
          .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSeq)
        val defaults = defaultsFor(spark).getOrElse(name.toLowerCase,
          Map.empty[String, String])
        colList.foreach { cl =>
          val known = target.columns.map(_.toLowerCase).toSet
          cl.filterNot(c => known(c.toLowerCase)).foreach(c =>
            throw new IllegalArgumentException(
              s"INSERT: column '$c' does not exist in '$name'"))
        }
        val boundCols = colList.getOrElse(target.columns.toSeq)
        def defaultExpr(f: org.apache.spark.sql.types.StructField) =
          defaults.get(f.name.toLowerCase)
            .map(org.apache.spark.sql.functions.expr)
            .getOrElse(org.apache.spark.sql.functions.lit(null))
            .cast(f.dataType).as(f.name)
        // ON CONFLICT tail (reference duckdb-4.cpp:9996): [(cols)] +
        // DO NOTHING / DO UPDATE SET a = expr[, ...]
        val conflictRe =
          ("""(?is)^(.*?)\s+ON\s+CONFLICT\s*(?:\(([^)]*)\)\s*)?""" +
            """DO\s+(NOTHING|UPDATE\s+SET\s+.+)$""").r
        val (body0, conflict) = m.group(4) match {
          case conflictRe(b, cols, action) =>
            (b, Some((Option(cols).map(_.split(",").map(_.trim).toSeq), action)))
          case b => (b, None)
        }
        // bare DEFAULT items inside VALUES tuples → the declared expr
        val body = substValuesDefaults(body0, boundCols, defaults)
        // positional bind + coercion to the TABLE's column types (the
        // reference casts VALUES literals to the declared types; without
        // this, RETURNING would leak the literal-inferred types)
        val rows =
          if (body.trim.toUpperCase.startsWith("DEFAULT")) // DEFAULT VALUES
            spark.range(1).select(target.schema.fields.map(defaultExpr).toSeq: _*)
          else {
            val bound = sql(spark, body).toDF(boundCols: _*)
            val listed = boundCols.map(_.toLowerCase).toSet
            bound.select(target.schema.fields.map { f =>
              if (listed(f.name.toLowerCase))
                col(f.name).cast(f.dataType).as(f.name)
              else defaultExpr(f)
            }.toSeq: _*)
          }
        def declaredKeys: Seq[String] = primaryKeysFor(spark)
          .getOrElse(name.toLowerCase, throw new IllegalArgumentException(
            s"INSERT conflict clause on '$name': no PRIMARY KEY declared " +
              "(create the table with a PRIMARY KEY column)"))
        val mode = m.group(1) match {
          case null => ""
          case s => s.trim.toUpperCase.replaceAll("\\s+", " ")
        }
        if (returningCols.isDefined && (mode.nonEmpty || conflict.isDefined))
          throw new UnsupportedOperationException(
            "RETURNING with OR REPLACE / OR IGNORE / ON CONFLICT is not supported")
        // declared-constraint validation (reference PhysicalInsert
        // verification): NOT NULL/CHECK raise on EVERY insert form —
        // the reference's OR IGNORE only forgives key conflicts —
        // while uniqueness raises only on plain INSERT (conflict
        // clauses consume the conflict as their resolution input)
        constraintsFor(spark).get(name.toLowerCase)
          .filter(_ => validationEnabled(spark))
          .foreach(cons => Engine.validateConstraints(spark, name, rows, cons,
            checkUnique = mode.isEmpty && conflict.isEmpty))
        val n = (mode, conflict) match {
          case ("", None) =>
            val c = rows.count(); Engine.insertInto(spark, name, rows); c
          case ("OR REPLACE", None) =>
            Engine.insertOrReplace(spark, name, rows, declaredKeys)
          case ("OR IGNORE", None) =>
            Engine.insertOrIgnore(spark, name, rows, declaredKeys)
          case ("", Some((cols, action))) if action.equalsIgnoreCase("NOTHING") =>
            Engine.insertOrIgnore(spark, name, rows, cols.getOrElse(declaredKeys))
          case ("", Some((cols, action))) =>
            val assigns = splitTopLevel(
              action.replaceAll("(?is)^UPDATE\\s+SET\\s+", "")).map { a =>
              val eq = a.indexOf('=')
              require(eq > 0, s"ON CONFLICT DO UPDATE: malformed assignment '$a'")
              a.substring(0, eq).trim -> a.substring(eq + 1).trim
            }.toMap
            Engine.insertOnConflictUpdate(spark, name, rows,
              cols.getOrElse(declaredKeys), assigns)
          case other =>
            throw new UnsupportedOperationException(
              s"INSERT: cannot combine $other")
        }
        // RETURNING on plain INSERT: the inserted rows, like the reference
        if (returningCols.isDefined) return returned(rows)
        return Seq(n).toDF("count")
      case None =>
    }
    val deleteRe =
      """(?is)^\s*DELETE\s+FROM\s+([A-Za-z_][A-Za-z0-9_]*)(?:\s+WHERE\s+(.+?))?\s*$""".r
    deleteRe.findFirstMatchIn(qDml) match {
      case Some(m) =>
        import spark.implicits._
        val cond = Option(m.group(2))
          .map(org.apache.spark.sql.functions.expr)
          .getOrElse(org.apache.spark.sql.functions.lit(true))
        // materialize the doomed rows BEFORE the view is re-registered
        // (filter keeps only predicate-TRUE rows — exactly the deleted set)
        val deleted = spark.table(m.group(1)).filter(cond).localCheckpoint()
        // parent-side FK check (reference ForeignKeyConstraint,
        // duckdb.hpp:20272): a deleted key still referenced by any
        // declared child FK raises before the delete lands
        if (validationEnabled(spark)) {
          val fn = org.apache.spark.sql.functions
          val pname = m.group(1).toLowerCase
          constraintsFor(spark).foreach { case (child, ccons) =>
            ccons.foreignKeys.filter(_._2.toLowerCase == pname).foreach {
              case (cols, _, refCols) =>
                if (spark.catalog.tableExists(child)) {
                  // self-referential FK (r11, ADVICE): probe the POST-
                  // delete child rows — deleting a key together with
                  // every row that referenced it is consistent
                  val childRows =
                    if (child == pname) spark.table(child).filter(!cond)
                    else spark.table(child)
                  val childKeys = childRows
                    .filter(cols.map(fn.col(_).isNotNull).reduce(_ && _))
                    .select(cols.zip(refCols).map { case (c, rc) => fn.col(c).as(rc) }: _*)
                  val stillRef = deleted.select(refCols.map(fn.col): _*)
                    .join(childKeys, refCols, "left_semi").limit(1).count() > 0
                  if (stillRef) throw new Engine.ConstraintViolation(
                    "Constraint Error: Violates foreign key constraint because the key " +
                      s"is still referenced by a foreign key in table $child")
                }
            }
          }
        }
        Engine.deleteWhere(spark, m.group(1), cond)
        if (returningCols.isDefined) return returned(deleted)
        return Seq(deleted.count()).toDF("count")
      case None =>
    }
    val updateRe =
      """(?is)^\s*UPDATE\s+([A-Za-z_][A-Za-z0-9_]*)\s+SET\s+(.+?)(?:\s+WHERE\s+(.+?))?\s*$""".r
    updateRe.findFirstMatchIn(qDml) match {
      case Some(m) =>
        import spark.implicits._
        val cond = Option(m.group(3))
          .map(org.apache.spark.sql.functions.expr)
          .getOrElse(org.apache.spark.sql.functions.lit(true))
        val tblDefaults = defaultsFor(spark)
          .getOrElse(m.group(1).toLowerCase, Map.empty[String, String])
        val assignments = splitTopLevel(m.group(2)).map { a =>
          val eq = a.indexOf('=')
          require(eq > 0, s"UPDATE: malformed assignment '$a'")
          val lhs = a.substring(0, eq).trim
          val rhsText = a.substring(eq + 1).trim
          // SET col = DEFAULT → the declared default (NULL when none)
          val rhs = if (rhsText.equalsIgnoreCase("default"))
            tblDefaults.getOrElse(lhs.toLowerCase, "NULL") else rhsText
          lhs -> org.apache.spark.sql.functions.expr(rhs)
        }
        // RETURNING on UPDATE reports the NEW row values: apply the same
        // assignment fold updateWhere uses, but over the matched rows only
        val post = assignments.foldLeft(spark.table(m.group(1)).filter(cond)) {
          case (acc, (c, v)) => acc.withColumn(c, v)
        }.localCheckpoint()
        // declared-constraint validation on the POST-assignment rows,
        // BEFORE the view is replaced (the reference verifies updates
        // the same way it verifies inserts): NOT NULL + CHECK on the
        // changed rows, then (r11 — the round-8 residual closed)
        // UNIQUE/PK on the POST-update whole-table key multiset when an
        // assignment touches a declared key — the old/new delta a
        // changed-rows-only check cannot see.
        val fn = org.apache.spark.sql.functions
        val assignedCols = assignments.map(_._1.toLowerCase).toSet
        lazy val newTable = assignments.foldLeft(spark.table(m.group(1))) {
          case (acc, (c, v)) =>
            acc.withColumn(c, fn.when(cond, v).otherwise(fn.col(c)))
        }
        constraintsFor(spark).get(m.group(1).toLowerCase)
          .filter(_ => validationEnabled(spark))
          .foreach { cons =>
            Engine.validateConstraints(spark, m.group(1), post,
              cons.copy(unique = Nil), checkUnique = false)
            cons.unique
              .filter(_._2.exists(k => assignedCols(k.toLowerCase)))
              .foreach { case (label, keys) =>
                // SQL UNIQUE ignores rows with any NULL key part
                val keyed = newTable
                  .filter(keys.map(fn.col(_).isNotNull).reduce(_ && _))
                val dup = keyed.groupBy(keys.map(fn.col): _*)
                  .count().filter(fn.col("count") > 1).limit(1).count() > 0
                if (dup) throw new Engine.ConstraintViolation(
                  s"Constraint Error: Duplicate key violates $label constraint: " +
                    s"${m.group(1)}(${keys.mkString(", ")})")
              }
          }
        // parent-side FK check (self-review r10): an UPDATE that
        // rewrites a REFERENCED column can remove keys children still
        // point at. Removed keys = old key set EXCEPT the post-update
        // key set (rows not matching cond keep their old key, so a
        // same-key rewrite removes nothing); probe each dependent FK
        // like the DELETE path does.
        if (validationEnabled(spark)) {
          val pname = m.group(1).toLowerCase
          constraintsFor(spark).foreach { case (child, ccons) =>
            ccons.foreignKeys.filter(_._2.toLowerCase == pname).foreach {
              case (cols, _, refCols) =>
                if (refCols.exists(rc => assignedCols(rc.toLowerCase)) &&
                    spark.catalog.tableExists(child)) {
                  val removed = spark.table(m.group(1))
                    .select(refCols.map(fn.col): _*)
                    .except(newTable.select(refCols.map(fn.col): _*))
                  // self-referential FK (r11, ADVICE): the child side is
                  // the POST-update row set when child == parent
                  val childRows =
                    if (child == pname) newTable else spark.table(child)
                  val childKeys = childRows
                    .filter(cols.map(fn.col(_).isNotNull).reduce(_ && _))
                    .select(cols.zip(refCols).map { case (c, rc) => fn.col(c).as(rc) }: _*)
                  if (removed.join(childKeys, refCols, "left_semi").limit(1).count() > 0)
                    throw new Engine.ConstraintViolation(
                      "Constraint Error: Violates foreign key constraint because the key " +
                        s"is still referenced by a foreign key in table $child")
                }
            }
          }
        }
        Engine.updateWhere(spark, m.group(1), cond, assignments.toMap)
        if (returningCols.isDefined) return returned(post)
        return Seq(post.count()).toDF("count")
      case None =>
    }
    if (returningCols.isDefined)
      throw new UnsupportedOperationException(
        "RETURNING is only valid on INSERT / UPDATE / DELETE")
    val dropTableRe =
      """(?is)^\s*DROP\s+(?:TABLE|VIEW)\s+(IF\s+EXISTS\s+)?([A-Za-z_][A-Za-z0-9_]*)\s*$""".r
    dropTableRe.findFirstMatchIn(q) match {
      case Some(m) =>
        assertNoFkDependents(spark, m.group(2))
        val dropped = m.group(2).toLowerCase
        val existed = spark.catalog.dropTempView(m.group(2))
        require(existed || m.group(1) != null, s"table ${m.group(2)} does not exist")
        primaryKeysFor(spark).remove(dropped)
        constraintsFor(spark).remove(dropped)
        defaultsFor(spark).remove(dropped)
        Engine.unmarkTable(spark, dropped)
        return spark.emptyDataFrame
      case None =>
    }
    val alterRe =
      """(?is)^\s*ALTER\s+TABLE\s+([A-Za-z_][A-Za-z0-9_]*)\s+(.+?)\s*$""".r
    alterRe.findFirstMatchIn(q) match {
      case Some(m) =>
        val name = m.group(1)
        val action = m.group(2).trim
        val renameTo = """(?is)^RENAME\s+TO\s+([A-Za-z_][A-Za-z0-9_]*)$""".r
        val renameCol =
          """(?is)^RENAME\s+COLUMN\s+([A-Za-z_][A-Za-z0-9_]*)\s+TO\s+([A-Za-z_][A-Za-z0-9_]*)$""".r
        val addCol =
          """(?is)^ADD\s+COLUMN\s+([A-Za-z_][A-Za-z0-9_]*)\s+([A-Za-z0-9_()\s,]+)$""".r
        val dropCol = """(?is)^DROP\s+COLUMN\s+([A-Za-z_][A-Za-z0-9_]*)$""".r
        val t = spark.table(name)
        action match {
          case renameTo(nn) =>
            t.localCheckpoint().createOrReplaceTempView(nn)
            spark.catalog.dropTempView(name)
            Engine.renameTableMark(spark, name, nn) // provenance follows
          case renameCol(a, b) =>
            t.withColumnRenamed(a, b).localCheckpoint().createOrReplaceTempView(name)
          case addCol(c, tpe) =>
            t.withColumn(c, org.apache.spark.sql.functions.lit(null)
              .cast(tpe.trim.toLowerCase)).localCheckpoint()
              .createOrReplaceTempView(name)
          case dropCol(c) =>
            t.drop(c).localCheckpoint().createOrReplaceTempView(name)
          case other =>
            throw new UnsupportedOperationException(s"ALTER TABLE: $other")
        }
        return spark.emptyDataFrame
      case None =>
    }
    // ANALYZE / VACUUM: accepted no-ops (the reference's VACUUM is
    // likewise a no-op; ANALYZE recomputes stats Catalyst derives itself)
    if (q.trim.toUpperCase.matches("ANALYZE|VACUUM(\\s+ANALYZE)?"))
      return spark.emptyDataFrame

    // DESCRIBE <table> → pragma_table_info shape (reference
    // DescribeStatement binds to the same table-info source)
    val describeRe = """(?is)^\s*DESCRIBE\s+([\w.]+)\s*$""".r
    describeRe.findFirstMatchIn(q) match {
      case Some(m) => return Engine.tableInfo(spark, m.group(1))
      case None =>
    }
    // CHECKPOINT and autocommit-compatible transaction delimiters are
    // accepted no-ops: the reference's checkpoint flushes its WAL
    // (duckdb-10.cpp) — there is no WAL here — and graft always runs
    // autocommit, under which BEGIN/COMMIT delimit nothing. ROLLBACK is
    // REFUSED rather than silently ignored: pretending to undo committed
    // work would be a correctness lie (transactions are a documented
    // non-goal, SURVEY §8).
    val trimmed = q.trim.toUpperCase
    if (trimmed.matches("(FORCE\\s+)?CHECKPOINT") ||
        trimmed.matches("BEGIN(\\s+TRANSACTION)?") || trimmed == "COMMIT")
      return spark.emptyDataFrame
    if (trimmed == "ROLLBACK" || trimmed == "ABORT")
      throw new UnsupportedOperationException(
        "ROLLBACK: transactions are a documented non-goal (autocommit only)")

    // macro calls → inlined bodies (before any other rewrite, so macro
    // bodies get the full dialect treatment too)
    q = expandMacros(spark, q)

    // UNION [ALL] BY NAME (reference duckdb-8.cpp:7905): split at the
    // top-level combinator and column-match the sides (missing columns
    // null-fill, like the reference's by-name binder). Plain BY NAME
    // dedups, matching UNION semantics. Out of this shim's scope:
    // trailing ORDER BY/LIMIT on the combined result, and a leading WITH
    // whose CTEs are referenced from the right-hand arm (the split does
    // not re-scope the CTE list).
    val ubn = """(?is)\bUNION\s+(ALL\s+)?BY\s+NAME\b""".r
    ubn.findAllMatchIn(q).find(m =>
      !insideQuotes(q, m.start) && parenDepth(q, m.start) == 0) match {
      case Some(m) =>
        val left = sql(spark, q.substring(0, m.start))
        val right = sql(spark, q.substring(m.end))
        val u = left.unionByName(right, allowMissingColumns = true)
        return if (m.group(1) != null) u else u.distinct()
      case None =>
    }

    // COPY table FROM 'path' [(options)] — bulk ingest (reference
    // BufferedCSVReader → PhysicalInsert, duckdb-4.cpp:1949-3700): read
    // with the TARGET TABLE'S schema (no inference, like the reference)
    // and append through the INSERT primitive; returns the row count.
    copyFromRe.findFirstMatchIn(q) match {
      case Some(m) =>
        val name = m.group(1)
        val path = m.group(2)
        val target = spark.table(name)
        val opts = Option(m.group(3)).map(splitTopLevel(_).map(_.trim))
          .getOrElse(Seq.empty)
        val upper = opts.map(_.toUpperCase.replaceAll("\\s+", " "))
        val fmt = upper.collectFirst { case o if o.startsWith("FORMAT") =>
          o.split(" ").last }.getOrElse(
          if (path.toLowerCase.endsWith(".parquet")) "PARQUET" else "CSV")
        val rows =
          if (fmt == "PARQUET") spark.read.schema(target.schema).parquet(path)
          else {
            val header = upper.exists(o => o == "HEADER" || o == "HEADER TRUE" ||
              o == "HEADER 1")
            val delim = opts.flatMap(
              """(?i)^DELIM(?:ITER)?\s+'([^']*)'$""".r.findFirstMatchIn(_)
                .map(_.group(1))).headOption
            delim.foldLeft(
              spark.read.schema(target.schema).option("header", header.toString)) {
              (r, d) => r.option("sep", d)
            }.csv(path)
          }
        val renamed = rows.toDF(target.columns.toSeq: _*)
        val n = renamed.count()
        Engine.insertInto(spark, name, renamed)
        import spark.implicits._
        return Seq(n).toDF("Count")
      case None =>
    }

    // CREATE / DROP / ALTER SEQUENCE statements (reference
    // duckdb-6.cpp:2012; nextval/currval are registered session UDFs
    // over the same driver-side counters — r17, closes the
    // SQL-surface half of the §2.11 sequence row)
    locally {
      val createSeq =
        ("""(?is)^\s*CREATE\s+(OR\s+REPLACE\s+)?SEQUENCE\s+(IF\s+NOT\s+EXISTS\s+)?""" +
          """([A-Za-z_]\w*)\s*(.*)$""").r
      val dropSeq =
        """(?is)^\s*DROP\s+SEQUENCE\s+(IF\s+EXISTS\s+)?([A-Za-z_]\w*)\s*$""".r
      val alterSeq =
        ("""(?is)^\s*ALTER\s+SEQUENCE\s+([A-Za-z_]\w*)\s+RESTART""" +
          """(?:\s+WITH\s+(-?\d+))?\s*$""").r
      q.trim match {
        case createSeq(orRepl, ifNotEx, name, tail) =>
          def opt(re: String): Option[Long] = re.r
            .findFirstMatchIn(tail).map(_.group(1).toLong)
          val start = opt("""(?is)START\s+(?:WITH\s+)?(-?\d+)""")
          val inc = opt("""(?is)INCREMENT\s+(?:BY\s+)?(-?\d+)""").getOrElse(1L)
          val minV = opt("""(?is)\bMINVALUE\s+(-?\d+)""")
          val maxV = opt("""(?is)\bMAXVALUE\s+(-?\d+)""")
          val cycle = """(?is)(?<!NO\s)\bCYCLE\b""".r
            .findFirstIn(tail).isDefined
          // anything the option scan did not consume is a silent-
          // divergence hazard — raise instead (COPY-matrix policy)
          val residue = Seq(
            """(?is)START\s+(?:WITH\s+)?-?\d+""", """(?is)INCREMENT\s+(?:BY\s+)?-?\d+""",
            """(?is)\bMINVALUE\s+-?\d+""", """(?is)\bMAXVALUE\s+-?\d+""",
            """(?is)\bNO\s+(?:CYCLE|MINVALUE|MAXVALUE)\b""", """(?is)\bCYCLE\b""")
            .foldLeft(tail) { (t, re) => re.r.replaceAllIn(t, " ") }.trim
          if (residue.nonEmpty) throw new UnsupportedOperationException(
            s"CREATE SEQUENCE: unsupported options '$residue'")
          graft.functions.TypeHelpers.createSequence(name,
            start.getOrElse(if (inc > 0) minV.getOrElse(1L)
              else maxV.getOrElse(-1L)), inc,
            minV, maxV, cycle,
            ifNotExists = ifNotEx != null, orReplace = orRepl != null)
          return spark.emptyDataFrame
        case dropSeq(ifEx, name) =>
          graft.functions.TypeHelpers.dropSequence(name, ifEx != null)
          return spark.emptyDataFrame
        case alterSeq(_, _) =>
          // the reference itself raises here (probed d08) — error
          // parity beats implementing more than the reference;
          // TypeHelpers.restartSequence stays as the API-level partial
          throw new UnsupportedOperationException(
            "Not implemented Error: ALTER SEQUENCE option not supported yet!")
        case _ =>
      }
    }

    // COPY … TO 'path' [(options)] → DataFrame write; returns the
    // copied row count like the reference. Option matrix (r17
    // BATTERY7): FORMAT, HEADER [bool], DELIMITER/DELIM/SEP, QUOTE,
    // ESCAPE, NULL 'str', COMPRESSION, DATEFORMAT/TIMESTAMPFORMAT
    // (strftime text translated to the writer's pattern language),
    // FORCE_QUOTE (cols|*) → quote-all, PARTITION_BY (cols) → hive
    // layout on both formats.
    copyToRe.findFirstMatchIn(q) match {
      case Some(m) =>
        val src = m.group(1).trim
        val df =
          if (src.startsWith("(")) sql(spark, src.stripPrefix("(").stripSuffix(")"))
          else spark.table(src)
        // parse `NAME [value]` options: value = quoted string, bare
        // word, or parenthesized column list
        val optPairs: Seq[(String, String)] =
          Option(m.group(3)).map(splitTopLevel(_).map(_.trim).filter(_.nonEmpty)
            .map { o =>
              val sp = o.indexWhere(c => c.isWhitespace || c == '(')
              if (sp < 0) (o.toUpperCase, "")
              else (o.substring(0, sp).toUpperCase, o.substring(sp).trim)
            }).getOrElse(Seq.empty)
        def strVal(v: String): String =
          v.stripPrefix("'").stripSuffix("'")
        val optMap = optPairs.toMap
        val fmt = optMap.get("FORMAT").map(strVal(_).toUpperCase).getOrElse(
          if (m.group(2).toLowerCase.endsWith(".parquet")) "PARQUET" else "CSV")
        val partitionCols: Seq[String] = optMap.get("PARTITION_BY").toSeq
          .flatMap(v => v.stripPrefix("(").stripSuffix(")").split(",")
            .map(_.trim).filter(_.nonEmpty))
        val n = df.count()
        if (fmt == "PARQUET") {
          val w0 = df.write.mode("overwrite")
          val w = optMap.get("COMPRESSION")
            .map(c => w0.option("compression", strVal(c).toLowerCase))
            .getOrElse(w0)
          (if (partitionCols.nonEmpty) w.partitionBy(partitionCols: _*) else w)
            .parquet(m.group(2))
        } else {
          val csvOpts = scala.collection.mutable.Map.empty[String, String]
          optPairs.foreach { case (k, v) =>
            k match {
              case "FORMAT" => ()
              case "HEADER" => csvOpts("header") =
                (v.isEmpty || strVal(v).equalsIgnoreCase("true") ||
                  strVal(v) == "1").toString
              case "DELIMITER" | "DELIM" | "SEP" => csvOpts("delim") = strVal(v)
              case "QUOTE" => csvOpts("quote") = strVal(v)
              case "ESCAPE" => csvOpts("escape") = strVal(v)
              case "NULL" => csvOpts("nullstr") = strVal(v)
              case "COMPRESSION" => csvOpts("compression") =
                strVal(v).toLowerCase
              case "DATEFORMAT" => csvOpts("dateformat") = strVal(v)
              case "TIMESTAMPFORMAT" => csvOpts("timestampformat") = strVal(v)
              case "FORCE_QUOTE" => csvOpts("force_quote") = "true"
              case "PARTITION_BY" => ()
              case other => throw new UnsupportedOperationException(
                s"COPY TO: unsupported option $other")
            }
          }
          sources.Csv.write(df, m.group(2), csvOpts.toMap, partitionCols)
        }
        import spark.implicits._
        return Seq(n).toDF("Count")
      case None =>
    }

    // duckdb_functions()/duckdb_tables()/duckdb_columns() catalog table
    // fns (duckdb-6.cpp:14150-14176) → registered views over the
    // session's catalog state, resolved AT STATEMENT TIME
    val duckdbFunctionsFn = """(?i)\bduckdb_functions\s*\(\s*\)""".r
    if (duckdbFunctionsFn.findFirstIn(q).isDefined) {
      Engine.functionsTable(spark).createOrReplaceTempView("__graft_functions")
      q = duckdbFunctionsFn.replaceAllIn(q, "__graft_functions")
    }
    val duckdbTablesFn = """(?i)\bduckdb_tables\s*\(\s*\)""".r
    if (duckdbTablesFn.findFirstIn(q).isDefined) {
      Engine.tables(spark).createOrReplaceTempView("__graft_tables")
      q = duckdbTablesFn.replaceAllIn(q, "__graft_tables")
    }
    val duckdbColumnsFn = """(?i)\bduckdb_columns\s*\(\s*\)""".r
    if (duckdbColumnsFn.findFirstIn(q).isDefined) {
      Engine.columnsTable(spark).createOrReplaceTempView("__graft_columns")
      q = duckdbColumnsFn.replaceAllIn(q, "__graft_columns")
    }
    // r12 long tail (ref duckdb-6.cpp:14150-14176): schemas / views /
    // settings catalog fns + the pragma_database_size table form
    val duckdbSchemasFn = """(?i)\bduckdb_schemas\s*\(\s*\)""".r
    if (duckdbSchemasFn.findFirstIn(q).isDefined) {
      Engine.schemasTable(spark).createOrReplaceTempView("__graft_schemas")
      q = duckdbSchemasFn.replaceAllIn(q, "__graft_schemas")
    }
    val duckdbViewsFn = """(?i)\bduckdb_views\s*\(\s*\)""".r
    if (duckdbViewsFn.findFirstIn(q).isDefined) {
      Engine.viewsTable(spark).createOrReplaceTempView("__graft_views")
      q = duckdbViewsFn.replaceAllIn(q, "__graft_views")
    }
    val duckdbSettingsFn = """(?i)\bduckdb_settings\s*\(\s*\)""".r
    if (duckdbSettingsFn.findFirstIn(q).isDefined) {
      Engine.settingsTable(spark).createOrReplaceTempView("__graft_settings")
      q = duckdbSettingsFn.replaceAllIn(q, "__graft_settings")
    }
    val pragmaDbSizeFn = """(?i)\bpragma_database_size\s*\(\s*\)""".r
    if (pragmaDbSizeFn.findFirstIn(q).isDefined) {
      Engine.databaseSize(spark).createOrReplaceTempView("__graft_db_size")
      q = pragmaDbSizeFn.replaceAllIn(q, "__graft_db_size")
    }
    // pragma_table_info('t') table-fn form (r15 census — the statement
    // form PRAGMA table_info(…) and DESCRIBE already route above)
    val pragmaTableInfoFn = """(?i)\bpragma_table_info\s*\(\s*'([^']+)'\s*\)""".r
    pragmaTableInfoFn.findFirstMatchIn(q).foreach { m =>
      Engine.tableInfo(spark, m.group(1))
        .createOrReplaceTempView("__graft_table_info")
      q = pragmaTableInfoFn.replaceAllIn(q, "__graft_table_info")
    }

    // test_all_types() / test_vector_types(expr[, all_flat]) — the
    // reference's type-surface table functions (duckdb-6.cpp:13886-7),
    // registered as temp views at call time (same replacement-scan
    // treatment as read_csv below)
    q = rewriteTestTableFns(spark, q)

    // replacement scans: read_csv('p' [, opt=v…]) / read_parquet('p') /
    // bare 'x.csv' / 'x.parquet' → temp views
    q = readCsvFn.replaceAllIn(q,
      m => registerCsv(spark, m.group(1), Option(m.group(2)).getOrElse("")))
    q = bareCsv.replaceAllIn(q, m => "FROM " + registerCsv(spark, m.group(1), ""))
    q = readParquetFn.replaceAllIn(q, m =>
      registerParquet(spark, m.group(1), Option(m.group(2)).getOrElse("")))
    q = bareParquet.replaceAllIn(q, m => "FROM " + registerParquet(spark, m.group(1)))
    q = readJsonFn.replaceAllIn(q, m => registerJson(spark, m.group(1)))
    q = bareJson.replaceAllIn(q, m => "FROM " + registerJson(spark, m.group(1)))

    // LIMIT p% → run + limit
    limitPercent.findFirstMatchIn(q) match {
      case Some(m) =>
        val pct = m.group(1).toDouble
        // localCheckpoint: the count pass materializes the base result once;
        // the consuming limit reuses it instead of re-executing the query.
        // floor, not ceil: duck-probed r14b (LIMIT 26% of 10 rows -> 2,
        // 99% of 10 -> 9 - the reference truncates the row count)
        val base = spark.sql(rewriteCore(spark, q.substring(0, m.start))).localCheckpoint()
        val n = math.floor(base.count() * pct / 100.0).toLong
        return base.limit(n.toInt)
      case None =>
    }

    // USING SAMPLE p% (system[, seed]) — block-level sampling (reference
    // SampleMethod::SYSTEM_SAMPLE, duckdb.hpp:20017): a 2048-row block
    // (the reference's vector granularity) is kept or dropped wholesale
    // by a seeded hash of its block id. Must rewrite BEFORE the generic
    // percent rewrite below (whose pattern is a prefix of this one).
    val usingSampleSystem =
      ("""(?is)\bFROM\s+([A-Za-z_][A-Za-z0-9_]*)\s+USING\s+SAMPLE\s+""" +
        """([0-9.]+)\s*%\s*\(\s*system\s*(?:,\s*(\d+))?\s*\)""").r
    q = usingSampleSystem.replaceAllIn(q, m => {
      val seed = Option(m.group(3)).getOrElse("42")
      s"FROM (SELECT * EXCEPT (__gblk) FROM (SELECT *, " +
        s"floor(monotonically_increasing_id() / 2048) AS __gblk " +
        s"FROM ${m.group(1)}) WHERE pmod(hash(__gblk, $seed), 100) < ${m.group(2)})"
    })

    // USING SAMPLE → Spark TABLESAMPLE (works at any nesting depth)
    q = usingSampleRows.replaceAllIn(q, m => s"TABLESAMPLE (${m.group(1)} ROWS)")
    q = usingSamplePct.replaceAllIn(q, m => s"TABLESAMPLE (${m.group(1)} PERCENT)")

    val rewritten = rewriteCore(spark, q)
    // LIMIT n% is an executed-count rewrite and only handled at the top
    // level (above); a nested one surviving to here would otherwise die
    // as an opaque Spark parse error — refuse loudly instead
    """(?is)\bLIMIT\s+[0-9.]+\s*%""".r.findFirstMatchIn(rewritten).foreach { mm =>
      if (!insideQuotes(rewritten, mm.start))
        throw new UnsupportedOperationException(
          "LIMIT n% inside a subquery/CTE is not supported (top level only)")
    }
    spark.sql(rewritten)
  }

  /** Text-level rewrites that stay inside one SQL statement. */
  private[graft] def rewriteCore(spark: SparkSession, query: String): String = {
    var q = query

    // Double-quoted identifiers → backticks (reference identifiers are
    // "quoted" per the SQL standard — Postgres grammar ident rules,
    // duckdb-libpg_query region; Spark's default parser reads "…" as a
    // string literal, so a migrated script's "order key" column would
    // silently become a constant). Token-driven: only QIdent tokens
    // rewrite, a double quote INSIDE a string literal is untouchable by
    // construction; `[…]` is list syntax in the reference, never an
    // identifier (SqlLex scaladoc).
    locally {
      val toks = SqlLex.tokenize(q)
      if (toks.exists(t => t.kind == SqlLex.QIdent && t.start < q.length &&
          q.charAt(t.start) == '"')) {
        val sb = new StringBuilder
        var last = 0
        toks.foreach { t =>
          if (t.kind == SqlLex.QIdent && q.charAt(t.start) == '"') {
            sb.append(q.substring(last, t.start))
            val inner = q.substring(t.start, t.end)
              .stripPrefix("\"").stripSuffix("\"").replace("\"\"", "\"")
            sb.append('`').append(inner.replace("`", "``")).append('`')
            last = t.end
          }
        }
        q = sb.append(q.substring(last)).toString
      }
    }

    // A CTE literally NAMED `recursive` (r12): the reference accepts
    // `WITH recursive AS (…)` as a plain CTE (probed — RECURSIVE needs a
    // following name), but Spark's parser greedily reads RECURSIVE as
    // the keyword and names the CTE `as` → TABLE_OR_VIEW_NOT_FOUND.
    // Backtick-quote the name at its DEFINITION site (unquoted uses
    // resolve case-insensitively to the same identifier). Pattern is
    // token-structural: (WITH | ,) recursive [(cols)] AS ( — an ident
    // followed by AS( cannot occur elsewhere in valid SQL.
    locally {
      val toks = SqlLex.tokenize(q)
      val quoteAt = scala.collection.mutable.ArrayBuffer.empty[SqlLex.Tok]
      var i = 1
      while (i < toks.length) {
        val t = toks(i)
        if (t.kind == SqlLex.Ident && t.lower == "recursive" &&
            ((toks(i - 1).kind == SqlLex.Ident && toks(i - 1).lower == "with") ||
             (toks(i - 1).kind == SqlLex.Punct && toks(i - 1).lower == ","))) {
          var j = i + 1
          if (j < toks.length && toks(j).kind == SqlLex.LParen) {
            // Consume the opening LParen first, then balance to depth 0
            // (mirrors SqlLex.skipGroup); exiting the loop leaves j one
            // past the column list's matching RParen.
            var depth = 1
            j += 1
            while (j < toks.length && depth > 0) {
              if (toks(j).kind == SqlLex.LParen) depth += 1
              else if (toks(j).kind == SqlLex.RParen) depth -= 1
              j += 1
            }
          }
          if (j + 1 < toks.length && toks(j).kind == SqlLex.Ident &&
              toks(j).lower == "as" && toks(j + 1).kind == SqlLex.LParen)
            quoteAt += t
        }
        i += 1
      }
      if (quoteAt.nonEmpty) {
        val sb = new StringBuilder
        var last = 0
        quoteAt.foreach { t =>
          sb.append(q.substring(last, t.start)).append("`recursive`")
          last = t.end
        }
        q = sb.append(q.substring(last)).toString
      }
    }

    // duck list literals, `a // b`, and in-call ordered aggregates —
    // token-structural passes (r14b; each behavior duck-probed). These
    // run AFTER the replacement scans (read_csv option brackets are
    // already consumed) and BEFORE the COLLATE pass (whose operand
    // walks then see plain calls instead of dialect syntax).
    q = rewriteListLiterals(q)
    // r15 battery-tranche-2 literal surfaces: e'…' escapes, TIME and
    // mixed-INTERVAL literals, struct/map braces — then 1-based duck
    // subscripts/slices over whatever base expressions remain
    q = rewriteEStrings(q)
    q = rewriteBlobLiterals(q)
    q = rewriteTimeLiterals(q)
    q = rewriteMixedIntervals(q)
    q = rewriteStructLits(q)
    q = rewriteBracketOps(q)
    // exponentiation and prefix-abs BEFORE the division passes (the
    // reference binds ** / ^ tighter than * / % — probed `2*3**2`=18)
    q = rewritePowAbs(q)
    q = rewriteFloorDiv(q)
    // duck cast targets (::/CAST int + varchar families) before the
    // div/mod pass so operand chains see plain calls
    q = rewriteCasts(q)
    // MAP(keys_list, values_list) — the reference's two-LIST map
    // constructor (duckdb-5.cpp map function). Spark's `map(…)` takes
    // ALTERNATING key/value scalars, so the same text built a 1-entry
    // list→list map silently (r17 BATTERY7 find, r07_render_map) —
    // exactly-2-argument map() calls rewrite to map_from_arrays. Runs
    // AFTER rewriteCasts — MAP tokens inside cast TYPE TEXT (e.g.
    // STRUCT(m MAP(INT, INT)) targets) are folded into duck_ncast
    // string literals by then and can never match (r17 review
    // finding) — and after rewriteStructLits, whose MAP {…} braces
    // now emit map_from_arrays themselves.
    locally {
      var changed = true
      while (changed) {
        changed = false
        val toks = SqlLex.tokenize(q)
        var k = 0
        while (!changed && k < toks.length) {
          val t = toks(k)
          if (t.kind == SqlLex.Ident && t.lower == "map" &&
            k + 1 < toks.length && toks(k + 1).kind == SqlLex.LParen &&
            !(k > 0 && ((toks(k - 1).kind == SqlLex.Punct &&
              (toks(k - 1).lower == "." || toks(k - 1).lower == "::")) ||
              (toks(k - 1).kind == SqlLex.Ident &&
                toks(k - 1).lower == "as")))) {
            var depth = 0
            var j = k + 1
            var close = -1
            while (close < 0 && j < toks.length) {
              toks(j).kind match {
                case SqlLex.LParen => depth += 1
                case SqlLex.RParen => depth -= 1; if (depth == 0) close = j
                case _ => ()
              }
              j += 1
            }
            if (close > 0) {
              val inner = q.substring(toks(k + 1).end, toks(close).start)
              if (splitTopLevel(inner).map(_.trim).count(_.nonEmpty) == 2) {
                q = q.substring(0, t.start) + "map_from_arrays" +
                  q.substring(t.end)
                changed = true
              }
            }
          }
          k += 1
        }
      }
    }
    // SQL-surface function renames to the duck_-prefixed registrations
    // (the registry also resolves API names in Spark 4, so the
    // raise-on-domain / re-typed variants must not shadow them)
    q = rewriteFnNames(q)
    // `/` and `%` → reference semantics (NULL on zero divisor, always-
    // double division — r15 arithmetic-edge sweep)
    q = rewriteDivMod(q)
    // binary `-` → duck_sub (DATE - DATE is an integer day count)
    q = rewriteDateSub(q)
    // << / >> → range-checked shifts (looser than + -, so after the
    // passes that consume tighter operators)
    q = rewriteShiftOps(q)
    q = rewriteSortedAggs(q)
    q = rewriteListFns(q)
    // aggregate FILTER (expr) without WHERE (the reference accepts both)
    q = rewriteFilterWhere(q)
    // quantified subquery comparisons (= ANY / <> ALL / op ANY|ALL)
    q = rewriteQuantified(q)
    // JSON arrow operators (before dateSub would see the minus)
    q = rewriteJsonArrows(q)
    // frame EXCLUDE: strip the no-op form, name the unsupported ones
    q = rewriteFrameExclude(q)
    // window-edge parity (r16 tranche 5): FILTER-before-OVER, empty
    // literal frames, nonpositive nth_value offsets, and order-requiring
    // functions over an ORDER-BY-less spec — all valid on the reference,
    // all Spark analysis errors without the rewrites
    q = rewriteWindowEdges(q)

    // expr [NOT] SIMILAR TO 'pattern' → anchored [NOT] RLIKE (the
    // reference binds SIMILAR TO to regexp_full_match — the pattern is a
    // regex matched against the WHOLE string, duckdb-6.cpp:5993-6041 —
    // so wrapping ^(?:…)$ is the exact Spark equivalent, per SURVEY §2.8)
    locally {
      val sb = new StringBuilder
      var last = 0
      similarToRe.findAllMatchIn(q).foreach { m =>
        if (!insideQuotes(q, m.start)) {
          val body = m.group(2).substring(1, m.group(2).length - 1)
          val neg = if (m.group(1) != null) "NOT " else ""
          sb.append(q.substring(last, m.start))
            .append(s" ${neg}RLIKE '^(?:$body)$$'")
          last = m.end
        }
      }
      if (last > 0) q = sb.append(q.substring(last)).toString
    }

    // COLLATE NOCASE / NOACCENT (reference collation registry,
    // duckdb-5.cpp:5156-5158) as comparison-key folding. COLLATE
    // attaches to a COMPARISON, not a value: `a = b COLLATE NOCASE`
    // folds BOTH operands (`lower(a) = lower(b)`), while in an ORDER BY
    // / windowed ORDER BY item only the sort key folds — the projected
    // value keeps its original case either way, matching the
    // reference. Operands are the textual expression shapes (string
    // literal / identifier / dotted column / function call with one
    // paren-nesting level / parenthesized group), optionally chained
    // with || + - * / — so `(a || b) = c COLLATE NOCASE` and
    // `a || b = c COLLATE NOCASE` fold BOTH full sides (the chain must
    // be captured whole: folding just the nearest atom would rewrite
    // `a || lower(b)` and silently change the comparison). NOACCENT
    // maps to the registered strip_accents UDF (same fold
    // `TypeHelpers.collateNoaccent` uses).
    q = rewriteCollate(q)

    // star modifiers (reference: star expression EXCLUDE / REPLACE,
    // duckdb-internal.hpp star expr):
    //   * EXCLUDE (a, b)            → * EXCEPT (a, b)        (Spark native)
    //   * REPLACE (expr AS c, …)    → * EXCEPT (c, …), expr AS c, …
    //     (replaced columns move to the end of the projection; the
    //     harness compare is column-order-insensitive)
    // combined form `* EXCLUDE (…) REPLACE (…)` folds into one EXCEPT.
    // Structural rewrites — star modifiers, QUALIFY, DISTINCT ON — as
    // tree transforms on the parsed statement spine, at every nesting
    // depth (r13, [[SqlSelect]]; retired the regex splicers)
    q = SqlSelect.rewrite(q)

    // LAST: the reference's default null ordering is NULLS LAST in
    // BOTH directions (probed r15) — running after every pass that can
    // generate ORDER BY spans keeps the whole surface covered
    q = rewriteOrderByNulls(q)

    // VERY LAST: the reference's string literals are RAW (standard
    // SQL — '\d' is backslash-d) while Spark's parser processes C
    // escapes, silently eating the backslash out of every regex in
    // shared-text SQL (r15 tranche 3: regexp_extract('ab12cd','(\d+)')
    // matched 'd'). Doubling each backslash inside string literals
    // makes Spark's un-escaping reproduce the raw text; '' doubling is
    // untouched. (The session-conf alternative,
    // escapedStringLiterals=true, BREAKS '' doubling — probed.)
    // e'…' escape strings were already decoded to raw chars upstream,
    // so their surviving backslashes are literal and double correctly.
    q = rewriteRawStrings(q)

    q
  }

  private[graft] def rewriteRawStrings(q0: String): String = {
    val toks = SqlLex.tokenize(q0)
    val subs = scala.collection.mutable.ArrayBuffer.empty[(Int, Int, String)]
    toks.foreach { t =>
      if (t.kind == SqlLex.Str) {
        val body = q0.substring(t.start, t.end)
        if (body.indexOf('\\') >= 0)
          subs += ((t.start, t.end, body.replace("\\", "\\\\")))
      }
    }
    if (subs.isEmpty) q0
    else {
      val sb = new StringBuilder
      var last = 0
      subs.foreach { case (a, b, rep) =>
        sb.append(q0.substring(last, a)).append(rep); last = b
      }
      sb.append(q0.substring(last)).toString
    }
  }

  // aggregates whose RESULT is decided by comparisons of the annotated
  // argument (reference-probed r12: min/arg_min DO bind the argument's
  // collation — `min(x COLLATE NOCASE)` over ('B','a') returns 'a' —
  // while scalar calls and order-insensitive aggregates ignore it:
  // `greatest('B' COLLATE NOCASE,'a')`, `string_agg`, `first`, and
  // anything past one expression boundary, `min(concat(x COLLATE
  // NOCASE,''))`, are byte-ordered)
  private val collationAggregates = Set("min", "max", "arg_min", "arg_max",
    "min_by", "max_by", "mode", "median", "quantile", "quantile_disc",
    "quantile_cont", "first_value", "last_value")

  private val cmpOps = Set("=", "<>", "!=", "<=", ">=", "<", ">")

  /** COLLATE NOCASE / NOACCENT (reference collation registry,
    * duckdb-5.cpp:5156-5158) as comparison-key folding, token-span
    * structural since r14 (retires the textual `opnd` regex, whose atom
    * shapes capped paren nesting, missed bracket indexing, and could
    * desync on quoted identifiers — the last splicer-class scanner).
    *
    * Per COLLATE site, [[SqlLex.operandStart]] walks the full operand
    * chain the annotation binds to; then:
    *  - a comparison operator on EITHER side folds BOTH full sides
    *    (`a = b COLLATE NOCASE` and `a COLLATE NOCASE = b` are the same
    *    collated comparison — duck-probed r14; the left-side form used
    *    to raise the named error);
    *  - otherwise the single-operand position decides, via the shared
    *    clause machine ([[SqlLex.clauseAt]]): SORT keys fold (but a
    *    sorted aggregate's internal ORDER BY is byte-ordered —
    *    reference-probed r12 — so an enclosing CALL suppresses the
    *    fold; OVER frames bound that search), PROJECTED positions and
    *    scalar-call arguments drop the annotation (a collation changes
    *    comparisons, never the returned value), and grouping /
    *    predicate / comparison-aggregate-argument positions raise a
    *    named error (the fold would change semantics silently, or —
    *    for min/arg_min — need the ORIGINAL value under the folded
    *    order, inexpressible as a text rewrite). */
  private[graft] def rewriteCollate(query: String): String = {
    var q = query
    def fold(c: String, e: String): String =
      if (c == "nocase") s"lower($e)" else s"strip_accents($e)"
    var changed = true
    while (changed) {
      changed = false
      val toks = SqlLex.tokenize(q)
      var k = 1
      while (!changed && k + 1 < toks.length) {
        val t = toks(k)
        if (t.kind == SqlLex.Ident && t.lower == "collate" &&
          toks(k + 1).kind == SqlLex.Ident &&
          Set("nocase", "noaccent")(toks(k + 1).lower)) {
          val coll = toks(k + 1).lower
          val s1 = SqlLex.operandStart(toks, k - 1)
          if (s1 >= 0) {
            val rhs = q.substring(toks(s1).start, toks(k - 1).end)
            val leftCmp = s1 - 1 >= 0 && toks(s1 - 1).kind == SqlLex.Punct &&
              cmpOps(toks(s1 - 1).lower)
            val rightCmp = k + 2 < toks.length &&
              toks(k + 2).kind == SqlLex.Punct && cmpOps(toks(k + 2).lower)
            if (leftCmp && SqlLex.operandStart(toks, s1 - 2) >= 0) {
              val s0 = SqlLex.operandStart(toks, s1 - 2)
              val lhs = q.substring(toks(s0).start, toks(s1 - 2).end)
              q = q.substring(0, toks(s0).start) +
                s"${fold(coll, lhs)} ${toks(s1 - 1).lower} ${fold(coll, rhs)}" +
                q.substring(toks(k + 1).end)
              changed = true
            } else if (rightCmp && SqlLex.operandEnd(toks, k + 3) >= 0) {
              val e2 = SqlLex.operandEnd(toks, k + 3)
              val rhs2 = q.substring(toks(k + 3).start, toks(e2).end)
              q = q.substring(0, toks(s1).start) +
                s"${fold(coll, rhs)} ${toks(k + 2).lower} ${fold(coll, rhs2)}" +
                q.substring(toks(e2).end)
              changed = true
            } else collateCompareForms(q, toks, k, s1, coll) match {
              case Some(nq) =>
                q = nq
                changed = true
              case None =>
                val pos = toks(s1).start
                val repl = SqlLex.clauseAt(toks, pos) match {
                  case "sort" if SqlLex.callNameAt(toks, pos).isEmpty =>
                    fold(coll, rhs)
                  case "sort" => rhs
                  case "select" => rhs
                  case "func" if !collationAggregates(SqlLex.callNameAt(toks, pos)) =>
                    rhs
                  case ctx => throw new IllegalArgumentException(
                    s"graft: COLLATE ${coll.toUpperCase} on a single operand in a " +
                      s"$ctx position would change ${if (ctx == "group") "grouping" else "matching"} " +
                      "semantics silently — fold explicitly with lower()/strip_accents() " +
                      "(reference collation registry, duckdb-5.cpp:5156)")
                }
                q = q.substring(0, toks(s1).start) + repl + q.substring(toks(k + 1).end)
                changed = true
            }
          }
        }
        k += 1
      }
    }
    q
  }

  /** Identifiers after which a `[` opens a LIST LITERAL rather than an
    * index — clause keywords and operators; a `[` directly after an
    * identifier, quoted identifier, `)`, `]`, or string is indexing. */
  private val bracketLiteralWords = Set(
    "select", "where", "when", "then", "else", "and", "or", "not", "in",
    "on", "using", "by", "as", "values", "union", "all", "except",
    "intersect", "distinct", "having", "qualify", "limit", "offset",
    "returning", "set", "between", "like", "ilike", "case", "is", "from")

  /** duck `[e1, e2, …]` list literals → `array(e1, e2, …)` (reference
    * list constructor syntax; Spark's parser has no bracket literal).
    * Indexing (`w[i]`, `arr[1]` — a `[` after a value token) is left
    * alone: Spark shares duck's bracket-index syntax. Runs after the
    * replacement scans so `read_csv(… names=['a'])` options are
    * already consumed. */
  private[graft] def rewriteListLiterals(q0: String): String = {
    var q = q0
    var changed = true
    while (changed) {
      changed = false
      val toks = SqlLex.tokenize(q)
      var k = 0
      while (!changed && k < toks.length) {
        val t = toks(k)
        if (t.kind == SqlLex.Punct && t.lower == "[") {
          val prev = if (k > 0) toks(k - 1) else null
          val indexing = prev != null && (prev.kind == SqlLex.RParen ||
            prev.kind == SqlLex.Str || prev.kind == SqlLex.QIdent ||
            (prev.kind == SqlLex.Punct && prev.lower == "]") ||
            (prev.kind == SqlLex.Ident && !bracketLiteralWords(prev.lower)))
          if (!indexing) {
            var depth = 0
            var j = k
            var close = -1
            while (close < 0 && j < toks.length) {
              val w = toks(j)
              if (w.kind == SqlLex.Punct && w.lower == "[") depth += 1
              else if (w.kind == SqlLex.Punct && w.lower == "]") {
                depth -= 1
                if (depth == 0) close = j
              }
              j += 1
            }
            if (close > 0) {
              // duck list COMPREHENSIONS (r15 probed: `[x*2 FOR x IN
              // [1,2,3] IF x > 1]` = [4,6]) → transform/filter lambdas;
              // detection: depth-1 bare FOR … IN inside the brackets
              var forIdx = -1
              var inIdx = -1
              var ifIdx = -1
              locally {
                var d = 0
                var m = k
                while (m < close) {
                  val w = toks(m)
                  if ((w.kind == SqlLex.Punct && w.lower == "[") ||
                    w.kind == SqlLex.LParen) d += 1
                  else if ((w.kind == SqlLex.Punct && w.lower == "]") ||
                    w.kind == SqlLex.RParen) d -= 1
                  else if (d == 1 && w.kind == SqlLex.Ident) {
                    if (w.lower == "for" && forIdx < 0) forIdx = m
                    else if (w.lower == "in" && forIdx > 0 && inIdx < 0) inIdx = m
                    else if (w.lower == "if" && inIdx > 0 && ifIdx < 0) ifIdx = m
                  }
                  m += 1
                }
              }
              if (forIdx > 0 && inIdx == forIdx + 2 &&
                toks(forIdx + 1).kind == SqlLex.Ident) {
                val v = q.substring(toks(forIdx + 1).start, toks(forIdx + 1).end)
                val e = q.substring(t.end, toks(forIdx).start).trim
                val listEnd = if (ifIdx > 0) toks(ifIdx).start else toks(close).start
                val lst = q.substring(toks(inIdx).end, listEnd).trim
                val src = if (ifIdx > 0) {
                  val cond = q.substring(toks(ifIdx).end, toks(close).start).trim
                  s"filter($lst, $v -> $cond)"
                } else lst
                q = q.substring(0, t.start) + s"transform($src, $v -> $e)" +
                  q.substring(toks(close).end)
              } else {
                q = q.substring(0, t.start) + "array(" +
                  q.substring(t.end, toks(close).start) + ")" +
                  q.substring(toks(close).end)
              }
              changed = true
            }
          }
        }
        k += 1
      }
    }
    q
  }

  /** duck `a // b` (duck-probed r14b): truncating integer division for
    * integral operands, PLAIN division otherwise — dispatched at plan
    * time by [[graft.functions.DuckFloorDiv]]. Operand capture is
    * multiplicative-precedence only (`a + b // c` is `a + (b//c)`):
    * the left side chains across * / % :: and the right side is one
    * atom (plus an optional sign and :: casts) — `a // b * c` stays
    * `(a//b) * c`. */
  private[graft] def rewriteFloorDiv(q0: String): String = {
    val mulOps = Set("*", "/", "%", "::")
    val castOnly = Set("::")
    var q = q0
    var changed = true
    while (changed) {
      changed = false
      val toks = SqlLex.tokenize(q)
      var k = 1
      while (!changed && k + 1 < toks.length) {
        val a = toks(k)
        val b = toks(k + 1)
        if (a.kind == SqlLex.Punct && a.lower == "/" &&
          b.kind == SqlLex.Punct && b.lower == "/" && a.end == b.start) {
          val ls = SqlLex.operandStart(toks, k - 1, mulOps)
          // optional unary sign on the right operand
          val signTok = if (k + 2 < toks.length && toks(k + 2).kind == SqlLex.Punct &&
            (toks(k + 2).lower == "-" || toks(k + 2).lower == "+")) 1 else 0
          val re = SqlLex.operandEnd(toks, k + 2 + signTok, castOnly)
          if (ls >= 0 && re >= 0) {
            val l = q.substring(toks(ls).start, toks(k - 1).end)
            val r = q.substring(toks(k + 2).start, toks(re).end)
            q = q.substring(0, toks(ls).start) + s"graft_fdiv($l, $r)" +
              q.substring(toks(re).end)
            changed = true
          }
        }
        k += 1
      }
    }
    q
  }

  /** `a ** b` / `a ^ b` → power(a, b) and prefix `@x` → abs(x)
    * (duck-probed r15: the reference's `^` is EXPONENTIATION returning
    * DOUBLE — `2^3`=8.0 where Spark's `^` is xor, a silent-wrong
    * class; `**`/`^` bind tighter than `* / %` — `2*3**2`=18,
    * `2^3*2`=16 — are left-associative — `2**3**2`=64 — and a unary
    * sign binds INTO the left operand: `-2**2`=4). Scanning leftmost-
    * first per pass yields left associativity. */
  private[graft] def rewritePowAbs(q0: String): String = {
    val castOnly = Set("::")
    // a sign token is UNARY when the tokens before it cannot end an
    // operand (`2 - 3**2` keeps the binary minus out of the operand;
    // `(-2)**2` and `a * -2 ** 2` pull the sign in)
    def unarySign(toks: Vector[SqlLex.Tok], i: Int): Boolean =
      toks(i).kind == SqlLex.Punct &&
        (toks(i).lower == "-" || toks(i).lower == "+") &&
        (i == 0 || SqlLex.operandStart(toks, i - 1, castOnly) < 0)
    var q = q0
    var changed = true
    while (changed) {
      changed = false
      val toks = SqlLex.tokenize(q)
      var k = 0
      while (!changed && k < toks.length) {
        val t = toks(k)
        val isPow2 = t.kind == SqlLex.Punct && t.lower == "*" &&
          k + 1 < toks.length && toks(k + 1).kind == SqlLex.Punct &&
          toks(k + 1).lower == "*" && t.end == toks(k + 1).start
        val isCaret = t.kind == SqlLex.Punct && t.lower == "^"
        if ((isPow2 || isCaret) && k >= 1) {
          val opEnd = if (isPow2) k + 1 else k
          var ls = SqlLex.operandStart(toks, k - 1, castOnly)
          if (ls > 0 && unarySign(toks, ls - 1)) ls -= 1
          val rSign = if (opEnd + 1 < toks.length &&
            toks(opEnd + 1).kind == SqlLex.Punct &&
            (toks(opEnd + 1).lower == "-" || toks(opEnd + 1).lower == "+")) 1 else 0
          val re = if (opEnd + 1 + rSign < toks.length)
            SqlLex.operandEnd(toks, opEnd + 1 + rSign, castOnly) else -1
          if (ls >= 0 && re >= 0) {
            val l = q.substring(toks(ls).start, toks(k - 1).end)
            val r = q.substring(toks(opEnd + 1).start, toks(re).end)
            q = q.substring(0, toks(ls).start) + s"power($l, $r)" +
              q.substring(toks(re).end)
            changed = true
          }
        } else if (t.kind == SqlLex.Punct && t.lower == "@" &&
          k + 1 < toks.length) {
          // prefix abs (probed `@ -5.5` = 5.5): operand is an optional
          // sign + one atom with casts
          val rSign = if (toks(k + 1).kind == SqlLex.Punct &&
            (toks(k + 1).lower == "-" || toks(k + 1).lower == "+")) 1 else 0
          val re = if (k + 1 + rSign < toks.length)
            SqlLex.operandEnd(toks, k + 1 + rSign, castOnly) else -1
          if (re >= 0) {
            val r = q.substring(toks(k + 1).start, toks(re).end)
            q = q.substring(0, t.start) + s"abs($r)" + q.substring(toks(re).end)
            changed = true
          }
        }
        k += 1
      }
    }
    q
  }

  /** duck `a / b` and `a % b` → duck_div / duck_mod (r15 arithmetic-
    * edge sweep; [[graft.functions.DuckDiv]] / [[graft.functions.DuckMod]]
    * dispatch on operand types at plan time: NULL on a zero divisor at
    * every numeric type, `/` always DOUBLE — probed `typeof(5/2)` =
    * `typeof(1.5/2.5)` = DOUBLE — and the per-width `min % -1`
    * overflow error). Same multiplicative operand capture as
    * [[rewriteFloorDiv]]. An INTERVAL literal on the left keeps
    * Spark's own interval arithmetic (the capture would otherwise take
    * just the unit keyword). */
  private[graft] def rewriteDivMod(q0: String): String = {
    val mulOps = Set("*", "/", "%", "::")
    val castOnly = Set("::")
    var q = q0
    var changed = true
    while (changed) {
      changed = false
      val toks = SqlLex.tokenize(q)
      var k = 1
      while (!changed && k < toks.length) {
        val t = toks(k)
        if (t.kind == SqlLex.Punct && (t.lower == "/" || t.lower == "%")) {
          val fn = if (t.lower == "/") "duck_div" else "duck_mod"
          val ls = SqlLex.operandStart(toks, k - 1, mulOps)
          // two token shapes: `INTERVAL 4 HOUR` (keyword at ls-2, the
          // capture lands on the unit ident) and the quoted form
          // `INTERVAL '4 hours'` (keyword at ls-1, capture on the Str)
          val intervalLeft = (ls >= 2 &&
            toks(ls - 2).kind == SqlLex.Ident && toks(ls - 2).lower == "interval") ||
            (ls >= 1 && toks(ls).kind == SqlLex.Str &&
              toks(ls - 1).kind == SqlLex.Ident && toks(ls - 1).lower == "interval")
          val rSign = if (k + 1 < toks.length && toks(k + 1).kind == SqlLex.Punct &&
            (toks(k + 1).lower == "-" || toks(k + 1).lower == "+")) 1 else 0
          val re = if (k + 1 + rSign < toks.length)
            SqlLex.operandEnd(toks, k + 1 + rSign, castOnly) else -1
          if (ls >= 0 && re >= 0 && !intervalLeft) {
            val l = q.substring(toks(ls).start, toks(k - 1).end)
            val r = q.substring(toks(k + 1).start, toks(re).end)
            q = q.substring(0, toks(ls).start) + s"$fn($l, $r)" +
              q.substring(toks(re).end)
            changed = true
          }
        }
        k += 1
      }
    }
    q
  }

  /** Typed-literal keywords: a captured Str operand whose PREVIOUS
    * token is one of these belongs to a typed literal — the keyword
    * must travel with the operand (`DATE '1994-01-01' - 1` must not
    * capture just the string). */
  private val typedLitKw = Set("date", "timestamp", "time", "interval")

  private def withTypedLitKw(toks: Vector[SqlLex.Tok], ls: Int): Int =
    if (ls > 0 && toks(ls).kind == SqlLex.Str &&
      toks(ls - 1).kind == SqlLex.Ident && typedLitKw(toks(ls - 1).lower)) ls - 1
    else ls

  /** duck `a - b` → duck_sub (r15 battery tranche 2): DATE - DATE is
    * an INTEGER day count on the reference (probed: 31) where Spark
    * yields a day-time interval; all other operand types pass through
    * to Spark's own Subtract resolution. Additive-precedence capture;
    * unary minus never rewrites (no left operand). */
  private[graft] def rewriteDateSub(q0: String): String = {
    val addOps = Set("*", "/", "%", "::", "+", "-")
    val mulOps = Set("*", "/", "%", "::")
    val castOnly = Set("::")
    def unarySign(toks: Vector[SqlLex.Tok], i: Int): Boolean =
      toks(i).kind == SqlLex.Punct &&
        (toks(i).lower == "-" || toks(i).lower == "+") &&
        (i == 0 || SqlLex.operandStart(toks, i - 1, castOnly) < 0)
    // additive-chain start with unary signs folded INTO the chain
    // (`x * -3 - y` must capture `x * -3`, not just `3`)
    def extStart(toks: Vector[SqlLex.Tok], j: Int): Int = {
      var s = SqlLex.operandStart(toks, j, addOps)
      if (s < 0) return -1
      var more = true
      while (more) {
        more = false
        s = withTypedLitKw(toks, s)
        if (s > 0 && unarySign(toks, s - 1)) {
          s -= 1
          if (s > 0 && toks(s - 1).kind == SqlLex.Punct &&
            addOps(toks(s - 1).lower) && s - 2 >= 0) {
            val s2 = SqlLex.operandStart(toks, s - 2, addOps)
            if (s2 >= 0) { s = s2; more = true }
          }
        }
      }
      s
    }
    var q = q0
    var changed = true
    while (changed) {
      changed = false
      val toks = SqlLex.tokenize(q)
      var k = 1
      while (!changed && k + 1 < toks.length) {
        val t = toks(k)
        // a binary minus only (tokens before it can end an operand);
        // `->` arrows pass through
        val isArrow = toks(k + 1).kind == SqlLex.Punct &&
          toks(k + 1).lower == ">" && t.end == toks(k + 1).start
        // `1e-7`: the lexer splits a signed exponent into Num('1e') -
        // Num('7'); an adjacent minus between them is the literal's
        // exponent sign, not subtraction
        val isSciExp = toks(k - 1).kind == SqlLex.Num &&
          toks(k - 1).end == t.start && k + 1 < toks.length &&
          toks(k + 1).kind == SqlLex.Num && t.end == toks(k + 1).start && {
            val p = q.substring(toks(k - 1).start, toks(k - 1).end)
            p.endsWith("e") || p.endsWith("E")
          }
        if (t.kind == SqlLex.Punct && t.lower == "-" && !isArrow && !isSciExp &&
          SqlLex.operandStart(toks, k - 1, castOnly) >= 0) {
          var ls = extStart(toks, k - 1)
          // keyword-form interval on the left (`INTERVAL 4 HOUR - …`):
          // the capture lands on the unit ident — extend to the
          // keyword so duck_sub sees the whole literal (r16; duck_sub
          // now dispatches every interval pairing incl. the MIXED
          // ym/dt classes Spark cannot combine)
          if (ls >= 2 && toks(ls - 2).kind == SqlLex.Ident &&
            toks(ls - 2).lower == "interval") ls -= 2
          val rSign = if (toks(k + 1).kind == SqlLex.Punct &&
            (toks(k + 1).lower == "-" || toks(k + 1).lower == "+")) 1 else 0
          var re = if (k + 1 + rSign < toks.length)
            SqlLex.operandEnd(toks, k + 1 + rSign, mulOps) else -1
          // typed literal on the right (DATE '…' parses as ident+str)
          if (re >= 0 && rSign == 0 && toks(k + 1).kind == SqlLex.Ident &&
            typedLitKw(toks(k + 1).lower) && re == k + 1 &&
            k + 2 < toks.length && toks(k + 2).kind == SqlLex.Str) re = k + 2
          // INTERVAL right operands (quoted and keyword forms) rewrite
          // too since r16 — duck_sub owns all interval pairings
          if (re < 0 && rSign == 0 && toks(k + 1).kind == SqlLex.Ident &&
            toks(k + 1).lower == "interval" && k + 2 < toks.length) {
            if (toks(k + 2).kind == SqlLex.Str) re = k + 2
            else if (toks(k + 2).kind == SqlLex.Num && k + 3 < toks.length &&
              toks(k + 3).kind == SqlLex.Ident) re = k + 3
          }
          if (ls >= 0 && re >= 0) {
            val l = q.substring(toks(ls).start, toks(k - 1).end)
            val r = q.substring(toks(k + 1).start, toks(re).end)
            q = q.substring(0, toks(ls).start) + s"duck_sub($l, $r)" +
              q.substring(toks(re).end)
            changed = true
          }
        }
        k += 1
      }
    }
    q
  }


  /** duck cast targets (r15): `CAST/TRY_CAST(x AS <int-name>)` and
    * `x::<int-name>` route through duck_icast (float inputs round half
    * to even, decimals half away, strings take the exact parse first —
    * all probed), and the VARCHAR/TEXT/STRING targets route through
    * duck_str (fixes Spark's bare-VARCHAR rejection and renders
    * doubles with the reference's shortest-round-trip format). */
  /** `test_all_types()` → a registered 3-row min/max/NULL view;
    * `test_vector_types(expr [, all_flat])` → a per-layout test-vector
    * view for the ARGUMENT's type ([[graft.sources.TestTables]]). The
    * argument's type is bound through the session (after the cast
    * rewrite so `NULL::DECIMAL(4,1)` resolves); `all_flat` only
    * changes the reference's internal vector layout, so it is
    * accepted and ignored. */
  private def rewriteTestTableFns(spark: SparkSession, q0: String): String = {
    var q = q0
    val tat = """(?is)\btest_all_types\s*\(\s*\)""".r
    // per-occurrence quote check (r17 review: a single findFirst +
    // replaceAllIn either mutated string literals or skipped real
    // calls depending on which came first)
    val tatMatches = tat.findAllMatchIn(q).toSeq
      .filter(m => !insideQuotes(q, m.start))
    if (tatMatches.nonEmpty) {
      graft.sources.TestTables.testAllTypes(spark)
        .createOrReplaceTempView("__graft_test_all_types")
      val sb = new StringBuilder(q)
      tatMatches.reverse.foreach(m =>
        sb.replace(m.start, m.end, "__graft_test_all_types"))
      q = sb.toString
    }
    var guard = 0
    var found = true
    while (found && guard < 64) {
      guard += 1
      found = false
      val toks = SqlLex.tokenize(q)
      var k = 0
      while (!found && k < toks.length) {
        val t = toks(k)
        if (t.kind == SqlLex.Ident && t.lower == "test_vector_types" &&
          k + 1 < toks.length && toks(k + 1).kind == SqlLex.LParen) {
          var depth = 0
          var j = k + 1
          var close = -1
          while (close < 0 && j < toks.length) {
            toks(j).kind match {
              case SqlLex.LParen => depth += 1
              case SqlLex.RParen => depth -= 1; if (depth == 0) close = j
              case _ => ()
            }
            j += 1
          }
          if (close < 0) throw new IllegalArgumentException(
            "test_vector_types: unbalanced parentheses")
          val inner = q.substring(toks(k + 1).end, toks(close).start)
          val args = splitTopLevel(inner).map(_.trim).filter(_.nonEmpty)
          if (args.isEmpty) throw new IllegalArgumentException(
            "test_vector_types requires a typed argument, e.g. " +
              "test_vector_types(NULL::INTEGER)")
          val dt = spark.sql(rewriteCore(spark,
            s"SELECT ${args.head} AS __graft_tvt")).schema.head.dataType
          val view = s"__graft_tvt_${guard}_${math.abs(inner.hashCode)}"
          graft.sources.TestTables.testVectorTypes(spark, dt)
            .createOrReplaceTempView(view)
          q = q.substring(0, t.start) + view + q.substring(toks(close).end)
          found = true
        }
        k += 1
      }
    }
    q
  }

  private[graft] def rewriteCasts(q0: String): String = {
    val intNames = graft.functions.DuckICast.targets.keySet
    val strNames = Set("varchar", "text", "string")
    val boolNames = Set("boolean", "bool", "logical")
    var q = q0
    var changed = true
    while (changed) {
      changed = false
      val toks = SqlLex.tokenize(q)
      var k = 0
      while (!changed && k < toks.length) {
        val t = toks(k)
        if (t.kind == SqlLex.Ident && (t.lower == "cast" || t.lower == "try_cast") &&
          k + 1 < toks.length && toks(k + 1).kind == SqlLex.LParen) {
          var depth = 0
          var j = k + 1
          var close = -1
          var asIdx = -1
          while (close < 0 && j < toks.length) {
            val w = toks(j)
            if (w.kind == SqlLex.LParen) depth += 1
            else if (w.kind == SqlLex.RParen) { depth -= 1; if (depth == 0) close = j }
            else if (depth == 1 && w.kind == SqlLex.Ident && w.lower == "as") asIdx = j
            j += 1
          }
          // stringy targets incl. length modifiers: the reference
          // treats CHAR(10) / VARCHAR(3) / CHARACTER VARYING(2) /
          // BPCHAR as plain VARCHAR — no padding, no truncation
          // (probed r16: CAST('abc' AS CHAR(10)) || 'Z' = 'abcZ')
          // where Spark's CHAR(n) space-pads and VARCHAR(n) truncates
          val strTypeEnd: Int = if (close > 0 && asIdx > k + 2 &&
            toks(asIdx + 1).kind == SqlLex.Ident) {
            val ty0 = toks(asIdx + 1).lower
            var e = -1
            if (strNames(ty0) || ty0 == "char" || ty0 == "character" ||
              ty0 == "bpchar") {
              e = asIdx + 1
              if ((ty0 == "character" || ty0 == "char") && e + 1 < close &&
                toks(e + 1).kind == SqlLex.Ident && toks(e + 1).lower == "varying")
                e += 1
              if (e + 3 <= close && toks(e + 1).kind == SqlLex.LParen &&
                toks(e + 2).kind == SqlLex.Num &&
                toks(e + 3).kind == SqlLex.RParen) e += 3
              if (e + 1 != close) e = -1 // trailing junk — not ours
            }
            e
          } else -1
          // single-ident target directly before the close, or `T[]`
          // array targets (DECIMAL(p,s) falls through to Spark)
          val singleIdent = close > 0 && asIdx > k + 2 && asIdx + 2 == close &&
            toks(asIdx + 1).kind == SqlLex.Ident
          val arrayIdent = close > 0 && asIdx > k + 2 && asIdx + 4 == close &&
            toks(asIdx + 1).kind == SqlLex.Ident &&
            toks(asIdx + 2).kind == SqlLex.Punct && toks(asIdx + 2).lower == "[" &&
            toks(asIdx + 3).kind == SqlLex.Punct && toks(asIdx + 3).lower == "]"
          // nested targets: STRUCT(…)/MAP(…) (at any depth, incl.
          // array suffixes) and multi-dim T[][] route through
          // duck_ncast — by-name struct matching + leaf-level TRY
          // (r17 BATTERY7; functions/DuckNestedCast.scala)
          val nestedTarget: Option[String] =
            if (close > 0 && asIdx > k + 2 && asIdx + 1 < close) {
              val tt = q.substring(toks(asIdx).end, toks(close).start).trim
              val headIsNested = toks(asIdx + 1).kind == SqlLex.Ident &&
                Set("struct", "map")(toks(asIdx + 1).lower) &&
                asIdx + 2 < close && toks(asIdx + 2).kind == SqlLex.LParen
              val multiDim =
                """\]\s*\[""".r.findFirstIn(tt).isDefined
              if (headIsNested || multiDim) Some(tt) else None
            } else None
          if (nestedTarget.isDefined) {
            val isTry = t.lower == "try_cast"
            val expr = q.substring(toks(k + 2).start, toks(asIdx).start).trim
            val tyLit = nestedTarget.get.replace("'", "''")
            q = q.substring(0, t.start) +
              (if (isTry) "duck_try_ncast(" else "duck_ncast(") +
              expr + s", '$tyLit')" + q.substring(toks(close).end)
            changed = true
          } else if (strTypeEnd > 0) {
            val isTry = t.lower == "try_cast"
            val expr = q.substring(toks(k + 2).start, toks(asIdx).start).trim
            q = q.substring(0, t.start) +
              (if (isTry) "duck_try_str(" else "duck_str(") + expr + ")" +
              q.substring(toks(close).end)
            changed = true
          } else if (singleIdent || arrayIdent) {
            val ty = toks(asIdx + 1).lower
            val isTry = t.lower == "try_cast"
            val expr = q.substring(toks(k + 2).start, toks(asIdx).start).trim
            val call =
              if (arrayIdent) Some(
                (if (isTry) "duck_try_acast(" else "duck_acast(") + expr + s", '$ty')")
              else if (intNames(ty)) Some(
                (if (isTry) "duck_try_icast(" else "duck_icast(") + expr + s", '$ty')")
              else if (strNames(ty)) Some(
                (if (isTry) "duck_try_str(" else "duck_str(") + expr + ")")
              else if (boolNames(ty)) Some(
                (if (isTry) "duck_try_bcast(" else "duck_bcast(") + expr + ")")
              else None
            call.foreach { c =>
              q = q.substring(0, t.start) + c + q.substring(toks(close).end)
              changed = true
            }
          }
        } else if (t.kind == SqlLex.Punct && t.lower == "::" && k >= 1 &&
          k + 1 < toks.length && toks(k + 1).kind == SqlLex.Ident &&
          Set("struct", "map")(toks(k + 1).lower) &&
          k + 2 < toks.length && toks(k + 2).kind == SqlLex.LParen) {
          // x::STRUCT(…) / x::MAP(…,…) [+ optional [] suffixes] → the
          // by-name nested cast (r17 BATTERY7)
          val ls = SqlLex.operandStart(toks, k - 1, Set("::"))
          if (ls >= 0) {
            var depth = 0
            var j = k + 2
            var close = -1
            while (close < 0 && j < toks.length) {
              toks(j).kind match {
                case SqlLex.LParen => depth += 1
                case SqlLex.RParen => depth -= 1; if (depth == 0) close = j
                case _ => ()
              }
              j += 1
            }
            if (close > 0) {
              var te = close
              while (te + 2 < toks.length &&
                toks(te + 1).kind == SqlLex.Punct && toks(te + 1).lower == "[" &&
                toks(te + 2).kind == SqlLex.Punct && toks(te + 2).lower == "]")
                te += 2
              val operand = q.substring(toks(ls).start, toks(k - 1).end)
              val tyLit = q.substring(toks(k + 1).start, toks(te).end)
                .replace("'", "''")
              q = q.substring(0, toks(ls).start) +
                s"duck_ncast($operand, '$tyLit')" + q.substring(toks(te).end)
              changed = true
            }
          }
        } else if (t.kind == SqlLex.Punct && t.lower == "::" && k >= 1 &&
          k + 1 < toks.length && toks(k + 1).kind == SqlLex.Ident &&
          (intNames(toks(k + 1).lower) || strNames(toks(k + 1).lower) ||
            boolNames(toks(k + 1).lower) ||
            Set("char", "character", "bpchar")(toks(k + 1).lower)) &&
          !(k + 2 < toks.length && toks(k + 2).kind == SqlLex.Punct &&
            toks(k + 2).lower == "[")) {
          val ls = SqlLex.operandStart(toks, k - 1, Set("::"))
          if (ls >= 0) {
            val ty = toks(k + 1).lower
            // stringy targets may carry VARYING and a length modifier
            // — both ignored by the reference (probed 'abc'::CHAR(10))
            val stringy = !intNames(ty) && !boolNames(ty)
            var te = k + 1
            if (stringy && (ty == "character" || ty == "char") &&
              te + 1 < toks.length &&
              toks(te + 1).kind == SqlLex.Ident && toks(te + 1).lower == "varying")
              te += 1
            if (stringy && te + 3 < toks.length &&
              toks(te + 1).kind == SqlLex.LParen &&
              toks(te + 2).kind == SqlLex.Num &&
              toks(te + 3).kind == SqlLex.RParen) te += 3
            val operand = q.substring(toks(ls).start, toks(k - 1).end)
            val call = if (intNames(ty)) s"duck_icast($operand, '$ty')"
              else if (boolNames(ty)) s"duck_bcast($operand)"
              else s"duck_str($operand)"
            q = q.substring(0, toks(ls).start) + call + q.substring(toks(te).end)
            changed = true
          }
        }
        k += 1
      }
    }
    q
  }

  /** duck `a << b` / `a >> b` → duck_lshift / duck_rshift (probed r15:
    * the reference raises on negative or ≥-width left shifts and on
    * overflow past the operand width's SIGNED max — `1 << 31` at INT32
    * raises; `>>` yields 0 for out-of-range amounts — while Spark
    * wraps at Java semantics). Probed precedence: looser than + -
    * (`1+1<<2`=8), tighter than & (`3 & 1<<1`=2), left-associative.
    * A leading unary sign binds into the left operand so `-1 << 2`
    * raises like the reference. `>>>` (three adjacent) is untouched. */
  private[graft] def rewriteShiftOps(q0: String): String = {
    val addOps = Set("*", "/", "%", "::", "+", "-")
    val castOnly = Set("::")
    def unarySign(toks: Vector[SqlLex.Tok], i: Int): Boolean =
      toks(i).kind == SqlLex.Punct &&
        (toks(i).lower == "-" || toks(i).lower == "+") &&
        (i == 0 || SqlLex.operandStart(toks, i - 1, castOnly) < 0)
    var q = q0
    var changed = true
    while (changed) {
      changed = false
      val toks = SqlLex.tokenize(q)
      var k = 1
      while (!changed && k + 1 < toks.length) {
        val a = toks(k)
        val b = toks(k + 1)
        val twoOf = (c: String) => a.kind == SqlLex.Punct && a.lower == c &&
          b.kind == SqlLex.Punct && b.lower == c && a.end == b.start &&
          !(k + 2 < toks.length && toks(k + 2).kind == SqlLex.Punct &&
            toks(k + 2).lower == c && b.end == toks(k + 2).start) &&
          !(k >= 1 && toks(k - 1).kind == SqlLex.Punct &&
            toks(k - 1).lower == c && toks(k - 1).end == a.start)
        val fn = if (twoOf("<")) "duck_lshift"
          else if (twoOf(">")) "duck_rshift" else null
        if (fn != null) {
          var ls = SqlLex.operandStart(toks, k - 1, addOps)
          if (ls > 0 && unarySign(toks, ls - 1)) ls -= 1
          val rSign = if (k + 2 < toks.length && toks(k + 2).kind == SqlLex.Punct &&
            (toks(k + 2).lower == "-" || toks(k + 2).lower == "+")) 1 else 0
          val re = if (k + 2 + rSign < toks.length)
            SqlLex.operandEnd(toks, k + 2 + rSign, addOps) else -1
          if (ls >= 0 && re >= 0) {
            val l = q.substring(toks(ls).start, toks(k - 1).end)
            val r = q.substring(toks(k + 2).start, toks(re).end)
            q = q.substring(0, toks(ls).start) + s"$fn($l, $r)" +
              q.substring(toks(re).end)
            changed = true
          }
        }
        k += 1
      }
    }
    q
  }

  /** duck struct literals `{'k': v, …}` → named_struct('k', v, …) and
    * `MAP {'k': v, …}` → map('k', v, …); `struct_pack(a := 1)` →
    * named_struct('a', 1) (probed r15 battery tranche 2 — Spark has no
    * brace literals). Outermost-first; nested literals resolve on the
    * next pass. Only braces whose first depth-1 item is `key :` are
    * touched. */
  private[graft] def rewriteStructLits(q0: String): String = {
    var q = q0
    var changed = true
    while (changed) {
      changed = false
      val toks = SqlLex.tokenize(q)
      var k = 0
      while (!changed && k < toks.length) {
        val t = toks(k)
        if (t.kind == SqlLex.Punct && t.lower == "{") {
          var depth = 0
          var j = k
          var close = -1
          val colons = scala.collection.mutable.ArrayBuffer.empty[Int]
          val commas = scala.collection.mutable.ArrayBuffer.empty[Int]
          while (close < 0 && j < toks.length) {
            val w = toks(j)
            if (w.kind == SqlLex.Punct && w.lower == "{") depth += 1
            else if (w.kind == SqlLex.Punct && w.lower == "}") {
              depth -= 1; if (depth == 0) close = j
            } else if (depth == 1 && w.kind == SqlLex.LParen) {
              // skip call groups whole so inner commas/colons don't count
              var d2 = 1; j += 1
              while (j < toks.length && d2 > 0) {
                if (toks(j).kind == SqlLex.LParen) d2 += 1
                else if (toks(j).kind == SqlLex.RParen) d2 -= 1
                if (d2 > 0) j += 1
              }
            } else if (depth == 1 && w.kind == SqlLex.Punct && w.lower == ":")
              colons += j
            else if (depth == 1 && w.kind == SqlLex.Punct && w.lower == ",")
              commas += j
            j += 1
          }
          val isMap = k > 0 && toks(k - 1).kind == SqlLex.Ident &&
            toks(k - 1).lower == "map"
          // a struct/map literal iff the first content token is a key
          // followed by a depth-1 colon
          val looksLit = close > k + 2 && colons.nonEmpty &&
            (toks(k + 1).kind == SqlLex.Str || toks(k + 1).kind == SqlLex.QIdent) &&
            colons.head == k + 2
          if (looksLit) {
            val bounds = (Seq(k) ++ commas ++ Seq(close)).sliding(2).toSeq
            val pairs = bounds.map { case Seq(a, b) =>
              // item spans (a, b); its key:value split at the first
              // depth-1 colon inside
              val c = colons.find(i => i > a && i < b).getOrElse(-1)
              require(c > 0, "struct literal item without ':'")
              val key = q.substring(toks(a + 1).start, toks(c).start).trim
              val v = q.substring(toks(c).end, toks(b).start).trim
              val keyLit =
                if (toks(a + 1).kind == SqlLex.QIdent)
                  "'" + key.stripPrefix("\"").stripSuffix("\"") + "'"
                else key
              (keyLit, v)
            }
            // MAP {…} emits map_from_arrays (not Spark's alternating
            // map(k,v…)) so the LATER two-arg MAP(list,list) rewrite
            // can never mistake brace output for the reference's
            // list-pair constructor (r17 review finding)
            val body =
              if (isMap)
                s"map_from_arrays(array(${pairs.map(_._1).mkString(", ")}), " +
                  s"array(${pairs.map(_._2).mkString(", ")}))"
              else s"named_struct(${
                pairs.map(p => s"${p._1}, ${p._2}").mkString(", ")})"
            val from = if (isMap) toks(k - 1).start else t.start
            q = q.substring(0, from) + body + q.substring(toks(close).end)
            changed = true
          }
        } else if (t.kind == SqlLex.Ident &&
          (t.lower == "struct_pack" || t.lower == "struct_insert") &&
          k + 1 < toks.length && toks(k + 1).kind == SqlLex.LParen) {
          var depth = 0
          var j = k + 1
          var close = -1
          while (close < 0 && j < toks.length) {
            if (toks(j).kind == SqlLex.LParen) depth += 1
            else if (toks(j).kind == SqlLex.RParen) {
              depth -= 1; if (depth == 0) close = j
            }
            j += 1
          }
          if (close > 0) {
            val inner = q.substring(toks(k + 1).end, toks(close).start)
            val conv = splitTopLevel(inner).map { arg =>
              val i = arg.indexOf(":=")
              if (i > 0) s"'${arg.substring(0, i).trim}', ${arg.substring(i + 2).trim}"
              else if (t.lower == "struct_insert") arg.trim // the base struct
              else throw new IllegalArgumentException(
                "struct_pack expects name := value")
            }
            val fn = if (t.lower == "struct_pack") "named_struct"
              else "duck_struct_insert"
            q = q.substring(0, t.start) + fn + "(" +
              conv.mkString(", ") + ")" + q.substring(toks(close).end)
            changed = true
          }
        }
        k += 1
      }
    }
    q
  }

  /** duck bracket subscripts (r15 battery tranche 2 — the probe found
    * the reference's indexing is 1-BASED with NULL at 0/out-of-range
    * while Spark's `[]` is 0-based, a silently-shifted-value class):
    * `base[i]` → duck_idx(base, i) and `base[a:b]` (1-based inclusive,
    * negative-from-end, open bounds) → duck_slice(base, a, b). Runs
    * after rewriteListLiterals, so remaining `[` after a value token
    * are genuine subscripts. */
  private[graft] def rewriteBracketOps(q0: String): String = {
    val castOnly = Set("::")
    var q = q0
    var changed = true
    while (changed) {
      changed = false
      val toks = SqlLex.tokenize(q)
      var k = 1
      while (!changed && k < toks.length) {
        val t = toks(k)
        val prev = toks(k - 1)
        val indexing = t.kind == SqlLex.Punct && t.lower == "[" &&
          (prev.kind == SqlLex.Str || prev.kind == SqlLex.QIdent ||
            prev.kind == SqlLex.RParen ||
            (prev.kind == SqlLex.Punct && prev.lower == "]") ||
            (prev.kind == SqlLex.Ident && !bracketLiteralWords(prev.lower)))
        if (indexing) {
          var depth = 0
          var j = k
          var close = -1
          var colon = -1
          while (close < 0 && j < toks.length) {
            val w = toks(j)
            if (w.kind == SqlLex.Punct && w.lower == "[") depth += 1
            else if (w.kind == SqlLex.Punct && w.lower == "]") {
              depth -= 1; if (depth == 0) close = j
            } else if (depth == 1 && w.kind == SqlLex.Punct && w.lower == ":")
              colon = j
            else if (w.kind == SqlLex.LParen) {
              var d2 = 1; j += 1
              while (j < toks.length && d2 > 0) {
                if (toks(j).kind == SqlLex.LParen) d2 += 1
                else if (toks(j).kind == SqlLex.RParen) d2 -= 1
                if (d2 > 0) j += 1
              }
            }
            j += 1
          }
          val bs = SqlLex.operandStart(toks, k - 1, castOnly)
          // empty brackets are TYPE syntax (INTEGER[]), not a subscript
          if (close > k + 1 && bs >= 0) {
            val base = q.substring(toks(bs).start, prev.end)
            val call =
              if (colon > 0) {
                val s = q.substring(t.end, toks(colon).start).trim
                val e = q.substring(toks(colon).end, toks(close).start).trim
                val sArg = if (s.isEmpty) "CAST(NULL AS INT)" else s
                val eArg = if (e.isEmpty) "CAST(NULL AS INT)" else e
                s"duck_slice($base, $sArg, $eArg)"
              } else {
                val i = q.substring(t.end, toks(close).start).trim
                s"duck_idx($base, $i)"
              }
            q = q.substring(0, toks(bs).start) + call + q.substring(toks(close).end)
            changed = true
          }
        }
        k += 1
      }
    }
    q
  }

  /** C-style escape strings `e'…'` (reference/Postgres syntax; probed:
    * e'a\nb' is a two-line string) → plain literals with the escapes
    * decoded. */
  private[graft] def rewriteEStrings(q0: String): String = {
    val toks = SqlLex.tokenize(q0)
    val subs = scala.collection.mutable.ArrayBuffer.empty[(Int, Int, String)]
    var k = 0
    while (k + 1 < toks.length) {
      val t = toks(k)
      val s = toks(k + 1)
      if (t.kind == SqlLex.Ident && t.lower == "e" && s.kind == SqlLex.Str &&
        t.end == s.start) {
        val raw = q0.substring(s.start + 1, s.end - 1)
        val out = new StringBuilder
        var i = 0
        // escape-produced bytes must be ASCII and non-zero on the
        // reference (probed: e'\xff', e'\0', e'é' are all parser
        // errors; only 0x01–0x7F results survive UTF-8 validation)
        def appendCode(v: Int, form: String): Unit =
          if (v >= 1 && v <= 0x7f) out.append(v.toChar)
          else throw new IllegalArgumentException(
            s"invalid e-string escape $form: byte value $v is not valid here")
        def isHex(c: Char): Boolean =
          (c >= '0' && c <= '9') || (c >= 'a' && c <= 'f') || (c >= 'A' && c <= 'F')
        while (i < raw.length) {
          val c = raw.charAt(i)
          if (c == '\\' && i + 1 < raw.length) {
            raw.charAt(i + 1) match {
              case 'n' => out.append('\n'); i += 2
              case 't' => out.append('\t'); i += 2
              case 'r' => out.append('\r'); i += 2
              case 'b' => out.append('\b'); i += 2
              case 'f' => out.append('\f'); i += 2
              case '\\' => out.append('\\'); i += 2
              case '\'' => out.append('\''); i += 2
              case 'x' =>
                // \x + 1-2 hex digits (probed: e'\x41'='A', e'\x4.' =
                // 0x04 then '.', bare e'\x'='x')
                var j = i + 2
                while (j < raw.length && j < i + 4 && isHex(raw.charAt(j))) j += 1
                if (j == i + 2) { out.append('x'); i += 2 }
                else {
                  appendCode(Integer.parseInt(raw.substring(i + 2, j), 16), "\\x")
                  i = j
                }
              case 'u' =>
                // \u takes EXACTLY 4 hex digits (probed: e'\u004' is
                // "invalid Unicode escape"); surrogates and non-ASCII
                // codepoints are errors on the reference
                val j = i + 2
                if (j + 4 > raw.length || !raw.substring(j, j + 4).forall(isHex))
                  throw new IllegalArgumentException("invalid Unicode escape")
                val v = Integer.parseInt(raw.substring(j, j + 4), 16)
                if (v >= 0xd800 && v <= 0xdfff) throw new IllegalArgumentException(
                  "invalid Unicode surrogate pair")
                appendCode(v, "\\u")
                i = j + 4
              case 'U' =>
                // 8-digit \U escapes error on the reference for every
                // probed codepoint (incl. \U00000041) — named error
                val j = i + 2
                if (j + 8 > raw.length || !raw.substring(j, j + 8).forall(isHex))
                  throw new IllegalArgumentException("invalid Unicode escape")
                throw new IllegalArgumentException(
                  "invalid e-string escape \\U: 8-digit Unicode escapes are not supported here")
              case d if d >= '0' && d <= '7' =>
                // octal: 1-3 digits (probed: e'\101'='A', e'\479' =
                // 0x27 then '9')
                var j = i + 1
                while (j < raw.length && j < i + 4 &&
                  raw.charAt(j) >= '0' && raw.charAt(j) <= '7') j += 1
                appendCode(Integer.parseInt(raw.substring(i + 1, j), 8), "\\octal")
                i = j
              case other => out.append(other); i += 2
            }
          } else { out.append(c); i += 1 }
        }
        subs += ((t.start, s.end, "'" + out.toString.replace("'", "''") + "'"))
        k += 1
      }
      k += 1
    }
    if (subs.isEmpty) q0
    else {
      val sb = new StringBuilder
      var last = 0
      subs.foreach { case (a, b, rep) =>
        sb.append(q0.substring(last, a)).append(rep); last = b
      }
      sb.append(q0.substring(last)).toString
    }
  }

  /** Dollar-quoted strings `$tag$…$tag$` (reference/Postgres) → plain
    * quoted literals. Raw text scan BEFORE tokenization (the contents
    * may not lex), skipping `$` inside normal string literals. */
  private[graft] def convertDollarQuotes(sql: String): String = {
    val sb = new StringBuilder
    var i = 0
    var inStr = false
    val n = sql.length
    while (i < n) {
      val c = sql.charAt(i)
      if (inStr) { sb.append(c); if (c == '\'') inStr = false; i += 1 }
      else if (c == '\'') { sb.append(c); inStr = true; i += 1 }
      else if (c == '$') {
        var j = i + 1
        while (j < n && (sql.charAt(j).isLetterOrDigit || sql.charAt(j) == '_')) j += 1
        if (j < n && sql.charAt(j) == '$' && !(j == i + 1 && i + 1 < n &&
          sql.charAt(i + 1).isDigit)) {
          val tag = sql.substring(i, j + 1)
          val end = sql.indexOf(tag, j + 1)
          if (end >= 0) {
            val body = sql.substring(j + 1, end)
            sb.append('\'').append(body.replace("'", "''")).append('\'')
            i = end + tag.length
          } else { sb.append(c); i += 1 }
        } else { sb.append(c); i += 1 }
      } else { sb.append(c); i += 1 }
    }
    sb.toString
  }

  /** `BLOB '<text>'` literals (reference blob literal with \xHH byte
    * escapes) → `unhex('<hex>')` computed at rewrite time (r16 —
    * Spark has no BLOB typed literal). */
  private[graft] def rewriteBlobLiterals(q0: String): String = {
    val toks = SqlLex.tokenize(q0)
    val subs = scala.collection.mutable.ArrayBuffer.empty[(Int, Int, String)]
    var k = 0
    while (k + 1 < toks.length) {
      val t = toks(k)
      val s = toks(k + 1)
      if (t.kind == SqlLex.Ident && t.lower == "blob" && s.kind == SqlLex.Str &&
        (k == 0 || !(toks(k - 1).kind == SqlLex.Punct &&
          (toks(k - 1).lower == "." || toks(k - 1).lower == "::")))) {
        val raw = q0.substring(s.start + 1, s.end - 1).replace("''", "'")
        val bytes = scala.collection.mutable.ArrayBuffer.empty[Byte]
        var i = 0
        while (i < raw.length) {
          if (raw.charAt(i) == '\\' && i + 3 < raw.length &&
            (raw.charAt(i + 1) == 'x' || raw.charAt(i + 1) == 'X')) {
            bytes += Integer.parseInt(raw.substring(i + 2, i + 4), 16).toByte
            i += 4
          } else {
            bytes ++= raw.substring(i, i + 1).getBytes("UTF-8")
            i += 1
          }
        }
        val hex = bytes.map("%02X".format(_)).mkString
        subs += ((t.start, s.end, s"unhex('$hex')"))
        k += 1
      }
      k += 1
    }
    if (subs.isEmpty) q0
    else {
      val sb = new StringBuilder
      var last = 0
      subs.foreach { case (a, b, rep) =>
        sb.append(q0.substring(last, a)).append(rep); last = b
      }
      sb.append(q0.substring(last)).toString
    }
  }

  /** `TIME 'HH:MM:SS[.f]'` literals → the engine's documented TIME
    * encoding (LongType micros since midnight — TypeHelpers; the
    * reference's dtime_t, duckdb.hpp:914). */
  private[graft] def rewriteTimeLiterals(q0: String): String = {
    val toks = SqlLex.tokenize(q0)
    val subs = scala.collection.mutable.ArrayBuffer.empty[(Int, Int, String)]
    var k = 0
    while (k + 1 < toks.length) {
      val t = toks(k)
      val s = toks(k + 1)
      if (t.kind == SqlLex.Ident && t.lower == "time" && s.kind == SqlLex.Str &&
        // not TIME_TZ / not a column named time compared to a string:
        // the literal form is exactly TIME '<h:m:s>'
        (k == 0 || !(toks(k - 1).kind == SqlLex.Punct &&
          (toks(k - 1).lower == "." || toks(k - 1).lower == "::")))) {
        val raw = q0.substring(s.start + 1, s.end - 1)
        val m = """(\d{1,2}):(\d{2})(?::(\d{2})(?:\.(\d{1,6}))?)?""".r
        raw match {
          case m(h, mi, se, fr) =>
            val frac = Option(fr).map(f => (f + "0" * (6 - f.length)).toLong)
              .getOrElse(0L)
            val us = h.toLong * 3600000000L + mi.toLong * 60000000L +
              Option(se).map(_.toLong * 1000000L).getOrElse(0L) + frac
            subs += ((t.start, s.end, s"CAST($us AS BIGINT)"))
            k += 1
          case _ => ()
        }
      }
      k += 1
    }
    if (subs.isEmpty) q0
    else {
      val sb = new StringBuilder
      var last = 0
      subs.foreach { case (a, b, rep) =>
        sb.append(q0.substring(last, a)).append(rep); last = b
      }
      sb.append(q0.substring(last)).toString
    }
  }

  /** Mixed INTERVAL string literals (`INTERVAL '1 year 2 months 3
    * days'`) → make_interval(…): Spark's ANSI intervals cannot mix
    * year-month and day-time fields in one literal, the reference can
    * (probed). Single-class literals stay native. */
  private[graft] def rewriteMixedIntervals(q0: String): String = {
    val ymU = Set("year", "years", "month", "months", "quarter", "quarters")
    val dtU = Set("week", "weeks", "day", "days", "hour", "hours", "minute",
      "minutes", "second", "seconds", "millisecond", "milliseconds",
      "microsecond", "microseconds")
    val toks = SqlLex.tokenize(q0)
    val subs = scala.collection.mutable.ArrayBuffer.empty[(Int, Int, String)]
    var k = 0
    while (k + 1 < toks.length) {
      val t = toks(k)
      val s = toks(k + 1)
      if (t.kind == SqlLex.Ident && t.lower == "interval" && s.kind == SqlLex.Str) {
        val raw = q0.substring(s.start + 1, s.end - 1).trim.toLowerCase
        val parts = raw.split("\\s+").toSeq
        if (parts.length >= 4 && parts.length % 2 == 0 &&
          parts.grouped(2).forall { case Seq(n, u) =>
            n.matches("-?\\d+") && (ymU(u) || dtU(u)) }) {
          val pairs = parts.grouped(2).map { case Seq(n, u) => (u, n.toLong) }.toSeq
          val hasYm = pairs.exists(p => ymU(p._1))
          val hasDt = pairs.exists(p => dtU(p._1))
          if (hasYm && hasDt) {
            def tot(us: Set[String], scale: String => Long): Long =
              pairs.filter(p => us(p._1)).map(p => p._2 * scale(p._1)).sum
            val y = tot(Set("year", "years"), _ => 1L)
            val mo = tot(Set("month", "months"), _ => 1L) +
              tot(Set("quarter", "quarters"), _ => 3L)
            val w = tot(Set("week", "weeks"), _ => 1L)
            val d = tot(Set("day", "days"), _ => 1L)
            val h = tot(Set("hour", "hours"), _ => 1L)
            val mi = tot(Set("minute", "minutes"), _ => 1L)
            val se = tot(Set("second", "seconds"), _ => 1L)
            subs += ((t.start, s.end,
              s"make_interval($y, $mo, $w, $d, $h, $mi, $se)"))
            k += 1
          }
        }
      }
      k += 1
    }
    if (subs.isEmpty) q0
    else {
      val sb = new StringBuilder
      var last = 0
      subs.foreach { case (a, b, rep) =>
        sb.append(q0.substring(last, a)).append(rep); last = b
      }
      sb.append(q0.substring(last)).toString
    }
  }

  /** SQL-surface call renames to the duck_-prefixed registrations
    * (r15): the reference's raise-on-domain math (sqrt/ln/log2/log10/
    * asin/acos), its LOG10-meaning 1-arg log(), numeric 1-arg trunc(),
    * TINYINT sign(), HUGEINT factorial(), NULL-on-zero mod(), and
    * DOUBLE-typed avg()/mean() all carry semantics Spark's same-named
    * functions don't — and in Spark 4 a registry override would ALSO
    * capture the API's functions.* resolution (functions.log resolves
    * to "ln"), silently re-typing every operator in the engine. The
    * rename keeps the reference semantics strictly on the dialect
    * surface. Only bare (non-dotted) call positions rename. */
  private val fnRenames = Map(
    "sqrt" -> "duck_sqrt", "ln" -> "duck_ln", "log10" -> "duck_log10",
    "log2" -> "duck_log2", "asin" -> "duck_asin", "acos" -> "duck_acos",
    "log" -> "duck_log", "trunc" -> "duck_trunc", "sign" -> "duck_sign",
    "factorial" -> "duck_factorial", "mod" -> "duck_mod",
    "avg" -> "duck_avg", "mean" -> "duck_avg",
    // r15 tranche 2: null-skipping stringly concat, substr 0/negative-
    // length edges (substring's FROM…FOR form is guarded below)
    "concat" -> "duck_concat",
    "substr" -> "duck_substr", "substring" -> "duck_substr",
    // r15 tranche 3 (BATTERY3_r15.json): same-named Spark functions
    // with silently DIFFERENT semantics — trim family's swapped
    // (trimStr, srcStr) argument order, left/right negative counts,
    // regexp_extract's default group 1 (reference: 0), regexp_replace
    // replacing ALL (reference: FIRST unless 'g'), split's regex
    // delimiter (reference: literal)
    "trim" -> "duck_trim", "ltrim" -> "duck_ltrim", "rtrim" -> "duck_rtrim",
    "left" -> "duck_left", "right" -> "duck_right",
    "regexp_extract" -> "duck_regexp_extract",
    "regexp_extract_all" -> "duck_regexp_extract_all",
    "regexp_replace" -> "duck_regexp_replace",
    "split" -> "duck_split",
    // r15 tranche 4 (BATTERY4_r15.json): more same-named-but-different
    // semantics — Spark's chr truncates codepoints to a byte,
    // dayname/monthname are short names, skewness/kurtosis are
    // POPULATION statistics (the reference's are sample),
    // date_part/date_diff/date_sub/date_add lack the reference's
    // fields/arities, element_at on maps returns the scalar (the
    // reference wraps a list, like subscripts)
    "chr" -> "duck_chr", "char" -> "duck_chr",
    "dayname" -> "duck_dayname", "monthname" -> "duck_monthname",
    "skewness" -> "duck_skewness", "kurtosis" -> "duck_kurtosis",
    "date_part" -> "duck_date_part", "datepart" -> "duck_date_part",
    "date_diff" -> "duck_date_diff", "datediff" -> "duck_date_diff",
    "date_sub" -> "duck_date_sub", "date_add" -> "duck_date_add",
    "dateadd" -> "duck_date_add",
    "element_at" -> "duck_idx",
    // r16 tranche 5: reference type names (Spark's typeof renders its
    // own lowercase names — silent text divergence)
    "typeof" -> "duck_typeof",
    // r16 tranche 6 (BATTERY6_r16.json): same-named-but-different —
    // dayofweek/weekday are Sunday=0 on the reference (Spark: 1/Mon-0),
    // bit_count popcounts at the input WIDTH, date_trunc supports
    // decade/century/millennium and returns DATE for day-or-coarser
    // units, printf carries C numeric conversions, age is the symbolic
    // calendar decomposition
    "dayofweek" -> "duck_dayofweek", "weekday" -> "duck_dayofweek",
    "bit_count" -> "duck_bit_count",
    "date_trunc" -> "duck_date_trunc", "datetrunc" -> "duck_date_trunc",
    "printf" -> "duck_printf")

  private[graft] def rewriteFnNames(q0: String): String = {
    val toks = SqlLex.tokenize(q0)
    val subs = scala.collection.mutable.ArrayBuffer.empty[(SqlLex.Tok, String)]
    var i = 0
    while (i < toks.length) {
      val t = toks(i)
      if (t.kind == SqlLex.Ident && fnRenames.contains(t.lower) &&
        i + 1 < toks.length && toks(i + 1).kind == SqlLex.LParen &&
        !(i > 0 && toks(i - 1).kind == SqlLex.Punct && toks(i - 1).lower == ".")) {
        // cast-TARGET position: `CAST(x AS CHAR(10))` / `x::char(10)`
        // names a TYPE, not a call — a rename makes a parse error
        val castTarget = i > 0 && {
          val p = toks(i - 1)
          (p.kind == SqlLex.Ident && p.lower == "as") ||
            (p.kind == SqlLex.Punct && p.lower == "::")
        }
        // `substring(x FROM a FOR b)` and `trim(BOTH c FROM s)` are
        // parser-special syntax on the bare name — a renamed call
        // would not parse; skip when the call carries a depth-1 FROM
        // or opens with a LEADING/TRAILING/BOTH specifier
        val fromFamily = t.lower == "substring" || t.lower == "substr" ||
          t.lower == "trim" || t.lower == "ltrim" || t.lower == "rtrim"
        val skipFromForm = fromFamily && {
          var d = 0; var j = i + 1; var sawFrom = false; var stop = false
          while (!stop && j < toks.length) {
            val w = toks(j)
            if (w.kind == SqlLex.LParen) { d += 1
              if (d == 1 && j == i + 1 && j + 1 < toks.length &&
                toks(j + 1).kind == SqlLex.Ident &&
                Set("leading", "trailing", "both")(toks(j + 1).lower)) {
                sawFrom = true; stop = true
              }
            }
            else if (w.kind == SqlLex.RParen) { d -= 1; if (d == 0) stop = true }
            else if (d == 1 && w.kind == SqlLex.Ident && w.lower == "from")
              sawFrom = true
            j += 1
          }
          sawFrom
        }
        if (!castTarget && !skipFromForm) subs += ((t, fnRenames(t.lower)))
      }
      i += 1
    }
    if (subs.isEmpty) q0
    else {
      val sb = new StringBuilder
      var last = 0
      subs.foreach { case (t, name) =>
        sb.append(q0.substring(last, t.start)).append(name)
        last = t.end
      }
      sb.append(q0.substring(last)).toString
    }
  }

  /** Window frame EXCLUDE clauses (r15 tranche 3): `EXCLUDE NO
    * OTHERS` is the default — stripped; the active exclusions
    * (CURRENT ROW / GROUP / TIES) have no Spark frame analog and raise
    * a NAMED error instead of the parse error. Detection: EXCLUDE
    * following a frame-bound keyword region inside parens (the star
    * modifier `* EXCLUDE (…)` has a following LParen and is skipped). */
  /** Window-edge parity (r16 battery tranche 5; reference segment-tree
    * window executor, `duckdb-3.cpp:10800-12291`). Four reference-valid
    * shapes that are Spark ANALYSIS ERRORS get structural rewrites:
    *
    *  1. `agg(x) FILTER (WHERE c) OVER …` → `agg(CASE WHEN c THEN x
    *     END) OVER …` (`count(*)` counts a CASE-guarded 1) — aggregates
    *     skip NULLs, so the guard reproduces the filter exactly;
    *     Spark's window operator rejects filter predicates outright.
    *  2. empty literal frames (`ROWS BETWEEN 2 FOLLOWING AND 1
    *     FOLLOWING`) — NULL on the reference (0 for count) — the call
    *     wraps in a dead-branch CASE over a valid frame, which keeps
    *     the aggregate's exact result TYPE without executing it.
    *  3. `nth_value(x, k)` with literal k ≤ 0 → NULL (same dead-branch
    *     device; Spark requires a positive offset).
    *  4. ranking/offset functions over a spec with no ORDER BY —
    *     arbitrary order on the reference — gain `ORDER BY 1`: a
    *     constant key ties every row, which is the reference's
    *     any-order contract.
    */
  private[graft] def rewriteWindowEdges(q0: String): String = {
    val orderReq = Set("row_number", "rank", "dense_rank", "percent_rank",
      "cume_dist", "ntile", "lag", "lead")
    var q = q0
    var changed = true
    while (changed) {
      changed = false
      val toks = SqlLex.tokenize(q)
      def closeOf(open: Int): Int = {
        var d = 0; var j = open
        while (j < toks.length) {
          if (toks(j).kind == SqlLex.LParen) d += 1
          else if (toks(j).kind == SqlLex.RParen) { d -= 1; if (d == 0) return j }
          j += 1
        }
        -1
      }
      def openOf(close: Int): Int = {
        var d = 0; var j = close
        while (j >= 0) {
          if (toks(j).kind == SqlLex.RParen) d += 1
          else if (toks(j).kind == SqlLex.LParen) { d -= 1; if (d == 0) return j }
          j -= 1
        }
        -1
      }
      // the agg call directly before token i: `fn ( args )` with its
      // closing paren at i-1; returns (fnIdx, argsOpen, argsClose)
      def callBefore(i: Int): Option[(Int, Int, Int)] =
        if (i >= 1 && toks(i - 1).kind == SqlLex.RParen) {
          val ao = openOf(i - 1)
          if (ao >= 1 && toks(ao - 1).kind == SqlLex.Ident)
            Some((ao - 1, ao, i - 1))
          else None
        } else None

      var k = 0
      while (!changed && k < toks.length) {
        val t = toks(k)

        // 1. FILTER (WHERE c) immediately before OVER
        if (t.kind == SqlLex.Ident && t.lower == "filter" &&
          k + 1 < toks.length && toks(k + 1).kind == SqlLex.LParen) {
          val fc = closeOf(k + 1)
          val isWin = fc > 0 && fc + 1 < toks.length &&
            toks(fc + 1).kind == SqlLex.Ident && toks(fc + 1).lower == "over"
          callBefore(k) match {
            case Some((fi, ao, ac)) if isWin =>
              val fn = toks(fi).lower
              // rewriteFilterWhere has already normalized to WHERE form
              val condStart =
                if (toks(k + 2).kind == SqlLex.Ident &&
                  toks(k + 2).lower == "where") k + 3 else k + 2
              val cond = q.substring(toks(condStart).start, toks(fc).start).trim
              val args = q.substring(toks(ao).end, toks(ac).start).trim
              val newCall =
                if (fn == "count" && args == "*")
                  s"count(CASE WHEN $cond THEN 1 END)"
                else {
                  val parts = splitTopLevel(args).map(_.trim)
                  val first = parts.head
                  val (pre, core) =
                    if (first.toUpperCase.startsWith("DISTINCT "))
                      ("DISTINCT ", first.substring(9))
                    else ("", first)
                  q.substring(toks(fi).start, toks(ao).end) +
                    ((s"${pre}CASE WHEN $cond THEN $core END") +: parts.tail)
                      .mkString(", ") + ")"
                }
              q = q.substring(0, toks(fi).start) + newCall +
                q.substring(toks(fc).end)
              changed = true
            case _ => ()
          }
        }

        // 3. nth_value with a nonpositive literal offset
        if (!changed && t.kind == SqlLex.Ident && t.lower == "nth_value" &&
          k + 1 < toks.length && toks(k + 1).kind == SqlLex.LParen) {
          val ac = closeOf(k + 1)
          if (ac > 0 && ac + 1 < toks.length &&
            toks(ac + 1).kind == SqlLex.Ident && toks(ac + 1).lower == "over") {
            val parts = splitTopLevel(
              q.substring(toks(k + 1).end, toks(ac).start)).map(_.trim)
            val nonPos = parts.length == 2 &&
              parts(1).matches("-?\\d+") && parts(1).toLong <= 0
            if (nonPos) {
              val (overEnd, overText) =
                if (ac + 2 < toks.length && toks(ac + 2).kind == SqlLex.LParen) {
                  val oc = closeOf(ac + 2)
                  (oc, q.substring(toks(ac + 2).start, toks(oc).end))
                } else (ac + 2, q.substring(toks(ac + 2).start, toks(ac + 2).end))
              q = q.substring(0, t.start) +
                s"(CASE WHEN 1=0 THEN nth_value(${parts.head}, 1) " +
                s"OVER $overText END)" + q.substring(toks(overEnd).end)
              changed = true
            }
          }
        }

        // 2. empty literal frame / 4. missing ORDER BY on ranking fns
        if (!changed && t.kind == SqlLex.Ident && t.lower == "over" &&
          k + 1 < toks.length && toks(k + 1).kind == SqlLex.LParen) {
          val oc = closeOf(k + 1)
          if (oc > 0) {
            // depth-1 scan of the spec interior
            var d = 0
            var frameIdx = -1
            var hasOrder = false
            var j = k + 1
            while (j < oc) {
              toks(j).kind match {
                case SqlLex.LParen => d += 1
                case SqlLex.RParen => d -= 1
                case SqlLex.Ident if d == 1 =>
                  val w = toks(j).lower
                  if (w == "order") hasOrder = true
                  else if ((w == "rows" || w == "range") && frameIdx < 0)
                    frameIdx = j
                case _ => ()
              }
              j += 1
            }
            // literal frame bounds: Some(v) finite, None non-literal
            def bound(s: Int): (Option[Long], Int) = {
              if (s >= oc) (None, s)
              else if (toks(s).kind == SqlLex.Ident &&
                toks(s).lower == "unbounded") (None, s + 2)
              else if (toks(s).kind == SqlLex.Ident &&
                toks(s).lower == "current") (Some(0L), s + 2)
              else if (toks(s).kind == SqlLex.Num && s + 1 < oc &&
                toks(s + 1).kind == SqlLex.Ident &&
                (toks(s + 1).lower == "preceding" ||
                  toks(s + 1).lower == "following")) {
                val raw = q.substring(toks(s).start, toks(s).end)
                val v = try Some(raw.toLong) catch { case _: Exception => None }
                (v.map(x => if (toks(s + 1).lower == "preceding") -x else x),
                  s + 2)
              } else (None, s + 2)
            }
            val emptyFrame = frameIdx > 0 && frameIdx + 1 < oc &&
              toks(frameIdx + 1).kind == SqlLex.Ident &&
              toks(frameIdx + 1).lower == "between" && {
                val (lo, after) = bound(frameIdx + 2)
                val andOk = after < oc && toks(after).kind == SqlLex.Ident &&
                  toks(after).lower == "and"
                val (hi, _) = if (andOk) bound(after + 1) else (None, 0)
                lo.isDefined && hi.isDefined && lo.get > hi.get
              }
            if (emptyFrame) {
              callBefore(k) match {
                case Some((fi, _, ac)) =>
                  val fnCall = q.substring(toks(fi).start, toks(ac).end)
                  val specPrefix = q.substring(toks(k + 1).end,
                    toks(frameIdx).start)
                  val tail = if (toks(fi).lower == "count") " ELSE 0" else ""
                  q = q.substring(0, toks(fi).start) +
                    s"(CASE WHEN 1=0 THEN $fnCall OVER ($specPrefix " +
                    s"ROWS BETWEEN CURRENT ROW AND CURRENT ROW)$tail END)" +
                    q.substring(toks(oc).end)
                  changed = true
                case None => ()
              }
            } else if (!hasOrder) {
              callBefore(k) match {
                case Some((fi, _, _)) if orderReq(toks(fi).lower) =>
                  val at = if (frameIdx > 0) toks(frameIdx).start
                    else toks(oc).start
                  q = q.substring(0, at) + " ORDER BY 1 " + q.substring(at)
                  changed = true
                case _ => ()
              }
            }
          }
        }
        k += 1
      }
    }
    q
  }

  private[graft] def rewriteFrameExclude(q0: String): String = {
    val toks = SqlLex.tokenize(q0)
    val subs = scala.collection.mutable.ArrayBuffer.empty[(Int, Int)]
    var k = 1
    while (k < toks.length) {
      val t = toks(k)
      if (t.kind == SqlLex.Ident && t.lower == "exclude" &&
        k + 1 < toks.length && toks(k + 1).kind != SqlLex.LParen &&
        (toks(k - 1).kind == SqlLex.Ident &&
          Set("row", "following", "preceding")(toks(k - 1).lower))) {
        val rest = toks.drop(k + 1).take(2).map(_.lower)
        if (rest.startsWith(Seq("no", "others")))
          subs += ((t.start, toks(k + 2).end))
        else throw new UnsupportedOperationException(
          "unsupported DuckDB construct: window frame EXCLUDE " +
            rest.mkString(" ").toUpperCase +
            " (no Spark frame analog; rewrite the aggregate explicitly, " +
            "e.g. sum(x) OVER frame - x for EXCLUDE CURRENT ROW)")
      }
      k += 1
    }
    if (subs.isEmpty) q0
    else {
      val sb = new StringBuilder
      var last = 0
      subs.foreach { case (a, b) => sb.append(q0.substring(last, a)); last = b }
      sb.append(q0.substring(last)).toString
    }
  }

  /** JSON arrow operators (r15 tranche 3): `j -> 'key'` extracts JSON
    * text, `j ->> 'key'` extracts unquoted text (probed; keys accept
    * bare names or $-paths). The arrow is also the LAMBDA arrow, so
    * only forms a lambda can never take rewrite: the RIGHT side must
    * be a string literal and the LEFT operand must not be a bare
    * identifier or a paren group (lambda parameter shapes) — a
    * bare-ident json column uses json_extract() instead (documented). */
  private[graft] def rewriteJsonArrows(q0: String): String = {
    var q = q0
    var changed = true
    while (changed) {
      changed = false
      val toks = SqlLex.tokenize(q)
      var k = 1
      while (!changed && k + 1 < toks.length) {
        val t = toks(k)
        val isArrow = t.kind == SqlLex.Punct && t.lower == "-" &&
          toks(k + 1).kind == SqlLex.Punct && toks(k + 1).lower == ">" &&
          t.end == toks(k + 1).start
        if (isArrow) {
          val dbl = k + 2 < toks.length && toks(k + 2).kind == SqlLex.Punct &&
            toks(k + 2).lower == ">" && toks(k + 1).end == toks(k + 2).start
          val keyIdx = if (dbl) k + 3 else k + 2
          if (keyIdx < toks.length && toks(keyIdx).kind == SqlLex.Str) {
            val ls = SqlLex.operandStart(toks, k - 1, Set("::"))
            val bareIdent = ls == k - 1 && toks(ls).kind == SqlLex.Ident
            val parenGroup = ls >= 0 && toks(ls).kind == SqlLex.LParen &&
              toks(k - 1).kind == SqlLex.RParen &&
              // a CALL name(…) before the arrow is fine; a plain paren
              // group could be lambda params
              !(ls > 0 && (toks(ls - 1).kind == SqlLex.Ident ||
                toks(ls - 1).kind == SqlLex.QIdent))
            if (ls >= 0 && !bareIdent && !parenGroup) {
              val l = q.substring(toks(ls).start, toks(k - 1).end)
              val key = q.substring(toks(keyIdx).start, toks(keyIdx).end)
              val fn = if (dbl) "json_extract_string" else "json_extract"
              q = q.substring(0, toks(ls).start) + s"$fn($l, $key)" +
                q.substring(toks(keyIdx).end)
              changed = true
            }
          }
        }
        k += 1
      }
    }
    q
  }

  /** Quantified subquery comparisons (r15 grammar census — reference
    * AEXPR_OP_ANY / AEXPR_OP_ALL, probed): `x = ANY/SOME (sub)` →
    * `x IN (sub)`, `x <> ALL (sub)` → `x NOT IN (sub)`, other
    * operators → [NOT] EXISTS with a correlated comparison. Spark has
    * no quantified-comparison surface at all (parse error before).
    * Three-valued-logic caveat: a NULL in the subquery yields NULL on
    * the reference and false here in PROJECTION position — the same
    * documented class as IN-subquery (BATTERY2_r15.json). Only
    * subquery operands rewrite (group must start with SELECT/WITH/
    * VALUES); array forms stay errors. */
  private[graft] def rewriteQuantified(q0: String): String = {
    val cmp2 = Set("<=", ">=", "<>", "!=")
    var q = q0
    var changed = true
    while (changed) {
      changed = false
      val toks = SqlLex.tokenize(q)
      var k = 1
      while (!changed && k + 1 < toks.length) {
        val t = toks(k)
        if (t.kind == SqlLex.Ident &&
          (t.lower == "any" || t.lower == "some" || t.lower == "all") &&
          toks(k + 1).kind == SqlLex.LParen) {
          // the comparison operator directly before: one Punct or an
          // adjacent pair (<=, >=, <>, !=)
          // the lexer may emit two-char comparisons as one token or as
          // an adjacent pair — accept both
          val single = Set("=", "<", ">", "<>", "!=", "<=", ">=")
          var opStart = -1
          var opText = ""
          if (k >= 2 && toks(k - 1).kind == SqlLex.Punct &&
            toks(k - 2).kind == SqlLex.Punct &&
            toks(k - 2).end == toks(k - 1).start &&
            cmp2(toks(k - 2).lower + toks(k - 1).lower)) {
            opStart = k - 2; opText = toks(k - 2).lower + toks(k - 1).lower
          } else if (toks(k - 1).kind == SqlLex.Punct && single(toks(k - 1).lower)) {
            opStart = k - 1; opText = toks(k - 1).lower
          }
          // subquery group only
          val firstIn = if (k + 2 < toks.length) toks(k + 2) else toks(k + 1)
          val isSub = firstIn.kind == SqlLex.Ident &&
            Set("select", "with", "values")(firstIn.lower)
          if (opStart > 0 && isSub) {
            val ls = SqlLex.operandStart(toks, opStart - 1)
            var depth = 0
            var j = k + 1
            var close = -1
            while (close < 0 && j < toks.length) {
              if (toks(j).kind == SqlLex.LParen) depth += 1
              else if (toks(j).kind == SqlLex.RParen) {
                depth -= 1; if (depth == 0) close = j
              }
              j += 1
            }
            if (ls >= 0 && close > 0) {
              val l = q.substring(toks(ls).start, toks(opStart).start).trim
              val sub = q.substring(toks(k + 1).end, toks(close).start)
              val isAll = t.lower == "all"
              val rep =
                if (opText == "=" && !isAll) s"($l IN ($sub))"
                else if ((opText == "<>" || opText == "!=") && isAll)
                  s"($l NOT IN ($sub))"
                else if (!isAll)
                  s"(EXISTS (SELECT 1 FROM ($sub) __qany(__qv) WHERE ($l) $opText __qv))"
                else
                  // the `($l) IS NULL` disjunct covers a NULL left
                  // operand (probed r16: NULL > ALL (SELECT 2) is NULL
                  // — falsy in predicates — where the two-clause form
                  // returned TRUE and kept the row)
                  s"(NOT EXISTS (SELECT 1 FROM ($sub) __qall(__qv) " +
                    s"WHERE NOT (($l) $opText __qv) OR __qv IS NULL OR ($l) IS NULL))"
              q = q.substring(0, toks(ls).start) + rep + q.substring(toks(close).end)
              changed = true
            }
          }
        }
        k += 1
      }
    }
    q
  }

  /** Aggregate `FILTER (expr)` → `FILTER (WHERE expr)` (the reference
    * accepts the WHERE-less form — probed r15). Only after a closing
    * paren (an aggregate call); the filter() HOF never follows one. */
  private[graft] def rewriteFilterWhere(q0: String): String = {
    var q = q0
    var changed = true
    while (changed) {
      changed = false
      val toks = SqlLex.tokenize(q)
      var k = 1
      while (!changed && k + 1 < toks.length) {
        val t = toks(k)
        if (t.kind == SqlLex.Ident && t.lower == "filter" &&
          toks(k - 1).kind == SqlLex.RParen &&
          toks(k + 1).kind == SqlLex.LParen &&
          k + 2 < toks.length &&
          !(toks(k + 2).kind == SqlLex.Ident && toks(k + 2).lower == "where")) {
          q = q.substring(0, toks(k + 1).end) + "WHERE " +
            q.substring(toks(k + 1).end)
          changed = true
        }
        k += 1
      }
    }
    q
  }

  /** Append `NULLS LAST` to every sort key that carries no explicit
    * modifier (duck-probed r15: the reference defaults to NULLS LAST
    * in BOTH directions — `ORDER BY x LIMIT 2` over (1,NULL,2) returns
    * 1,2 and `row_number() OVER (ORDER BY x)` ranks NULL last — while
    * Spark's ASC default is NULLS FIRST, silently wrong whenever a
    * LIMIT, window, or DISTINCT ON consumes the order). DESC keys keep
    * Spark's matching NULLS LAST default; a bare `ORDER BY ALL` is
    * left untouched (Spark rejects a modifier there). */
  private[graft] def rewriteOrderByNulls(q0: String): String = {
    val toks = SqlLex.tokenize(q0)
    val enders = Set("limit", "offset", "rows", "range", "groups", "window",
      "union", "except", "intersect", "having", "qualify", "fetch")
    val ins = scala.collection.mutable.ArrayBuffer.empty[Int] // char positions
    var depth = 0
    var i = 0
    while (i < toks.length) {
      val t = toks(i)
      if (t.kind == SqlLex.LParen) depth += 1
      else if (t.kind == SqlLex.RParen) depth -= 1
      else if (t.kind == SqlLex.Ident && t.lower == "order" &&
        i + 1 < toks.length && toks(i + 1).kind == SqlLex.Ident &&
        toks(i + 1).lower == "by") {
        val d0 = depth
        var j = i + 2
        var d = depth
        var keyStart = j
        var keyEnd = -1
        var done = false
        def closeKey(endTok: Int): Unit = {
          keyEnd = endTok
          if (keyEnd >= keyStart) {
            val last = toks(keyEnd)
            val skip = (last.kind == SqlLex.Ident &&
              (last.lower == "first" || last.lower == "last" ||
                last.lower == "desc")) ||
              (keyEnd == keyStart && last.kind == SqlLex.Ident &&
                last.lower == "all")
            if (!skip) ins += last.end
          }
        }
        while (!done && j < toks.length) {
          val w = toks(j)
          if (w.kind == SqlLex.LParen) d += 1
          else if (w.kind == SqlLex.RParen) {
            d -= 1
            if (d < d0) { closeKey(j - 1); done = true }
          } else if (d == d0) {
            if (w.kind == SqlLex.Punct && (w.lower == "," || w.lower == ";")) {
              closeKey(j - 1)
              if (w.lower == ";") done = true else keyStart = j + 1
            } else if (w.kind == SqlLex.Ident && enders(w.lower)) {
              closeKey(j - 1); done = true
            }
          }
          j += 1
        }
        if (!done) closeKey(toks.length - 1)
        // continue the outer scan from the first key token so nested
        // ORDER BYs (a window inside a sort key) are visited too
      }
      i += 1
    }
    if (ins.isEmpty) q0
    else {
      val sb = new StringBuilder(q0)
      ins.sorted(Ordering[Int].reverse).foreach(p => sb.insert(p, " NULLS LAST"))
      sb.toString
    }
  }

  /** duck's in-call ordered aggregates (duck-probed r14b):
    *
    *   string_agg(x[, sep] ORDER BY k…)  — default sep ',' —
    *     → listagg(x, sep) WITHIN GROUP (ORDER BY k…)   (Spark 4)
    *   list(x ORDER BY k…) / array_agg(x ORDER BY k…)
    *     → transform(array_sort(array_agg(named_struct('o0',k0,…,'v',x)),
    *         (l,r) -> <comparator>), s -> s.v)
    *
    * The comparator honors per-key ASC/DESC and NULLS FIRST/LAST with
    * duck's default of NULLS LAST in BOTH directions (probed). Only
    * calls whose argument list carries a depth-0 ORDER BY rewrite;
    * plain `list(x)` / `string_agg(x, s)` keep their registered
    * mappings. */
  private[graft] def rewriteSortedAggs(q0: String): String = {
    var q = q0
    var changed = true
    while (changed) {
      changed = false
      val toks = SqlLex.tokenize(q)
      var k = 0
      while (!changed && k + 1 < toks.length) {
        val t = toks(k)
        val isName = t.kind == SqlLex.Ident &&
          Set("string_agg", "list", "array_agg")(t.lower) &&
          toks(k + 1).kind == SqlLex.LParen &&
          !(k > 0 && toks(k - 1).kind == SqlLex.Punct && toks(k - 1).lower == ".")
        if (isName) {
          var depth = 0
          var j = k + 1
          var close = -1
          while (close < 0 && j < toks.length) {
            toks(j).kind match {
              case SqlLex.LParen => depth += 1
              case SqlLex.RParen => depth -= 1; if (depth == 0) close = j
              case _ => ()
            }
            j += 1
          }
          if (close > 0) {
            val inner = q.substring(toks(k + 1).end, toks(close).start)
            val itoks = SqlLex.tokenize(inner)
            // depth-0 ORDER BY inside the argument list
            var oi = -1
            var d = 0
            var m = 0
            while (oi < 0 && m + 1 < itoks.length) {
              itoks(m).kind match {
                case SqlLex.LParen => d += 1
                case SqlLex.RParen => d -= 1
                case SqlLex.Ident if d == 0 && itoks(m).lower == "order" &&
                  itoks(m + 1).kind == SqlLex.Ident && itoks(m + 1).lower == "by" =>
                  oi = m
                case _ => ()
              }
              m += 1
            }
            if (oi >= 0) {
              val argsText = inner.substring(0, itoks(oi).start)
              val spec = inner.substring(itoks(oi + 1).end).trim
              val args = splitTopLevel(argsText).map(_.trim).filter(_.nonEmpty)
              val repl =
                if (t.lower == "string_agg") {
                  val sep = if (args.length > 1) args(1) else "','"
                  s"listagg(${args.head}, $sep) WITHIN GROUP (ORDER BY $spec)"
                } else {
                  // per-key (expr, desc, nullsFirst) with duck defaults
                  val keys = splitTopLevel(spec).map(_.trim).filter(_.nonEmpty)
                    .map { e =>
                      val et = SqlLex.tokenize(e)
                      var end = et.length
                      var desc = false
                      var nullsFirst = false
                      var sawNulls = false
                      var stop = false
                      while (!stop && end > 1 && et(end - 1).kind == SqlLex.Ident) {
                        et(end - 1).lower match {
                          case "desc" => desc = true; end -= 1
                          case "asc" => end -= 1
                          case "first" | "last" if end > 2 &&
                            et(end - 2).kind == SqlLex.Ident &&
                            et(end - 2).lower == "nulls" =>
                            sawNulls = true
                            nullsFirst = et(end - 1).lower == "first"
                            end -= 2
                          case _ => stop = true
                        }
                      }
                      val expr = e.substring(et.head.start, et(end - 1).end)
                      (expr, desc, if (sawNulls) nullsFirst else false)
                    }
                  val fields = keys.zipWithIndex
                    .map { case ((e, _, _), i) => s"'o$i', $e" }
                    .mkString(", ") + s", 'v', ${args.head}"
                  def cmp(i: Int): String =
                    if (i >= keys.length) "0"
                    else {
                      val (_, desc, nf) = keys(i)
                      val lt = if (desc) "1" else "-1"
                      val gt = if (desc) "-1" else "1"
                      val nl = if (nf) "-1" else "1" // null vs value
                      val nr = if (nf) "1" else "-1"
                      s"CASE WHEN l.o$i IS NULL AND r.o$i IS NULL THEN ${cmp(i + 1)} " +
                        s"WHEN l.o$i IS NULL THEN $nl WHEN r.o$i IS NULL THEN $nr " +
                        s"WHEN l.o$i < r.o$i THEN $lt WHEN l.o$i > r.o$i THEN $gt " +
                        s"ELSE ${cmp(i + 1)} END"
                    }
                  s"transform(array_sort(array_agg(named_struct($fields)), " +
                    s"(l, r) -> ${cmp(0)}), s -> s.v)"
                }
              q = q.substring(0, t.start) + repl + q.substring(toks(close).end)
              changed = true
            }
          }
        }
        k += 1
      }
    }
    q
  }

  /** duck scalar list aggregates (duck-probed r14b): `list_aggregate(e,
    * 'name'[, sep])` + the `list_aggr`/`list_sum`/`list_min`/`list_max`
    * /`list_avg` aliases. NULL elements are skipped (sum [1,NULL,3]=4,
    * count=2) and empty/all-null lists yield NULL for sum/avg (probed —
    * a bare reduce would give 0). Unsupported aggregate names are left
    * in place and fail with the unresolved-routine error. The list
    * expression is spliced more than once for sum/avg/count — fine for
    * SQL expressions (deterministic by construction on these paths). */
  private[graft] def rewriteListFns(q0: String): String = {
    val names = Set("list_aggregate", "list_aggr", "list_sum", "list_min",
      "list_max", "list_avg")
    var q = q0
    var changed = true
    while (changed) {
      changed = false
      val toks = SqlLex.tokenize(q)
      var k = 0
      while (!changed && k + 1 < toks.length) {
        val t = toks(k)
        if (t.kind == SqlLex.Ident && names(t.lower) &&
          toks(k + 1).kind == SqlLex.LParen &&
          !(k > 0 && toks(k - 1).kind == SqlLex.Punct && toks(k - 1).lower == ".")) {
          var depth = 0
          var j = k + 1
          var close = -1
          while (close < 0 && j < toks.length) {
            toks(j).kind match {
              case SqlLex.LParen => depth += 1
              case SqlLex.RParen => depth -= 1; if (depth == 0) close = j
              case _ => ()
            }
            j += 1
          }
          if (close > 0) {
            val args = splitTopLevel(q.substring(toks(k + 1).end, toks(close).start))
              .map(_.trim).filter(_.nonEmpty)
            val call = t.lower match {
              case "list_aggregate" | "list_aggr" if args.length >= 2 &&
                args(1).startsWith("'") =>
                Some((args(1).stripPrefix("'").stripSuffix("'").toLowerCase,
                  args.head, args.drop(2)))
              case "list_aggregate" | "list_aggr" => None
              case other => Some((other.stripPrefix("list_"), args.head, args.tail))
            }
            val repl = call.flatMap { case (nm, e, extra) =>
              def nn = s"filter($e, x -> x IS NOT NULL)"
              nm match {
                case "sum" => Some(s"(CASE WHEN size($nn) = 0 THEN NULL " +
                  s"ELSE reduce($nn, 0, (a, x) -> a + x) END)")
                case "min" => Some(s"array_min($e)")
                case "max" => Some(s"array_max($e)")
                case "avg" | "mean" => Some(s"(CASE WHEN size($nn) = 0 THEN NULL " +
                  s"ELSE reduce($nn, CAST(0 AS DOUBLE), (a, x) -> a + x) / size($nn) END)")
                case "count" => Some(s"size($nn)")
                case "string_agg" =>
                  Some(s"array_join($e, ${extra.headOption.getOrElse("','")})")
                case _ => None
              }
            }
            repl.foreach { r =>
              q = q.substring(0, t.start) + r + q.substring(toks(close).end)
              changed = true
            }
          }
        }
        k += 1
      }
    }
    q
  }

  /** Comparison forms beyond the six binary operators (duck-probed
    * r14b, the gap the token-span rewrite inherited from the regex era):
    *
    *  - `x COLLATE C [NOT] BETWEEN a AND b` folds x, a, and b — probed:
    *    `'B' COLLATE NOCASE BETWEEN 'a' AND 'c'` is true (right-side
    *    bound annotations are a reference parse error, so only the
    *    first operand can carry one);
    *  - `x COLLATE C [NOT] IN (e1, …)` folds x and every element;
    *    an element's OWN annotation triggers the same fold (probed:
    *    `'B' IN ('b' COLLATE NOCASE, 'x')` is true), and elements with
    *    a DIFFERENT collation raise the reference's binder error
    *    ("Cannot combine types with different collation!");
    *  - `x COLLATE C IN (SELECT …)` IGNORES the annotation (probed:
    *    byte semantics — the subquery side never folds);
    *  - `x COLLATE C IS [NOT] DISTINCT FROM y` folds both sides;
    *  - LIKE / ILIKE / GLOB / SIMILAR TO and IS [NOT] NULL ignore the
    *    annotation on either side (probed: `'B' COLLATE NOCASE LIKE
    *    'b%'` is false — pattern matching is always byte-wise);
    *  - a simple-CASE operand or WHEN comparand folds the operand AND
    *    every WHEN comparand as one collated matching group (probed:
    *    `CASE 'B' COLLATE NOCASE WHEN 'b' THEN 1` hits).
    *
    * Returns the rewritten statement, or None when no form applies and
    * the caller's single-operand clause classification decides. Folded
    * spans may still contain the triggering COLLATE tokens — the next
    * pass drops them via the scalar-call rule (`lower(x COLLATE C)` →
    * `lower(x)`), which also bounds the rewrite loop. */
  private def collateCompareForms(q: String, toks: Vector[SqlLex.Tok],
      k: Int, s1: Int, coll: String): Option[String] = {
    import SqlLex._
    def fold(e: String): String =
      if (coll == "nocase") s"lower($e)" else s"strip_accents($e)"
    def tokAt(j: Int): Tok = if (j >= 0 && j < toks.length) toks(j) else null
    def id(j: Int): String = {
      val t = tokAt(j)
      if (t != null && t.kind == Ident) t.lower else ""
    }
    val rhs = q.substring(toks(s1).start, toks(k - 1).end)
    def drop: Option[String] =
      Some(q.substring(0, toks(k - 1).end) + q.substring(toks(k + 1).end))
    def mixedCheck(lo: Int, hi: Int): Unit = {
      var i = lo
      while (i <= hi) {
        if (toks(i).kind == Ident && toks(i).lower == "collate" &&
          i + 1 < toks.length && toks(i + 1).kind == Ident &&
          Set("nocase", "noaccent")(toks(i + 1).lower) &&
          toks(i + 1).lower != coll)
          throw new IllegalArgumentException(
            "graft: Cannot combine types with different collation! " +
              "(reference binder wording; collation registry duckdb-5.cpp:5156)")
        i += 1
      }
    }
    def matchRightIdx(open: Int): Int = {
      var depth = 0
      var m = open
      while (m < toks.length) {
        toks(m).kind match {
          case LParen => depth += 1
          case RParen => depth -= 1; if (depth == 0) return m
          case _ => ()
        }
        m += 1
      }
      -1
    }

    // ---- forms announced by the token AFTER the collation name ----
    val j = k + 2
    // quantified comparison (`= ANY/ALL/SOME (subquery)`): the
    // annotation is IGNORED, like the IN-subquery form (duck-probed:
    // `'B' COLLATE NOCASE = ANY (SELECT 'b')` is false — byte)
    if (tokAt(j) != null && toks(j).kind == Punct && cmpOps(toks(j).lower) &&
      Set("any", "all", "some")(id(j + 1)) &&
      tokAt(j + 2) != null && toks(j + 2).kind == LParen) return drop
    val neg = id(j) == "not"
    val j0 = if (neg) j + 1 else j
    id(j0) match {
      // rlike: SIMILAR TO has already been rewritten to anchored RLIKE
      // by the time this pass runs (rewriteCore order)
      case "like" | "ilike" | "glob" | "rlike" => return drop
      case "similar" if id(j0 + 1) == "to" => return drop
      case "between" =>
        val lowStart = j0 + 1
        val lowEnd = operandEnd(toks, lowStart)
        if (lowEnd >= 0 && id(lowEnd + 1) == "and") {
          val hiStart = lowEnd + 2
          val hiEnd = operandEnd(toks, hiStart)
          if (hiEnd >= 0) {
            mixedCheck(k + 2, hiEnd)
            val low = q.substring(toks(lowStart).start, toks(lowEnd).end)
            val hi = q.substring(toks(hiStart).start, toks(hiEnd).end)
            val kw = if (neg) "NOT BETWEEN" else "BETWEEN"
            return Some(q.substring(0, toks(s1).start) +
              s"${fold(rhs)} $kw ${fold(low)} AND ${fold(hi)}" +
              q.substring(toks(hiEnd).end))
          }
        }
      case "in" if tokAt(j0 + 1) != null && tokAt(j0 + 1).kind == LParen =>
        val close = matchRightIdx(j0 + 1)
        if (close > 0) {
          val h = tokAt(j0 + 2)
          val isSub = h != null && h.kind == Ident &&
            Set("select", "with", "values")(h.lower)
          if (isSub) return drop // probed: annotation ignored vs a subquery
          mixedCheck(j0 + 2, close - 1)
          val interior = q.substring(toks(j0 + 1).end, toks(close).start)
          val elems = splitTopLevel(interior).map(e => fold(e.trim))
          val kw = if (neg) "NOT IN" else "IN"
          return Some(q.substring(0, toks(s1).start) +
            s"${fold(rhs)} $kw (${elems.mkString(", ")})" +
            q.substring(toks(close).end))
        }
      case "is" if !neg =>
        if (id(j0 + 1) == "null" ||
          (id(j0 + 1) == "not" && id(j0 + 2) == "null")) return drop
        val dIdx =
          if (id(j0 + 1) == "distinct") j0 + 1
          else if (id(j0 + 1) == "not" && id(j0 + 2) == "distinct") j0 + 2
          else -1
        if (dIdx > 0 && id(dIdx + 1) == "from") {
          val rStart = dIdx + 2
          val rEnd = operandEnd(toks, rStart)
          if (rEnd >= 0) {
            mixedCheck(rStart, rEnd)
            val right = q.substring(toks(rStart).start, toks(rEnd).end)
            val isKw = q.substring(toks(j0).start, toks(dIdx + 1).end)
            return Some(q.substring(0, toks(s1).start) +
              s"${fold(rhs)} $isKw ${fold(right)}" + q.substring(toks(rEnd).end))
          }
        }
      case _ => ()
    }

    // ---- forms announced by the token BEFORE the operand ----
    def owningCase(from: Int): Int = {
      var depth = 1
      var m = from
      while (m >= 0 && depth > 0) {
        val t = toks(m)
        if (t.kind == RParen) {
          var d = 0
          var i = m
          var open = -1
          while (open < 0 && i >= 0) {
            toks(i).kind match {
              case RParen => d += 1
              case LParen => d -= 1; if (d == 0) open = i
              case _ => ()
            }
            i -= 1
          }
          if (open < 0) return -1
          m = open - 1
        } else {
          if (t.kind == Ident && t.lower == "end") depth += 1
          else if (t.kind == Ident && t.lower == "case") {
            depth -= 1
            if (depth == 0) return m
          }
          m -= 1
        }
      }
      -1
    }
    id(s1 - 1) match {
      case "like" | "ilike" | "glob" | "rlike" | "to" | "escape" =>
        return drop // pattern-side annotation: byte-wise matching, probed
      case "from" if id(s1 - 2) == "distinct" =>
        // right side of IS [NOT] DISTINCT FROM (probed: folds both sides)
        val isIdx = if (id(s1 - 3) == "not") s1 - 4 else s1 - 3
        if (id(isIdx) == "is") {
          val lend = isIdx - 1
          val lstart = operandStart(toks, lend)
          if (lstart >= 0) {
            mixedCheck(lstart, lend)
            val left = q.substring(toks(lstart).start, toks(lend).end)
            val isKw = q.substring(toks(isIdx).start, toks(s1 - 1).end)
            return Some(q.substring(0, toks(lstart).start) +
              s"${fold(left)} $isKw ${fold(rhs)}" + q.substring(toks(k + 1).end))
          }
        }
      case "case" =>
        // != q guard: a malformed CASE (no matching END) folds to the
        // unchanged text, which must fall through to classification
        // instead of spinning the rewrite loop on the same site
        val f = foldSimpleCase(q, toks, s1 - 1, coll)
        if (f != q) return Some(f)
      case "when" =>
        val ci = owningCase(s1 - 2)
        // only a SIMPLE case (operand directly after CASE) is a collated
        // matching group; a searched case's WHEN is a boolean expression
        if (ci >= 0 && tokAt(ci + 1) != null && id(ci + 1) != "when") {
          val f = foldSimpleCase(q, toks, ci, coll)
          if (f != q) return Some(f)
        }
      case _ => ()
    }

    // ---- the operand is an element of an enclosing IN list ----
    var stack = List.empty[Int]
    var i2 = 0
    while (i2 < s1) {
      toks(i2).kind match {
        case LParen => stack ::= i2
        case RParen => if (stack.nonEmpty) stack = stack.tail
        case _ => ()
      }
      i2 += 1
    }
    stack.headOption.foreach { pIdx =>
      val h = tokAt(pIdx + 1)
      val isSub = h != null && h.kind == Ident &&
        Set("select", "with", "values")(h.lower)
      if (!isSub && pIdx > 0 && toks(pIdx - 1).kind == Ident &&
        toks(pIdx - 1).lower == "in" &&
        !(pIdx > 1 && toks(pIdx - 2).kind == Punct && toks(pIdx - 2).lower == ".")) {
        val negIn = pIdx - 2 >= 0 && toks(pIdx - 2).kind == Ident &&
          toks(pIdx - 2).lower == "not"
        val lend = if (negIn) pIdx - 3 else pIdx - 2
        val lstart = operandStart(toks, lend)
        val close = matchRightIdx(pIdx)
        if (lstart >= 0 && close > 0) {
          mixedCheck(lstart, pIdx - 1)
          mixedCheck(pIdx + 1, close - 1)
          val left = q.substring(toks(lstart).start, toks(lend).end)
          val interior = q.substring(toks(pIdx).end, toks(close).start)
          val elems = splitTopLevel(interior).map(e => fold(e.trim))
          val kw = if (negIn) "NOT IN" else "IN"
          return Some(q.substring(0, toks(lstart).start) +
            s"${fold(left)} $kw (${elems.mkString(", ")})" +
            q.substring(toks(close).end))
        }
      }
    }

    // ---- parenthesized operand: the annotation is the ENTIRE content
    // of a plain grouping paren — it binds through the transparent group
    // (probed: `('B' COLLATE NOCASE) IN ('b','x')` folds). Move it
    // outside so the next pass sees the real comparison context. Only
    // for grouping positions (the allowlist below) — a call's or a
    // quantifier's argument paren (`min(…)`, `ANY(…)`) is a boundary the
    // annotation must NOT cross (probed: scalar-call args byte-compare).
    if (s1 - 1 >= 0 && toks(s1 - 1).kind == LParen &&
      matchRightIdx(s1 - 1) == k + 2) {
      val prev = tokAt(s1 - 2)
      val groupingPos = prev == null || prev.kind == Punct ||
        prev.kind == LParen ||
        (prev.kind == Ident && Set("where", "and", "or", "when", "then",
          "else", "on", "select", "having", "qualify", "by")(prev.lower))
      if (groupingPos)
        return Some(q.substring(0, toks(s1 - 1).start) + "(" + rhs + ") " +
          q.substring(toks(k).start, toks(k + 1).end) +
          q.substring(toks(k + 2).end))
    }
    None
  }

  /** Fold a simple CASE's operand and every WHEN comparand as one
    * collated matching group (THEN/ELSE results untouched). `caseIdx`
    * is the CASE token; spans may contain the triggering COLLATE — the
    * next rewrite pass drops it inside the fold call. */
  private def foldSimpleCase(q: String, toks: Vector[SqlLex.Tok],
      caseIdx: Int, coll: String): String = {
    import SqlLex._
    def fold(e: String): String =
      if (coll == "nocase") s"lower($e)" else s"strip_accents($e)"
    val spans = Vector.newBuilder[(Int, Int)]
    var m = caseIdx + 1
    var caseDepth = 1
    var parenDepth = 0
    var spanStart = m
    var inComparand = true
    var endIdx = -1
    while (m < toks.length && endIdx < 0) {
      val t = toks(m)
      t.kind match {
        case LParen => parenDepth += 1
        case RParen => parenDepth -= 1
        case Ident if parenDepth == 0 =>
          t.lower match {
            case "case" => caseDepth += 1
            case "end" =>
              caseDepth -= 1
              if (caseDepth == 0) endIdx = m
            case "when" if caseDepth == 1 =>
              if (inComparand && m > spanStart) spans += ((spanStart, m - 1))
              spanStart = m + 1
              inComparand = true
            case "then" if caseDepth == 1 =>
              if (inComparand && m > spanStart) spans += ((spanStart, m - 1))
              inComparand = false
            case _ => ()
          }
        case _ => ()
      }
      m += 1
    }
    val sp = spans.result()
    if (endIdx < 0 || sp.isEmpty) return q // malformed — leave for the parser
    for ((a, b) <- sp; i <- a to b)
      if (toks(i).kind == Ident && toks(i).lower == "collate" &&
        i + 1 < toks.length && toks(i + 1).kind == Ident &&
        Set("nocase", "noaccent")(toks(i + 1).lower) && toks(i + 1).lower != coll)
        throw new IllegalArgumentException(
          "graft: Cannot combine types with different collation! " +
            "(reference binder wording; collation registry duckdb-5.cpp:5156)")
    val sb = new StringBuilder
    var last = 0
    for ((a, b) <- sp) {
      sb.append(q.substring(last, toks(a).start))
        .append(fold(q.substring(toks(a).start, toks(b).end)))
      last = toks(b).end
    }
    sb.append(q.substring(last))
    sb.toString
  }

  /** Inline every registered-macro call site. Iterative passes handle
    * macros whose bodies call other macros; the pass cap stops a
    * self-recursive macro from spinning (the leftover call then fails in
    * the parser with a clear unresolved-function error, mirroring the
    * reference's bind-time recursion error).
    */
  private[graft] def expandMacros(spark: SparkSession, query: String): String = {
    val reg = macrosFor(spark)
    if (reg.isEmpty) return query
    var q = query
    var pass = 0
    var changed = true
    while (changed && pass < 10) {
      changed = false
      var searchFrom = 0
      var done = false
      while (!done) {
        // token-structural call-site scan (r14, retires the \b…\( regex
        // + insideQuotes walk): a macro call is a BARE identifier token
        // followed by '(' — string literals and quoted identifiers are
        // excluded by tokenization, and a dotted reference `t.m(…)` is a
        // qualified function, never the session macro
        val toks = SqlLex.tokenize(q)
        var k = 0
        var found = -1
        while (found < 0 && k + 1 < toks.length) {
          val t = toks(k)
          if (t.start >= searchFrom && t.kind == SqlLex.Ident &&
            reg.contains(t.lower) && toks(k + 1).kind == SqlLex.LParen &&
            !(k > 0 && toks(k - 1).kind == SqlLex.Punct && toks(k - 1).lower == "."))
            found = k
          else k += 1
        }
        if (found < 0) done = true
        else {
          var depth = 0
          var j = found + 1
          var close = -1
          while (close < 0 && j < toks.length) {
            toks(j).kind match {
              case SqlLex.LParen => depth += 1
              case SqlLex.RParen => depth -= 1; if (depth == 0) close = j
              case _ => ()
            }
            j += 1
          }
          if (close < 0) searchFrom = toks(found + 1).end // unbalanced — skip
          else {
            val args = splitTopLevel(
              q.substring(toks(found + 1).end, toks(close).start))
              .map(_.trim).filter(_.nonEmpty)
            val expansion = "(" + substituteParams(reg(toks(found).lower), args) + ")"
            q = q.substring(0, toks(found).start) + expansion +
              q.substring(toks(close).end)
            // nested macro calls inside the expansion are picked up by
            // the next pass
            searchFrom = toks(found).start + expansion.length
            changed = true
          }
        }
      }
      pass += 1
    }
    q
  }

  /** Bind call-site arguments (positional, then named `p := v`, then
    * declared defaults) and substitute them into the body in ONE pass —
    * simultaneous substitution, so an argument that happens to contain
    * another parameter's name is never re-substituted.
    */
  private def substituteParams(mac: Macro, args: Seq[String]): String = {
    val named = args.filter(_.matches(namedArg)).map { a =>
      val i = a.indexOf(":=")
      a.substring(0, i).trim.toLowerCase -> a.substring(i + 2).trim
    }.toMap
    val positional = args.filterNot(_.matches(namedArg))
    val bind = mac.params.zipWithIndex.map { case ((name, dflt), i) =>
      val v =
        if (i < positional.length) positional(i)
        else named.getOrElse(name.toLowerCase, dflt.getOrElse(
          throw new IllegalArgumentException(s"macro parameter '$name' not bound")))
      name.toLowerCase -> v
    }.toMap
    // token-driven body substitution (r14): only BARE identifier tokens
    // substitute — a parameter name inside a string literal or a quoted
    // identifier never rewrites (the old char-walker tracked ' but not
    // " or `), and a dotted reference `t.p` is a column, not the
    // parameter
    val body = mac.body
    val toks = SqlLex.tokenize(body)
    val sb = new StringBuilder
    var last = 0
    var i = 0
    while (i < toks.length) {
      val t = toks(i)
      if (t.kind == SqlLex.Ident && bind.contains(t.lower) &&
        !(i > 0 && toks(i - 1).kind == SqlLex.Punct && toks(i - 1).lower == ".")) {
        sb.append(body.substring(last, t.start))
          .append('(').append(bind(t.lower)).append(')')
        last = t.end
      }
      i += 1
    }
    sb.append(body.substring(last)).toString
  }

  /** Is position `idx` inside a single-quoted string literal? */
  private def insideQuotes(s: String, idx: Int): Boolean = {
    var inStr = false
    var i = 0
    while (i < idx) {
      if (s.charAt(i) == '\'') inStr = !inStr
      i += 1
    }
    inStr
  }

  /** Split on top-level commas (outside parens/brackets/braces and
    * quotes — bracket nesting protects list/struct literals like
    * `names=['a','b']`). */
  private[graft] def splitTopLevel(s: String): Seq[String] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    var depth = 0; var inStr = false; var inBt = false; var inDq = false
    var start = 0; var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (inStr) { if (c == '\'') inStr = false }
      else if (inBt) { if (c == '`') inBt = false }
      else if (inDq) { if (c == '"') inDq = false }
      else c match {
        case '\'' => inStr = true
        case '`' => inBt = true
        case '"' => inDq = true
        case '(' | '[' | '{' => depth += 1
        case ')' | ']' | '}' => depth -= 1
        case ',' if depth == 0 => out += s.substring(start, i); start = i + 1
        case _ =>
      }
      i += 1
    }
    out += s.substring(start)
    out.toSeq
  }

  /** Find `fn(args) OVER (window)` substrings in a predicate
    * (paren-balanced scan, good for the common QUALIFY shapes). */
  private[graft] def extractWindowExprs(pred: String): Seq[String] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    val re = """(?i)\b[a-z_][a-z0-9_]*\s*\(""".r
    for (m <- re.findAllMatchIn(pred)) {
      val argsEnd = matchParen(pred, m.end - 1)
      if (argsEnd > 0) {
        val after = pred.substring(argsEnd + 1)
        val overRe = """(?is)^\s*OVER\s*\(""".r
        val overNamed = """(?i)^\s*OVER\s+([a-z_][a-z0-9_]*)""".r
        overRe.findFirstMatchIn(after) match {
          case Some(om) =>
            val winEnd = matchParen(after, om.end - 1)
            if (winEnd > 0)
              out += pred.substring(m.start, argsEnd + 1) + after.substring(0, winEnd + 1)
          case None =>
            // named-window reference `fn(args) OVER w` (reference window
            // binder; QUALIFY may cite a WINDOW-clause name) — the
            // aliased __qN column rides the inner select, where the
            // WINDOW clause still lives and Spark resolves the name.
            overNamed.findFirstMatchIn(after).foreach { om =>
              out += pred.substring(m.start, argsEnd + 1) + after.substring(0, om.end)
            }
        }
      }
    }
    // distinct: a repeated expression must alias ONCE (the second
    // text-replace would no-op and leave a dangling unused column).
    // longest-first: a named reference can be a PREFIX of another
    // (`… OVER w` vs `… OVER w2`) and replacing the shorter one first
    // would corrupt the longer — inline `OVER (…)` forms end with a
    // paren and never prefix each other.
    out.distinct.sortBy(-_.length).toSeq
  }

  /** Paren nesting depth at index `idx` (quote-aware). */
  private def parenDepth(s: String, idx: Int): Int = {
    var depth = 0; var inStr = false; var inBt = false; var inDq = false
    var i = 0
    while (i < idx) {
      val c = s.charAt(i)
      if (inStr) { if (c == '\'') inStr = false }
      else if (inBt) { if (c == '`') inBt = false }
      else if (inDq) { if (c == '"') inDq = false }
      else c match {
        case '\'' => inStr = true
        case '`' => inBt = true
        case '"' => inDq = true
        case '(' => depth += 1
        case ')' => depth -= 1
        case _ =>
      }
      i += 1
    }
    depth
  }

  /** Index of the ')' matching the '(' at `open`, or -1 (quote-aware:
    * parens inside string literals don't count). */
  private[graft] def matchParen(s: String, open: Int): Int = {
    var depth = 0; var i = open
    var inStr = false; var inBt = false; var inDq = false
    while (i < s.length) {
      val c = s.charAt(i)
      if (inStr) { if (c == '\'') inStr = false }
      else if (inBt) { if (c == '`') inBt = false }
      else if (inDq) { if (c == '"') inDq = false }
      else if (c == '\'') inStr = true
      else if (c == '`') inBt = true
      else if (c == '"') inDq = true
      else if (c == '(') depth += 1
      else if (c == ')') { depth -= 1; if (depth == 0) return i }
      i += 1
    }
    -1
  }

  /** Register a read_csv scan as a temp view; `optStr` is the raw
    * `, k=v, k=v` tail (reference named-parameter syntax), routed through
    * the full [[sources.Csv]] option translation. */
  private def registerCsv(spark: SparkSession, path: String, optStr: String): String = {
    val opts = splitTopLevel(optStr.stripPrefix(","))
      .map(_.trim).filter(_.nonEmpty).flatMap { kv =>
        val i = kv.indexOf('=')
        if (i < 0) None
        else Some(kv.substring(0, i).trim.toLowerCase ->
          kv.substring(i + 1).trim.stripPrefix("'").stripSuffix("'"))
      }.toMap
    val view = "csv_" + math.abs((path, opts).hashCode).toString
    sources.Csv.read(spark, path, opts).createOrReplaceTempView(view)
    view
  }

  private def registerParquet(spark: SparkSession, path: String,
                              optStr: String = ""): String = {
    // accepted options: hive_partitioning (Spark discovers key=value
    // directories natively — basePath pins the partition root when the
    // path is a glob INTO the partition dirs), union_by_name (schema
    // merge); anything else raises rather than silently diverging
    var reader = spark.read
    splitTopLevel(optStr.stripPrefix(",")).map(_.trim).filter(_.nonEmpty)
      .foreach { o =>
        val kv = o.split("=", 2).map(_.trim.toLowerCase)
        // bare `opt` means true; `opt=false`/`=0` disables (r17
        // review: values were ignored and explicit-false enabled)
        val on = kv.length < 2 || kv(1) == "true" || kv(1) == "1"
        kv(0) match {
          case "hive_partitioning" if on =>
            // strip glob tails (/*/*.parquet) back to the dataset root
            val root = path.indexOf("/*") match {
              case -1 => path
              case i => path.substring(0, i)
            }
            reader = reader.option("basePath", root)
          case "hive_partitioning" => ()
          case "union_by_name" =>
            if (on) reader = reader.option("mergeSchema", "true")
          case other => throw new IllegalArgumentException(
            s"read_parquet: unsupported option $other")
        }
      }
    val view = "pq_" + math.abs((path + optStr).hashCode).toString
    reader.parquet(path).createOrReplaceTempView(view)
    view
  }

  private def registerJson(spark: SparkSession, path: String): String = {
    val view = "js_" + math.abs(path.hashCode).toString
    spark.read.json(path).createOrReplaceTempView(view)
    view
  }
}

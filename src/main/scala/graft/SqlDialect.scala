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

  /** Top-level (paren-depth-0, outside quotes) index of a keyword. */
  private def topLevelIndex(sql: String, kw: String): Int = {
    val upper = sql.toUpperCase
    var depth = 0
    var inStr = false
    var i = 0
    while (i < sql.length) {
      val c = sql.charAt(i)
      if (inStr) { if (c == '\'') inStr = false }
      else c match {
        case '\'' => inStr = true
        case '(' => depth += 1
        case ')' => depth -= 1
        case _ =>
          if (depth == 0 && upper.startsWith(kw, i) &&
            (i == 0 || !upper.charAt(i - 1).isLetterOrDigit) &&
            (i + kw.length >= sql.length || !upper.charAt(i + kw.length).isLetterOrDigit))
            return i
      }
      i += 1
    }
    -1
  }

  private val limitPercent = """(?is)\bLIMIT\s+([0-9.]+)\s*%\s*$""".r
  private val usingSampleRows = """(?is)\bUSING\s+SAMPLE\s+(\d+)\s+ROWS\b""".r
  private val usingSamplePct = """(?is)\bUSING\s+SAMPLE\s+([0-9.]+)\s*%""".r
  private val readCsvFn = """(?is)\bread_csv(?:_auto)?\s*\(\s*'([^']+)'\s*\)""".r
  private val bareCsv = """(?is)\bFROM\s+'([^']+\.csv)'""".r
  private val distinctOn = """(?is)^\s*SELECT\s+DISTINCT\s+ON\s*\(""".r

  /** Rewrite + execute. */
  def sql(spark: SparkSession, query: String): DataFrame = {
    var q = query.trim.stripSuffix(";")

    // replacement scans: read_csv('p') / FROM 'x.csv' → temp view
    q = readCsvFn.replaceAllIn(q, m => registerCsv(spark, m.group(1)))
    q = bareCsv.replaceAllIn(q, m => "FROM " + registerCsv(spark, m.group(1)))

    // LIMIT p% → run + limit
    limitPercent.findFirstMatchIn(q) match {
      case Some(m) =>
        val pct = m.group(1).toDouble
        // localCheckpoint: the count pass materializes the base result once;
        // the consuming limit reuses it instead of re-executing the query
        val base = spark.sql(rewriteCore(spark, q.substring(0, m.start))).localCheckpoint()
        val n = math.ceil(base.count() * pct / 100.0).toLong
        return base.limit(n.toInt)
      case None =>
    }

    // USING SAMPLE → Spark TABLESAMPLE (works at any nesting depth)
    q = usingSampleRows.replaceAllIn(q, m => s"TABLESAMPLE (${m.group(1)} ROWS)")
    q = usingSamplePct.replaceAllIn(q, m => s"TABLESAMPLE (${m.group(1)} PERCENT)")

    spark.sql(rewriteCore(spark, q))
  }

  /** Text-level rewrites that stay inside one SQL statement. */
  private[graft] def rewriteCore(spark: SparkSession, query: String): String = {
    var q = query

    // star modifiers (reference: star expression EXCLUDE / REPLACE,
    // duckdb-internal.hpp star expr):
    //   * EXCLUDE (a, b)            → * EXCEPT (a, b)        (Spark native)
    //   * REPLACE (expr AS c, …)    → * EXCEPT (c, …), expr AS c, …
    //     (replaced columns move to the end of the projection; the
    //     harness compare is column-order-insensitive)
    // combined form `* EXCLUDE (…) REPLACE (…)` folds into one EXCEPT.
    q = rewriteStarModifiers(q)

    // QUALIFY pred [ORDER BY …] → subquery + WHERE. Window expressions
    // used directly in the predicate (QUALIFY row_number() OVER (…) <= 3)
    // are auto-aliased into the select list first.
    val qi = topLevelIndex(q, "QUALIFY")
    if (qi >= 0) {
      var inner = q.substring(0, qi)
      val rest = q.substring(qi + "QUALIFY".length)
      val oi = topLevelIndex(rest, "ORDER")
      var (pred, tail) = if (oi >= 0) (rest.substring(0, oi), rest.substring(oi)) else (rest, "")
      val winExprs = extractWindowExprs(pred)
      winExprs.zipWithIndex.foreach { case (we, i) =>
        val alias = s"__q$i"
        pred = pred.replace(we, alias)
        val fi = topLevelIndex(inner, "FROM")
        require(fi >= 0, "QUALIFY rewrite needs a FROM clause")
        inner = inner.substring(0, fi) + s", $we AS $alias " + inner.substring(fi)
      }
      val drop = if (winExprs.isEmpty) "*"
      else s"* EXCEPT (${winExprs.indices.map(i => s"__q$i").mkString(", ")})"
      q = s"SELECT $drop FROM ($inner) __qualify WHERE ($pred) $tail"
    }

    // SELECT DISTINCT ON (keys) cols FROM … [ORDER BY s] →
    //   row_number() OVER (PARTITION BY keys ORDER BY s) = 1
    if (distinctOn.findFirstIn(q).isDefined) {
      val open = q.indexOf('(', q.toUpperCase.indexOf("ON"))
      var depth = 1; var i = open + 1
      while (depth > 0 && i < q.length) {
        if (q.charAt(i) == '(') depth += 1
        else if (q.charAt(i) == ')') depth -= 1
        i += 1
      }
      val keys = q.substring(open + 1, i - 1)
      val afterKeys = q.substring(i) // "cols FROM … [WHERE …] [ORDER BY …]"
      val oi = topLevelIndex(afterKeys, "ORDER")
      val (body, order) =
        if (oi >= 0) (afterKeys.substring(0, oi),
          afterKeys.substring(oi + "ORDER".length).trim.stripPrefix("BY").trim)
        else (afterKeys, keys)
      val fi = topLevelIndex(body, "FROM")
      require(fi >= 0, "DISTINCT ON rewrite needs a FROM clause")
      val proj = body.substring(0, fi).trim
      val fromRest = body.substring(fi)
      q = s"""SELECT * EXCEPT (__rn) FROM (
             |  SELECT $proj, row_number() OVER (PARTITION BY $keys ORDER BY $order) AS __rn
             |  $fromRest
             |) WHERE __rn = 1""".stripMargin
    }

    q
  }

  private val starMod = """(?is)\*\s+(EXCLUDE|REPLACE)\s*\(""".r

  /** `* EXCLUDE (…) [REPLACE (…)]` → Spark `* EXCEPT (…)` + re-projected
    * replacement expressions. Paren-balanced; applied repeatedly so
    * multiple stars / subqueries all rewrite; clauses may chain in either
    * order after the same `*`. */
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

  private[graft] def rewriteStarModifiers(query: String): String = {
    val modHead = """(?is)^\s+(EXCLUDE|REPLACE)\s*\(""".r
    var q = query
    var from = 0 // skip-ahead cursor: quoted / malformed matches are left alone
    var m = starMod.findFirstMatchIn(q.substring(from)).map(x => (from + x.start, x))
    while (m.isDefined) {
      val star = m.get._1 // position of '*'
      if (insideQuotes(q, star)) {
        from = star + 1 // a literal like '* EXCLUDE (' — don't mangle it
      } else {
        var pos = star + 1
        var excluded = Vector.empty[String]
        var replaced = Vector.empty[(String, String)] // (expr, alias)
        var malformed = false
        var h = modHead.findFirstMatchIn(q.substring(pos))
        while (h.isDefined && !malformed) {
          val open = pos + h.get.end - 1
          val close = matchParen(q, open)
          if (close < 0) malformed = true // leave for the SQL parser to report
          else {
            val args = splitTopLevel(q.substring(open + 1, close))
            if (h.get.group(1).equalsIgnoreCase("EXCLUDE")) excluded ++= args.map(_.trim)
            else args.foreach { item =>
              val ai = item.toUpperCase.lastIndexOf(" AS ")
              if (ai <= 0) malformed = true
              else replaced :+= (item.substring(0, ai).trim, item.substring(ai + 4).trim)
            }
            pos = close + 1
            h = modHead.findFirstMatchIn(q.substring(pos))
          }
        }
        if (malformed) from = star + 1
        else {
          val names = excluded ++ replaced.map(_._2)
          val repl = "* EXCEPT (" + names.mkString(", ") + ")" +
            replaced.map { case (e, a) => s", $e AS $a" }.mkString
          q = q.substring(0, star) + repl + q.substring(pos)
          from = star + repl.length
        }
      }
      m = starMod.findFirstMatchIn(q.substring(from)).map(x => (from + x.start, x))
    }
    q
  }

  /** Split on top-level commas (outside parens and quotes). */
  private def splitTopLevel(s: String): Seq[String] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    var depth = 0; var inStr = false; var start = 0; var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (inStr) { if (c == '\'') inStr = false }
      else c match {
        case '\'' => inStr = true
        case '(' => depth += 1
        case ')' => depth -= 1
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
        overRe.findFirstMatchIn(after).foreach { om =>
          val winEnd = matchParen(after, om.end - 1)
          if (winEnd > 0)
            out += pred.substring(m.start, argsEnd + 1) + after.substring(0, winEnd + 1)
        }
      }
    }
    out.toSeq
  }

  /** Index of the ')' matching the '(' at `open`, or -1. */
  private def matchParen(s: String, open: Int): Int = {
    var depth = 0; var i = open
    while (i < s.length) {
      if (s.charAt(i) == '(') depth += 1
      else if (s.charAt(i) == ')') { depth -= 1; if (depth == 0) return i }
      i += 1
    }
    -1
  }

  private def registerCsv(spark: SparkSession, path: String): String = {
    val view = "csv_" + math.abs(path.hashCode).toString
    spark.read.option("header", "true").option("inferSchema", "true")
      .csv(path).createOrReplaceTempView(view)
    view
  }
}

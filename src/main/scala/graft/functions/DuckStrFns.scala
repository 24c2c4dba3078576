package graft.functions

import java.util.regex.Pattern

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.objects.StaticInvoke
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Battery tranche-3 parity family (r15 — the SQL-surface FUNCTION
  * layer; every behavior duck-probed, BATTERY3_r15.json). The tranche's
  * find-class: the engine's semantics existed in API form while the
  * dialect surface missed the reference's names — and several Spark
  * same-named functions carry silently DIFFERENT semantics (trim arg
  * order, left/right negatives, regexp_extract's default group 1 vs
  * the reference's 0, regexp_replace's replace-ALL vs the reference's
  * replace-FIRST, split's regex vs literal delimiter). */
object DuckStrFns {
  // compiled-pattern cache (same reference-object idea as the codegen
  // kernels under plans/)
  private val patterns =
    new java.util.concurrent.ConcurrentHashMap[(String, Int), Pattern]()

  private def pat(re: String, flags: String): Pattern = {
    var f = 0
    if (flags.indexOf('i') >= 0) f |= Pattern.CASE_INSENSITIVE
    if (flags.indexOf('s') >= 0) f |= Pattern.DOTALL
    if (flags.indexOf('m') >= 0) f |= Pattern.MULTILINE
    patterns.computeIfAbsent((re, f), k => Pattern.compile(k._1, k._2))
  }

  /** duck regexp_replace: replaces the FIRST match unless the 'g' flag
    * is given (probed — Spark's replaces all). */
  def regexpReplace(s: UTF8String, re: UTF8String, repl: UTF8String,
      flags: UTF8String): UTF8String = {
    val fl = flags.toString
    val m = pat(re.toString, fl).matcher(s.toString)
    UTF8String.fromString(
      if (fl.indexOf('g') >= 0) m.replaceAll(repl.toString)
      else m.replaceFirst(repl.toString))
  }

  /** duck json_extract returns JSON TEXT: string values keep their
    * quotes ('"x"'); numbers/bools/null/objects/arrays pass through.
    * Spark's get_json_object unquotes strings — re-quote by shape. */
  def requoteJson(v: UTF8String): UTF8String = {
    if (v == null) return null
    val s = v.toString
    if (s.isEmpty) return UTF8String.fromString("\"\"")
    val c = s.charAt(0)
    val scalar = c == '{' || c == '[' || c == '-' || (c >= '0' && c <= '9') ||
      s == "true" || s == "false" || s == "null"
    if (scalar) v
    else UTF8String.fromString(
      "\"" + s.replace("\\", "\\\\").replace("\"", "\\\"") + "\"")
  }

  /** strptime via the shared strftime↔Java translation (per-format
    * cached formatter; reference strptime, duckdb-5.cpp:11399).
    * Returns epoch MICROS (TimestampType's physical form). */
  private val formatters = new java.util.concurrent.ConcurrentHashMap[
    String, java.time.format.DateTimeFormatter]()

  def strptime(s: UTF8String, fmt: UTF8String): Long = {
    val f = formatters.computeIfAbsent(fmt.toString, c =>
      new java.time.format.DateTimeFormatterBuilder()
        .parseCaseInsensitive()
        .appendPattern(DuckFunctions.strftimeToJava(c))
        .parseDefaulting(java.time.temporal.ChronoField.HOUR_OF_DAY, 0)
        .parseDefaulting(java.time.temporal.ChronoField.MINUTE_OF_HOUR, 0)
        .parseDefaulting(java.time.temporal.ChronoField.SECOND_OF_MINUTE, 0)
        .toFormatter(java.util.Locale.ROOT))
    val ta = f.parse(s.toString)
    val ld = java.time.LocalDate.from(ta)
    val lt = java.time.LocalTime.from(ta)
    java.time.LocalDateTime.of(ld, lt)
      .toEpochSecond(java.time.ZoneOffset.UTC) * 1000000L + lt.getNano / 1000L
  }

  private def sInvoke(name: String, dt: DataType, args: Seq[Expression]): Expression =
    StaticInvoke(DuckStrFns.getClass, dt, name,
      args.map(a => Cast(a, StringType)), args.map(_ => StringType))

  // ---- builders (registered by DuckFunctions; dialect-renamed where a
  // Spark name collides with different semantics) ----

  /** duck regexp_replace(s, re, repl[, flags]) — FIRST match default. */
  val regexpReplaceB: Seq[Expression] => Expression = a =>
    sInvoke("regexpReplace", StringType,
      Seq(a(0), a(1), a(2), if (a.length > 3) a(3) else Literal("")))

  /** duck regexp_extract(s, re[, group]) — group 0 DEFAULT (probed;
    * Spark's default is 1). */
  val regexpExtractB: Seq[Expression] => Expression = a =>
    if (a.length > 2) RegExpExtract(a(0), a(1), a(2))
    else RegExpExtract(a(0), a(1), Literal(0))

  /** duck trim/ltrim/rtrim(string, characters) — Spark's two-arg form
    * is (trimStr, srcStr), silently swapped (probed: '' results). */
  val trimB: Seq[Expression] => Expression = a =>
    if (a.length > 1) StringTrim(a(0), Some(a(1))) else StringTrim(a(0), None)
  val ltrimB: Seq[Expression] => Expression = a =>
    if (a.length > 1) StringTrimLeft(a(0), Some(a(1))) else StringTrimLeft(a(0), None)
  val rtrimB: Seq[Expression] => Expression = a =>
    if (a.length > 1) StringTrimRight(a(0), Some(a(1))) else StringTrimRight(a(0), None)

  /** duck left/right accept NEGATIVE counts = all but |n| from the
    * other end (probed: left('hello',-2)='hel'; Spark returns ''). */
  val leftB: Seq[Expression] => Expression = a => {
    val n = Cast(a(1), IntegerType)
    Left(a(0), If(LessThan(n, Literal(0)), Add(Length(a(0)), n), n))
  }
  val rightB: Seq[Expression] => Expression = a => {
    val n = Cast(a(1), IntegerType)
    Right(a(0), If(LessThan(n, Literal(0)), Add(Length(a(0)), n), n))
  }

  /** duck split/string_split: LITERAL delimiter (probed — Spark's
    * split is a regex; '.' would split every character). */
  val splitLiteralB: Seq[Expression] => Expression = a => {
    val d = a(1) match {
      case Literal(s: UTF8String, StringType) =>
        Literal(Pattern.quote(s.toString))
      case other => Concat(Seq(Literal("\\Q"), other, Literal("\\E")))
    }
    StringSplit(a(0), d, Literal(-1))
  }

  val splitRegexB: Seq[Expression] => Expression = a =>
    StringSplit(a(0), a(1), Literal(-1))

  /** duck format('{} and {}', …) — fmt-style placeholders, literal
    * format only ({} sequential and {n} positional), args rendered
    * with the reference's string casts. */
  val formatB: Seq[Expression] => Expression = a => a.head match {
    case Literal(f: UTF8String, StringType) =>
      val fmt = f.toString
      val parts = scala.collection.mutable.ArrayBuffer.empty[Expression]
      val sb = new StringBuilder
      var i = 0
      var next = 1
      while (i < fmt.length) {
        val open = fmt.indexOf('{', i)
        val close = if (open >= 0) fmt.indexOf('}', open) else -1
        if (open < 0 || close < 0) { sb.append(fmt.substring(i)); i = fmt.length }
        else {
          sb.append(fmt.substring(i, open))
          val inner = fmt.substring(open + 1, close)
          val idx = if (inner.isEmpty) { val k = next; next += 1; k }
            else inner.toInt + 1
          if (sb.nonEmpty) { parts += Literal(sb.toString); sb.clear() }
          parts += Coalesce(Seq(DuckStrCast(a(idx)), Literal("")))
          i = close + 1
        }
      }
      if (sb.nonEmpty) parts += Literal(sb.toString)
      Concat(parts.toSeq)
    case _ => throw new IllegalArgumentException(
      "format() requires a literal format string")
  }

  /** duck json_extract: JSON-text result (strings stay quoted). Paths
    * accept '$.a.b', '/a/b', or a bare key. */
  private def jsonPath(p: Expression): Expression = p match {
    case Literal(s: UTF8String, StringType) =>
      val str = s.toString
      Literal(if (str.startsWith("$")) str
        else if (str.startsWith("/")) "$." + str.stripPrefix("/").replace("/", ".")
        else "$." + str)
    case other => other
  }
  val jsonExtractB: Seq[Expression] => Expression = a =>
    StaticInvoke(DuckStrFns.getClass, StringType, "requoteJson",
      Seq(GetJsonObject(a(0), jsonPath(a(1)))), Seq(StringType))
  val jsonExtractStringB: Seq[Expression] => Expression = a =>
    GetJsonObject(a(0), jsonPath(a(1)))
  val jsonValidB: Seq[Expression] => Expression = a =>
    IsNotNull(GetJsonObject(a(0), Literal("$")))

  /** strptime(s, fmt) — epoch micros through the shared translator. */
  val strptimeB: Seq[Expression] => Expression = a =>
    StaticInvoke(DuckStrFns.getClass, TimestampType, "strptime",
      Seq(Cast(a(0), StringType), Cast(a(1), StringType)),
      Seq(StringType, StringType))

  /** strftime(ts, fmt) — literal fmt through the shared translation to
    * a Java pattern (non-literal formats raise). */
  val strftimeB: Seq[Expression] => Expression = a => a(1) match {
    case Literal(f: UTF8String, StringType) =>
      DateFormatClass(
        Cast(a(0), TimestampType,
          Option(org.apache.spark.sql.internal.SQLConf.get.sessionLocalTimeZone)),
        Literal(DuckFunctions.strftimeToJava(f.toString)),
        Option(org.apache.spark.sql.internal.SQLConf.get.sessionLocalTimeZone))
    case _ => throw new IllegalArgumentException(
      "strftime() requires a literal format string")
  }

  /** yearweek = ISO year * 100 + ISO week (probed: 1994-01-01 →
    * 199352). ISO year = calendar year of that week's Thursday. */
  val yearweekB: Seq[Expression] => Expression = a => {
    val d = Cast(a(0), DateType)
    val thursday = DateAdd(d, Subtract(Literal(3), WeekDay(d)))
    Add(Multiply(Year(thursday), Literal(100)), WeekOfYear(d))
  }

  /** duck scalar range/generate_series: range is END-EXCLUSIVE,
    * generate_series inclusive (probed). */
  val rangeB: Seq[Expression] => Expression = a => {
    def excl(stop: Expression, step: Expression) =
      If(GreaterThan(Cast(step, LongType), Literal(0L)),
        Cast(Subtract(Cast(stop, LongType), Literal(1L)), LongType),
        Cast(Add(Cast(stop, LongType), Literal(1L)), LongType))
    a.length match {
      case 1 => new Sequence(Literal(0L), excl(a(0), Literal(1L)))
      case 2 => new Sequence(Cast(a(0), LongType), excl(a(1), Literal(1L)))
      case _ => Sequence(Cast(a(0), LongType), excl(a(1), a(2)),
        Some(Cast(a(2), LongType)), None)
    }
  }
  val generateSeriesB: Seq[Expression] => Expression = a => a.length match {
    case 1 => new Sequence(Literal(0L), Cast(a(0), LongType))
    case 2 => new Sequence(Cast(a(0), LongType), Cast(a(1), LongType))
    case _ => Sequence(Cast(a(0), LongType), Cast(a(1), LongType),
      Some(Cast(a(2), LongType)), None)
  }

  /** duck list_distinct/list_unique DROP NULLs (probed). */
  private def nonNulls(arr: Expression): Expression =
    ArrayFilter(arr, LambdaFunction(
      IsNotNull(UnresolvedNamedLambdaVariable(Seq("__x"))),
      Seq(UnresolvedNamedLambdaVariable(Seq("__x")))))
  val listDistinctB: Seq[Expression] => Expression = a =>
    ArrayDistinct(nonNulls(a(0)))
  val listUniqueB: Seq[Expression] => Expression = a =>
    Cast(Size(ArrayDistinct(nonNulls(a(0))), legacySizeOfNull = false), LongType)
}

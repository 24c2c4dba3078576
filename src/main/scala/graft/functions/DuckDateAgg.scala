package graft.functions

import org.apache.spark.sql.catalyst.analysis.UnresolvedFunction
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.objects.StaticInvoke
import org.apache.spark.sql.internal.SQLConf
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Battery tranche-4 parity family (r15 — date-part long tail,
  * aggregate-edge semantics, struct/map function names; every behavior
  * duck-probed, BATTERY4_r15.json). Silent-wrong finds: 1-arg
  * string_agg's ',' default separator, SAMPLE skewness/kurtosis
  * (Spark's are population), chr() truncating codepoints to a byte,
  * dayname/monthname short names, element_at's list-wrapping map
  * semantics, date_part's reference-only fields. */
object DuckDateAgg {
  private def tz = Option(SQLConf.get.sessionLocalTimeZone)
  private def tsOf(e: Expression): Expression = Cast(e, TimestampType, tz)
  private def dOf(e: Expression): Expression = Cast(e, DateType, tz)

  def chr(cp: Int): UTF8String =
    UTF8String.fromString(new String(Character.toChars(cp)))

  val chrB: Seq[Expression] => Expression = a =>
    StaticInvoke(DuckDateAgg.getClass, StringType, "chr",
      Seq(Cast(a(0), IntegerType)), Seq(IntegerType))

  val daynameB: Seq[Expression] => Expression = a =>
    DateFormatClass(tsOf(a(0)), Literal("EEEE"), tz)
  val monthnameB: Seq[Expression] => Expression = a =>
    DateFormatClass(tsOf(a(0)), Literal("MMMM"), tz)

  /** 1-arg string_agg/group_concat default to ',' (probed — Spark's
    * listagg default is ''). The in-call ORDER BY form is consumed by
    * rewriteSortedAggs before resolution reaches this builder. */
  val stringAggB: Seq[Expression] => Expression = a =>
    UnresolvedFunction(Seq("listagg"),
      Seq(a(0), if (a.length > 1) a(1) else Literal(",")), isDistinct = false)

  /** duck skewness/kurtosis are SAMPLE statistics (probed on
    * (1,2,2,9): 1.900104 / 3.708507 vs Spark's population 1.097025 /
    * -0.705532): g1·√(n(n−1))/(n−2) and the standard sample-excess
    * transform of g2. */
  // aggregate compositions resolve through UnresolvedFunction — a
  // direct AggregateFunction ctor inside a registry-built scalar tree
  // evades the analyzer's aggregate extraction and fails at execution
  private def uf(name: String, args: Expression*): Expression =
    UnresolvedFunction(Seq(name), args.toSeq, isDistinct = false)

  val skewSampB: Seq[Expression] => Expression = a => {
    val x = Cast(a(0), DoubleType)
    val n = Cast(uf("count", x), DoubleType)
    Multiply(uf("skewness", x),
      Divide(Sqrt(Multiply(n, Subtract(n, Literal(1.0)))),
        Subtract(n, Literal(2.0))))
  }
  val kurtSampB: Seq[Expression] => Expression = a => {
    val x = Cast(a(0), DoubleType)
    val n = Cast(uf("count", x), DoubleType)
    Multiply(
      Divide(Subtract(n, Literal(1.0)),
        Multiply(Subtract(n, Literal(2.0)), Subtract(n, Literal(3.0)))),
      Add(Multiply(Add(n, Literal(1.0)), uf("kurtosis", x)), Literal(6.0)))
  }

  // ---- date_part long tail (probed: epoch → DOUBLE seconds,
  // decade/century/millennium ceil-style, isodow Monday=1, isoyear via
  // the week's Thursday, micro/milliseconds WITHIN THE MINUTE) ----

  private def isoThursday(e: Expression): Expression =
    DateAdd(dOf(e), Subtract(Literal(3), WeekDay(dOf(e))))

  def isoyear(e: Expression): Expression = Year(isoThursday(e))
  def century(e: Expression): Expression =
    Cast(Divide(Cast(Add(Year(dOf(e)), Literal(99)), DoubleType),
      Literal(100.0)), IntegerType)
  def decade(e: Expression): Expression =
    Cast(Divide(Cast(Year(dOf(e)), DoubleType), Literal(10.0)), IntegerType)
  def millennium(e: Expression): Expression =
    Cast(Divide(Cast(Add(Year(dOf(e)), Literal(999)), DoubleType),
      Literal(1000.0)), IntegerType)
  private def secondOfMinuteMicros(e: Expression): Expression =
    Pmod(UnixMicros(tsOf(e)), Literal(60000000L))

  val datePartB: Seq[Expression] => Expression = a => {
    val unit = a(0) match {
      case Literal(s: UTF8String, StringType) => s.toString.toLowerCase
      case _ => throw new IllegalArgumentException(
        "date_part expects a literal field name")
    }
    val e = a(1)
    unit match {
      case "epoch" => DuckEpoch(e)
      case "isodow" => Add(WeekDay(dOf(e)), Literal(1))
      case "isoyear" => isoyear(e)
      case "decade" => decade(e)
      case "century" => century(e)
      case "millennium" => millennium(e)
      case "era" => If(GreaterThan(Year(dOf(e)), Literal(0)), Literal(1), Literal(0))
      case "microseconds" => secondOfMinuteMicros(e)
      case "milliseconds" =>
        Cast(IntegralDivide(secondOfMinuteMicros(e), Literal(1000L)), IntegerType)
      case "timezone" | "timezone_hour" | "timezone_minute" => Literal(0)
      case "dayofweek" | "dow" =>
        UnresolvedFunction(Seq("dayofweek"), Seq(dOf(e)), isDistinct = false)
      case "weekday" => WeekDay(dOf(e))
      case "yearweek" => DuckStrFns.yearweekB(Seq(e))
      case _ =>
        // standard fields delegate to Spark's own date_part builtin
        UnresolvedFunction(Seq("date_part"), Seq(a(0), e), isDistinct = false)
    }
  }

  /** duck date_diff counts BOUNDARY crossings (probed: 'week' Jan 1 →
    * Feb 1 1994 = 5 Mondays, 'year' Dec 31 → Jan 1 = 1). The 2-arg
    * form keeps Spark's datediff(end, start). */
  val dateDiffB: Seq[Expression] => Expression = a =>
    if (a.length == 2) DateDiff(a(0), a(1))
    else {
      val unit = literalUnit(a(0))
      val (s, e) = (a(1), a(2))
      unit match {
        case "year" => Subtract(Year(dOf(e)), Year(dOf(s)))
        case "quarter" =>
          Subtract(
            Add(Multiply(Year(dOf(e)), Literal(4)), Quarter(dOf(e))),
            Add(Multiply(Year(dOf(s)), Literal(4)), Quarter(dOf(s))))
        case "month" =>
          Subtract(
            Add(Multiply(Year(dOf(e)), Literal(12)), Month(dOf(e))),
            Add(Multiply(Year(dOf(s)), Literal(12)), Month(dOf(s))))
        case "week" =>
          Cast(IntegralDivide(
            DateDiff(dOf(TruncTimestamp(Literal("week"), tsOf(e), tz)),
              dOf(TruncTimestamp(Literal("week"), tsOf(s), tz))),
            Literal(7L)), LongType)
        case "day" => Cast(DateDiff(dOf(e), dOf(s)), LongType)
        case "hour" | "minute" | "second" =>
          val div = unit match {
            case "hour" => 3600L; case "minute" => 60L; case _ => 1L
          }
          IntegralDivide(
            Subtract(
              IntegralDivide(UnixSeconds(tsOf(e)), Literal(div)),
              IntegralDivide(UnixSeconds(tsOf(s)), Literal(div))),
            Literal(1L))
        case other => throw new IllegalArgumentException(
          s"date_diff: unsupported unit $other")
      }
    }

  /** duck's 3-arg date_sub counts COMPLETE intervals between the
    * instants (month via months_between floor). 2-arg stays Spark. */
  val dateSubB: Seq[Expression] => Expression = a =>
    if (a.length == 2) DateSub(a(0), Cast(a(1), IntegerType))
    else {
      val unit = literalUnit(a(0))
      val (s, e) = (a(1), a(2))
      unit match {
        case "year" =>
          Cast(new Floor(Divide(
            MonthsBetween(tsOf(e), tsOf(s), Literal(false), tz),
            Literal(12.0))), LongType)
        case "month" =>
          Cast(new Floor(
            MonthsBetween(tsOf(e), tsOf(s), Literal(false), tz)), LongType)
        case "week" =>
          IntegralDivide(Cast(DateDiff(dOf(e), dOf(s)), LongType), Literal(7L))
        case "day" => Cast(DateDiff(dOf(e), dOf(s)), LongType)
        case "hour" | "minute" | "second" =>
          val div = unit match {
            case "hour" => 3600L; case "minute" => 60L; case _ => 1L
          }
          IntegralDivide(
            Subtract(UnixSeconds(tsOf(e)), UnixSeconds(tsOf(s))), Literal(div))
        case other => throw new IllegalArgumentException(
          s"date_sub: unsupported unit $other")
      }
    }

  private def literalUnit(e: Expression): String = e match {
    case Literal(s: UTF8String, StringType) =>
      s.toString.toLowerCase.stripSuffix("s")
    case _ => throw new IllegalArgumentException(
      "expects a literal unit name")
  }

  /** duck date_add(date, INTERVAL) — Spark's date_add is (date, int). */
  val dateAddB: Seq[Expression] => Expression = a => DuckDateAdd(a(0), a(1))

  /** time_bucket(INTERVAL w, ts): epoch-aligned buckets (probed:
    * 2 HOUR of 05:30 → 04:00; 1 MONTH of a date → month start). */
  val timeBucketB: Seq[Expression] => Expression = a => a(0) match {
    case Literal(us: Long, _: DayTimeIntervalType) =>
      val t = a(1)
      SecondsToTimestamp(Divide(Cast(
        Subtract(UnixMicros(tsOf(t)), Pmod(UnixMicros(tsOf(t)), Literal(us))),
        DoubleType), Literal(1e6)))
    case Literal(m: Int, _: YearMonthIntervalType) =>
      val d = dOf(a(1))
      val monthsSinceEpoch =
        Add(Multiply(Subtract(Year(d), Literal(1970)), Literal(12)),
          Subtract(Month(d), Literal(1)))
      val b = Multiply(IntegralDivide(Cast(monthsSinceEpoch, LongType),
        Literal(m.toLong)), Literal(m.toLong))
      UnresolvedFunction(Seq("make_date"), Seq(
        Add(Literal(1970L), IntegralDivide(b, Literal(12L))),
        Add(Pmod(b, Literal(12L)), Literal(1L)),
        Literal(1)), isDistinct = false)
    case _ => throw new IllegalArgumentException(
      "time_bucket expects a literal interval width")
  }

  /** bitstring_agg(x, lo, hi): a '0'/'1' string with positions set
    * (the engine's BIT strings are '0'/'1' varchar — TypeHelpers). */
  val bitstringAggB: Seq[Expression] => Expression = a => {
    val v = UnresolvedNamedLambdaVariable(Seq("__bit_i"))
    ArrayJoin(
      ArrayTransform(
        new Sequence(Cast(a(1), LongType), Cast(a(2), LongType)),
        LambdaFunction(
          If(ArrayContains(
            UnresolvedFunction(Seq("collect_set"),
              Seq(Cast(a(0), LongType)), isDistinct = false), v),
            Literal("1"), Literal("0")),
          Seq(v))),
      Literal(""), None)
  }

  /** struct_insert(s, 'name', v, …) — the := surface is converted by
    * the dialect (rewriteStructLits). */
  val structInsertB: Seq[Expression] => Expression = a => {
    val ops = a.drop(1).grouped(2).map {
      case Seq(Literal(n: UTF8String, StringType), v) =>
        WithField(n.toString, v)
      case _ => throw new IllegalArgumentException(
        "struct_insert expects 'name', value pairs")
    }.toSeq
    UpdateFields(a(0), ops)
  }

  val structExtractB: Seq[Expression] => Expression = a =>
    org.apache.spark.sql.catalyst.analysis.UnresolvedExtractValue(a(0), a(1))
}

/** duck date_add(date, interval) type dispatch at plan time. */
case class DuckDateAdd(left: Expression, right: Expression)
  extends BinaryExpression with RuntimeReplaceable {

  override lazy val replacement: Expression = right.dataType match {
    case _: YearMonthIntervalType => DateAddYMInterval(left, right)
    case _: DayTimeIntervalType =>
      TimestampAddInterval(
        Cast(left, TimestampType, DuckEdges.tzOpt), right, DuckEdges.tzOpt)
    case CalendarIntervalType =>
      TimestampAddInterval(
        Cast(left, TimestampType, DuckEdges.tzOpt), right, DuckEdges.tzOpt)
    case _ => DateAdd(left, Cast(right, IntegerType))
  }

  override def prettyName: String = "date_add"
  override protected def withNewChildrenInternal(l: Expression, r: Expression): DuckDateAdd =
    copy(left = l, right = r)
}

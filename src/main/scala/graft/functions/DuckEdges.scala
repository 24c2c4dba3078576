package graft.functions

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.internal.SQLConf
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Battery tranche-2 parity family (r15 — date/time & interval
  * literals, string escapes, struct/map literals, bracket indexing and
  * slicing, nested-subquery corners; every behavior duck-probed —
  * BATTERY2_r15.json). The headline find: the reference's bracket
  * INDEXING is 1-BASED with NULL at 0 and out-of-range, while Spark's
  * `[]` is 0-based — silently shifted values on every shared-text
  * subscript. Type dispatch at plan time like [[DuckArith]].
  */
object DuckEdges {
  private[graft] def tzOpt: Option[String] =
    Option(SQLConf.get.sessionLocalTimeZone)

  /** duck interval rendering (probed: '1 year 2 months', '26:00:00',
    * '1 day 02:00:03', '1 year 1 day 01:02:03'). */
  def formatMonths(m0: Int): UTF8String = {
    val sb = new StringBuilder
    appendMonths(sb, m0)
    UTF8String.fromString(if (sb.isEmpty) "00:00:00" else sb.toString)
  }

  private def appendMonths(sb: StringBuilder, m0: Int): Unit = {
    val y = m0 / 12
    val m = m0 % 12
    if (y != 0) sb.append(y).append(if (math.abs(y) == 1) " year" else " years")
    if (m != 0) {
      if (sb.nonEmpty) sb.append(' ')
      sb.append(m).append(if (math.abs(m) == 1) " month" else " months")
    }
  }

  def formatMicros(us0: Long): UTF8String = formatMicros(us0, true)

  /** splitDays: the reference stores days separately from sub-day
    * micros, so `INTERVAL '26 hours'` prints '26:00:00' while
    * `INTERVAL '1 day 2 hours'` prints '1 day 02:00:00' — Spark's
    * interval TYPE start-field tells the two apart. */
  def formatMicros(us0: Long, splitDays: Boolean): UTF8String = {
    val sb = new StringBuilder
    appendMicros(sb, us0, splitDays)
    UTF8String.fromString(sb.toString)
  }

  private def appendMicros(sb: StringBuilder, us0: Long,
      splitDays: Boolean = true): Unit = {
    var us = us0
    val d = if (splitDays) us / 86400000000L else 0L
    us -= d * 86400000000L
    if (d != 0) {
      sb.append(d).append(if (math.abs(d) == 1) " day" else " days")
      if (us != 0) sb.append(' ')
    }
    if (us != 0 || d == 0) {
      val neg = us < 0
      if (neg) { sb.append('-'); us = -us }
      val h = us / 3600000000L
      val mi = us / 60000000L % 60
      val se = us / 1000000L % 60
      val frac = us % 1000000L
      sb.append(f"$h%02d:$mi%02d:$se%02d")
      if (frac != 0) {
        val fs = f"$frac%06d".reverse.dropWhile(_ == '0').reverse
        sb.append('.').append(fs)
      }
    }
  }

  /** Mixed year-month ± day-time interval → CalendarInterval with the
    * reference's day split (probed r16: INTERVAL '1 month' - INTERVAL
    * '10 days' renders '1 month -10 days'). */
  def mixedInterval(months: Int, us: Long): org.apache.spark.unsafe.types.CalendarInterval =
    new org.apache.spark.unsafe.types.CalendarInterval(
      months, (us / 86400000000L).toInt, us % 86400000000L)

  /** ym − dt (physical encodings: months int / micros long). */
  def mixedIntervalSub(months: Int, us: Long): org.apache.spark.unsafe.types.CalendarInterval =
    mixedInterval(months, -us)

  /** dt − ym. */
  def mixedIntervalSubDt(us: Long, months: Int): org.apache.spark.unsafe.types.CalendarInterval =
    mixedInterval(-months, us)

  /** CalendarInterval (mixed literals via make_interval). */
  def formatCalendar(months: Int, days: Int, us: Long): UTF8String = {
    val sb = new StringBuilder
    if (months != 0) appendMonths(sb, months)
    val total = days * 86400000000L + us
    if (total != 0 || sb.isEmpty) {
      if (sb.nonEmpty) sb.append(' ')
      appendMicros(sb, total)
    }
    UTF8String.fromString(sb.toString)
  }
}

/** duck bracket indexing (probed r15): lists are 1-BASED, index 0 and
  * out-of-range are NULL, negative counts from the end; strings index
  * characters the same way but yield '' (not NULL) out of range; map
  * subscripts return a LIST of matches ([] when the key is absent).
  * Spark's native `[]` is 0-based — silently shifted values. */
case class DuckIdx(base: Expression, idx: Expression)
  extends BinaryExpression with RuntimeReplaceable {

  override def left: Expression = base
  override def right: Expression = idx

  override lazy val replacement: Expression = base.dataType match {
    case ArrayType(et, _) =>
      val i = Cast(idx, IntegerType)
      If(EqualTo(i, Literal(0)), Literal.create(null, et),
        new TryElementAt(base, i))
    case MapType(_, vt, _) =>
      val e = new TryElementAt(base, idx)
      If(IsNull(e), Literal.create(Array.empty[Any],
        ArrayType(vt)), CreateArray(Seq(e)))
    case _: StructType =>
      // struct bracket access s['key'] is field extraction (probed 42)
      ExtractValue(base, idx, SQLConf.get.resolver)
    case _ =>
      val s = Cast(base, StringType)
      val i = Cast(idx, IntegerType)
      If(EqualTo(i, Literal(0)), Literal(""), Substring(s, i, Literal(1)))
  }

  override def prettyName: String = "duck_idx"
  override protected def withNewChildrenInternal(l: Expression, r: Expression): DuckIdx =
    copy(base = l, idx = r)
}

/** duck slicing `base[a:b]` (probed): 1-based INCLUSIVE bounds,
  * negative bounds count from the end (`[2:-1]` reaches the last
  * element), open bounds default to the ends, inverted or past-the-end
  * ranges are empty. Start/end arrive as literals or NULL (open). */
case class DuckSlice(base: Expression, start: Expression, end: Expression)
  extends TernaryExpression with RuntimeReplaceable {

  override def first: Expression = base
  override def second: Expression = start
  override def third: Expression = end

  private def norm(e: Expression, size: Expression, dflt: Expression): Expression = {
    val i = Cast(e, IntegerType)
    If(IsNull(i), dflt,
      If(LessThan(i, Literal(0)), Add(Add(size, i), Literal(1)), i))
  }

  override lazy val replacement: Expression = {
    val isStr = base.dataType == StringType
    val size: Expression =
      if (isStr) Length(base) else Size(base, legacySizeOfNull = false)
    val s0 = norm(start, size, Literal(1))
    // clamp the start to >= 1 so a negative-run start stays valid
    val s1 = If(LessThan(s0, Literal(1)), Literal(1), s0)
    val e0 = norm(end, size, size)
    val e1 = If(GreaterThan(e0, size), size, e0)
    val len = Add(Subtract(e1, s1), Literal(1))
    val len1 = If(LessThan(len, Literal(0)), Literal(0), len)
    if (isStr) Substring(base, s1, len1)
    else If(EqualTo(len1, Literal(0)),
      Literal.create(Array.empty[Any], base.dataType),
      Slice(base, s1, len1))
  }

  override def prettyName: String = "duck_slice"
  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression): DuckSlice =
    copy(base = f, start = s, end = t)
}

/** duck `a - b`: DATE - DATE is an INTEGER day count (probed: 31 —
  * Spark yields a day-time interval). The replacement is built AFTER
  * the analyzer's ResolveBinaryArithmetic has run, so the datetime
  * dispatch that rule normally performs is reproduced here; numeric
  * and interval pairs keep plain Subtract. */
case class DuckSub(left: Expression, right: Expression)
  extends BinaryExpression with RuntimeReplaceable {
  import DuckEdges.tzOpt

  override lazy val replacement: Expression =
    (left.dataType, right.dataType) match {
      case (DateType, DateType) => DateDiff(left, right)
      case (DateType, dt) if DuckArith.isIntegral(dt) =>
        DateSub(left, Cast(right, IntegerType))
      case (DateType, _: YearMonthIntervalType) =>
        DateAddYMInterval(left, UnaryMinus(right))
      case (DateType, _: DayTimeIntervalType) =>
        // duck's date ± day-time interval yields a TIMESTAMP (probed)
        TimestampAddInterval(
          Cast(left, TimestampType, tzOpt), UnaryMinus(right), tzOpt)
      case (TimestampType | TimestampNTZType, TimestampType | TimestampNTZType)
        if left.dataType == right.dataType =>
        SubtractTimestamps(left, right, legacyInterval = false, tzOpt)
      // mixed timestamp/date pairs (probed; parquet timestamps arrive
      // as TIMESTAMP_NTZ): the date side widens to the timestamp
      // side's type and the difference is an interval, same as ts - ts
      case (ts @ (TimestampType | TimestampNTZType), DateType) =>
        SubtractTimestamps(
          left, Cast(right, ts, tzOpt), legacyInterval = false, tzOpt)
      case (DateType, ts @ (TimestampType | TimestampNTZType)) =>
        SubtractTimestamps(
          Cast(left, ts, tzOpt), right, legacyInterval = false, tzOpt)
      case (TimestampType, TimestampNTZType) | (TimestampNTZType, TimestampType) =>
        SubtractTimestamps(Cast(left, TimestampType, tzOpt),
          Cast(right, TimestampType, tzOpt), legacyInterval = false, tzOpt)
      case (TimestampNTZType, _: YearMonthIntervalType) =>
        new TimestampAddYMInterval(left, UnaryMinus(right))
      case (TimestampNTZType, _: DayTimeIntervalType) =>
        TimestampAddInterval(left, UnaryMinus(right), tzOpt)
      // mixed interval classes → CalendarInterval (probed r16:
      // '1 month -10 days'; Spark cannot combine the two types).
      // Intervals pass at their PHYSICAL encodings (months int /
      // micros long) — a Cast to LongType converts to the END-FIELD
      // unit ('10 days' → 10), which minted a -10-microsecond bug
      case (ym: YearMonthIntervalType, dt: DayTimeIntervalType) =>
        org.apache.spark.sql.catalyst.expressions.objects.StaticInvoke(
          DuckEdges.getClass, CalendarIntervalType, "mixedIntervalSub",
          Seq(left, right), Seq(ym, dt))
      case (dt: DayTimeIntervalType, ym: YearMonthIntervalType) =>
        org.apache.spark.sql.catalyst.expressions.objects.StaticInvoke(
          DuckEdges.getClass, CalendarIntervalType, "mixedIntervalSubDt",
          Seq(left, right), Seq(dt, ym))
      case (TimestampType, _: YearMonthIntervalType) =>
        new TimestampAddYMInterval(left, UnaryMinus(right))
      case (TimestampType, _: DayTimeIntervalType) =>
        TimestampAddInterval(left, UnaryMinus(right), tzOpt)
      case (a, b) if a == b => Subtract(left, right)
      case _ =>
        val (l2, r2) = DuckArith.widenPair(left, right)
        Subtract(l2, r2)
    }

  override def prettyName: String = "duck_sub"
  override protected def withNewChildrenInternal(l: Expression, r: Expression): DuckSub =
    copy(left = l, right = r)
}

/** duck concat(): casts every argument to VARCHAR with the reference
  * rendering and SKIPS NULLs (probed: concat('a', NULL, 'b') = 'ab',
  * concat('a', 1.5, DATE...) = 'a1.51994-01-01'); Spark's concat is
  * typed and null-propagating. */
case class DuckConcat(children: Seq[Expression])
  extends Expression with RuntimeReplaceable {

  override lazy val replacement: Expression =
    Concat(children.map(c =>
      Coalesce(Seq(DuckStrCast(c), Literal("")))))

  override def prettyName: String = "concat"
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): DuckConcat =
    copy(children = newChildren)
}

/** duck substr edges (probed): `substr(s, 0, n)` consumes one unit of
  * length before the first char ('ab' for n=3); a NEGATIVE length
  * takes the characters [start+len, start) ('a' for (2,-1)); negative
  * starts count from the end exactly like Spark. */
case class DuckSubstr(str: Expression, pos: Expression, len: Expression)
  extends TernaryExpression with RuntimeReplaceable {

  override def first: Expression = str
  override def second: Expression = pos
  override def third: Expression = len

  override lazy val replacement: Expression = {
    val p = Cast(pos, IntegerType)
    val l = Cast(len, IntegerType)
    If(LessThan(l, Literal(0)),
      Substring(str, Add(p, l), UnaryMinus(l)),
      If(EqualTo(p, Literal(0)),
        Substring(str, Literal(1),
          If(GreaterThan(Subtract(l, Literal(1)), Literal(0)),
            Subtract(l, Literal(1)), Literal(0))),
        Substring(str, p, l)))
  }

  override def prettyName: String = "substr"
  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression): DuckSubstr =
    copy(str = f, pos = s, len = t)
}

/** duck interval rendering for VARCHAR casts (probed: '1 year 2
  * months', '26:00:00', '1 day 02:00:03', '1 year 1 day 01:02:03'). */
case class DuckIntervalStr(child: Expression) extends UnaryExpression {
  import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
  override def dataType: DataType = StringType

  private def splitDays: Boolean = child.dataType match {
    case d: DayTimeIntervalType => d.startField == DayTimeIntervalType.DAY
    case _ => true
  }

  override protected def nullSafeEval(v: Any): Any = child.dataType match {
    case _: YearMonthIntervalType => DuckEdges.formatMonths(v.asInstanceOf[Int])
    case _: DayTimeIntervalType =>
      DuckEdges.formatMicros(v.asInstanceOf[Long], splitDays)
    case _ =>
      val ci = v.asInstanceOf[org.apache.spark.unsafe.types.CalendarInterval]
      DuckEdges.formatCalendar(ci.months, ci.days, ci.microseconds)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    child.dataType match {
      case _: YearMonthIntervalType =>
        defineCodeGen(ctx, ev, c => s"graft.functions.DuckEdges.formatMonths($c)")
      case _: DayTimeIntervalType =>
        defineCodeGen(ctx, ev, c =>
          s"graft.functions.DuckEdges.formatMicros($c, $splitDays)")
      case _ =>
        defineCodeGen(ctx, ev, c =>
          s"graft.functions.DuckEdges.formatCalendar($c.months, $c.days, $c.microseconds)")
    }

  override def prettyName: String = "duck_interval_str"
  override protected def withNewChildInternal(c: Expression): DuckIntervalStr =
    copy(child = c)
}

/** duck CAST to an ARRAY type: strings parse as list syntax
  * ('[1,2]'::INTEGER[] — probed; routed through from_json, whose
  * null-on-malformed also covers TRY_CAST), arrays re-cast
  * element-wise. */
case class DuckACast(child: Expression, elem: DataType)
  extends UnaryExpression with RuntimeReplaceable {

  override lazy val replacement: Expression = child.dataType match {
    case StringType =>
      JsonToStructs(ArrayType(elem), Map.empty[String, String], child,
        DuckEdges.tzOpt)
    case _ => Cast(child, ArrayType(elem))
  }

  override def prettyName: String = "duck_acast"
  override protected def withNewChildInternal(c: Expression): DuckACast =
    copy(child = c)
}

/** TRY_CAST to an ARRAY type: the reference nulls the failing ELEMENT,
  * not the whole list (r17 BATTERY7 probe: `TRY_CAST(['1','x','3'] AS
  * INT[])` → `[1, NULL, 3]`) — array inputs route through
  * [[DuckNamedCast]]'s leaf-level TRY; string inputs keep the
  * null-on-malformed json parse (whole-value NULL, matching the
  * reference's list-literal parse). */
case class DuckTryACast(child: Expression, elem: DataType)
  extends UnaryExpression with RuntimeReplaceable {

  override lazy val replacement: Expression = child.dataType match {
    case StringType => TryEval(JsonToStructs(ArrayType(elem),
      Map.empty[String, String], child, DuckEdges.tzOpt))
    case _ => DuckNamedCast(child, ArrayType(elem), isTry = true)
  }

  override def prettyName: String = "duck_try_acast"
  override protected def withNewChildInternal(c: Expression): DuckTryACast =
    copy(child = c)
}

object DuckACast {
  private[functions] def elemType(e: Expression): DataType = t(e)
  private def t(e: Expression): DataType = e match {
    case Literal(s: UTF8String, StringType) =>
      DuckICast.targets.getOrElse(s.toString.toLowerCase, s.toString.toLowerCase match {
        case "double" => DoubleType
        case "float" | "real" => FloatType
        case "varchar" | "text" | "string" => StringType
        case "boolean" | "bool" => BooleanType
        case "date" => DateType
        case "timestamp" => TimestampType
        case other => throw new IllegalArgumentException(
          s"duck_acast: unsupported element type $other")
      })
    case _ => throw new IllegalArgumentException(
      "duck_acast expects a literal type name")
  }
  val builder: Seq[Expression] => Expression = a => DuckACast(a(0), t(a(1)))
}

/** duck epoch(ts): seconds since the epoch as DOUBLE incl. fraction
  * (probed: epoch(…00.5) = 0.5). */
case class DuckEpoch(child: Expression)
  extends UnaryExpression with RuntimeReplaceable {

  override lazy val replacement: Expression =
    Divide(Cast(UnixMicros(Cast(child, TimestampType,
      Option(SQLConf.get.sessionLocalTimeZone))), DoubleType),
      Literal(1e6))

  override def prettyName: String = "epoch"
  override protected def withNewChildInternal(c: Expression): DuckEpoch =
    copy(child = c)
}

/** duck typeof(x): the REFERENCE's type names, resolved at plan time
  * from the child's data type (probed r16: INTEGER / BIGINT / VARCHAR /
  * DECIMAL(2,1) / INTEGER[] / STRUCT(a INTEGER) / MAP(VARCHAR, INTEGER)
  * / "NULL" for the null literal) — Spark's own typeof renders its
  * lowercase names ("int", "decimal(11,1)"), a silent text divergence
  * on every shared typeof call. */
case class DuckTypeof(child: Expression)
  extends UnaryExpression with RuntimeReplaceable {

  override lazy val replacement: Expression =
    Literal(UTF8String.fromString(DuckTypeof.name(child.dataType)), StringType)

  override def prettyName: String = "typeof"
  override protected def withNewChildInternal(c: Expression): DuckTypeof =
    copy(child = c)
}

object DuckTypeof {
  def name(dt: DataType): String = dt match {
    case NullType => "\"NULL\""
    case ByteType => "TINYINT"
    case ShortType => "SMALLINT"
    case IntegerType => "INTEGER"
    case LongType => "BIGINT"
    case FloatType => "FLOAT"
    case DoubleType => "DOUBLE"
    case StringType => "VARCHAR"
    case BooleanType => "BOOLEAN"
    case BinaryType => "BLOB"
    case DateType => "DATE"
    case TimestampType | TimestampNTZType => "TIMESTAMP"
    case d: DecimalType => s"DECIMAL(${d.precision},${d.scale})"
    case _: DayTimeIntervalType | _: YearMonthIntervalType |
         CalendarIntervalType => "INTERVAL"
    case ArrayType(et, _) => name(et) + "[]"
    case MapType(k, v, _) => s"MAP(${name(k)}, ${name(v)})"
    case st: StructType =>
      st.fields.map(f => s"${f.name} ${name(f.dataType)}")
        .mkString("STRUCT(", ", ", ")")
    case other => other.sql
  }
  val builder: Seq[Expression] => Expression = a => DuckTypeof(a.head)
}

/** duck bit_count: popcount at the INPUT's width (probed r16:
  * bit_count(CAST(-1 AS TINYINT)) = 8 where Spark promotes and answers
  * 64 — silent wrong on every negative narrow input). */
case class DuckBitCount(child: Expression)
  extends UnaryExpression with RuntimeReplaceable {

  override lazy val replacement: Expression = child.dataType match {
    case ByteType => BitwiseCount(
      BitwiseAnd(Cast(child, LongType), Literal(0xFFL)))
    case ShortType => BitwiseCount(
      BitwiseAnd(Cast(child, LongType), Literal(0xFFFFL)))
    case IntegerType => BitwiseCount(
      BitwiseAnd(Cast(child, LongType), Literal(0xFFFFFFFFL)))
    case _ => BitwiseCount(child)
  }

  override def prettyName: String = "bit_count"
  override protected def withNewChildInternal(c: Expression): DuckBitCount =
    copy(child = c)
}

/** duck date_trunc: result TYPE is DATE for day-or-coarser units and
  * TIMESTAMP for sub-day units, regardless of the input's type (probed
  * r16); decade/century/millennium floor the year (probed: 2024 →
  * 2020 / 2000 / 2000) where Spark returns NULL — silent wrong. */
case class DuckDateTrunc(unit: Expression, child: Expression)
  extends BinaryExpression with RuntimeReplaceable {
  import DuckEdges.tzOpt

  override def left: Expression = unit
  override def right: Expression = child

  override lazy val replacement: Expression = {
    val u = unit match {
      case Literal(s: UTF8String, StringType) => s.toString.toLowerCase
      case _ => throw new IllegalArgumentException(
        "date_trunc requires a literal unit")
    }
    val ts = Cast(child, TimestampType, tzOpt)
    def yearFloor(div: Int): Expression =
      MakeDate(Multiply(Cast(Floor(Divide(
        Cast(Year(Cast(child, DateType, tzOpt)), DoubleType),
        Literal(div.toDouble))), IntegerType), Literal(div)),
        Literal(1), Literal(1))
    u match {
      case "decade" | "decades" => yearFloor(10)
      case "century" | "centuries" => yearFloor(100)
      case "millennium" | "millennia" => yearFloor(1000)
      case "year" | "years" | "quarter" | "quarters" | "month" | "months" |
           "week" | "weeks" | "day" | "days" =>
        // day-or-coarser → DATE (probed even for timestamp inputs)
        Cast(TruncTimestamp(Literal(UTF8String.fromString(u), StringType),
          ts, tzOpt), DateType, tzOpt)
      case _ =>
        // sub-day units keep TIMESTAMP (probed even for date inputs)
        TruncTimestamp(unit, ts, tzOpt)
    }
  }

  override def prettyName: String = "date_trunc"
  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): DuckDateTrunc = copy(unit = l, child = r)
}

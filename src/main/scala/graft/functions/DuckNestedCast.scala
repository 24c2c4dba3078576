package graft.functions

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, MapData}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Nested-type CASTs with the reference's semantics (r17, BATTERY7):
  * duck casts STRUCTs BY NAME — case-insensitive field match, output
  * reordered to the TARGET's field order (`{'b':1,'a':2}::STRUCT(a
  * INT, b INT)` → `{'a': 2, 'b': 1}`, probed) — with its two named
  * errors on field-set mismatch; `TRY_CAST` nulls the failing LEAF
  * (list element / struct field), not the whole value (probed:
  * `TRY_CAST(['1','x','3'] AS INT[])` → `[1, NULL, 3]`). Spark's
  * `Cast` is positional for structs and `try_cast` nulls the whole
  * value, so the dialect routes `STRUCT(…)`/`MAP(…)`/multi-dim `[]`
  * cast targets through `duck_ncast`/`duck_try_ncast` instead
  * (SqlDialect.rewriteCasts).
  */
object DuckTypeText {

  /** Parse the reference's type text → Spark DataType:
    * `STRUCT(name TYPE, …)`, `MAP(K, V)`, `T[]` (any depth; fixed
    * `T[n]` reads as list), `DECIMAL(p,s)`, and the scalar names the
    * cast family already maps. */
  def parse(s: String): DataType = {
    val (dt, rest) = parseOne(s.trim)
    require(rest.trim.isEmpty, s"duck type text: trailing '$rest' in '$s'")
    dt
  }

  private def parseOne(s0: String): (DataType, String) = {
    val s = s0.trim
    val lower = s.toLowerCase
    val (base, rest0): (DataType, String) =
      if (lower.startsWith("struct") &&
        s.substring(6).trim.startsWith("(")) {
        var rest = s.substring(s.indexOf('(') + 1)
        val fields = scala.collection.mutable.ArrayBuffer.empty[StructField]
        var done = false
        while (!done) {
          rest = rest.trim
          val (name, afterName) =
            if (rest.startsWith("\"")) {
              val e = rest.indexOf('"', 1)
              (rest.substring(1, e), rest.substring(e + 1))
            } else {
              val e = rest.indexWhere(c => c.isWhitespace)
              (rest.substring(0, e), rest.substring(e))
            }
          val (ft, afterType) = parseOne(afterName)
          fields += StructField(name, ft)
          val t = afterType.trim
          if (t.startsWith(",")) rest = t.substring(1)
          else { require(t.startsWith(")"), s"struct type text: '$t'")
            rest = t.substring(1); done = true }
        }
        (StructType(fields.toSeq), rest)
      } else if (lower.startsWith("map") &&
        s.substring(3).trim.startsWith("(")) {
        val inner = s.substring(s.indexOf('(') + 1)
        val (kt, afterK) = parseOne(inner)
        val t1 = afterK.trim
        require(t1.startsWith(","), s"map type text: '$t1'")
        val (vt, afterV) = parseOne(t1.substring(1))
        val t2 = afterV.trim
        require(t2.startsWith(")"), s"map type text: '$t2'")
        (MapType(kt, vt), t2.substring(1))
      } else {
        // scalar: ident [(args)] — consume the name token and an
        // optional parenthesized argument list (DECIMAL(p,s), VARCHAR(n))
        val nameEnd0 = s.indexWhere(c => !c.isLetterAndDigitOrUnderscore)
        val nameEnd = if (nameEnd0 < 0) s.length else nameEnd0
        val name = s.substring(0, nameEnd).toLowerCase
        var rest = s.substring(nameEnd).trim
        var args = Seq.empty[Int]
        if (rest.startsWith("(")) {
          val close = rest.indexOf(')')
          args = rest.substring(1, close).split(',').toSeq
            .map(_.trim).filter(_.nonEmpty).map(_.toInt)
          rest = rest.substring(close + 1)
        }
        (scalar(name, args), rest)
      }
    // array suffixes: [] or [n] (fixed arrays read as lists), any depth
    var dt = base
    var rest = rest0.trim
    while (rest.startsWith("[")) {
      val close = rest.indexOf(']')
      require(close > 0, s"array type text: '$rest'")
      dt = ArrayType(dt)
      rest = rest.substring(close + 1).trim
    }
    (dt, rest)
  }

  private implicit class CharOps(private val c: Char) extends AnyVal {
    def isLetterAndDigitOrUnderscore: Boolean =
      c.isLetterOrDigit || c == '_'
  }

  private def scalar(name: String, args: Seq[Int]): DataType = name match {
    case "decimal" | "numeric" =>
      if (args.length == 2) DecimalType(args.head, args(1))
      else if (args.length == 1) DecimalType(args.head, 0)
      else DecimalType(18, 3) // the reference's bare-DECIMAL default
    case "varchar" | "text" | "string" | "char" | "bpchar" | "uuid" =>
      StringType
    case "boolean" | "bool" | "logical" => BooleanType
    case "double" | "float8" => DoubleType
    case "float" | "real" | "float4" => FloatType
    case "date" => DateType
    case "timestamp" | "datetime" => TimestampNTZType
    case "timestamptz" => TimestampType
    case "blob" | "bytea" | "binary" | "varbinary" => BinaryType
    case "hugeint" => DecimalType(38, 0)
    case other =>
      DuckICast.targets.getOrElse(other, throw new IllegalArgumentException(
        s"duck_ncast: unsupported type name '$other'"))
  }

  /** The reference's display name for a type — used in its error
    * texts (`STRUCT(a INTEGER, b VARCHAR)`). */
  def duckName(dt: DataType): String = dt match {
    case st: StructType => st.fields
      .map(f => s"${f.name} ${duckName(f.dataType)}").mkString("STRUCT(", ", ", ")")
    case ArrayType(et, _) => duckName(et) + "[]"
    case MapType(k, v, _) => s"MAP(${duckName(k)}, ${duckName(v)})"
    case IntegerType => "INTEGER"
    case LongType => "BIGINT"
    case ShortType => "SMALLINT"
    case ByteType => "TINYINT"
    case StringType => "VARCHAR"
    case d: DecimalType => s"DECIMAL(${d.precision},${d.scale})"
    case TimestampNTZType => "TIMESTAMP"
    case TimestampType => "TIMESTAMP WITH TIME ZONE"
    case other => other.sql
  }
}

/** duck CAST to a nested target: structs matched BY NAME (reordered to
  * target order, duck's exact mismatch error texts), lists recast
  * element-wise, maps key/value-wise; `isTry` nulls failing LEAVES.
  * NULL input stays NULL at every level (probed n12/n14: a NULL struct
  * casts to NULL, a present struct with a failing field casts to a
  * struct with a NULL field). */
case class DuckNamedCast(child: Expression, target: DataType, isTry: Boolean)
  extends UnaryExpression with RuntimeReplaceable {

  override lazy val replacement: Expression = build(child, target)

  private def tz = Option(
    org.apache.spark.sql.internal.SQLConf.get.sessionLocalTimeZone)

  private def leaf(e: Expression, t: DataType): Expression = {
    val c = t match {
      case StringType => DuckStrCast(e)
      case _ => Cast(e, t, tz)
    }
    if (isTry) TryEval(c) else c
  }

  private def build(e: Expression, t: DataType): Expression =
    (e.dataType, t) match {
      case (a, b) if a == b => e
      case (NullType, b) => Literal.create(null, b)
      case (cs: StructType, ts: StructType) =>
        if (cs.length != ts.length) throw new IllegalArgumentException(
          s"Mismatch Type Error: Type ${DuckTypeText.duckName(cs)} does " +
            s"not match with ${DuckTypeText.duckName(ts)}. Cannot cast " +
            "STRUCTs of different size")
        val tNames = ts.fieldNames.map(_.toLowerCase).toSet
        cs.fieldNames.find(n => !tNames(n.toLowerCase)).foreach { n =>
          throw new IllegalArgumentException(
            s"Mismatch Type Error: Type ${DuckTypeText.duckName(cs)} does " +
              s"not match with ${DuckTypeText.duckName(ts)}. Cannot cast " +
              s"""STRUCTs - element "$n" in source struct was not found """ +
              "in target struct")
        }
        val byName = cs.fieldNames.zipWithIndex
          .map { case (n, i) => n.toLowerCase -> i }.toMap
        val parts = ts.fields.flatMap { tf =>
          // a source struct with case-insensitive DUPLICATE field names
          // collapses byName, so a target field can be unmatched even
          // after the subset check above — raise the reference's
          // Mismatch Type Error, not a raw NoSuchElementException
          // (r17 advice)
          val i = byName.getOrElse(tf.name.toLowerCase,
            throw new IllegalArgumentException(
              s"Mismatch Type Error: Type ${DuckTypeText.duckName(cs)} " +
                s"does not match with ${DuckTypeText.duckName(ts)}. Cannot " +
                s"""cast STRUCTs - element "${tf.name}" in target struct """ +
                "was not found in source struct"))
          Seq(Literal(UTF8String.fromString(tf.name), StringType),
            build(GetStructField(e, i, Some(cs.fields(i).name)), tf.dataType))
        }
        val cns = CreateNamedStruct(parts.toSeq)
        If(IsNull(e), Literal.create(null, cns.dataType), cns)
      case (ca: ArrayType, ta: ArrayType) =>
        val lv = NamedLambdaVariable("x", ca.elementType, ca.containsNull)
        ArrayTransform(e, LambdaFunction(build(lv, ta.elementType), Seq(lv)))
      case (cm: MapType, tm: MapType) =>
        // decompose to key/value arrays and rebuild — ArrayTransform's
        // manual-lambda construction resolves cleanly where the
        // TransformKeys/TransformValues pair does not
        val kv = NamedLambdaVariable("k", cm.keyType, nullable = false)
        val vv = NamedLambdaVariable("v", cm.valueType, cm.valueContainsNull)
        val keys = ArrayTransform(MapKeys(e),
          LambdaFunction(build(kv, tm.keyType), Seq(kv)))
        val vals = ArrayTransform(MapValues(e),
          LambdaFunction(build(vv, tm.valueType), Seq(vv)))
        val rebuilt = MapFromArrays(keys, vals)
        // a TRY-nulled KEY is unrepresentable in a Spark map (the
        // reference keeps a literal NULL key, probed) — the whole map
        // goes NULL instead of crashing on MapFromArrays' null-key
        // check; documented deviation, error → NULL, never a throw
        if (isTry) TryEval(rebuilt) else rebuilt
      case (_, st: StructType) =>
        // probed: TRY_CAST('abc' AS STRUCT(…)) is NULL, plain CAST is
        // the reference's conversion error
        if (isTry) Literal.create(null, st)
        else throw new IllegalArgumentException(
          s"Conversion Error: Type ${DuckTypeText.duckName(e.dataType)} " +
            "can't be cast to the destination type STRUCT")
      case _ => leaf(e, t)
    }

  override def prettyName: String =
    if (isTry) "duck_try_ncast" else "duck_ncast"
  override protected def withNewChildInternal(c: Expression): DuckNamedCast =
    copy(child = c)
}

object DuckNamedCast {
  private def t(e: Expression): DataType = e match {
    case Literal(s: UTF8String, StringType) => DuckTypeText.parse(s.toString)
    case _ => throw new IllegalArgumentException(
      "duck_ncast expects a literal type text")
  }
  val builder: Seq[Expression] => Expression =
    a => DuckNamedCast(a(0), t(a(1)), isTry = false)
  val tryBuilder: Seq[Expression] => Expression =
    a => DuckNamedCast(a(0), t(a(1)), isTry = true)
}

/** duck `CAST(complex AS VARCHAR)` rendering (probed r17): lists as
  * `[e1, e2]` with `NULL` members and RAW (unquoted) strings — even
  * with embedded commas; structs as `{'key': value}` with quoted keys
  * and raw values; maps as `{k=v}`; doubles in shortest-round-trip
  * form (`2.0`, `0.1`); dates/timestamps in the reference's text
  * forms. Spark's own cast differs on every one of these (`null` vs
  * `NULL`, `{1, x}` for structs). */
case class DuckRenderStr(child: Expression) extends UnaryExpression
  with CodegenFallback {

  override def dataType: DataType = StringType

  override protected def nullSafeEval(v: Any): Any =
    UTF8String.fromString(DuckRenderStr.render(v, child.dataType))

  override def prettyName: String = "duck_render_str"
  override protected def withNewChildInternal(c: Expression): DuckRenderStr =
    copy(child = c)
}

object DuckRenderStr {
  def render(v: Any, dt: DataType): String = dt match {
    case ArrayType(et, _) =>
      val a = v.asInstanceOf[ArrayData]
      (0 until a.numElements()).map { i =>
        if (a.isNullAt(i)) "NULL" else render(a.get(i, et), et)
      }.mkString("[", ", ", "]")
    case st: StructType =>
      val r = v.asInstanceOf[InternalRow]
      st.fields.zipWithIndex.map { case (f, i) =>
        val fv = if (r.isNullAt(i)) "NULL" else render(r.get(i, f.dataType), f.dataType)
        s"'${f.name}': $fv"
      }.mkString("{", ", ", "}")
    case mt: MapType =>
      val m = v.asInstanceOf[MapData]
      val ks = m.keyArray(); val vs = m.valueArray()
      (0 until m.numElements()).map { i =>
        val k = render(ks.get(i, mt.keyType), mt.keyType)
        val x = if (vs.isNullAt(i)) "NULL"
          else render(vs.get(i, mt.valueType), mt.valueType)
        s"$k=$x"
      }.mkString("{", ", ", "}")
    case DoubleType => DuckArith.pyReprD(v.asInstanceOf[Double]).toString
    case FloatType => DuckArith.pyReprF(v.asInstanceOf[Float]).toString
    case d: DecimalType =>
      v.asInstanceOf[Decimal].toJavaBigDecimal.toPlainString
    case BooleanType => if (v.asInstanceOf[Boolean]) "true" else "false"
    case DateType =>
      java.time.LocalDate.ofEpochDay(v.asInstanceOf[Int].toLong).toString
    case BinaryType =>
      // the reference's blob text: printable ASCII raw, \xNN otherwise
      val bytes = v.asInstanceOf[Array[Byte]]
      val b = new StringBuilder
      bytes.foreach { x =>
        val c = x & 0xff
        if (c >= 32 && c <= 126 && c != '\\') b.append(c.toChar)
        else b.append(f"\\x$c%02X")
      }
      b.toString
    case _: YearMonthIntervalType =>
      DuckEdges.formatMonths(v.asInstanceOf[Int]).toString
    case dt2: DayTimeIntervalType =>
      DuckEdges.formatMicros(v.asInstanceOf[Long],
        dt2.startField <= org.apache.spark.sql.types.DayTimeIntervalType.DAY)
        .toString
    case CalendarIntervalType =>
      val ci = v.asInstanceOf[org.apache.spark.unsafe.types.CalendarInterval]
      DuckEdges.formatCalendar(ci.months, ci.days, ci.microseconds).toString
    case TimestampNTZType | TimestampType =>
      val us = v.asInstanceOf[Long]
      val ldt = java.time.LocalDateTime.ofEpochSecond(
        Math.floorDiv(us, 1000000L),
        (Math.floorMod(us, 1000000L) * 1000L).toInt,
        java.time.ZoneOffset.UTC)
      val frac = Math.floorMod(us, 1000000L)
      val base = f"${ldt.getYear}%04d-${ldt.getMonthValue}%02d-" +
        f"${ldt.getDayOfMonth}%02d ${ldt.getHour}%02d:" +
        f"${ldt.getMinute}%02d:${ldt.getSecond}%02d"
      // NOTE: no '+00' suffix even for TimestampType — duck TIMESTAMP
      // literals land on Spark's TimestampType through the dialect, so
      // the suffix would mis-render the COMMON case; TIMESTAMPTZ
      // rendering therefore drops its offset inside complex values
      // (documented encoding limitation, same class as TIME's long)
      if (frac == 0L) base
      else base + "." + f"$frac%06d".reverse.dropWhile(_ == '0').reverse
    case _ => v.toString // ints, strings (UTF8String.toString), rest
  }
}

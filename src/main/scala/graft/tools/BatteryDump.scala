package graft.tools

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

import graft.Engine

/** Dev harness for hand-adversarial differential batteries (the r14c
  * method, institutionalized per the round-14 verdict): reads a TSV of
  * `name<TAB>sql` statements, executes each VERBATIM through the graft
  * dialect (`Engine.sql`), and dumps a JSON map of rendered results or
  * error strings. A python pairing script runs the same statements on
  * DuckDB and diffs the two sides; every divergence gets a disposition
  * (fix / guardrail / documented).
  *
  * Usage: runMain graft.tools.BatteryDump <statements.tsv> <out.json> [sfDir]
  */
object BatteryDump {
  private def jstr(s: String): String = {
    val b = new StringBuilder("\"")
    s.foreach {
      case '"'           => b.append("\\\"")
      case '\\'          => b.append("\\\\")
      case '\n'          => b.append("\\n")
      case '\r'          => b.append("\\r")
      case '\t'          => b.append("\\t")
      case c if c < ' '  => b.append(f"\\u${c.toInt}%04x")
      case c             => b.append(c)
    }
    b.append('"').toString
  }

  /** Render a cell the way the duck side's python renderer does, so the
    * comparer can diff strings directly (floats via Double.toString,
    * which python mirrors with repr for the values we probe). */
  private def cell(v: Any): String = v match {
    case null                => "NULL"
    case b: Array[Byte]      => b.map("%02x".format(_)).mkString
    case s: java.sql.Timestamp => s.toInstant.toString
    case d: java.math.BigDecimal => d.toPlainString
    case a: scala.collection.Seq[_] => a.map(cell).mkString("[", ", ", "]")
    case m: scala.collection.Map[_, _] =>
      m.toSeq.map { case (k, x) => cell(k) + "=" + cell(x) }
        .sorted.mkString("{", ", ", "}")
    case r: org.apache.spark.sql.Row if r.schema != null =>
      // python's duckdb driver fetches STRUCTs as dicts; the comparer
      // renders dicts as sorted k=v — mirror that so struct-valued
      // results diff by FIELD, not by tuple position (r17)
      r.schema.fieldNames.zipWithIndex
        .map { case (n, i) => cell(n) + "=" + cell(r.get(i)) }
        .sorted.mkString("{", ", ", "}")
    case r: org.apache.spark.sql.Row =>
      r.toSeq.map(cell).mkString("(", ", ", ")")
    case x                   => x.toString
  }

  def main(args: Array[String]): Unit = {
    val in = args(0)
    val out = args(1)
    val sfDir = if (args.length > 2) args(2) else "/root/testdata/sf0.01"
    val spark = Engine.session(
      s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")}]")
    Engine.registerAll(spark, sfDir)

    val lines = Files.readAllLines(Paths.get(in), StandardCharsets.UTF_8)
    val entries = scala.collection.mutable.ArrayBuffer[String]()
    lines.forEach { line =>
      if (line.nonEmpty && !line.startsWith("#")) {
        val i = line.indexOf('\t')
        val name = line.substring(0, i)
        val sql = line.substring(i + 1).replace("\\n", "\n")
        val body =
          try {
            val df = Engine.sql(spark, sql)
            val schema = df.schema.fields
              .map(f => f.name + ":" + f.dataType.simpleString).mkString(",")
            val rows = df.collect().toSeq.map(r =>
              "[" + r.toSeq.map(c => jstr(cell(c))).mkString(",") + "]")
            s"""{"ok":true,"schema":${jstr(schema)},"rows":[${rows.mkString(",")}]}"""
          } catch {
            case e: Throwable =>
              val msg = Option(e.getMessage).getOrElse(e.getClass.getName)
              s"""{"ok":false,"err":${jstr(msg.take(300))}}"""
          }
        entries += s"${jstr(name)}:$body"
      }
    }
    Files.write(Paths.get(out),
      ("{" + entries.mkString(",\n") + "}").getBytes(StandardCharsets.UTF_8))
    println(s"BATTERY ${entries.size} statements -> $out")
    spark.stop()
  }
}

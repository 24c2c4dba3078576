package graft

/** Shared SQL lexer for the dialect shim (SURVEY §7.2; the reference's
  * answer is a vendored Postgres grammar — duckdb-libpg_query.cpp,
  * Parser::ParseQuery duckdb-8.cpp:7252 — ours is at least one lexer
  * instead of four keyword scanners). One tokenizer feeds:
  *
  *  - [[clauseAt]] — the COLLATE position classifier (sort / select /
  *    group / pred / func), previously a ~70-line char-walking state
  *    machine patched per blind spot (round-10 verdict "What's missing
  *    #1"). The token stream also fixes the two residual blind spots:
  *    nested CASE restores the ENCLOSING clause on END via a real
  *    stack (the old machine reset to `select`, silently DROPPING a
  *    COLLATE in `WHERE CASE … END … COLLATE` instead of raising), and
  *    quoted identifiers (`"order"`, `"group by"`) can no longer
  *    masquerade as clause keywords.
  *  - [[keywordIndex]] — depth-0 keyword lookup (QUALIFY / ORDER /
  *    LIMIT / FROM boundaries), replacing the char-walking
  *    topLevelIndex; a keyword is a BARE identifier token, so `t."from"`
  *    or a string literal can never match.
  *  - [[splitWithPrefix]] — the leading `WITH name [(cols)] AS (…), …`
  *    splitter, previously hand-matched text (the round-9 AS-token bug
  *    class: `WITH atlas (…)` — structurally impossible on tokens).
  *
  * Tokens carry [start, end) offsets into the ORIGINAL text so the
  * regex-based rewriters keep splicing on exact positions.
  */
private[graft] object SqlLex {

  sealed abstract class Kind
  /** Bare identifier / keyword candidate. */
  case object Ident extends Kind
  /** Quoted identifier: "x" (the SQL standard / reference form) or
    * `x` (Spark). Square brackets are deliberately NOT identifiers:
    * the reference has no bracket idents but plenty of bracket LIST
    * syntax (`[1,2,3]` literals, `w[i]` indexing, `names=['a','b']`
    * read_csv args) that a bracket-ident rule would mangle
    * (self-review r11 #1) — `[`/`]` stay plain punctuation. */
  case object QIdent extends Kind
  case object Str extends Kind
  case object Num extends Kind
  case object Punct extends Kind
  case object LParen extends Kind
  case object RParen extends Kind

  final case class Tok(kind: Kind, lower: String, start: Int, end: Int)

  /** Tokenize `s`. Comments are expected to be stripped already
    * (SqlDialect.stripComments runs before every rewrite). Unterminated
    * quotes consume to end-of-string, matching the char-walkers this
    * replaces. */
  def tokenize(s: String): Vector[Tok] = {
    val out = Vector.newBuilder[Tok]
    val n = s.length
    var i = 0
    while (i < n) {
      val c = s.charAt(i)
      if (c.isWhitespace) i += 1
      else if (c == '\'') {
        val st = i
        i += 1
        var open = true
        while (open && i < n) {
          if (s.charAt(i) == '\'') {
            if (i + 1 < n && s.charAt(i + 1) == '\'') i += 2
            else { open = false; i += 1 }
          } else i += 1
        }
        out += Tok(Str, "", st, i)
      } else if (c == '"' || c == '`') {
        val st = i
        i += 1
        var open = true
        while (open && i < n) {
          if (s.charAt(i) == c) {
            if (i + 1 < n && s.charAt(i + 1) == c) i += 2
            else { open = false; i += 1 }
          } else i += 1
        }
        out += Tok(QIdent, s.substring(st, i), st, i)
      } else if (c == '(') { out += Tok(LParen, "(", i, i + 1); i += 1 }
      else if (c == ')') { out += Tok(RParen, ")", i, i + 1); i += 1 }
      else if (c.isLetter || c == '_') {
        val st = i
        while (i < n && (s.charAt(i).isLetterOrDigit || s.charAt(i) == '_')) i += 1
        out += Tok(Ident, s.substring(st, i).toLowerCase, st, i)
      } else if (c.isDigit) {
        val st = i
        while (i < n && (s.charAt(i).isLetterOrDigit || s.charAt(i) == '.')) i += 1
        out += Tok(Num, s.substring(st, i), st, i)
      } else {
        // 2-char operators kept whole so `::`/`:=`/`||`/`<=` splice as units
        val two = if (i + 1 < n) s.substring(i, i + 2) else ""
        val w = if (Set("||", "<=", ">=", "<>", "!=", "::", ":=").contains(two)) 2 else 1
        out += Tok(Punct, s.substring(i, i + w), i, i + w)
        i += w
      }
    }
    out.result()
  }

  /** Identifiers that make a following `(` a GROUPING paren (inherits
    * the clause context) rather than a function call. */
  private val nonCallWords = Set(
    "on", "in", "by", "over", "and", "or", "not", "when", "then",
    "else", "where", "select", "from", "values", "using", "as",
    "exists", "between", "all", "any", "some", "distinct")

  /** Clause context at character offset `pos`: one of "select", "sort",
    * "group", "pred", "func". Single-operand COLLATE folds in "sort",
    * drops in "select", and raises elsewhere (see SqlDialect). */
  def clauseAt(s: String, pos: Int): String = clauseAt(tokenize(s), pos)

  def clauseAt(toks: Vector[Tok], pos: Int): String = {
    // context stack per paren depth; CASE nesting is its own stack of
    // saved contexts (END must restore the clause the CASE opened in —
    // a WHERE CASE … END stays a predicate after the END)
    var ctx = List("select")
    var caseSaved = List.empty[String]
    var prevLower = ""
    var prevKind: Kind = Punct
    var prevPunct = ""
    var k = 0
    while (k < toks.length && toks(k).start < pos) {
      val t = toks(k)
      t.kind match {
        case LParen =>
          val isCall = prevKind == Ident && !nonCallWords(prevLower)
          ctx = (if (isCall) "func" else ctx.head) :: ctx
        case RParen =>
          if (ctx.tail.nonEmpty) ctx = ctx.tail
        case Ident if !(prevKind == Punct && prevPunct == ".") =>
          val next = if (k + 1 < toks.length) toks(k + 1) else null
          def nextIs(w: String) = next != null && next.kind == Ident && next.lower == w
          t.lower match {
            case "order" | "partition" if nextIs("by") => ctx = "sort" :: ctx.tail
            case "group" if nextIs("by") => ctx = "group" :: ctx.tail
            case "select" | "values" | "returning" => ctx = "select" :: ctx.tail
            case "where" | "having" | "qualify" => ctx = "pred" :: ctx.tail
            case "case" =>
              caseSaved = ctx.head :: caseSaved
              // a simple-CASE operand is a MATCHING position (its
              // collation decides which WHEN hits) — classify like a
              // predicate so a COLLATE there raises instead of dropping
              ctx = "pred" :: ctx.tail
            case "when" => ctx = "pred" :: ctx.tail
            case "then" | "else" => ctx = "select" :: ctx.tail
            case "end" =>
              caseSaved match {
                case h :: rest => ctx = h :: ctx.tail; caseSaved = rest
                case Nil => ctx = "select" :: ctx.tail
              }
            case "on" if prevLower == "distinct" => ctx = "sort" :: ctx.tail
            case "on" if !nextIs("conflict") => ctx = "pred" :: ctx.tail
            case _ => ()
          }
        case _ => ()
      }
      if (t.kind == Ident) prevLower = t.lower
      else if (t.kind != LParen && t.kind != RParen) prevLower = ""
      prevPunct = if (t.kind == Punct) t.lower else ""
      prevKind = t.kind
      k += 1
    }
    ctx.head
  }

  /** Lowercased name of the INNERMOST function call whose argument list
    * encloses `pos`, or "" when pos is inside no call. Plain parens are
    * transparent — reference-probed: `min((x COLLATE NOCASE))` still
    * binds the collation — while any intervening CALL bounds the search
    * (`min(concat(x COLLATE NOCASE,''))` is byte-ordered: an annotation
    * does not survive a function result). Used by the dialect's COLLATE
    * classifier to distinguish comparison-binding aggregates
    * (min/max/arg_min…) from scalar calls, whose arguments ignore the
    * annotation. */
  def callNameAt(s: String, pos: Int): String = callNameAt(tokenize(s), pos)

  def callNameAt(toks: Vector[Tok], pos: Int): String = {
    var stack = List.empty[String]
    var prevKind: Kind = Punct
    var prevLower = ""
    var k = 0
    while (k < toks.length && toks(k).start < pos) {
      val t = toks(k)
      t.kind match {
        case LParen =>
          val isCall = prevKind == Ident && !nonCallWords(prevLower)
          // an OVER (...) frame or a subquery frame (next token SELECT /
          // WITH / VALUES) is not a call, but BOUNDS the search: a
          // window's ORDER BY key — or a subquery's own ORDER BY — is
          // not an argument of whatever call the expression sits inside
          val nxt = if (k + 1 < toks.length) toks(k + 1) else null
          val isSubquery = nxt != null && nxt.kind == Ident &&
            (nxt.lower == "select" || nxt.lower == "with" || nxt.lower == "values")
          val marker =
            if (isSubquery) "over" // same boundary semantics
            else if (isCall) prevLower
            else if (prevKind == Ident && prevLower == "over") "over"
            else ""
          stack = marker :: stack
        case RParen => if (stack.nonEmpty) stack = stack.tail
        case _ => ()
      }
      if (t.kind == Ident) prevLower = t.lower
      else if (t.kind != LParen && t.kind != RParen) prevLower = ""
      prevKind = t.kind
      k += 1
    }
    stack.find(_.nonEmpty) match {
      case Some("over") | None => ""
      case Some(n) => n
    }
  }

  // ---- expression operand spans (r14 — the token-structural
  // replacement for the COLLATE pass's textual `opnd` regex, whose
  // atom shapes capped paren nesting at two levels and could not see
  // bracket indexing or quoted identifiers containing quotes) ----

  /** Chain operators that extend an operand across atoms: `a || b`,
    * `a + b * c`, `x::VARCHAR` are each ONE operand for collation
    * binding (the annotation attaches to the whole chain's result —
    * reference-probed r12/r14). Comparison operators deliberately NOT
    * here: they SEPARATE the two operands a comparison-site COLLATE
    * folds. */
  private val chainOps = Set("||", "+", "-", "*", "/", "::")

  private def isAtomIdent(t: Tok): Boolean =
    t.kind == Ident || t.kind == QIdent

  /** Bare identifiers that terminate an expression rather than name a
    * value — a chain walk that lands on one of these has walked out of
    * the expression (`CASE … END = x COLLATE NOCASE` must not take
    * `end` for the left operand; quoted or dotted forms are real
    * column references and stay atoms). */
  private val nonAtomWords = Set(
    "and", "or", "not", "in", "is", "like", "ilike", "glob", "similar",
    "between", "escape", "case", "when", "then", "else", "end", "over",
    "partition", "order", "group", "by", "from", "where", "select",
    "distinct", "as", "on", "using", "join", "union", "all", "intersect",
    "except", "limit", "offset", "having", "window", "qualify", "asc",
    "desc", "nulls", "collate", "interval", "exists", "any", "some",
    "values", "with", "filter", "within")

  /** Start index (inclusive) of the widest operand chain whose LAST
    * token is `j`, or -1 when toks(j) cannot end an operand. Atoms:
    * string/number literal, dotted identifier chain, call with balanced
    * args (dotted name allowed), parenthesized group, bracket-index
    * suffix on any of those. */
  def operandStart(toks: Vector[Tok], j: Int): Int =
    operandStart(toks, j, chainOps)

  /** As [[operandStart]] with an explicit chain-operator set — the
    * `//` rewrite needs multiplicative-precedence chains only. */
  def operandStart(toks: Vector[Tok], j: Int, ops: Set[String]): Int = {
    def matchLeft(close: Int, isBracket: Boolean): Int = {
      var depth = 0
      var i = close
      while (i >= 0) {
        val t = toks(i)
        val shuts = if (isBracket) t.kind == Punct && t.lower == "]"
                    else t.kind == RParen
        val opens = if (isBracket) t.kind == Punct && t.lower == "["
                    else t.kind == LParen
        if (shuts) depth += 1
        if (opens) { depth -= 1; if (depth == 0) return i }
        i -= 1
      }
      -1
    }
    def dotChainStart(i: Int): Int = {
      var s = i
      while (s - 2 >= 0 && toks(s - 1).kind == Punct && toks(s - 1).lower == "." &&
        isAtomIdent(toks(s - 2))) s -= 2
      s
    }
    def atomStart(i: Int): Int = {
      if (i < 0) return -1
      toks(i).kind match {
        case Str | Num => i
        case Ident if toks(i).lower == "end" && dotChainStart(i) == i =>
          // CASE … END is one atom (duck-probed r14: `ORDER BY CASE …
          // END COLLATE NOCASE` folds the whole case result; the old
          // regex dropped the annotation silently). Nested CASEs tracked
          // by depth; paren groups skipped whole so a parenthesized
          // `(end)` alias inside can't miscount.
          var depth = 1
          var m = i - 1
          while (m >= 0 && depth > 0) {
            val w = toks(m)
            if (w.kind == RParen) m = matchLeft(m, isBracket = false) - 1
            else {
              if (w.kind == Ident && w.lower == "end") depth += 1
              else if (w.kind == Ident && w.lower == "case") depth -= 1
              if (depth > 0) m -= 1
            }
          }
          if (m < 0 || depth > 0) -1 else m
        case Ident if dotChainStart(i) == i && nonAtomWords(toks(i).lower) => -1
        case Ident | QIdent => dotChainStart(i)
        case RParen =>
          val m = matchLeft(i, isBracket = false)
          if (m < 0) -1
          else if (m - 1 >= 0 && ((toks(m - 1).kind == Ident &&
            !nonCallWords(toks(m - 1).lower)) || toks(m - 1).kind == QIdent))
            dotChainStart(m - 1) // call: name(…)
          else m // plain paren group
        case Punct if toks(i).lower == "]" =>
          val m = matchLeft(i, isBracket = true)
          if (m <= 0) -1 else atomStart(m - 1) // base[idx]
        case _ => -1
      }
    }
    var s = atomStart(j)
    if (s < 0) return -1
    var more = true
    while (more) {
      more = false
      if (s - 2 >= 0 && toks(s - 1).kind == Punct && ops(toks(s - 1).lower)) {
        val s2 = atomStart(s - 2)
        if (s2 >= 0) { s = s2; more = true }
      }
    }
    s
  }

  /** End index (inclusive) of the widest operand chain whose FIRST
    * token is `j`, or -1. Mirror of [[operandStart]], for the
    * right-hand side of `x COLLATE NOCASE = y`. */
  def operandEnd(toks: Vector[Tok], j: Int): Int =
    operandEnd(toks, j, chainOps)

  def operandEnd(toks: Vector[Tok], j: Int, ops: Set[String]): Int = {
    def matchRight(open: Int, isBracket: Boolean): Int = {
      var depth = 0
      var i = open
      while (i < toks.length) {
        val t = toks(i)
        val opens = if (isBracket) t.kind == Punct && t.lower == "[" else t.kind == LParen
        val shuts = if (isBracket) t.kind == Punct && t.lower == "]" else t.kind == RParen
        if (opens) depth += 1
        if (shuts) { depth -= 1; if (depth == 0) return i }
        i += 1
      }
      -1
    }
    def brackets(i: Int): Int = {
      var e = i
      while (e + 1 < toks.length && toks(e + 1).kind == Punct &&
        toks(e + 1).lower == "[") {
        val m = matchRight(e + 1, isBracket = true)
        if (m < 0) return e
        e = m
      }
      e
    }
    def atomEnd(i: Int): Int = {
      if (i >= toks.length) return -1
      toks(i).kind match {
        case Str | Num => brackets(i)
        case Ident if toks(i).lower == "case" =>
          var depth = 1
          var m = i + 1
          while (m < toks.length && depth > 0) {
            val w = toks(m)
            if (w.kind == LParen) {
              val r = matchRight(m, isBracket = false)
              if (r < 0) return -1
              m = r + 1
            } else {
              if (w.kind == Ident && w.lower == "case") depth += 1
              else if (w.kind == Ident && w.lower == "end") depth -= 1
              if (depth > 0) m += 1
            }
          }
          if (m >= toks.length || depth > 0) -1 else brackets(m)
        case Ident if nonAtomWords(toks(i).lower) => -1
        case Ident | QIdent =>
          var e = i
          while (e + 2 < toks.length && toks(e + 1).kind == Punct &&
            toks(e + 1).lower == "." && isAtomIdent(toks(e + 2))) e += 2
          if (e + 1 < toks.length && toks(e + 1).kind == LParen &&
            !(toks(e).kind == Ident && nonCallWords(toks(e).lower))) {
            val m = matchRight(e + 1, isBracket = false)
            if (m < 0) e else brackets(m)
          } else brackets(e)
        case LParen =>
          val m = matchRight(i, isBracket = false)
          if (m < 0) -1 else brackets(m)
        case _ => -1
      }
    }
    var e = atomEnd(j)
    if (e < 0) return -1
    var more = true
    while (more) {
      more = false
      if (e + 2 < toks.length && toks(e + 1).kind == Punct &&
        ops(toks(e + 1).lower)) {
        val e2 = atomEnd(e + 2)
        if (e2 >= 0) { e = e2; more = true }
      }
    }
    e
  }

  /** First depth-0 occurrence of bare keyword `kw` (case-insensitive),
    * or -1. Quoted identifiers, string literals, and dotted references
    * (`t.from`) never match. */
  def keywordIndex(s: String, kw: String): Int =
    keywordIndex(tokenize(s), kw)

  def keywordIndex(toks: Vector[Tok], kw: String): Int = {
    val w = kw.toLowerCase
    var depth = 0
    var k = 0
    while (k < toks.length) {
      val t = toks(k)
      t.kind match {
        case LParen => depth += 1
        case RParen => depth -= 1
        case Ident if depth == 0 && t.lower == w &&
          !(k > 0 && toks(k - 1).kind == Punct && toks(k - 1).lower == ".") =>
          return t.start
        case _ => ()
      }
      k += 1
    }
    -1
  }

  /** Split a leading `WITH name [(cols)] AS (body) [, …]` chain off a
    * statement: returns (withPrefix, remainder) with offsets on the
    * ORIGINAL text; ("", q) when the text does not start with a WITH
    * chain. Token-structural: a CTE is name → optional paren group →
    * AS token → paren group, so an identifier ENDING in "as"
    * (`WITH atlas (a) AS (…)`) can never be taken for the keyword. */
  def splitWithPrefix(q: String): (String, String) = {
    val toks = tokenize(q)
    if (toks.isEmpty || toks.head.kind != Ident || toks.head.lower != "with")
      return ("", q)
    var k = 1
    def skipGroup(): Boolean = {
      // toks(k) must be LParen; advance past its matching RParen
      if (k >= toks.length || toks(k).kind != LParen) return false
      var depth = 0
      while (k < toks.length) {
        toks(k).kind match {
          case LParen => depth += 1
          case RParen =>
            depth -= 1
            if (depth == 0) { k += 1; return true }
          case _ => ()
        }
        k += 1
      }
      false
    }
    var end = -1
    var done = false
    while (!done) {
      // name
      if (k >= toks.length ||
        (toks(k).kind != Ident && toks(k).kind != QIdent)) done = true
      else {
        k += 1
        // RECURSIVE prefix: `WITH RECURSIVE name …`. A bare identifier
        // `recursive` that is itself the CTE NAME (`WITH recursive AS
        // (…)`) is disambiguated by lookahead: the keyword reading needs
        // a name after it, and a name cannot be the reserved word `as` —
        // so `recursive as (` means the name was `recursive` (r12,
        // closes the r11 self-review degraded parse). Only BARE idents
        // take the keyword reading; `"recursive"` is always a name.
        if (k < toks.length && toks(k - 1).kind == Ident &&
          toks(k - 1).lower == "recursive" &&
          (toks(k).kind == Ident || toks(k).kind == QIdent) &&
          !(toks(k).kind == Ident && toks(k).lower == "as" &&
            k + 1 < toks.length && toks(k + 1).kind == LParen)) k += 1
        // optional column list
        if (k < toks.length && toks(k).kind == LParen) {
          if (!skipGroup()) done = true
        }
        // AS (body)
        if (!done) {
          if (k < toks.length && toks(k).kind == Ident && toks(k).lower == "as" &&
            k + 1 < toks.length && toks(k + 1).kind == LParen) {
            k += 1
            if (skipGroup()) {
              end = toks(k - 1).end // past the body's RParen
              if (k < toks.length && toks(k).kind == Punct && toks(k).lower == ",") {
                k += 1 // comma continues the chain
              } else done = true
            } else done = true
          } else done = true
        }
      }
    }
    if (end < 0) ("", q)
    else (q.substring(0, end), q.substring(end))
  }
}

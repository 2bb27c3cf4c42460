package graft.sources

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Jinja SUBSET compiler for kerchunk v1 `templates`/`gen` rendering
  * (the fsspec `reference://` filesystem's v1 spec, which the reference
  * inherits through source.py:70-137): template strings are literal text
  * with `{{ expr }}` substitution holes, where `expr` is an identifier,
  * an integer literal, or integer arithmetic (`+ - * // %`, parens, unary
  * minus) over them — exactly the surface the published spec exercises
  * (`"offset": "{{(i + 10) * 1000}}"`).
  *
  * Spark-first shape: a template is CONSTANT per index (or per gen spec),
  * so it compiles ONCE on the driver into a codegen'd [[Column]] over the
  * per-row dimension values — rendering a million generated refs is a
  * narrow projection, never a driver loop or a UDF.
  *
  * Everything beyond the spec'd surface refuses loudly at compile time:
  * jinja statements/comments (`{%`/`{#`), filters (`|`), attribute access,
  * float division (`/` — jinja's is TRUE division; silently flooring it
  * would corrupt offsets), and arithmetic over string-valued scope entries.
  */
private[graft] object KerchunkTemplates {

  /** A scope value: the column plus whether it is numeric (arithmetic is
    * only defined over numeric values — dimension ranges and integer list
    * entries; template strings and string list entries are text-only). */
  final case class Value(col: Column, numeric: Boolean)

  /** Split a template into literal text (Left) and hole expressions
    * (Right). */
  def segments(template: String, context: String): Seq[Either[String, String]] = {
    require(!template.contains("{%") && !template.contains("{#"),
      s"$context: template '$template' uses jinja statements/comments — beyond the kerchunk v1 spec surface")
    val out = Seq.newBuilder[Either[String, String]]
    var i = 0
    while (i < template.length) {
      val open = template.indexOf("{{", i)
      if (open < 0) { if (i < template.length) out += Left(template.substring(i)); i = template.length }
      else {
        if (open > i) out += Left(template.substring(i, open))
        val close = template.indexOf("}}", open + 2)
        require(close >= 0, s"$context: template '$template' has an unterminated '{{'")
        out += Right(template.substring(open + 2, close))
        i = close + 2
      }
    }
    out.result()
  }

  /** Render a whole template to a STRING column. Numeric hole values
    * render as decimal (python `str(int)`); string values verbatim. */
  def render(template: String, scope: String => Option[Value], context: String): Column = {
    val parts = segments(template, context).map {
      case Left(text)  => lit(text)
      case Right(expr) =>
        val v = compileExpr(expr, scope, context)
        if (v.numeric) v.col.cast("string") else v.col
    }
    if (parts.isEmpty) lit("") else if (parts.size == 1) parts.head else concat(parts: _*)
  }

  /** Render a template that must produce an INTEGER (gen `offset`/
    * `length`: fsspec does `int(render(...))`). */
  def renderLong(template: String, scope: String => Option[Value], context: String): Column =
    render(template, scope, context).cast("long")

  // ------------------------------------------------------ expression parser
  private sealed trait Tok
  private case class TNum(v: Long) extends Tok
  private case class TId(name: String) extends Tok
  private case class TOp(op: String) extends Tok

  private def tokenize(src: String, context: String): List[Tok] = {
    val out = List.newBuilder[Tok]
    var i = 0
    def fail(what: String): Nothing = throw new IllegalArgumentException(
      s"$context: unsupported jinja in '{{$src}}' ($what) — the kerchunk v1 surface is " +
        "identifiers and integer arithmetic (+ - * // % and parens)")
    while (i < src.length) {
      val c = src(i)
      if (c.isWhitespace) i += 1
      else if (c.isDigit) {
        val j = src.indexWhere(!_.isDigit, i) match { case -1 => src.length; case k => k }
        out += TNum(src.substring(i, j).toLong); i = j
      } else if (c.isLetter || c == '_') {
        val j = src.indexWhere(ch => !ch.isLetterOrDigit && ch != '_', i) match {
          case -1 => src.length; case k => k
        }
        out += TId(src.substring(i, j)); i = j
      } else if (c == '/' && i + 1 < src.length && src(i + 1) == '/') { out += TOp("//"); i += 2 }
      else if (c == '/') fail("'/' is jinja TRUE division — only integer '//' is supported")
      else if ("+-*%()".contains(c)) { out += TOp(c.toString); i += 1 }
      else fail(s"character '$c'")
    }
    out.result()
  }

  /** expr := term (('+'|'-') term)* ; term := unary (('*'|'//'|'%') unary)* ;
    * unary := '-' unary | INT | IDENT | '(' expr ')'. Integer semantics
    * match python's on the spec'd surface: `//` floors, `%` follows the
    * divisor's sign — both via Spark's pmod/floor-div equivalents built
    * from the same formulas python defines them by. */
  def compileExpr(src: String, scope: String => Option[Value], context: String): Value = {
    var toks = tokenize(src, context)
    def fail(what: String): Nothing = throw new IllegalArgumentException(
      s"$context: cannot compile '{{$src}}' ($what)")
    def peek: Option[Tok] = toks.headOption
    def next(): Tok = toks match {
      case h :: t => toks = t; h
      case Nil    => fail("unexpected end of expression")
    }
    def num(v: Value, op: String): Column = {
      if (!v.numeric) fail(s"operator '$op' over a string value — arithmetic needs numeric scope entries")
      v.col
    }
    def unary(): Value = next() match {
      case TNum(v) => Value(lit(v), numeric = true)
      case TId(n)  => scope(n).getOrElse(fail(s"unknown identifier '$n'"))
      case TOp("-") => val v = unary(); Value(-num(v, "-"), numeric = true)
      case TOp("(") =>
        val v = expr()
        next() match { case TOp(")") => v; case t => fail(s"expected ')', got $t") }
      case t => fail(s"unexpected token $t")
    }
    def term(): Value = {
      var acc = unary()
      var cont = true
      while (cont) peek match {
        case Some(TOp(op @ ("*" | "//" | "%"))) =>
          next(); val r = unary()
          val (a, b) = (num(acc, op), num(r, op))
          val c = op match {
            case "*" => a * b
            // python floor division / modulo (result sign follows the
            // divisor), which jinja inherits — EXACT integer arithmetic
            // (a double round-trip would lose offsets past 2^53): truncating
            // div, then one adjustment when the remainder's sign disagrees
            case "//" | "%" =>
              val al = a.cast("long"); val bl = b.cast("long")
              val q = call_function("div", al, bl)
              val r = al - q * bl
              val adjust = r =!= 0L && (r < 0L) =!= (bl < 0L)
              if (op == "//") when(adjust, q - 1L).otherwise(q)
              else when(adjust, r + bl).otherwise(r)
          }
          acc = Value(c, numeric = true)
        case _ => cont = false
      }
      acc
    }
    def expr(): Value = {
      var acc = term()
      var cont = true
      while (cont) peek match {
        case Some(TOp(op @ ("+" | "-"))) =>
          next(); val r = term()
          val c = if (op == "+") num(acc, op) + num(r, op) else num(acc, op) - num(r, op)
          acc = Value(c, numeric = true)
        case _ => cont = false
      }
      acc
    }
    val v = expr()
    if (toks.nonEmpty) fail(s"trailing tokens $toks")
    v
  }
}

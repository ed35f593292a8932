package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/**
 * Per-cell transform expressions (reference P3: Groovy scripts with binding
 * `self = value`, run per data cell — RasterEncoder.java:115-130, :173-181;
 * non-number result -> NaN; skipped for nodata).
 *
 * A Groovy shell per cell is the opposite of Spark-first; this replaces it
 * with a tiny arithmetic language over `self`, parsed once at plan time and
 * compiled to BOTH forms:
 *  - a Catalyst Column (stays inside whole-stage codegen — the hot path);
 *  - a Double => Double closure (for the dense per-tile kernels).
 *
 * Grammar (Groovy's conditional subset included — reference scripts branch,
 * e.g. `self > 0 ? self : 0`):
 *   ternary := or ('?' ternary ':' ternary)? ;
 *   or := and ('||' and)* ; and := cmp ('&&' cmp)* ;
 *   cmp := expr (('<'|'<='|'>'|'>='|'=='|'!=') expr)? ;
 *   expr := term (('+'|'-') term)* ; term := factor (('*'|'/'|'%') factor)* ;
 *   factor := ('-'|'!')? atom ('^' factor)? ; atom := number | 'self'
 *   | fn '(' ternary ')' | '(' ternary ')' ; fn in {abs, sqrt, log, exp, sin, cos}.
 * A numeric ternary condition is truthy when != 0 (Groovy number truth).
 * NaN in a comparison: the closure path follows Java (false), the Column
 * path follows Spark SQL ordering — irrelevant for `self` (the NaN/nodata
 * guard short-circuits before the script) but scripts whose SUBexpressions
 * manufacture NaN (log of a negative) should not branch on them.
 */
object TransformExpr {

  sealed trait Ast
  case class Num(v: Double) extends Ast
  case object Self extends Ast
  case class Bin(op: Char, l: Ast, r: Ast) extends Ast
  case class Fn(name: String, a: Ast) extends Ast
  case class Neg(a: Ast) extends Ast
  case class Cmp(op: String, l: Ast, r: Ast) extends Ast
  case class Logic(op: String, l: Ast, r: Ast) extends Ast
  case class Not(a: Ast) extends Ast
  case class Ternary(c: Ast, t: Ast, f: Ast) extends Ast

  def parse(src: String): Ast = new Parser(src).parseAll()

  private final class Parser(src: String) {
    private var pos = 0
    private def peek: Char = if (pos < src.length) src.charAt(pos) else '\u0000'
    private def skipWs(): Unit = while (pos < src.length && src.charAt(pos).isWhitespace) pos += 1
    private def expect(c: Char): Unit = {
      skipWs()
      require(peek == c, s"expected '$c' at $pos in: $src")
      pos += 1
    }
    /** True + consume when the next chars are exactly `op` (two-char ops
      * checked before their one-char prefixes by the callers). */
    private def eat(op: String): Boolean = {
      skipWs()
      if (src.startsWith(op, pos)) { pos += op.length; true } else false
    }
    def parseAll(): Ast = {
      val e = ternary()
      skipWs()
      require(pos == src.length, s"trailing input at $pos in: $src")
      e
    }
    private def ternary(): Ast = {
      val c = orExpr()
      skipWs()
      if (peek == '?') {
        pos += 1
        val t = ternary()
        expect(':')
        Ternary(c, t, ternary())
      } else c
    }
    private def orExpr(): Ast = {
      var l = andExpr()
      while (eat("||")) l = Logic("||", l, andExpr())
      l
    }
    private def andExpr(): Ast = {
      var l = cmpExpr()
      while (eat("&&")) l = Logic("&&", l, cmpExpr())
      l
    }
    private def cmpExpr(): Ast = {
      val l = expr()
      skipWs()
      // two-char ops first; a bare '=' is not an operator in this grammar
      val op =
        if (eat("<=")) "<=" else if (eat(">=")) ">="
        else if (eat("==")) "==" else if (eat("!=")) "!="
        else if (peek == '<') { pos += 1; "<" }
        else if (peek == '>') { pos += 1; ">" }
        else null
      if (op == null) l else Cmp(op, l, expr())
    }
    private def expr(): Ast = {
      var l = term()
      skipWs()
      while (peek == '+' || peek == '-') {
        val op = peek; pos += 1
        l = Bin(op, l, term()); skipWs()
      }
      l
    }
    private def term(): Ast = {
      var l = factor()
      skipWs()
      while (peek == '*' || peek == '/' || peek == '%') {
        val op = peek; pos += 1
        l = Bin(op, l, factor()); skipWs()
      }
      l
    }
    private def factor(): Ast = {
      skipWs()
      val neg = peek == '-'
      val not = peek == '!' && !src.startsWith("!=", pos)
      if (neg || not) pos += 1
      val a = atom()
      skipWs()
      val base = if (peek == '^') { pos += 1; Bin('^', a, factor()) } else a
      if (neg) Neg(base) else if (not) Not(base) else base
    }
    private def atom(): Ast = {
      skipWs()
      if (peek == '(') { expect('('); val e = ternary(); expect(')'); e }
      else if (peek.isDigit || peek == '.') {
        val start = pos
        while (peek.isDigit || peek == '.' || peek == 'e' || peek == 'E' ||
               ((peek == '+' || peek == '-') && pos > start &&
                (src.charAt(pos - 1) == 'e' || src.charAt(pos - 1) == 'E'))) pos += 1
        Num(src.substring(start, pos).toDouble)
      } else {
        val start = pos
        while (peek.isLetter) pos += 1
        val name = src.substring(start, pos)
        require(name.nonEmpty, s"unexpected character at $pos in: $src")
        if (name == "self") Self
        else { expect('('); val e = ternary(); expect(')'); Fn(name, e) }
      }
    }
  }

  /** Compile a condition position to a Boolean closure. A numeric node is
    * truthy when != 0 (Groovy number truth). */
  private def compileBool(ast: Ast): Double => Boolean = ast match {
    case Cmp(op, l, r) =>
      val fl = compile(l); val fr = compile(r)
      op match {
        case "<"  => v => fl(v) < fr(v)
        case "<=" => v => fl(v) <= fr(v)
        case ">"  => v => fl(v) > fr(v)
        case ">=" => v => fl(v) >= fr(v)
        case "==" => v => fl(v) == fr(v)
        case "!=" => v => fl(v) != fr(v)
      }
    case Logic("&&", l, r) =>
      val fl = compileBool(l); val fr = compileBool(r); v => fl(v) && fr(v)
    case Logic("||", l, r) =>
      val fl = compileBool(l); val fr = compileBool(r); v => fl(v) || fr(v)
    case Not(a) => val f = compileBool(a); v => !f(v)
    case num    => val f = compile(num); v => f(v) != 0.0
  }

  /** Compile to a scalar closure (dense per-tile kernels). */
  def compile(ast: Ast): Double => Double = ast match {
    case Num(v) => _ => v
    case Self => v => v
    case Neg(a) => val f = compile(a); v => -f(v)
    case Ternary(c, t, f) =>
      val fc = compileBool(c); val ft = compile(t); val ff = compile(f)
      v => if (fc(v)) ft(v) else ff(v)
    case Cmp(_, _, _) | Logic(_, _, _) | Not(_) =>
      // a bare boolean result coerces to 1/0 (Groovy-adjacent; keeps the
      // closure total so `self > 0` alone is a usable mask script)
      val f = compileBool(ast); v => if (f(v)) 1.0 else 0.0
    case Bin(op, l, r) =>
      val fl = compile(l); val fr = compile(r)
      op match {
        case '+' => v => fl(v) + fr(v)
        case '-' => v => fl(v) - fr(v)
        case '*' => v => fl(v) * fr(v)
        case '/' => v => fl(v) / fr(v)
        case '%' => v => fl(v) % fr(v)
        case '^' => v => math.pow(fl(v), fr(v))
      }
    case Fn(name, a) =>
      val f = compile(a)
      name match {
        case "abs"  => v => math.abs(f(v))
        case "sqrt" => v => math.sqrt(f(v))
        case "log"  => v => math.log(f(v))
        case "exp"  => v => math.exp(f(v))
        case "sin"  => v => math.sin(f(v))
        case "cos"  => v => math.cos(f(v))
        case other  => throw new NoSuchElementException(s"unknown function $other")
      }
  }

  /** Condition position as a BooleanType Column. */
  private def toBoolColumn(ast: Ast, self: Column): Column = ast match {
    case Cmp("<", l, r)  => toColumn(l, self) < toColumn(r, self)
    case Cmp("<=", l, r) => toColumn(l, self) <= toColumn(r, self)
    case Cmp(">", l, r)  => toColumn(l, self) > toColumn(r, self)
    case Cmp(">=", l, r) => toColumn(l, self) >= toColumn(r, self)
    case Cmp("==", l, r) => toColumn(l, self) === toColumn(r, self)
    case Cmp("!=", l, r) => toColumn(l, self) =!= toColumn(r, self)
    case Cmp(op, _, _)   => throw new IllegalStateException(s"cmp $op")
    case Logic("&&", l, r) => toBoolColumn(l, self) && toBoolColumn(r, self)
    case Logic("||", l, r) => toBoolColumn(l, self) || toBoolColumn(r, self)
    case Logic(op, _, _)   => throw new IllegalStateException(s"logic $op")
    case Not(a) => !toBoolColumn(a, self)
    case num    => toColumn(num, self) =!= lit(0.0)
  }

  /** Compile to a Catalyst Column over the value column (codegen path). */
  def toColumn(ast: Ast, self: Column): Column = ast match {
    case Num(v) => lit(v)
    case Self => self
    case Neg(a) => -toColumn(a, self)
    case Ternary(c, t, f) =>
      when(toBoolColumn(c, self), toColumn(t, self)).otherwise(toColumn(f, self))
    case Cmp(_, _, _) | Logic(_, _, _) | Not(_) =>
      when(toBoolColumn(ast, self), lit(1.0)).otherwise(lit(0.0))
    case Bin('+', l, r) => toColumn(l, self) + toColumn(r, self)
    case Bin('-', l, r) => toColumn(l, self) - toColumn(r, self)
    case Bin('*', l, r) => toColumn(l, self) * toColumn(r, self)
    case Bin('/', l, r) => toColumn(l, self) / toColumn(r, self)
    case Bin('%', l, r) => toColumn(l, self) % toColumn(r, self)
    case Bin('^', l, r) => pow(toColumn(l, self), toColumn(r, self))
    case Bin(op, _, _)  => throw new IllegalStateException(s"op $op")
    case Fn("abs", a)  => abs(toColumn(a, self))
    case Fn("sqrt", a) => sqrt(toColumn(a, self))
    case Fn("log", a)  => log(toColumn(a, self))
    case Fn("exp", a)  => exp(toColumn(a, self))
    case Fn("sin", a)  => sin(toColumn(a, self))
    case Fn("cos", a)  => cos(toColumn(a, self))
    case Fn(other, _)  => throw new NoSuchElementException(s"unknown function $other")
  }

  /** One-call convenience: parse + scalar compile (the reference's
    * "transform" resource parameter shape). */
  def scalar(src: String): Double => Double = compile(parse(src))

  /** One-call convenience: parse + Column (applied only to data values —
    * the isData guard of RasterEncoder.java:173-181). */
  def column(src: String, self: Column): Column = {
    val c = toColumn(parse(src), self)
    when(isnan(self) || self.isNull, self).otherwise(c)
  }
}

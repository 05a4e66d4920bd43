package graft.regex

/** AST for the schema regex dialect (reference: /root/reference/docs/Schema.md:74-90).
  *
  * Supported constructs: literal, `.`, `\d \s \w`, bracketed classes with
  * ranges/escapes/nesting, grouping `( )`, alternation `|`, and the greedy
  * repetitions `* + ? {N} {N,} {N,M}`. Negation, non-greedy repetition and
  * non-ASCII characters are rejected — the reference does the same
  * (/root/reference/src/nfa/nfa.rs:171-173, 221-223, 462-467).
  */
sealed trait Ast

object Ast {
  /** One character-class over ASCII 0..127 as a 128-bit mask (lo = chars
    * 0..63, hi = 64..127) — the JVM analogue of the reference's `u128`
    * one-hot transition encoding (/root/reference/src/nfa/nfa.rs:18-24).
    */
  final case class Cls(lo: Long, hi: Long) extends Ast {
    def contains(c: Int): Boolean =
      c < 128 && (if (c < 64) (lo & (1L << c)) != 0 else (hi & (1L << (c - 64))) != 0)
    def union(other: Cls): Cls = Cls(lo | other.lo, hi | other.hi)
  }
  final case class Concat(items: List[Ast]) extends Ast
  final case class Alt(branches: List[Ast]) extends Ast
  final case class Rep(item: Ast, min: Int, max: Option[Int]) extends Ast
  final case class Grp(item: Ast) extends Ast
}

object CharMask {
  import Ast.Cls

  def single(c: Char): Cls = {
    require(c < 128, s"non-ASCII character in pattern: '$c'")
    if (c < 64) Cls(1L << c, 0L) else Cls(0L, 1L << (c - 64))
  }

  def range(from: Char, to: Char): Cls = {
    require(from <= to, s"invalid range $from-$to")
    require(to < 128, "non-ASCII range bound")
    var lo = 0L; var hi = 0L
    var c = from.toInt
    while (c <= to.toInt) {
      if (c < 64) lo |= 1L << c else hi |= 1L << (c - 64)
      c += 1
    }
    Cls(lo, hi)
  }

  /** `\d` = [0-9] — mirrors DIGIT_TRANSITION (/root/reference/src/nfa/nfa.rs:18). */
  val Digit: Cls = range('0', '9')

  /** `\s` = {\t \n \v \f \r ' '} — mirrors SPACE_TRANSITION (nfa.rs:19). */
  val Space: Cls = Cls((0x1FL << 9) | (1L << 32), 0L)

  /** `\w` = [0-9A-Za-z_] — mirrors WORD_TRANSITION (nfa.rs:20). */
  val Word: Cls = Cls(Digit.lo, range('A', 'Z').hi | range('a', 'z').hi | single('_').hi)

  /** `.` = any ASCII char incl. newline — mirrors DOT_TRANSITION (nfa.rs:24). */
  val Dot: Cls = Cls(-1L, -1L)
}

/** Recursive-descent parser for the schema regex dialect.
  *
  * The grammar is the one documented at /root/reference/docs/Schema.md:74-90;
  * behaviour verified against the reference's AST/NFA test matrices
  * (/root/reference/src/nfa/nfa.rs:469-1210). One deliberate divergence:
  * multi-item bracket classes (`[a-c3-9]`) are a *union* here, per the
  * reference's documentation ("match any character in the brackets"), whereas
  * the reference implementation chains the items sequentially
  * (nfa.rs:319-332) — a bug its own example schemas never trigger.
  */
final class RegexParser(pattern: String) {
  private[this] var pos = 0
  private[this] val n = pattern.length

  private def peek: Char = pattern.charAt(pos)
  private def eof: Boolean = pos >= n
  private def fail(msg: String): Nothing =
    throw new IllegalArgumentException(s"regex '$pattern' at $pos: $msg")

  def parse(): Ast = {
    val ast = parseAlt()
    if (!eof) fail(s"unexpected '${peek}'")
    ast
  }

  private def parseAlt(): Ast = {
    val branches = scala.collection.mutable.ListBuffer(parseConcat())
    while (!eof && peek == '|') { pos += 1; branches += parseConcat() }
    if (branches.size == 1) branches.head else Ast.Alt(branches.toList)
  }

  private def parseConcat(): Ast = {
    val items = scala.collection.mutable.ListBuffer.empty[Ast]
    while (!eof && peek != '|' && peek != ')') items += parseTerm()
    if (items.size == 1) items.head else Ast.Concat(items.toList)
  }

  private def parseTerm(): Ast = {
    var atom = parseAtom()
    var more = true
    while (more && !eof) {
      peek match {
        case '*' => pos += 1; atom = Ast.Rep(atom, 0, None)
        case '+' => pos += 1; atom = Ast.Rep(atom, 1, None)
        case '?' => pos += 1; atom = Ast.Rep(atom, 0, Some(1))
        case '{' => atom = parseBracedRep(atom)
        case _   => more = false
      }
    }
    atom
  }

  private def parseBracedRep(atom: Ast): Ast = {
    pos += 1 // '{'
    val min = parseInt()
    val rep = if (!eof && peek == ',') {
      pos += 1
      if (!eof && peek == '}') Ast.Rep(atom, min, None)
      else {
        val max = parseInt()
        if (max < min) fail(s"repetition max $max < min $min")
        Ast.Rep(atom, min, Some(max))
      }
    } else Ast.Rep(atom, min, Some(min))
    if (eof || peek != '}') fail("expected '}'")
    pos += 1
    rep
  }

  private def parseInt(): Int = {
    val start = pos
    while (!eof && peek.isDigit) pos += 1
    if (pos == start) fail("expected number")
    pattern.substring(start, pos).toInt
  }

  private def parseAtom(): Ast = {
    if (eof) fail("unexpected end of pattern")
    peek match {
      case '(' =>
        pos += 1
        val inner = parseAlt()
        if (eof || peek != ')') fail("expected ')'")
        pos += 1
        Ast.Grp(inner)
      case '[' => parseClass()
      case '.' => pos += 1; CharMask.Dot
      case '\\' => parseEscape()
      case c @ ('*' | '+' | '?' | '{' | ')' | '|' | ']') => fail(s"unexpected '$c'")
      case c =>
        if (c >= 128) fail(s"non-ASCII character '$c'")
        pos += 1
        CharMask.single(c)
    }
  }

  private def parseEscape(): Ast.Cls = {
    pos += 1 // '\'
    if (eof) fail("dangling escape")
    val c = peek
    pos += 1
    c match {
      case 'd' => CharMask.Digit
      case 's' => CharMask.Space
      case 'w' => CharMask.Word
      case 'n' => CharMask.single('\n')
      case 't' => CharMask.single('\t')
      case 'r' => CharMask.single('\r')
      case 'D' | 'S' | 'W' => fail(s"negated class \\$c not supported")
      case other =>
        if (other >= 128) fail(s"non-ASCII escape '$other'")
        CharMask.single(other)
    }
  }

  private def parseClass(): Ast.Cls = {
    pos += 1 // '['
    var mask = Ast.Cls(0L, 0L)
    if (!eof && peek == '^') fail("negated class not supported")
    while (!eof && peek != ']') {
      mask = mask.union(parseClassItem())
    }
    if (eof) fail("unterminated class")
    pos += 1 // ']'
    mask
  }

  private def parseClassItem(): Ast.Cls = {
    peek match {
      case '[' => parseClass() // nested class, e.g. [a-c[A-X]]
      case '\\' =>
        val esc = parseEscape()
        maybeRange(esc)
      case c =>
        if (c >= 128) fail(s"non-ASCII character '$c' in class")
        pos += 1
        maybeRange(CharMask.single(c))
    }
  }

  /** After a single-char item, an unescaped '-' followed by another char
    * forms a range (the dialect requires literal '-' to be escaped).
    */
  private def maybeRange(first: Ast.Cls): Ast.Cls = {
    if (!eof && peek == '-' && pos + 1 < n && pattern.charAt(pos + 1) != ']') {
      val from = singletonChar(first).getOrElse(fail("range start must be a single char"))
      pos += 1 // '-'
      val to = peek match {
        case '\\' => singletonChar(parseEscape()).getOrElse(fail("range end must be a single char"))
        case c    => pos += 1; c
      }
      CharMask.range(from, to)
    } else first
  }

  private def singletonChar(cls: Ast.Cls): Option[Char] = {
    if (java.lang.Long.bitCount(cls.lo) + java.lang.Long.bitCount(cls.hi) != 1) None
    else if (cls.lo != 0) Some(java.lang.Long.numberOfTrailingZeros(cls.lo).toChar)
    else Some((64 + java.lang.Long.numberOfTrailingZeros(cls.hi)).toChar)
  }
}

object RegexParser {
  def parse(pattern: String): Ast = new RegexParser(pattern).parse()
}

package graft.automata

import org.scalatest.funsuite.AnyFunSuite
import graft.regex.{Ast, CharMask, RegexParser}

/** Ports the reference's DFA accept/reject matrices
  * (/root/reference/src/dfa/dfa.rs:460-1050) against our compiled bank.
  * `simulate` returns Some(patternId) on whole-string accept.
  */
class AutomataSpec extends AnyFunSuite {

  private def dfa(patterns: String*): DenseDfa = DenseDfa.compile(patterns)

  test("single pattern c* (dfa.rs test_nfa2)") {
    val d = dfa("c*")
    assert(d.simulate("c").contains(0))
    assert(d.simulate("cc").contains(0))
    assert(d.simulate("cccc").contains(0))
    assert(d.simulate("").contains(0))
    assert(d.simulate("ccccab").isEmpty)
    assert(d.simulate("cab").isEmpty)
  }

  test("single pattern c+ab (dfa.rs test_nfa3)") {
    val d = dfa("c+ab")
    assert(d.simulate("c").isEmpty)
    assert(d.simulate("ccc").isEmpty)
    assert(d.simulate("cccccab").contains(0))
    assert(d.simulate("cab").contains(0))
    assert(d.simulate("ab").isEmpty)
    assert(d.simulate("").isEmpty)
  }

  test("merged multi-pattern DFA (dfa.rs test_easy_from_multi_nfas_to_dfa)") {
    val d = dfa("(a)|(ab)", "c*", "c+ab")
    assert(d.simulate("a").contains(0))
    assert(d.simulate("ab").contains(0))
    assert(d.simulate("aa").isEmpty)
    assert(d.simulate("abb").isEmpty)
    assert(d.simulate("aba").isEmpty)
    assert(d.simulate("c").contains(1))
    assert(d.simulate("ccccc").contains(1))
    assert(d.simulate("cccccab").contains(2))
    assert(d.simulate("cab").contains(2))
    assert(d.simulate("").contains(1))
  }

  test("priority: first-defined pattern wins (dfa.rs test_ambiguity)") {
    val d = dfa("aa", "a*")
    assert(d.simulate("aa").contains(0))
  }

  test("priority: int vs hex (dfa.rs test_int_hex_ambiguity)") {
    val d = dfa("""\-{0,1}\d+""", """(0x){0,1}([0-9a-f]+)|([0-9A-F]+)""")
    assert(d.simulate("10").contains(0))
    assert(d.simulate("1b").contains(1))
  }

  test("int pattern matrix (dfa.rs test_int)") {
    val d = dfa("""\-{0,1}\d+""")
    assert(d.simulate("0").contains(0))
    assert(d.simulate("1234").contains(0))
    assert(d.simulate("-1234").contains(0))
    assert(d.simulate("-0").contains(0))
    assert(d.simulate("aba").isEmpty)
    assert(d.simulate("").isEmpty)
    assert(d.simulate("3.14").isEmpty)
    assert(d.simulate("0.00").isEmpty)
  }

  test("float pattern matrix (dfa.rs test_float)") {
    val d = dfa("""\-{0,1}[0-9]+\.\d+""")
    assert(d.simulate("0.0").contains(0))
    assert(d.simulate("-0.0").contains(0))
    assert(d.simulate("-0.00001").contains(0))
    assert(d.simulate("3.1415926").contains(0))
    assert(d.simulate("-3.1415926").contains(0))
    assert(d.simulate("0").isEmpty)
    assert(d.simulate("-1234").isEmpty)
    assert(d.simulate("aba").isEmpty)
    assert(d.simulate("").isEmpty)
  }

  test("hex pattern matrix (dfa.rs test_hex)") {
    val d = dfa("""(0x){0,1}(((\d|[a-f])+)|((\d|[A-F])+))""")
    assert(d.simulate("0x0").contains(0))
    assert(d.simulate("0").contains(0))
    assert(d.simulate("1234").contains(0))
    assert(d.simulate("0x1A2B3C4D5E6F7890").contains(0))
    assert(d.simulate("0x1a2b3c4d5e6f7890").contains(0))
    assert(d.simulate("0xddba9b95eeb3cfb9ccb3d8401d1610d42f0e3aad").contains(0))
    assert(d.simulate("1a2b3c4d5e6f7890").contains(0))
    assert(d.simulate("abcdef").contains(0))
    assert(d.simulate("abcdefg").isEmpty)
    assert(d.simulate("aBa").isEmpty)
    assert(d.simulate("").isEmpty)
    assert(d.simulate("3.14").isEmpty)
  }

  test("timestamp pattern (dfa.rs test_timestamp)") {
    val d = dfa("""\d{4}\-\d{2}\-\d{2}T\d{2}:\d{2}:\d{2}\.\d{2}""")
    assert(d.simulate("2015-01-31T15:50:45.39").contains(0))
    assert(d.simulate("2015-01-31T15:50:45.3").isEmpty)
  }

  test("static text pattern (dfa.rs test_static_text)") {
    val d = dfa("TIMESTAMP")
    assert(d.simulate("TIMESTAMP").contains(0))
    assert(d.simulate("This log ").isEmpty)
  }

  test("repetition forms (dfa.rs test_repetition)") {
    val r03 = dfa("a{0,3}")
    assert(r03.simulate("").contains(0))
    assert(r03.simulate("a").contains(0))
    assert(r03.simulate("aaa").contains(0))
    assert(r03.simulate("aaaa").isEmpty)

    val r01 = dfa("a{0,1}")
    assert(r01.simulate("").contains(0))
    assert(r01.simulate("a").contains(0))
    assert(r01.simulate("aa").isEmpty)

    val star = dfa("a*")
    assert(star.simulate("").contains(0))
    assert(star.simulate("aaaaaaaa").contains(0))
    assert(star.simulate("ab").isEmpty)

    val plus = dfa("a+")
    assert(plus.simulate("").isEmpty)
    assert(plus.simulate("aaaa").contains(0))
    assert(plus.simulate("ba").isEmpty)

    val r1open = dfa("a{1,}")
    assert(r1open.simulate("").isEmpty)
    assert(r1open.simulate("a").contains(0))
    assert(r1open.simulate("aaaaaaaa").contains(0))

    val r3open = dfa("a{3,}")
    assert(r3open.simulate("aa").isEmpty)
    assert(r3open.simulate("aaa").contains(0))
    assert(r3open.simulate("aaaaaaaa").contains(0))

    val r3 = dfa("a{3}")
    assert(r3.simulate("aa").isEmpty)
    assert(r3.simulate("aaa").contains(0))
    assert(r3.simulate("aaaa").isEmpty)

    val r36 = dfa("a{3,6}")
    assert(r36.simulate("aa").isEmpty)
    assert(r36.simulate("aaa").contains(0))
    assert(r36.simulate("aaaaaa").contains(0))
    assert(r36.simulate("aaaaaaa").isEmpty)
  }

  test("longestMatch memoizes the last accept (lexer.rs:284-305 semantics)") {
    // two ts patterns: with-millis (idx 0) is longer than without (idx 1)
    val d = dfa("""\d{4}\-\d{2}\-\d{2} \d{2}:\d{2}:\d{2},\d{3}""",
                """\d{4}\-\d{2}\-\d{2} \d{2}:\d{2}:\d{2}""")
    val s = "2015-03-23 08:09:17,637 INFO rest"
    val m = d.longestMatch(s, 0)
    assert(m >= 0)
    assert((m >>> 32).toInt == 23) // longest match consumes the millis
    assert((m & 0xFFFFFFFFL).toInt == 0)
    // prefix that only satisfies the short pattern
    val m2 = d.longestMatch("2015-03-23 08:09:17 rest", 0)
    assert((m2 >>> 32).toInt == 19)
    assert((m2 & 0xFFFFFFFFL).toInt == 1)
    // no match at all → -1
    assert(d.longestMatch("not a timestamp", 0) == -1L)
  }

  test("class union semantics: [a-c3-9[A-X]] is a union (docs/Schema.md:79)") {
    val d = dfa("[a-c3-9[A-X]]")
    for (c <- Seq("a", "b", "c", "3", "9", "A", "X")) assert(d.simulate(c).contains(0), c)
    for (c <- Seq("d", "2", "Y", "z", "aa", "")) assert(d.simulate(c).isEmpty, c)
  }

  test("regex parser rejects unsupported constructs like the reference") {
    assertThrows[IllegalArgumentException](RegexParser.parse("[^a-z]"))
    assertThrows[IllegalArgumentException](RegexParser.parse("""\D"""))
    assertThrows[IllegalArgumentException](RegexParser.parse("a{2,1}"))
    assertThrows[IllegalArgumentException](RegexParser.parse("(ab"))
    assertThrows[IllegalArgumentException](RegexParser.parse("[ab"))
  }

  test("perl class masks match the reference bit patterns (nfa.rs:18-20)") {
    // \s = {\t,\n,\v,\f,\r,' '}
    for (c <- Seq('\t', '\n', '\u000B', '\f', '\r', ' ')) assert(CharMask.Space.contains(c), c.toInt)
    assert(!CharMask.Space.contains('a'))
    // \w = [0-9A-Za-z_]
    for (c <- Seq('0', '9', 'A', 'Z', '_', 'a', 'z')) assert(CharMask.Word.contains(c))
    assert(!CharMask.Word.contains('-'))
    // \d
    for (c <- '0' to '9') assert(CharMask.Digit.contains(c))
    assert(!CharMask.Digit.contains('a'))
    // . matches all ASCII incl newline (nfa.rs:24)
    assert(CharMask.Dot.contains('\n'))
    assert(CharMask.Dot.contains(0))
    assert(CharMask.Dot.contains(127))
  }

  test("DfaSimulator single-char stepping (dfa.rs:415-458; matrix from dfa.rs:716-760)") {
    // languages: p0 = a|ab, p1 = c*, p2 = c+ab — the reference's fixture NFAs
    val dfa = DenseDfa.compile(Seq("(a)|(ab)", "(c)*", "(c)+ab"))
    val sim = new DfaSimulator(dfa)
    assert(sim.simulateSingleChar('a') == (0, true))
    assert(sim.simulateSingleChar('b') == (0, true))
    assert(sim.simulateSingleChar('b') == (-1, false))
    sim.resetSimulation()
    assert(sim.simulateSingleChar('c') == (1, true))
    // dead end does NOT latch: state stays at the last good state
    // (reference semantics, dfa.rs:415-458 — current_state unchanged on a
    // missing transition), so a later valid char resumes from there
    assert(sim.simulateSingleChar('x') == (-1, false))
    assert(sim.simulateSingleChar('c') == (1, true))
    assert(sim.simulateSingleChar('c') == (1, true))
    assert(sim.simulateSingleChar('a') == (-1, true)) // live prefix of c+ab, accepts nothing
    assert(sim.simulateSingleChar('b') == (2, true))
  }

  test("AST shape: escaped literal and repetition (regex_parser/parser.rs:25-58)") {
    RegexParser.parse("""\-{0,1}\d+""") match {
      case Ast.Concat(List(Ast.Rep(dash: Ast.Cls, 0, Some(1)), Ast.Rep(d: Ast.Cls, 1, None))) =>
        assert(dash.contains('-') && !dash.contains('a'))
        assert(d == CharMask.Digit)
      case other => fail(s"unexpected AST: $other")
    }
  }
}

package graft.lexer

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalacheck.rng.Seed

/** Property-based invariants over generated ASCII texts with the example
  * schema (SURVEY.md §5.2-4): losslessness, timestamp-at-line-start,
  * variables delimiter-enclosed, and token/line bookkeeping. Uses scalacheck
  * directly (fixed seed → deterministic) — the scalatestplus bridge is not in
  * the offline dependency cache.
  */
class TokenizerPropertySpec extends AnyFunSuite {
  private val bank = PatternBank.example

  // Text generator biased toward log-like content: words drawn from variable
  // shapes, delimiters, partial timestamps, and junk.
  private val word: Gen[String] = Gen.oneOf(
    Gen.choose(-9999, 99999).map(_.toString),
    Gen.choose(0, 10000).map(n => s"$n.${n % 100}"),
    Gen.oneOf("INFO", "DEBUG", "WARN", "ERROR", "TRACE", "FATAL", "INFOX", "ERR"),
    Gen.oneOf("0xabc", "0x1A2B", "0xgg", "1b", "abc", "xyz-12"),
    Gen.oneOf("[main]", "[worker-1]", "[x]", "[", "]"),
    Gen.oneOf("/a/b/c", "/tmp/x.y", "path/no/lead", "/trail/"),
    Gen.oneOf("2015-03-23 08:09:17,637", "2015-03-23 08:09:17", "2015-03-23", "2015-03-23 08:09"),
    Gen.alphaNumStr.map(_.take(8))
  )
  private val delim: Gen[String] = Gen.oneOf(" ", "\t", "\r", "\n", ":", ",", "!", ";", "%", "  ", " \n")
  private val text: Gen[String] = for {
    n <- Gen.choose(0, 40)
    parts <- Gen.listOfN(n, Gen.frequency(3 -> word, 2 -> delim))
  } yield parts.mkString

  private def checkProp(name: String)(f: String => Unit): Unit = {
    val prop = Prop.forAll(text) { t => f(t); true }
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(300).withInitialSeed(Seed(42L)),
      prop)
    assert(res.passed, s"$name: ${res.status}")
  }

  test("losslessness: concatenated token values reproduce the input") {
    checkProp("lossless") { t =>
      val toks = Tokenizer.tokenize(bank, t)
      assert(toks.map(_.value).mkString == t)
    }
  }

  test("timestamp tokens appear only at line starts") {
    checkProp("ts-line-start") { t =>
      var off = 0
      Tokenizer.tokenize(bank, t).foreach { tok =>
        if (tok.tokenType == TokenType.Timestamp) {
          assert(off == 0 || t.charAt(off - 1) == '\n')
        }
        off += tok.value.length
      }
    }
  }

  test("variable tokens are exactly delimiter-enclosed and whole-word accepted") {
    checkProp("var-enclosed") { t =>
      var off = 0
      Tokenizer.tokenize(bank, t).foreach { tok =>
        if (tok.tokenType == TokenType.Variable) {
          val end = off + tok.value.length
          assert(end == t.length || bank.isDelimiter(t.charAt(end)))
          // whole word matches the claimed pattern with correct priority
          assert(bank.varDfa.simulate(tok.value).contains(tok.schemaId))
        }
        off += tok.value.length
      }
    }
  }

  test("line numbers are consistent with newline positions") {
    checkProp("line-numbers") { t =>
      var expectedLine = 1
      Tokenizer.tokenize(bank, t).foreach { tok =>
        assert(tok.lineNum == expectedLine)
        expectedLine += tok.value.count(_ == '\n')
      }
    }
  }

  test("newline containment per token type") {
    checkProp("newlines") { t =>
      Tokenizer.tokenize(bank, t).foreach { tok =>
        if (tok.tokenType == TokenType.StaticTextWithEndLine) {
          assert(tok.value.endsWith("\n"))
          assert(tok.value.count(_ == '\n') == 1)
        }
        if (tok.tokenType == TokenType.Variable || tok.tokenType == TokenType.Timestamp) {
          assert(!tok.value.contains('\n'))
        }
      }
    }
  }

  test("event assembly partitions the token stream") {
    checkProp("events") { t =>
      val toks = Tokenizer.tokenize(bank, t)
      val events = Tokenizer.assembleEvents(toks)
      if (toks.isEmpty) assert(events.isEmpty)
      else {
        assert(events.head.tokenStart == 0)
        assert(events.last.tokenEnd == toks.length)
        events.sliding(2).foreach {
          case collection.mutable.ArrayBuffer(a, b) => assert(b.tokenStart == a.tokenEnd)
          case _ => ()
        }
        // every non-first event starts with a Timestamp token
        events.drop(1).foreach(e => assert(toks(e.tokenStart).tokenType == TokenType.Timestamp))
      }
    }
  }
}

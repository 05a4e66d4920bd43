package graft.lexer

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalacheck.rng.Seed
import scala.collection.mutable.ArrayBuffer

/** The byte-level tokenizer (execution path) must agree with the char-based
  * tokenizer (test oracle) on every input — including multi-byte UTF-8,
  * where both treat non-ASCII as static text and stay byte/char-lossless.
  */
class ByteTokenizerSpec extends AnyFunSuite {
  private val bank = PatternBank.example

  private def byteTokens(text: String): Vector[Token] = {
    val bytes = text.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val out = ArrayBuffer.empty[Token]
    ByteTokenizer.tokenize(bank, bytes, new ByteTokenizer.Sink {
      override def token(tt: Byte, sid: Int, start: Int, end: Int, line: Int): Unit =
        out += Token(tt, sid, new String(bytes, start, end - start,
          java.nio.charset.StandardCharsets.UTF_8), line)
    })
    out.toVector
  }

  private val gen: Gen[String] = {
    val word = Gen.oneOf(
      Gen.choose(-999, 9999).map(_.toString),
      Gen.oneOf("INFO", "ERROR", "0xab12", "[main]", "/a/b.c", "plain", "2015-03-23 08:09:17,637",
        "héllo", "日本語ログ", "naïve-42", "emoji🙂end"),
      Gen.alphaNumStr.map(_.take(6)))
    val delim = Gen.oneOf(" ", "\n", ":", ",", "\t", ";")
    for {
      n <- Gen.choose(0, 30)
      parts <- Gen.listOfN(n, Gen.frequency(3 -> word, 2 -> delim))
    } yield parts.mkString
  }

  test("byte tokenizer ≡ char tokenizer on log-like and multi-byte UTF-8 inputs") {
    val prop = Prop.forAll(gen) { t =>
      // char tokenizer boundaries are char offsets; compare the full token
      // streams (type, schema, value, line)
      val chars = Tokenizer.tokenize(bank, t).toVector
        .map(tk => (tk.tokenType, tk.schemaId, tk.value, tk.lineNum))
      val bytes = byteTokens(t)
        .map(tk => (tk.tokenType, tk.schemaId, tk.value, tk.lineNum))
      chars == bytes
    }
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(500).withInitialSeed(Seed(7L)), prop)
    assert(res.passed, res.status.toString)
  }

  test("byte tokenizer handles the hive fixture identically") {
    val in = getClass.getResourceAsStream("/hive-24h.log")
    val text = try new String(in.readAllBytes(), java.nio.charset.StandardCharsets.UTF_8)
    finally in.close()
    assert(byteTokens(text) == Tokenizer.tokenize(bank, text).toVector)
  }

  test("fixed-offset timestamp parse agrees with the formatter oracle") {
    import graft.functions.ParseTurnExpression.parseTsMicros
    val cases = Seq(
      ("2015-03-23T08:09:17.637", 0), ("2015-03-23T08:09:17,637", 1),
      ("2015-03-23 08:09:17.637", 2), ("2015-03-23 08:09:17,637", 3),
      ("2015-03-23 08:09:17", 4), ("2000-02-29 23:59:59", 4),
      ("1999-12-31 00:00:00.001", 2))
    cases.foreach { case (s, sid) =>
      val bytes = s.getBytes
      val micros = parseTsMicros(bytes, 0, bytes.length)
      val oracle = graft.pipeline.Parse.parseTsToken(s, sid)
      assert(micros != null && oracle != null, s)
      assert(micros == oracle.getTime * 1000 + (oracle.getNanos / 1000 % 1000), s)
    }
    // garbage stays null instead of throwing
    val bad = "9915-99-99 99:99:99".getBytes
    assert(parseTsMicros(bad, 0, bad.length) == null)
    val sep = "2015x03-23 08:09:17".getBytes
    assert(parseTsMicros(sep, 0, sep.length) == null)
  }
}

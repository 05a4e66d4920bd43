package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String
import graft.lexer.{ByteTokenizer, PatternBank, TokenType}
import graft.pipeline.Category

/** `parse_turn(text, role, tool)` — the whole parse stage (SURVEY.md §2.2 P2)
  * as ONE native Catalyst expression: tokenize the text's UTF-8 bytes with
  * the compiled pattern bank and emit the parsed struct
  * (tokens + extraction + routing fields) directly as an InternalRow.
  *
  * This replaces the typed Dataset mapPartitions path on the hot path.
  * Profiling the typed path (JFR, 32 threads) showed the work dominated by
  * object churn — String decode/encode per token, Vector building, encoder
  * SerializeFromObject, DateTimeFormatter, exception control flow — which
  * inflated per-turn CPU >10× under concurrency (allocator/GC pressure).
  * Here token values are zero-copy UTF8String slices of the input bytes,
  * rows are built directly, and timestamp extraction is fixed-offset digit
  * math (the 5 schema formats are positional), so per-row allocation is
  * bounded by the output itself. Catalyst sees a plain expression: column
  * pruning upstream and whole-stage codegen around it still apply.
  *
  * The typed path (graft.pipeline.Parse.typed) remains as the independent
  * oracle; equality between the two is asserted in tests.
  */
case class ParseTurnExpression(first: Expression, second: Expression, third: Expression,
                               bank: PatternBank)
    extends TernaryExpression with CodegenFallback {

  override def dataType: DataType = ParseTurnExpression.schema
  override def nullable: Boolean = false
  // text may be null/empty; role/tool may be null — handle ourselves
  override def eval(input: InternalRow): Any = {
    val textAny = first.eval(input)
    val roleAny = second.eval(input)
    val toolAny = third.eval(input)
    ParseTurnExpression.parse(
      bank,
      if (textAny == null) null else textAny.asInstanceOf[UTF8String],
      if (roleAny == null) null else roleAny.asInstanceOf[UTF8String],
      if (toolAny == null) null else toolAny.asInstanceOf[UTF8String])
  }
  override protected def nullSafeEval(t: Any, r: Any, o: Any): Any =
    throw new IllegalStateException("eval is overridden")
  override protected def withNewChildrenInternal(f: Expression, s: Expression, t: Expression): Expression =
    copy(first = f, second = s, third = t)
  override def prettyName: String = "parse_turn"
}

object ParseTurnExpression {

  val tokenSchema: StructType = StructType(Seq(
    StructField("token_type", ByteType, nullable = false),
    StructField("schema_id", IntegerType, nullable = false),
    StructField("value", StringType, nullable = true),
    StructField("line_num", IntegerType, nullable = false)))

  val schema: StructType = StructType(Seq(
    StructField("tokens", ArrayType(tokenSchema, containsNull = true), nullable = false),
    StructField("n_tokens", IntegerType, nullable = false),
    StructField("n_lines", IntegerType, nullable = false),
    StructField("n_events", IntegerType, nullable = false),
    StructField("has_timestamp", BooleanType, nullable = false),
    StructField("first_ts", StringType, nullable = true),
    StructField("ts_schema_id", IntegerType, nullable = false),
    StructField("ts_extracted", TimestampType, nullable = true),
    StructField("n_errors", IntegerType, nullable = false),
    StructField("error_signature", StringType, nullable = true),
    StructField("tool_invocation", StringType, nullable = true),
    StructField("category", StringType, nullable = false)))

  private val ERROR = UTF8String.fromString("ERROR")
  private val FATAL = UTF8String.fromString("FATAL")
  private val TOOL = UTF8String.fromString("tool")
  private val ASSISTANT = UTF8String.fromString("assistant")
  private val CAT_ERRORS = UTF8String.fromString(Category.Errors)
  private val CAT_TOOL = UTF8String.fromString(Category.ToolCalls)
  private val CAT_ASSIST = UTF8String.fromString(Category.AssistantText)
  private val CAT_UNMATCHED = UTF8String.fromString(Category.Unmatched)
  private val TS_PLACEHOLDER = "<ts>"

  /** Reusable per-thread token-span scratch (4 ints per token: packed
    * type/schema, start, end, line). Thread-local because one bank/expression
    * can be shared across a stage's tasks; steady-state this allocates
    * nothing.
    */
  private val scratchTl: ThreadLocal[SpanBuf] =
    ThreadLocal.withInitial(() => new SpanBuf)

  private final class SpanBuf {
    var a: Array[Int] = new Array[Int](4 * 64)
    var n: Int = 0 // token count
    def reset(): Unit = n = 0
    def add(tt: Byte, sid: Int, start: Int, end: Int, line: Int): Unit = {
      if (4 * n == a.length) a = java.util.Arrays.copyOf(a, a.length * 2)
      val o = 4 * n
      a(o) = (tt.toInt << 24) | (sid & 0xFFFFFF)
      a(o + 1) = start
      a(o + 2) = end
      a(o + 3) = line
      n += 1
    }
    @inline def tt(i: Int): Byte = (a(4 * i) >> 24).toByte
    @inline def sid(i: Int): Int = { val s = a(4 * i) & 0xFFFFFF; if (s == 0xFFFFFF) -1 else s }
    @inline def start(i: Int): Int = a(4 * i + 1)
    @inline def end(i: Int): Int = a(4 * i + 2)
    @inline def line(i: Int): Int = a(4 * i + 3)
  }

  def parse(bank: PatternBank, text: UTF8String, role: UTF8String, tool: UTF8String): InternalRow = {
    val bytes = if (text == null) Array.emptyByteArray else text.getBytes
    val loglevelId = bank.varId("loglevel")
    val threadId = bank.varId("thread_identifier")
    val spans = scratchTl.get()
    spans.reset()

    // per-token bookkeeping collected in one pass over spans
    var nEol = 0
    var lastWasEol = false
    var nTs = 0
    var firstTsStart = -1
    var firstTsEnd = -1
    var tsSchemaId = -1
    var nErrors = 0
    var firstErrorLine = -1
    var toolInvStart = -1
    var toolInvEnd = -1
    val isToolRole = role != null && role.equals(TOOL)

    ByteTokenizer.tokenize(bank, bytes, new ByteTokenizer.Sink {
      override def token(tt: Byte, sid: Int, start: Int, end: Int, line: Int): Unit = {
        spans.add(tt, sid, start, end, line)
        lastWasEol = tt == TokenType.StaticTextWithEndLine
        if (lastWasEol) nEol += 1
        else if (tt == TokenType.Timestamp) {
          nTs += 1
          if (firstTsStart < 0) { firstTsStart = start; firstTsEnd = end; tsSchemaId = sid }
        } else if (tt == TokenType.Variable && sid == loglevelId) {
          val len = end - start
          if (len == 5 && matches5(bytes, start)) {
            nErrors += 1
            if (firstErrorLine < 0) firstErrorLine = line
          }
        } else if (tt == TokenType.Variable && sid == threadId) {
          if (isToolRole && toolInvStart < 0 && end - start >= 2) {
            toolInvStart = start + 1; toolInvEnd = end - 1
          }
        }
      }
    })

    val nTokens = spans.n
    val nLines = 1 + nEol - (if (lastWasEol) 1 else 0)
    // events split before each Timestamp token except a leading one
    val nEvents =
      if (nTokens == 0) 0
      else 1 + nTs - (if (spans.tt(0) == TokenType.Timestamp) 1 else 0)

    val category =
      if (nErrors > 0) CAT_ERRORS
      else if (isToolRole || tool != null) CAT_TOOL
      else if (role != null && role.equals(ASSISTANT)) CAT_ASSIST
      else CAT_UNMATCHED

    // Build the output struct directly in Tungsten format: one UnsafeRow
    // buffer per call (fresh buffer — the returned row must outlive this
    // call), zero per-token objects (mirrors GenerateUnsafeProjection's
    // array-of-struct pattern).
    val rw = new org.apache.spark.sql.catalyst.expressions.codegen.UnsafeRowWriter(
      12, 64 + bytes.length * 2)
    rw.resetRowWriter()
    rw.zeroOutNullBytes()

    // field 0: tokens ARRAY<STRUCT<byte,int,string,int>>
    val arrCursor = rw.cursor()
    val aw = new org.apache.spark.sql.catalyst.expressions.codegen.UnsafeArrayWriter(rw, 8)
    aw.initialize(nTokens)
    val sw = new org.apache.spark.sql.catalyst.expressions.codegen.UnsafeRowWriter(aw, 4)
    var i = 0
    while (i < nTokens) {
      val elemCursor = aw.cursor()
      sw.resetRowWriter()
      sw.zeroOutNullBytes()
      sw.write(0, spans.tt(i))
      sw.write(1, spans.sid(i))
      sw.write(2, bytes, spans.start(i), spans.end(i) - spans.start(i))
      sw.write(3, spans.line(i))
      aw.setOffsetAndSizeFromPreviousCursor(i, elemCursor)
      i += 1
    }
    rw.setOffsetAndSizeFromPreviousCursor(0, arrCursor)

    rw.write(1, nTokens)
    rw.write(2, nLines)
    rw.write(3, nEvents)
    rw.write(4, firstTsStart >= 0)
    if (firstTsStart < 0) rw.setNullAt(5)
    else rw.write(5, bytes, firstTsStart, firstTsEnd - firstTsStart)
    rw.write(6, tsSchemaId)
    val tsMicros = if (firstTsStart < 0) null else parseTsMicros(bytes, firstTsStart, firstTsEnd)
    if (tsMicros == null) rw.setNullAt(7) else rw.write(7, tsMicros.longValue())
    rw.write(8, nErrors)
    if (firstErrorLine < 0) rw.setNullAt(9)
    else rw.write(9, signature(bank, bytes, spans, firstErrorLine))
    if (isToolRole && toolInvStart >= 0) rw.write(10, bytes, toolInvStart, toolInvEnd - toolInvStart)
    else rw.setNullAt(10)
    rw.write(11, category)
    rw.getRow
  }

  /** value is exactly "ERROR" or "FATAL" (both length 5). */
  @inline private def matches5(b: Array[Byte], s: Int): Boolean =
    (b(s) == 'E' && b(s + 1) == 'R' && b(s + 2) == 'R' && b(s + 3) == 'O' && b(s + 4) == 'R') ||
    (b(s) == 'F' && b(s + 1) == 'A' && b(s + 2) == 'T' && b(s + 3) == 'A' && b(s + 4) == 'L')

  /** Log template of one line: variables → `<name>`, timestamps → `<ts>`,
    * static text verbatim; trailing newline dropped (mirrors
    * graft.pipeline.Parse.signatureOfLine, the test oracle).
    */
  private def signature(bank: PatternBank, bytes: Array[Byte], spans: SpanBuf, lineNum: Int): UTF8String = {
    val sb = new java.lang.StringBuilder(64)
    var i = 0
    while (i < spans.n) {
      if (spans.line(i) == lineNum) {
        spans.tt(i) match {
          case TokenType.Timestamp => sb.append(TS_PLACEHOLDER)
          case TokenType.Variable  => sb.append('<').append(bank.varName(spans.sid(i))).append('>')
          case _ => sb.append(new String(bytes, spans.start(i), spans.end(i) - spans.start(i),
            java.nio.charset.StandardCharsets.UTF_8))
        }
      }
      i += 1
    }
    if (sb.length > 0 && sb.charAt(sb.length - 1) == '\n') sb.setLength(sb.length - 1)
    UTF8String.fromString(sb.toString)
  }

  /** Fixed-offset timestamp parse for the example schema's 5 formats:
    * yyyy-MM-dd{T| }HH:mm:ss[{.|,}SSS] — digit positions are constant, so
    * no formatter, no exceptions. Epoch-day via the civil-from-days
    * algorithm; SMART day-of-month clamping like java.time's default
    * resolver. Returns micros since epoch (UTC) or null.
    */
  def parseTsMicros(bytes: Array[Byte], start: Int, end: Int): java.lang.Long = {
    val len = end - start
    if (len != 19 && len != 23) return null
    // positional sanity so a non-example ts schema degrades to null rather
    // than garbage: separators at the yyyy-MM-dd HH:mm:ss positions
    if (bytes(start + 4) != '-' || bytes(start + 7) != '-' ||
        bytes(start + 13) != ':' || bytes(start + 16) != ':') return null
    @inline def d2(off: Int): Int =
      (bytes(start + off) - '0') * 10 + (bytes(start + off + 1) - '0')
    val year = d2(0) * 100 + d2(2)
    var month = d2(5)
    var day = d2(8)
    val hour = d2(11)
    val minute = d2(14)
    val second = d2(17)
    val millis = if (len == 23) (bytes(start + 20) - '0') * 100 + d2(21) else 0
    if (month < 1 || month > 12 || day < 1 || hour > 23 || minute > 59 || second > 59) return null
    val leap = (year % 4 == 0 && year % 100 != 0) || year % 400 == 0
    val monthLen = month match {
      case 2 => if (leap) 29 else 28
      case 4 | 6 | 9 | 11 => 30
      case _ => 31
    }
    if (day > monthLen) day = monthLen // SMART resolution
    // Howard Hinnant's days_from_civil
    val y = if (month <= 2) year - 1 else year
    val era = (if (y >= 0) y else y - 399) / 400
    val yoe = y - era * 400
    val doy = (153 * (month + (if (month > 2) -3 else 9)) + 2) / 5 + day - 1
    val doe = yoe * 365 + yoe / 4 - yoe / 100 + doy
    val epochDay = era * 146097L + doe - 719468L
    val secs = epochDay * 86400L + hour * 3600L + minute * 60L + second
    java.lang.Long.valueOf(secs * 1000000L + millis * 1000L)
  }

  import org.apache.spark.sql.GraftBridge.{column, expression}
  def parse_turn(text: Column, role: Column, tool: Column, bank: PatternBank): Column =
    column(ParseTurnExpression(expression(text), expression(role), expression(tool), bank))
}

package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String
import graft.lexer.{ByteTokenizer, PatternBank, TokenType}
import graft.pipeline.Category

import scala.collection.mutable.ArrayBuffer

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

  def parse(bank: PatternBank, text: UTF8String, role: UTF8String, tool: UTF8String): InternalRow = {
    val bytes = if (text == null) Array.emptyByteArray else text.getBytes
    val loglevelId = bank.varId("loglevel")
    val threadId = bank.varId("thread_identifier")

    val rows = new ArrayBuffer[InternalRow](16)
    // per-token bookkeeping collected in one pass
    var nEol = 0
    var lastWasEol = false
    var nTs = 0
    var firstTsStart = -1
    var firstTsEnd = -1
    var tsSchemaId = -1
    var nErrors = 0
    var firstErrorLine = -1
    var toolInvocation: UTF8String = null
    val isToolRole = role != null && role.equals(TOOL)

    val sink = new ByteTokenizer.Sink {
      override def token(tt: Byte, sid: Int, start: Int, end: Int, line: Int): Unit = {
        val value = UTF8String.fromBytes(bytes, start, end - start)
        val row = new GenericInternalRow(4)
        row.update(0, tt)
        row.update(1, sid)
        row.update(2, value)
        row.update(3, line)
        rows += row
        lastWasEol = tt == TokenType.StaticTextWithEndLine
        if (lastWasEol) nEol += 1
        else if (tt == TokenType.Timestamp) {
          nTs += 1
          if (firstTsStart < 0) { firstTsStart = start; firstTsEnd = end; tsSchemaId = sid }
        } else if (tt == TokenType.Variable && sid == loglevelId) {
          if (value.equals(ERROR) || value.equals(FATAL)) {
            nErrors += 1
            if (firstErrorLine < 0) firstErrorLine = line
          }
        } else if (tt == TokenType.Variable && sid == threadId) {
          if (isToolRole && toolInvocation == null && end - start >= 2)
            toolInvocation = UTF8String.fromBytes(bytes, start + 1, end - start - 2)
        }
      }
    }
    ByteTokenizer.tokenize(bank, bytes, sink)

    val nTokens = rows.length
    val nLines = 1 + nEol - (if (lastWasEol) 1 else 0)
    // events split before each Timestamp token except a leading one
    val nEvents =
      if (nTokens == 0) 0
      else 1 + nTs - (if (rows(0).getByte(0) == TokenType.Timestamp) 1 else 0)

    val firstTs =
      if (firstTsStart < 0) null
      else UTF8String.fromBytes(bytes, firstTsStart, firstTsEnd - firstTsStart)
    val tsMicros =
      if (firstTsStart < 0) null
      else parseTsMicros(bytes, firstTsStart, firstTsEnd)

    val errorSig = if (firstErrorLine < 0) null else signature(bank, rows, firstErrorLine)

    val category =
      if (nErrors > 0) CAT_ERRORS
      else if (isToolRole || tool != null) CAT_TOOL
      else if (role != null && role.equals(ASSISTANT)) CAT_ASSIST
      else CAT_UNMATCHED

    val out = new GenericInternalRow(12)
    out.update(0, new GenericArrayData(rows.toArray[Any]))
    out.update(1, nTokens)
    out.update(2, nLines)
    out.update(3, nEvents)
    out.update(4, firstTsStart >= 0)
    out.update(5, firstTs)
    out.update(6, tsSchemaId)
    out.update(7, tsMicros)
    out.update(8, nErrors)
    out.update(9, errorSig)
    out.update(10, if (isToolRole) toolInvocation else null)
    out.update(11, category)
    out
  }

  /** Log template of one line: variables → `<name>`, timestamps → `<ts>`,
    * static text verbatim; trailing newline dropped (mirrors
    * graft.pipeline.Parse.signatureOfLine, the test oracle).
    */
  private def signature(bank: PatternBank, rows: ArrayBuffer[InternalRow], lineNum: Int): UTF8String = {
    val sb = new java.lang.StringBuilder(64)
    var i = 0
    while (i < rows.length) {
      val r = rows(i)
      if (r.getInt(3) == lineNum) {
        r.getByte(0) match {
          case TokenType.Timestamp => sb.append(TS_PLACEHOLDER)
          case TokenType.Variable  => sb.append('<').append(bank.varName(r.getInt(1))).append('>')
          case _                   => sb.append(r.getUTF8String(2).toString)
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

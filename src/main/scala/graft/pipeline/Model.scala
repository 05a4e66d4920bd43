package graft.pipeline

import java.sql.Timestamp

/** Input row: one turn of a multi-turn transcript — the exact shape mandated
  * by BASELINE.json `input_hint`:
  * (conv_id string, turn_idx int, role string, text string, tool string, ts timestamp).
  */
final case class Turn(
    conv_id: String,
    turn_idx: Int,
    role: String,
    text: String,
    tool: String, // nullable: tool name when role == "tool"
    ts: Timestamp
)

/** One token of a turn's text, as a nested array element on the parsed row.
  * token_type: 0=Timestamp 1=Variable 2=StaticText 3=StaticTextWithEndLine;
  * schema_id is the matched pattern index (priority id), -1 for static text.
  */
final case class TokenRow(token_type: Byte, schema_id: Int, value: String, line_num: Int)

/** Parse-stage output: the turn plus its token array and the extracted
  * routing fields. Tokens stay nested (per-turn equality checks remain a
  * row-level compare); `explode` only where token granularity is needed.
  */
final case class ParsedTurn(
    conv_id: String,
    turn_idx: Int,
    role: String,
    tool: String,
    ts: Timestamp,
    text: String,
    tokens: Seq[TokenRow],
    n_tokens: Int,
    n_lines: Int,
    n_events: Int,
    has_timestamp: Boolean,
    first_ts: String,        // raw text of the first Timestamp token, or null
    ts_schema_id: Int,       // which ts pattern matched first, or -1
    ts_extracted: Timestamp, // first_ts parsed with the matched pattern's format, or null
    n_errors: Int,           // loglevel tokens with value ERROR|FATAL
    error_signature: String, // log template of the first error line, or null
    tool_invocation: String, // first "[tool]"-style thread/tool id on a tool turn, or null
    category: String         // errors | tool_calls | assistant_text | unmatched
)

object Category {
  val Errors = "errors"
  val ToolCalls = "tool_calls"
  val AssistantText = "assistant_text"
  val Unmatched = "unmatched"
  val All: Seq[String] = Seq(Errors, ToolCalls, AssistantText, Unmatched)
}

/** splitmix64 — deterministic per-row RNG. Seeding by a pure function of
  * (conv, turn) keys makes generation independent of partitioning, so the
  * synthetic tables are bit-identical at any parallelism (needed for the
  * N-vs-4N scaling runs and the DuckDB oracle).
  */
object Rng {
  def mix(z0: Long): Long = {
    var z = z0 + 0x9E3779B97F4A7C15L
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z ^ (z >>> 31)
  }
  def mix2(a: Long, b: Long): Long = mix(mix(a) ^ b)
  /** Uniform in [0, n). */
  def bounded(z: Long, n: Int): Int = (Math.floorMod(z, n.toLong)).toInt
}

package graft.sources

import java.sql.Timestamp
import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.lexer.{PatternBank, TokenType, Tokenizer}
import graft.pipeline.{Category, Parse}

/** Raw log-file source — the reference's primary input mode
  * (`BufferedFileStream` + `Lexer`, /root/reference/src/lexer/lexer.rs and
  * tests/lexer_test.rs:9-65): read `.log` files, tokenize, and assemble
  * multi-line events (split-before-each-Timestamp) into a typed Dataset.
  *
  * Scale design: the unit of parallelism is the FILE (wholetext read +
  * per-file tokenize in `flatMap`), matching how log pipelines shard in
  * practice — a crawl/cluster emits many files, and event boundaries never
  * cross files, so no fix-up shuffle is needed. A single pathological
  * multi-GB file would pin one task; splitting WITHIN a file would need a
  * boundary-repair pass (CLP-style chunk + merge at the first Timestamp
  * after each split), noted as the extension point. Tokenization is
  * lossless (`concat(event texts) == file bytes`, asserted in tests).
  */
object LogFiles {

  /** One assembled multi-line log event. */
  final case class LogEvent(
      file: String,
      event_idx: Int,
      line_start: Int,
      line_end: Int,
      has_timestamp: Boolean,
      first_ts: String,
      ts_extracted: Timestamp,
      n_tokens: Int,
      n_errors: Int,
      error_signature: String,
      category: String,
      text: String
  )

  /** Parse every file matching `pathGlob` into events. */
  def events(spark: SparkSession, pathGlob: String,
             bank: Broadcast[PatternBank]): Dataset[LogEvent] = {
    import spark.implicits._
    spark.read.option("wholetext", "true").text(pathGlob)
      .select(input_file_name().as("file"), col("value"))
      .as[(String, String)]
      .flatMap { case (file, content) => eventsOf(file, content, bank.value) }
  }

  /** Pure per-file parse — shared with tests. Extraction semantics come
    * from [[Parse.scanTokens]], the same kernel the transcript pipeline
    * uses, applied to THIS event's token slice only (a whole-file scan per
    * event would make dense-error files O(events × file_tokens), and could
    * pick up a neighboring event sharing the boundary line).
    */
  def eventsOf(file: String, content: String, bank: PatternBank): Iterator[LogEvent] = {
    val toks = Tokenizer.tokenize(bank, content)
    Tokenizer.assembleEvents(toks).iterator.zipWithIndex.map { case (span, idx) =>
      val eventToks = toks.slice(span.tokenStart, span.tokenEnd)
      val scan = Parse.scanTokens(bank, eventToks)
      val sb = new java.lang.StringBuilder(128)
      eventToks.foreach(t => sb.append(t.value))
      LogEvent(
        file = file,
        event_idx = idx,
        line_start = span.lineStart,
        line_end = span.lineEnd,
        has_timestamp = span.hasTimestamp,
        first_ts = scan.firstTs,
        ts_extracted = Parse.parseTsToken(scan.firstTs, scan.tsSchemaId),
        n_tokens = span.tokenEnd - span.tokenStart,
        n_errors = scan.nErrors,
        error_signature =
          if (scan.firstErrorLine < 0) null
          else Parse.signatureOfLine(bank, eventToks, scan.firstErrorLine),
        category = if (scan.nErrors > 0) Category.Errors else Category.Unmatched,
        text = sb.toString
      )
    }
  }
}

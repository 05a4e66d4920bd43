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
  * Scale design: [[events]]'s unit of parallelism is the FILE (wholetext
  * read + per-file tokenize in `flatMap`), matching how log pipelines shard
  * in practice — a crawl/cluster emits many files, and event boundaries
  * never cross files, so no fix-up shuffle is needed. For pathological
  * multi-GB files that would pin one task, [[eventsSplit]] adds WITHIN-FILE
  * parallelism: CLP-style chunking with boundary repair at the first
  * event-start line after each split, producing byte-identical events.
  * Tokenization is lossless (`concat(event texts) == file bytes`, asserted
  * in tests).
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

  /** [[LogEvent]] plus its token array — the reference exposes an event's
    * tokens for per-event variable extraction
    * (/root/reference/src/log_parser/log_parser.rs:106-134:
    * `get_timestamp_token`, `get_log_message_tokens`); without them a
    * downstream extractor would have to re-tokenize the event text. Nested
    * on purpose: `select($"event.*", $"tokens")` flattens when wanted, and
    * [[events]] consumers that don't need tokens never pay for the array.
    * Token rows reuse the pipeline's schema (token_type, schema_id, value,
    * line_num); line_num is 1-based within the parsed text (file-local on
    * this wholetext path), exactly what [[eventsOf]]'s tokenize emitted.
    */
  final case class LogEventWithTokens(event: LogEvent, tokens: Seq[graft.pipeline.TokenRow])

  /** Parse every file matching `pathGlob` into events. */
  def events(spark: SparkSession, pathGlob: String,
             bank: Broadcast[PatternBank]): Dataset[LogEvent] = {
    import spark.implicits._
    spark.read.option("wholetext", "true").text(pathGlob)
      .select(input_file_name().as("file"), col("value"))
      .as[(String, String)]
      .flatMap { case (file, content) => eventsOf(file, content, bank.value) }
  }

  /** Structured Streaming twin of [[events]]: `.log` files arriving in
    * `dir` parse through the SAME kernels as the batch paths, one
    * micro-batch per trigger — the raw-log side of the R2 pluggable-stream
    * symmetry [[graft.streaming.StreamingParse]] provides for transcripts
    * (the reference's pull-stream input, /root/reference/src/lexer/
    * lexer_stream.rs:3-5). The `binaryFile` file-stream source is used for
    * DISCOVERY only — the query selects just (path, length), so the
    * source's column pruning never materializes file content; all byte
    * reads below are bounded ranges. A file is processed exactly once, in
    * the micro-batch that discovers it (file-source offset tracking);
    * event boundaries never cross files, so no cross-batch state is
    * needed, and batch ≡ stream equality is by construction (shared
    * kernels) and asserted in StreamingSpec.
    *
    * WITHIN-FILE SPLIT (the memory/latency bound the batch side gets from
    * [[eventsSplit]]): a file larger than `chunkBytes` is routed through
    * the chunk-index kernel INSIDE the stream — one task per file runs the
    * cheap phase-1 boundary scan ([[scanChunk]] per range, each holding
    * ~chunkBytes + lookahead, buffers discarded between chunks) and
    * prefix-sums it into repaired regions ([[regionsOf]]); the regions
    * then REPARTITION across the cluster and tokenize in parallel
    * ([[parseRegion]]). A 512 MB log arriving in the stream is a ~1 s
    * byte scan plus 32 parallel ~16 MB parse tasks, not one whole-file
    * task holding 512 MB on-heap. Files at or under `chunkBytes` (and all
    * files of a schema whose patterns fail [[chunkIndex]]'s newline-safety
    * preconditions, where split points can't be trusted) parse as a single
    * region — for those the whole-file task is the documented fallback.
    * Global event_idx / line numbers are file-local exactly like
    * [[events]]; the split restores them from the prefix sums, so stream
    * output is byte-identical to the batch wholetext parse. Files must
    * arrive complete (the standard file-source contract: write elsewhere,
    * move in).
    */
  def eventsStream(spark: SparkSession, dir: String, bank: Broadcast[PatternBank],
                   maxFilesPerTrigger: Int = 4, chunkBytes: Long = 16L << 20,
                   regionParallelism: Int = 0): Dataset[LogEvent] = {
    import spark.implicits._
    require(chunkBytes >= 4096, s"chunkBytes too small: $chunkBytes")
    val confSer = new org.apache.spark.SerializableWritable(
      spark.sparkContext.hadoopConfiguration)
    // same soundness preconditions chunkIndex requires; checked ONCE on the
    // driver — an unsafe schema degrades to whole-file regions, it must not
    // silently mis-split
    val splittable = !bank.value.tsDfa.canTransitionOn('\n') &&
      !bank.value.varDfa.canTransitionOn('\n') && bank.value.isDelimiter('\n')
    val files = spark.readStream
      .format("binaryFile")
      // the binaryFile format's FIXED schema — the streaming source API
      // still requires it stated explicitly
      .schema(org.apache.spark.sql.types.StructType.fromDDL(
        "path STRING, modificationTime TIMESTAMP, length BIGINT, content BINARY"))
      .option("pathGlobFilter", "*.log")
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .load(dir)
      .select(col("path"), col("length"))
      .as[(String, Long)]
    val regions = files.flatMap { case (path, len) =>
      if (!splittable || len <= chunkBytes) Iterator.single(Region(path, 0L, len, 0L, 0L))
      else {
        val n = ((len + chunkBytes - 1) / chunkBytes).toInt
        val metas = (0 until n).map { i =>
          scanChunk(path, i, i * chunkBytes, math.min(len, (i + 1) * chunkBytes),
            len, bank.value, confSer.value)
        }
        regionsOf(metas).iterator
      }
    }
    regions
      .repartition(if (regionParallelism > 0) regionParallelism
        else spark.sparkContext.defaultParallelism)
      .flatMap(r => parseRegion(r, bank.value, confSer.value))
  }

  /** [[events]] with the per-event token array attached. */
  def eventsWithTokens(spark: SparkSession, pathGlob: String,
                       bank: Broadcast[PatternBank]): Dataset[LogEventWithTokens] = {
    import spark.implicits._
    spark.read.option("wholetext", "true").text(pathGlob)
      .select(input_file_name().as("file"), col("value"))
      .as[(String, String)]
      .flatMap { case (file, content) => eventsWithTokensOf(file, content, bank.value) }
  }

  // ------------------------------------------------------------------ //
  // Within-file split: the CLP-style chunk + boundary-repair path for    //
  // files too large for one task (the extension point noted above).      //
  // ------------------------------------------------------------------ //

  /** Phase-1 metadata for one byte chunk `[start, end)` of a file: where
    * the first event starts at/after `start`, how many events start inside
    * the chunk, and newline counts (for global line numbering).
    * `firstEventStart == -1` means no event starts inside this chunk (a
    * single event spans it) — its bytes belong to the previous owner.
    * Public: [[chunkIndex]] returns these so the index can be persisted to
    * parquet and reused across jobs.
    */
  final case class ChunkMeta(
      file: String, chunkIdx: Int, start: Long, end: Long,
      firstEventStart: Long, nEventStarts: Long,
      nNewlines: Long, nNewlinesBeforeFirstEvent: Long)

  /** A repaired parse region: `[start, end)` begins at an event-start line
    * and ends at the next chunk's first event start, so events never cross
    * regions. Offsets restore global event indices and line numbers.
    */
  private[sources] final case class Region(
      file: String, start: Long, end: Long,
      eventIdxOffset: Long, lineOffset: Long)

  /** Parse files matching `pathGlob` into events with WITHIN-FILE
    * parallelism: files are cut into `chunkBytes` ranges, a cheap
    * distributed index pass finds event-start lines (a line start where the
    * timestamp DFA accepts — the same test `tokenize` applies) and newline
    * counts per chunk, the driver prefix-sums chunk metadata into repaired
    * regions (each starting at an event boundary), and a second distributed
    * pass tokenizes each region independently. Event output is IDENTICAL to
    * [[events]] (asserted in tests) — same events, same global event_idx
    * and line numbers — but a multi-GB file now spreads over
    * size/chunkBytes tasks instead of pinning one.
    *
    * Scale notes: the index pass is an IO-bound byte scan (DFA probes only
    * at line starts); at very large scale, persist its output like CLP
    * persists its archive index instead of re-deriving per job. Driver
    * memory holds one small ChunkMeta per chunk — size chunkBytes so
    * files/chunkBytes stays ~10⁵–10⁶ (the same regime as Spark's own
    * driver-side file-split planning). Soundness preconditions (checked):
    * '\n' is a delimiter and neither the timestamp nor the variable DFA can
    * consume '\n' — split points are line starts, so a newline-swallowing
    * token could hide an event boundary (and a newline) from the index pass.
    */
  def eventsSplit(spark: SparkSession, pathGlob: String, bank: Broadcast[PatternBank],
                  chunkBytes: Long = 16L << 20): Dataset[LogEvent] =
    eventsFromIndex(spark, chunkIndex(spark, pathGlob, bank, chunkBytes), bank)

  /** Phase 1 as a first-class, PERSISTABLE artifact: the chunk index — one
    * slim row per `chunkBytes` range of each matched file (event-start
    * offsets + newline counts). This is the CLP move: the index costs one
    * IO-bound scan of the raw logs, and once written to parquet it lets
    * every later job ([[eventsFromIndex]]) jump straight to repaired
    * parse regions without re-deriving boundaries — write it next to the
    * archive and reuse it for the file's lifetime (raw logs are immutable).
    */
  def chunkIndex(spark: SparkSession, pathGlob: String, bank: Broadcast[PatternBank],
                 chunkBytes: Long = 16L << 20): Dataset[ChunkMeta] = {
    // Soundness guards: split points are line starts, so '\n' must be a
    // hard token boundary. A timestamp OR variable pattern that can consume
    // '\n' lets a token swallow a newline (tokenize then neither probes the
    // next line start nor counts the newline), and a schema without '\n' as
    // a delimiter has no line structure at all.
    require(!bank.value.tsDfa.canTransitionOn('\n'),
      "within-file split requires newline-free timestamp patterns; use events() instead")
    require(!bank.value.varDfa.canTransitionOn('\n'),
      "within-file split requires newline-free variable patterns; use events() instead")
    require(bank.value.isDelimiter('\n'),
      "within-file split requires '\\n' to be a delimiter; use events() instead")
    require(chunkBytes >= 4096, s"chunkBytes too small: $chunkBytes")
    import spark.implicits._

    val hconf = spark.sparkContext.hadoopConfiguration
    // executor-side reads must see the SESSION's Hadoop conf (credentials,
    // endpoints, defaultFS) — a fresh Configuration() would silently limit
    // the split path to conf-free filesystems. SerializableWritable ships it.
    val confSer = new org.apache.spark.SerializableWritable(hconf)
    val glob = new org.apache.hadoop.fs.Path(pathGlob)
    val fs = glob.getFileSystem(hconf)
    val files = Option(fs.globStatus(glob)).getOrElse(Array.empty)
      .filter(s => s.isFile && s.getLen > 0)
      .map(s => (s.getPath.toString, s.getLen))
      .sortBy(_._1)

    val chunks = files.flatMap { case (path, len) =>
      val n = ((len + chunkBytes - 1) / chunkBytes).toInt
      (0 until n).map(i => (path, i, i * chunkBytes, math.min(len, (i + 1) * chunkBytes), len))
    }.toSeq

    spark.createDataset(chunks)
      .map { case (path, idx, s, e, len) =>
        scanChunk(path, idx, s, e, len, bank.value, confSer.value) }
  }

  /** Phase 2: parse events from a (possibly parquet-round-tripped) chunk
    * index. The index rows are collected (slim — one per chunk), prefix-
    * summed into repaired regions on the driver, and each region is
    * tokenized independently. Output equals [[events]] byte-for-byte.
    */
  def eventsFromIndex(spark: SparkSession, index: Dataset[ChunkMeta],
                      bank: Broadcast[PatternBank]): Dataset[LogEvent] = {
    import spark.implicits._
    val confSer = new org.apache.spark.SerializableWritable(
      spark.sparkContext.hadoopConfiguration)
    val metas = index.collect()

    // driver: prefix-sum chunk metadata into repaired regions
    val regions = metas.groupBy(_.file).toSeq.flatMap { case (_, ms) => regionsOf(ms) }

    // phase 2 (distributed): tokenize each region independently; restore
    // global event indices and line numbers from the prefix sums
    spark.createDataset(regions).flatMap(r => parseRegion(r, bank.value, confSer.value))
  }

  /** Prefix-sum ONE file's chunk metas into repaired parse regions — the
    * boundary-repair core shared by the batch split path
    * ([[eventsFromIndex]], driver-side over the collected index) and the
    * streaming split path ([[eventsStream]], executor-side per file).
    */
  private[sources] def regionsOf(ms: Seq[ChunkMeta]): Vector[Region] = {
    val sorted = ms.sortBy(_.chunkIdx)
    val file = sorted.head.file
    val fileLen = sorted.last.end
    var eventsBefore = 0L
    var newlinesBefore = 0L
    val out = Vector.newBuilder[Region]
    var i = 0
    while (i < sorted.length) {
      val m = sorted(i)
      if (m.firstEventStart >= 0) {
        // owned region ends at the next chunk that owns an event start
        var j = i + 1
        while (j < sorted.length && sorted(j).firstEventStart < 0) j += 1
        val end = if (j < sorted.length) sorted(j).firstEventStart else fileLen
        out += Region(file, m.firstEventStart, end, eventsBefore,
          newlinesBefore + m.nNewlinesBeforeFirstEvent)
      }
      eventsBefore += m.nEventStarts
      newlinesBefore += m.nNewlines
      i += 1
    }
    out.result()
  }

  /** Tokenize one repaired region and restore its global event indices and
    * line numbers from the prefix-sum offsets (shared phase-2 kernel).
    */
  private def parseRegion(r: Region, bank: PatternBank,
                          conf: org.apache.hadoop.conf.Configuration): Iterator[LogEvent] = {
    val content = new String(readRange(r.file, r.start, r.end, conf),
      java.nio.charset.StandardCharsets.UTF_8)
    eventsOf(r.file, content, bank).map { ev =>
      ev.copy(
        event_idx = (ev.event_idx + r.eventIdxOffset).toInt,
        line_start = (ev.line_start + r.lineOffset).toInt,
        line_end = (ev.line_end + r.lineOffset).toInt)
    }
  }

  /** Read bytes `[start, end)` of a Hadoop-FS path. Ranges are bounded by
    * the JVM's array/String limit — a repaired region larger than 2 GB
    * means >2 GB between two event starts, which no single-String tokenize
    * (here or in wholetext [[events]]) can represent; fail with a clear
    * message instead of a negative-size allocation.
    */
  private def readRange(file: String, start: Long, end: Long,
                        conf: org.apache.hadoop.conf.Configuration): Array[Byte] = {
    require(end - start < Int.MaxValue.toLong,
      s"single parse region of ${end - start} bytes in $file exceeds the 2 GB JVM string " +
        "limit (one event spans >2 GB between timestamps)")
    val path = new org.apache.hadoop.fs.Path(file)
    val fs = path.getFileSystem(conf)
    val in = fs.open(path)
    try {
      val buf = new Array[Byte]((end - start).toInt)
      in.seek(start)
      in.readFully(buf)
      buf
    } finally in.close()
  }

  /** Phase-1 scan of one chunk: walk `[start, end)` finding line starts,
    * probe the timestamp DFA at each (reading past `end` only as far as a
    * live probe needs), and count newlines. Probes replicate exactly the
    * test `tokenize` applies at a line start: does the ts DFA reach ANY
    * accepting state before dying (longest-match selection doesn't matter
    * for boundary detection).
    */
  private def scanChunk(file: String, chunkIdx: Int, start: Long, end: Long,
                        fileLen: Long, bank: PatternBank,
                        conf: org.apache.hadoop.conf.Configuration): ChunkMeta = {
    var lookahead = 8192L
    var buf = readRange(file, math.max(0L, start - 1), math.min(fileLen, end + lookahead), conf)
    val bufStart = math.max(0L, start - 1)

    // probe result: 1 = event start, 0 = no, -1 = ran off the buffer alive
    def probe(fromOff: Long): Int = {
      val dfa = bank.tsDfa
      var st = 0
      var i = (fromOff - bufStart).toInt
      while (i < buf.length) {
        val c = buf(i) & 0xff
        if (c >= 128) return 0
        st = dfa.next(st, c)
        if (st < 0) return 0
        if (dfa.acceptedPattern(st) >= 0) return 1
        i += 1
      }
      if (bufStart + buf.length >= fileLen) 0 else -1
    }

    def probeExtending(fromOff: Long): Boolean = {
      var r = probe(fromOff)
      while (r == -1) {
        lookahead *= 4
        buf = readRange(file, bufStart, math.min(fileLen, end + lookahead), conf)
        r = probe(fromOff)
      }
      r == 1
    }

    var firstEventStart = -1L
    var nEventStarts = 0L
    var nNewlines = 0L
    var nNewlinesBeforeFirst = 0L

    def visitLineStart(off: Long): Unit = {
      val isEvent = off == 0L || probeExtending(off)
      if (isEvent) {
        nEventStarts += 1
        if (firstEventStart < 0) { firstEventStart = off; nNewlinesBeforeFirst = nNewlines }
      }
    }

    // `start` is a line start iff it's the file start or follows a '\n'
    if (start == 0L || buf(0) == '\n') visitLineStart(start)
    var off = start
    while (off < end) {
      if (buf((off - bufStart).toInt) == '\n') {
        nNewlines += 1
        if (off + 1 < end) visitLineStart(off + 1)
      }
      off += 1
    }
    if (firstEventStart < 0) nNewlinesBeforeFirst = nNewlines
    ChunkMeta(file, chunkIdx, start, end, firstEventStart, nEventStarts,
      nNewlines, nNewlinesBeforeFirst)
  }

  /** Pure per-file parse — shared with tests. Extraction semantics come
    * from [[Parse.scanTokens]], the same kernel the transcript pipeline
    * uses, applied to THIS event's token slice only (a whole-file scan per
    * event would make dense-error files O(events × file_tokens), and could
    * pick up a neighboring event sharing the boundary line).
    */
  def eventsOf(file: String, content: String, bank: PatternBank): Iterator[LogEvent] =
    eventSlices(file, content, bank).map(_._1)

  /** [[eventsOf]] keeping each event's token slice attached. */
  def eventsWithTokensOf(file: String, content: String,
                         bank: PatternBank): Iterator[LogEventWithTokens] =
    eventSlices(file, content, bank).map { case (ev, toks) =>
      LogEventWithTokens(ev, toks.iterator
        .map(t => graft.pipeline.TokenRow(t.tokenType, t.schemaId, t.value, t.lineNum))
        .toVector)
    }

  private def eventSlices(file: String, content: String, bank: PatternBank)
      : Iterator[(LogEvent, collection.IndexedSeq[graft.lexer.Token])] = {
    val toks = Tokenizer.tokenize(bank, content)
    Tokenizer.assembleEvents(toks).iterator.zipWithIndex.map { case (span, idx) =>
      val eventToks = toks.slice(span.tokenStart, span.tokenEnd)
      val scan = Parse.scanTokens(bank, eventToks)
      val sb = new java.lang.StringBuilder(128)
      eventToks.foreach(t => sb.append(t.value))
      (LogEvent(
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
      ), eventToks)
    }
  }

  /** The slim per-event projection shared by the l1 driver query (split
    * path via a persisted chunk index) and its oracle staging (wholetext
    * path): enough columns to pin boundaries, numbering, extraction and the
    * exact text bytes (crc), without shipping the text itself.
    */
  def eventStats(events: Dataset[LogEvent]): org.apache.spark.sql.DataFrame =
    events.toDF().select(
      col("event_idx"), col("line_start"), col("line_end"), col("has_timestamp"),
      col("first_ts"), col("n_tokens"), col("n_errors"), col("error_signature"),
      col("category"), length(col("text")).cast("bigint").as("n_chars"),
      crc32(col("text").cast("binary")).as("text_crc"))
}

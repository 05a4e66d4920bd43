package graft.datagen

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import graft.pipeline.{Rng, Turn}
import java.sql.Timestamp

/** Deterministic synthetic transcript generator (FIXTURES.md §2).
  *
  * Shape per BASELINE.json input_hint; content per the reference's
  * hive-24h.log line shapes (/root/reference/examples/logs/hive-24h.log):
  * timestamp-led Hadoop/Hive-style lines in all 5 ts formats, continuation
  * lines, bracketed thread ids, paths, hex UUIDs, int/float variables,
  * error signatures, tool-invocation lines, plus chat-ish un-matched text.
  *
  * Every value is a pure function of (seed, convIdx, turnIdx) — generation is
  * partitioning-independent and reproducible at any parallelism. conv sizes
  * are skewed (a few hot conversations get ~100× the median turns) so the
  * routing stage's salted repartition has real skew to defuse.
  */
object SyntheticTranscripts {

  val ToolNames: Vector[String] = Vector(
    "bash", "python", "browser", "web_search", "file_editor", "compiler",
    "db_query", "http_client", "calculator", "translator", "planner",
    "memory_store", "scheduler", "mailer", "vision", "code_review")

  val Roles: Vector[String] = Vector("user", "assistant", "system", "tool")

  private val Classes = Vector(
    "org.apache.hadoop.metrics2.impl.MetricsSystemImpl",
    "org.apache.hadoop.mapred.MapTask",
    "org.apache.hadoop.hive.ql.exec.mr.ExecMapper",
    "org.apache.hadoop.hive.ql.exec.TableScanOperator",
    "org.apache.hadoop.mapreduce.task.ReduceContextImpl",
    "org.apache.spark.scheduler.TaskSetManager")
  private val Threads = Vector("[main]", "[worker_1]", "[worker_2]", "[shuffle_0]", "[rpc_8]")
  private val Verbs = Vector("Scheduled", "Processing", "Initializing", "Starting", "Finished", "Committing")
  private val Objects = Vector("snapshot period at", "split number", "children of", "container with id", "task attempt", "merge pass over")
  private val PathParts = Vector("tmp", "hadoop-ubuntu", "usercache", "appcache", "HiBench", "Hive", "Input-comp", "uservisits", "target", "share")
  private val ChatBits = Vector(
    "ok let me check the logs now", "looking into the failing task",
    "here is what I found so far", "can you rerun the job please",
    "the shuffle stage looks healthy", "summarizing the error output",
    "I will inspect the container next", "this needs a deeper look")
  private val ErrClasses = Vector("IOException", "NullPointerException", "OutOfMemoryError", "FileNotFoundException")

  private val baseEpochMs = 1427100000000L // 2015-03-23T09:20:00Z, near the fixture's era

  def tsString(rng: Long, epochMs: Long): (String, Int) = {
    val fmt = Rng.bounded(rng, 5)
    val instant = java.time.Instant.ofEpochMilli(epochMs)
    val ldt = java.time.LocalDateTime.ofInstant(instant, java.time.ZoneOffset.UTC)
    val date = f"${ldt.getYear}%04d-${ldt.getMonthValue}%02d-${ldt.getDayOfMonth}%02d"
    val time = f"${ldt.getHour}%02d:${ldt.getMinute}%02d:${ldt.getSecond}%02d"
    val ms = f"${epochMs % 1000}%03d"
    val s = fmt match {
      case 0 => s"${date}T$time.$ms"
      case 1 => s"${date}T$time,$ms"
      case 2 => s"$date $time.$ms"
      case 3 => s"$date $time,$ms"
      case 4 => s"$date $time"
    }
    (s, fmt)
  }

  private def hexUuid(rng: Long): String = {
    val a = Rng.mix(rng); val b = Rng.mix(a)
    f"0x$a%016x$b%016x".replace("-", "0")
  }

  private def path(rng: Long): String = {
    val n = 2 + Rng.bounded(rng, 4)
    (0 until n).map(i => PathParts(Rng.bounded(Rng.mix2(rng, i), PathParts.size))).mkString("/", "/", "") +
      s"/part-${Rng.bounded(Rng.mix2(rng, 99), 100000)}"
  }

  /** Build one turn's text. Deterministic in (seed, conv, turn). */
  def buildText(seed: Long, conv: Long, turn: Int, role: String, tool: String): String = {
    val r0 = Rng.mix2(Rng.mix2(seed, conv), turn.toLong)
    val epochMs = baseEpochMs + conv * 60000L + turn * 1731L + Rng.bounded(r0, 900)
    val sb = new StringBuilder(256)
    val isError = Rng.bounded(Rng.mix2(r0, 7L), 100) < 8 && (role == "assistant" || role == "tool")

    role match {
      case "user" | "system" =>
        // chat-ish, usually no timestamp; occasionally quotes a log line
        sb.append(ChatBits(Rng.bounded(r0, ChatBits.size)))
        if (Rng.bounded(Rng.mix2(r0, 1L), 10) < 3) {
          sb.append(" code ").append(Rng.bounded(Rng.mix2(r0, 2L), 500))
        }
        sb.append('\n')
      case "tool" =>
        val (ts, _) = tsString(Rng.mix2(r0, 3L), epochMs)
        sb.append(ts).append(" INFO [").append(tool).append("] invoked with args ")
          .append(path(Rng.mix2(r0, 4L))).append(" timeout ")
          .append(10 + Rng.bounded(Rng.mix2(r0, 5L), 990)).append('\n')
        val extra = Rng.bounded(Rng.mix2(r0, 6L), 3)
        var i = 0
        while (i < extra) {
          sb.append(" - UUID:").append(hexUuid(Rng.mix2(r0, 10L + i))).append('\n')
          i += 1
        }
        if (isError) {
          val (ts2, _) = tsString(Rng.mix2(r0, 8L), epochMs + 120)
          sb.append(ts2).append(" ERROR [").append(tool).append("] ")
            .append(Classes(Rng.bounded(Rng.mix2(r0, 9L), Classes.size)))
            .append(": caught ").append(ErrClasses(Rng.bounded(Rng.mix2(r0, 11L), ErrClasses.size)))
            .append(" at ").append(path(Rng.mix2(r0, 12L)))
            .append(" retry ").append(Rng.bounded(Rng.mix2(r0, 13L), 5)).append('\n')
        }
      case _ => // assistant: hive-style log lines, sometimes multi-line
        val nLines = 1 + Rng.bounded(Rng.mix2(r0, 20L), 3)
        var line = 0
        while (line < nLines) {
          val rl = Rng.mix2(r0, 30L + line)
          val (ts, _) = tsString(rl, epochMs + line * 37)
          val level = if (isError && line == nLines - 1) {
            if (Rng.bounded(Rng.mix2(rl, 1L), 4) == 0) "FATAL" else "ERROR"
          } else Vector("INFO", "DEBUG", "WARN", "TRACE")(Rng.bounded(Rng.mix2(rl, 2L), 4))
          sb.append(ts).append(' ').append(level).append(' ')
            .append(Threads(Rng.bounded(Rng.mix2(rl, 3L), Threads.size))).append(' ')
            .append(Classes(Rng.bounded(Rng.mix2(rl, 4L), Classes.size))).append(": ")
          if (level == "ERROR" || level == "FATAL") {
            sb.append("caught ").append(ErrClasses(Rng.bounded(Rng.mix2(rl, 5L), ErrClasses.size)))
              .append(" at ").append(path(Rng.mix2(rl, 6L)))
              .append(" code ").append(Rng.bounded(Rng.mix2(rl, 7L), 500))
          } else {
            sb.append(Verbs(Rng.bounded(Rng.mix2(rl, 5L), Verbs.size))).append(' ')
              .append(Objects(Rng.bounded(Rng.mix2(rl, 6L), Objects.size))).append(' ')
              .append(Rng.bounded(Rng.mix2(rl, 7L), 10000))
            if (Rng.bounded(Rng.mix2(rl, 8L), 3) == 0)
              sb.append(" ratio ").append(Rng.bounded(Rng.mix2(rl, 9L), 100))
                .append('.').append(Rng.bounded(Rng.mix2(rl, 10L), 100))
          }
          sb.append('\n')
          // continuation lines (multi-line event)
          if (Rng.bounded(Rng.mix2(rl, 11L), 4) == 0) {
            sb.append(" - InputFormatClass: org.apache.hadoop.mapred.SequenceFileInputFormat\n")
            sb.append(" - HashIndex:").append(hexUuid(Rng.mix2(rl, 12L))).append('\n')
          }
          line += 1
        }
    }
    sb.toString
  }

  /** Turn count for a conversation: Zipf-ish skew — every 97th conversation
    * is hot (up to ~160 turns), the rest get 3..14.
    */
  def convSize(seed: Long, conv: Long): Int = {
    val r = Rng.mix2(seed, conv * 31L)
    if (conv % 97 == 0) 60 + Rng.bounded(r, 100) else 3 + Rng.bounded(r, 12)
  }

  def roleOf(seed: Long, conv: Long, turn: Int): String = {
    // conversations roughly alternate user/assistant with tool/system mixed in
    val r = Rng.mix2(Rng.mix2(seed, conv), 1000L + turn)
    if (turn == 0) "user"
    else Rng.bounded(r, 10) match {
      case 0 => "system"
      case 1 | 2 => "tool"
      case 3 | 4 | 5 => "user"
      case _ => "assistant"
    }
  }

  def toolOf(seed: Long, conv: Long, turn: Int, role: String): String =
    if (role != "tool") null
    else ToolNames(Rng.bounded(Rng.mix2(Rng.mix2(seed, conv), 2000L + turn), ToolNames.size))

  /** Generate the transcript table: `nConvs` conversations, skewed sizes.
    * Distributed via spark.range over conversations; rows are pure functions
    * of (seed, conv, turn).
    */
  def generate(spark: SparkSession, nConvs: Long, seed: Long = 42L): Dataset[Turn] = {
    import spark.implicits._
    spark.range(nConvs).flatMap { conv =>
      val n = convSize(seed, conv)
      val convId = f"conv-$conv%08d"
      (0 until n).iterator.map { t =>
        val role = roleOf(seed, conv, t)
        val tool = toolOf(seed, conv, t, role)
        val epochMs = baseEpochMs + conv * 60000L + t * 1731L
        Turn(convId, t, role, buildText(seed, conv, t, role, tool), tool, new Timestamp(epochMs))
      }
    }
  }

  /** Tool dimension table (FIXTURES.md §3). */
  def dimTool(spark: SparkSession): DataFrame = {
    import spark.implicits._
    ToolNames.zipWithIndex.map { case (t, i) =>
      val cat = Vector("shell", "code", "web", "data", "comms", "agent")(i % 6)
      (t, cat, i % 3 == 0)
    }.toDF("tool", "tool_category", "is_error_prone")
  }

  /** Role dimension table. */
  def dimRole(spark: SparkSession): DataFrame = {
    import spark.implicits._
    Seq(
      ("user", "human"), ("assistant", "model"),
      ("system", "system"), ("tool", "machine")
    ).toDF("role", "role_class")
  }

  /** Rough conv count for a driver test-data scale factor: sf0.001 → ~250
    * convs (~2.3k turns), sf0.01 → ~2.5k (~23k turns), sf0.1 → ~25k (~230k).
    */
  def convsForSfDir(sfDir: String): Long = {
    val sf = raw"sf([0-9.]+)".r.findFirstMatchIn(sfDir).map(_.group(1).toDouble).getOrElse(0.001)
    math.max(50L, (sf * 250000).toLong)
  }
}

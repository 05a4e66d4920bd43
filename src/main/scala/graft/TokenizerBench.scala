package graft

import graft.lexer.{PatternBank, Tokenizer}
import graft.datagen.SyntheticTranscripts

/** Single-thread tokenizer microbenchmark — the apples-to-apples comparison
  * against the reference's single-core lexer numbers (BASELINE.md: ~170-200
  * MB/s, ~5-6.7M tokens/s on hive/openstack/hadoop logs).
  */
object TokenizerBench {
  def main(args: Array[String]): Unit = {
    val nTexts = if (args.length > 0) args(0).toInt else 200000
    val bank = PatternBank.example
    // build a corpus of synthetic transcript texts (driver-side, no Spark)
    val texts = (0 until nTexts).map { i =>
      val conv = i / 10; val turn = i % 10
      val role = SyntheticTranscripts.roleOf(42L, conv, turn)
      SyntheticTranscripts.buildText(42L, conv, turn, role,
        SyntheticTranscripts.toolOf(42L, conv, turn, role))
    }.toArray
    val bytes = texts.map(_.length.toLong).sum

    // warmup
    var sink = 0L
    for (_ <- 0 until 2; t <- texts) sink += Tokenizer.tokenize(bank, t).length

    val t0 = System.nanoTime()
    var tokens = 0L
    var i = 0
    while (i < texts.length) { tokens += Tokenizer.tokenize(bank, texts(i)).length; i += 1 }
    val secs = (System.nanoTime() - t0) / 1e9
    println(f"[tokbench] texts=$nTexts bytes=$bytes tokens=$tokens wall=$secs%.3fs " +
      f"thru=${bytes / secs / 1e6}%.1f MB/s ${tokens / secs / 1e6}%.2f Mtok/s ${texts.length / secs}%.0f texts/s (sink=$sink)")
  }
}

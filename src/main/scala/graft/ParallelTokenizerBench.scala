package graft

import graft.lexer.{PatternBank, ByteTokenizer}
import graft.datagen.SyntheticTranscripts
import java.util.concurrent.atomic.AtomicLong

/** Pure-JVM thread-scaling probe: K threads tokenize disjoint slices of the
  * same corpus (no Spark, no allocation beyond spans). Separates JVM/host
  * thread-scaling behaviour from Spark-stage effects — companion evidence
  * for BENCH/BASELINE.md §3.
  */
object ParallelTokenizerBench {
  def main(args: Array[String]): Unit = {
    val nTexts = if (args.length > 0) args(0).toInt else 400000
    val bank = PatternBank.example
    val texts = (0 until nTexts).map { i =>
      val conv = i / 10; val turn = i % 10
      val role = SyntheticTranscripts.roleOf(42L, conv, turn)
      SyntheticTranscripts.buildText(42L, conv, turn, role,
        SyntheticTranscripts.toolOf(42L, conv, turn, role)).getBytes
    }.toArray
    val bytes = texts.map(_.length.toLong).sum
    val counterSink = new ByteTokenizer.Sink {
      override def token(tt: Byte, sid: Int, s: Int, e: Int, l: Int): Unit = ()
    }
    // warmup
    texts.take(50000).foreach(t => ByteTokenizer.tokenize(bank, t, counterSink))

    for (k <- Seq(1, 2, 4, 8, 16, 32)) {
      val done = new AtomicLong()
      val t0 = System.nanoTime()
      val threads = (0 until k).map { tid =>
        new Thread(() => {
          var i = tid
          var n = 0L
          val sink = counterSink
          while (i < texts.length) { ByteTokenizer.tokenize(bank, texts(i), sink); n += 1; i += k }
          done.addAndGet(n)
        })
      }
      threads.foreach(_.start()); threads.foreach(_.join())
      val secs = (System.nanoTime() - t0) / 1e9
      println(f"[ptb] threads=$k%2d wall=$secs%6.3fs thru=${bytes / secs / 1e6}%7.1f MB/s texts/s=${done.get / secs}%.0f")
    }
  }
}

package graft

import org.apache.spark.sql.SparkSession

/** Diagnostic per-query timer (NOT the frozen driver bench): times
  * `SparkEntry.queries(name).count()` for an explicit ordered list in a
  * fresh session, with optional session confs — for isolating which rows
  * pay which staging and A/B-ing conf'd optimizations. Usage:
  *
  *   runMain graft.QBench [conf=k=v ...] <query> [query ...]
  */
object QBench {
  def main(args: Array[String]): Unit = {
    val (confArgs, names) = args.partition(_.startsWith("conf="))
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    var b = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-qbench")
      .config("spark.sql.shuffle.partitions", math.max(8, cpus).toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
    confArgs.foreach { c =>
      val kv = c.stripPrefix("conf=").split("=", 2)
      b = b.config(kv(0), kv(1))
    }
    val spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    try {
      names.foreach { name =>
        val fn = SparkEntry.queries(name)
        val t0 = System.nanoTime()
        val n = fn(spark, sfDir).count()
        val secs = (System.nanoTime() - t0) / 1e9
        println(f"[qbench] $name%-30s $secs%8.3f s  ($n rows)")
      }
    } finally spark.stop()
  }
}

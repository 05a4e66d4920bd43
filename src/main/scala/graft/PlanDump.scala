package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.ExplainMode

/** Dump `.explain("formatted")` for declared queries to files — the plan
  * evidence for the optimization rounds (plans/rNN/<query>_{before,after}.txt).
  * NOT part of the frozen bench contract; a diagnostic main like BenchExtra.
  *
  * Usage: runMain graft.PlanDump <outDir> <suffix> [query ...]
  *   (no query args = all declared queries; sf dir from SPARK_GRAFT_SF_DIR)
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: PlanDump <outDir> <suffix> [query ...]")
    val outDir = args(0)
    val suffix = args(1)
    val names = if (args.length > 2) args.drop(2).toSeq else Bench.HeadlineQueries
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-plandump")
      .config("spark.sql.shuffle.partitions", math.max(8, cpus).toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(outDir))
    // Internal operator plans: queries whose output is STAGED show only the
    // staged-parquet read in their own plan (the pipeline ran inside the
    // staging job at construction time), so the lazy operator plans are
    // dumped separately — e.g. `internal_d5_pairjob_after.txt` is the
    // pair-scoring pipeline the d5/d8 staging job executes, comparable
    // against the full pipeline visible in `d5_ngram_jaccard_before.txt`.
    def internals(spark: SparkSession): Seq[(String, org.apache.spark.sql.DataFrame)] = {
      import org.apache.spark.sql.functions.col
      val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      spark.conf.set(graft.operators.Dedup.AutoStageConf, "false")
      Seq(
        "internal_d5_pairjob" -> graft.operators.Dedup.ngramJaccardPairs(docs, n = 3, threshold = 0.5),
        "internal_truthjob" -> graft.operators.Dedup.shingleJaccardPairs(docs),
        "internal_d3_pairjob" -> graft.operators.Dedup.minhashPairs(docs, threshold = 0.8),
        "internal_d7_brute" -> graft.operators.Dedup.embeddingNearDupBrute(
          spark.read.parquet(s"$sfDir/embeddings.parquet").filter(col("vec_id") >= 0)))
    }
    try {
      internals(spark).foreach { case (name, df) =>
        try {
          val plan = df.queryExecution.explainString(ExplainMode.fromString("formatted"))
          java.nio.file.Files.writeString(
            java.nio.file.Paths.get(s"$outDir/${name}_$suffix.txt"), plan)
          println(s"[plandump] wrote $name")
        } catch { case e: Throwable =>
          System.err.println(s"[plandump] $name failed: ${e.getMessage}")
        }
      }
      names.foreach { name =>
        SparkEntry.queries.get(name).foreach { fn =>
          try {
            val df = fn(spark, sfDir)
            val plan = df.queryExecution.explainString(ExplainMode.fromString("formatted"))
            java.nio.file.Files.writeString(
              java.nio.file.Paths.get(s"$outDir/${name}_$suffix.txt"), plan)
            println(s"[plandump] wrote $name")
          } catch { case e: Throwable =>
            System.err.println(s"[plandump] $name failed: ${e.getMessage}")
          }
        }
      }
    } finally spark.stop()
  }
}

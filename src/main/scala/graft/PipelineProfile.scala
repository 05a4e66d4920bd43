package graft

import org.apache.spark.sql.functions._
import graft.pipeline._
import graft.lexer.PatternBank
import graft.datagen.SyntheticTranscripts

/** Stage-by-stage wall-clock breakdown of the pipeline at a given scale. */
object PipelineProfile {
  def main(args: Array[String]): Unit = {
    val nConvs = if (args.length > 0) args(0).toLong else 100000L
    val cores = if (args.length > 1) args(1).toInt else 32
    val spark = RunPipeline.sparkSession(cores, "graft-profile")
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    def timed(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val n = f
      println(f"[profile] $name%-28s ${(System.nanoTime()-t0)/1e9}%7.2fs  rows=$n")
    }
    val turns = RunPipeline.stageInput(spark, nConvs, s"/tmp/graft-input-$nConvs")
    val bank = spark.sparkContext.broadcast(PatternBank.example)
    // warmup
    Parse(turns.limit(5000), bank).toDF().count()

    timed("scan_only")(turns.count())
    timed("scan_parse")(Parse(turns, bank).toDF().count())
    timed("scan_parse_materialize") {
      Parse(turns, bank).toDF().select(sum(col("n_tokens"))).first().getLong(0)
    }
    val enriched = Enrich(Parse(turns, bank).toDF(),
      SyntheticTranscripts.dimTool(spark), SyntheticTranscripts.dimRole(spark))
    timed("scan_parse_enrich_agg")(enriched.groupBy("category").count().count())
    val out = java.nio.file.Files.createTempDirectory("graft-prof").toString
    timed("route_write_nocache") {
      Route.salted(enriched, cores * 2).write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic").partitionBy("category").parquet(out)
      0L
    }
    val out2 = java.nio.file.Files.createTempDirectory("graft-prof").toString
    timed("route_write_no_tokens") {
      Route.salted(enriched.drop("tokens"), cores * 2).write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic").partitionBy("category").parquet(out2)
      0L
    }
    val out3 = java.nio.file.Files.createTempDirectory("graft-prof").toString
    timed("salted_write_raw_parse") {
      val salted = Route.salted(turns.toDF(), cores * 2).as[Turn]
      val enr = Enrich(Parse(salted, bank).toDF(),
        SyntheticTranscripts.dimTool(spark), SyntheticTranscripts.dimRole(spark))
      Route.writePartitioned(enr, out3, Category.All)
      0L
    }
    val out4 = java.nio.file.Files.createTempDirectory("graft-prof").toString
    timed("write_unsalted_unpartitioned") {
      Enrich(Parse(turns, bank).toDF(),
        SyntheticTranscripts.dimTool(spark), SyntheticTranscripts.dimRole(spark))
        .write.mode("overwrite").parquet(out4)
      0L
    }
    timed("per_conv_window")(Aggregate.perConversation(enriched).count())
    timed("per_tool")(Aggregate.perTool(enriched).count())
    spark.stop()
  }
}

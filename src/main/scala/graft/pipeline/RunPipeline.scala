package graft.pipeline

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import graft.datagen.SyntheticTranscripts
import graft.lexer.PatternBank
import graft.schema.SchemaConfig

/** End-to-end job: scan → parse → enrich → route (4 sinks) → aggregates,
  * with checkpoint/resume and metrics accumulators. `main` is the
  * spark-submit entry used by the scaling benchmark:
  *
  *   RunPipeline <nConvs> <outDir> [cores] [schemaYamlPath]
  */
object RunPipeline {

  final case class Result(
      routedCounts: Map[String, Long],
      perTool: DataFrame,
      perConversation: DataFrame,
      nTools: Long,
      nConversations: Long,
      turnsIn: Long
  )

  def sparkSession(cores: Int, appName: String = "graft-pipeline"): SparkSession =
    SparkSession.builder()
      .master(s"local[$cores]")
      .appName(appName)
      .config("spark.sql.shuffle.partitions", math.max(8, cores * 2).toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()

  /** Run the full pipeline over an input Dataset[Turn]. Sinks land in
    * `outDir/<category>`; committed sinks are skipped on resume.
    */
  def run(spark: SparkSession, turns: Dataset[Turn], outDir: String,
          schema: SchemaConfig = SchemaConfig.example,
          fingerprint: String = ""): Result = {
    val sc = spark.sparkContext
    val bank = sc.broadcast(PatternBank.compile(schema))

    val turnsIn = sc.longAccumulator("turns_in")
    val counters = Category.All.map(c => c -> sc.longAccumulator(s"rows_routed_$c")).toMap

    import spark.implicits._
    val partitions = spark.conf.get("spark.sql.shuffle.partitions").toInt

    val ckpt = new Checkpoint(outDir, fingerprint)
    val pending = Category.All.filterNot(ckpt.isCommitted)

    if (pending.nonEmpty) {
      // ONE pass: salted repartition of the RAW turns (cheap representation
      // through the shuffle), parse after placement is fixed (the heavy
      // token arrays never move), broadcast-enrich, partitioned write.
      // No persist: everything downstream reads the written sinks back with
      // column pruning, which is far cheaper than caching full parsed rows.
      val saltedTurns = Route.salted(turns.toDF(), partitions).as[Turn]
      val counted = saltedTurns.map { t => turnsIn.add(1L); t }
      val parsed = Parse(counted, bank)
      val enriched = Enrich(parsed.toDF(),
        SyntheticTranscripts.dimTool(spark), SyntheticTranscripts.dimRole(spark))
      val tw = System.nanoTime()
      Route.writePartitioned(enriched, outDir, pending)
      if (sys.env.contains("GRAFT_PROFILE")) println(f"[run] write ${(System.nanoTime()-tw)/1e9}%.2fs")
    }

    // counts + aggregates read the durable sinks back: partition pruning for
    // counts, column pruning for the aggregates (a handful of scalar columns
    // instead of the token arrays)
    val routed = spark.read.parquet(outDir)
    val tc = System.nanoTime()
    val counts = routed.groupBy("category").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    if (sys.env.contains("GRAFT_PROFILE")) println(f"[run] counts ${(System.nanoTime()-tc)/1e9}%.2fs")
    pending.foreach { c =>
      val n = counts.getOrElse(c, 0L)
      counters.get(c).foreach(_.add(n))
      ckpt.commitSink(c, n)
    }
    val routedCounts = Category.All.map(c => c -> ckpt.committedRows(c).getOrElse(0L)).toMap

    val perTool = Aggregate.perTool(routed)
    val perConv = Aggregate.perConversation(routed)
    val ta = System.nanoTime()
    val nt = perTool.count()
    val ta2 = System.nanoTime()
    val nc = perConv.count()
    if (sys.env.contains("GRAFT_PROFILE")) println(f"[run] perTool ${(ta2-ta)/1e9}%.2fs perConv ${(System.nanoTime()-ta2)/1e9}%.2fs")
    Result(routedCounts, perTool, perConv, nt, nc, turnsIn.value)
  }

  /** Stage the synthetic transcript table as parquet (the "Iceberg table"
    * of the north rule) so measured runs start from a table scan like the
    * real deployment would — datagen CPU is not pipeline throughput.
    * Reuses an existing staging dir for the same nConvs.
    */
  def stageInput(spark: SparkSession, nConvs: Long, dir: String): Dataset[Turn] = {
    import spark.implicits._
    val marker = java.nio.file.Paths.get(dir, "_SUCCESS")
    if (!java.nio.file.Files.exists(marker)) {
      SyntheticTranscripts.generate(spark, nConvs)
        .write.mode("overwrite").parquet(dir)
    }
    spark.read.parquet(dir).as[Turn]
  }

  def main(args: Array[String]): Unit = {
    val nConvs = if (args.length > 0) args(0).toLong else 1000L
    val outDir = if (args.length > 1) args(1) else "target/pipeline-out"
    val cores = if (args.length > 2) args(2).toInt else Runtime.getRuntime.availableProcessors()
    val schema = if (args.length > 3) SchemaConfig.fromFile(args(3)) else SchemaConfig.example

    val spark = sparkSession(cores)
    spark.sparkContext.setLogLevel("WARN")
    try {
      // input staged once (untimed), shared across scaling runs
      val inDir = s"/tmp/graft-input-$nConvs"
      val turns = stageInput(spark, nConvs, inDir)

      // JIT/codegen warmup on a small slice so the measured run reflects
      // steady-state throughput (the scaling-protocol runs compare N vs 4N
      // cores, not cold-JVM effects)
      val warmDir = java.nio.file.Files.createTempDirectory("graft-warm").toString
      run(spark, stageInput(spark, math.max(100L, nConvs / 20), s"/tmp/graft-input-warm-$nConvs"),
        warmDir, schema, fingerprint = "warmup")

      val t0 = System.nanoTime()
      val res = run(spark, turns, outDir, schema, fingerprint = s"synthetic-$nConvs")
      val secs = (System.nanoTime() - t0) / 1e9
      val turnsTotal = res.routedCounts.values.sum
      println(f"[pipeline] convs=$nConvs turns=$turnsTotal sinks=${res.routedCounts} " +
        f"tools=${res.nTools} convStats=${res.nConversations} wall=$secs%.2fs thru=${turnsTotal / secs}%.0f turns/s")
    } finally spark.stop()
  }
}

package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.Dedup
import graft.pipeline.Rng

/** Dedup scale smoke: a dup-heavy synthetic corpus with a deliberately hot
  * duplicate cluster — the exact input shape that makes naive LSH dedup go
  * quadratic (every member of the cluster shares every band bucket). The
  * round-1 plan would generate |cluster|²/2 candidate pairs inside one
  * bucket (5·10⁹ at the default size); the defused plan collapses the
  * cluster to one representative before bucketing and emits linear star
  * pairs.
  *
  *   runMain graft.DedupScaleBench [nUnique] [dupFactor] [hotCluster] [cores]
  */
object DedupScaleBench {

  /** Deterministic ~30-word doc from a closed vocabulary; 1-in-50 docs get
    * a near-twin (one word changed) at id+10⁹ so the LSH path has real
    * near-dup work, not just exact clusters.
    */
  private val Vocab: Array[String] =
    ("the quick brown fox jumps over lazy dog while seventeen engineers review " +
      "partition shuffle broadcast skew salt checkpoint lineage manifest snapshot " +
      "token parse enrich route aggregate window conversation transcript tool error").split(" ")

  def text(seed: Long): String = {
    val sb = new java.lang.StringBuilder(256)
    var h = Rng.mix(seed)
    var i = 0
    while (i < 30) {
      if (i > 0) sb.append(' ')
      h = Rng.mix(h)
      sb.append(Vocab(Rng.bounded(h, Vocab.length)))
      i += 1
    }
    sb.toString
  }

  def corpus(spark: SparkSession, nUnique: Long, dupFactor: Int, hotCluster: Long): DataFrame = {
    import spark.implicits._
    require(dupFactor < 1000, "doc_id namespace packs the copy index into 3 decimal digits")
    val uniques = spark.range(nUnique).flatMap { u =>
      val t = text(u)
      // ids pack (unique, copy) so the namespaces can never collide at any
      // argument size: copies at u*1000+c, near-twins at u*1000+999
      val copies = (0 until dupFactor).map(c => (u * 1000L + c, t))
      val near =
        if (u % 50 == 0) Seq((u * 1000L + 999L, t.replaceFirst("the", "thee")))
        else Seq.empty
      copies ++ near
    }.toDF("doc_id", "text")
    val hot = spark.range(hotCluster)
      .select((col("id") + Long.MaxValue / 2).as("doc_id"),
        lit(text(424242L) + " hot").as("text"))
    uniques.unionByName(hot)
      .withColumn("lang", lit("en"))
      .withColumn("source", lit("synthetic"))
      .withColumn("n_chars", length(col("text")))
  }

  def main(args: Array[String]): Unit = {
    val nUnique = if (args.length > 0) args(0).toLong else 50000L
    val dupFactor = if (args.length > 1) args(1).toInt else 4
    val hotCluster = if (args.length > 2) args(2).toLong else 100000L
    val cores = if (args.length > 3) args(3).toInt else Runtime.getRuntime.availableProcessors()

    val spark = SparkSession.builder()
      .master(s"local[$cores]")
      .appName("dedup-scale-bench")
      .config("spark.sql.shuffle.partitions", math.max(16, cores * 4).toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // the bench's whole point is lazy-vs-staged: keep the "lazy" arms
    // genuinely lazy instead of letting the auto-stage heuristic (which
    // would fire at this corpus size) stage them behind our back
    spark.conf.set(Dedup.AutoStageConf, "false")
    val metrics = BenchMetrics.install(spark.sparkContext)
    try {
      val docs = corpus(spark, nUnique, dupFactor, hotCluster)
      docs.persist()
      val nDocs = docs.count()

      def timed(name: String)(df: => DataFrame): Unit = {
        val (n, secs, sw, sr) = BenchMetrics.timedWithShuffle(metrics)(df.count())
        println(f"[dedup-scale] $name docs=$nDocs pairs=$n wall=$secs%.1fs " +
          f"shuffleWrite=${sw / 1e6}%.1fMB shuffleRead=${sr / 1e6}%.1fMB cores=$cores")
      }
      timed("minhash")(Dedup.minhashPairs(docs, threshold = 0.8))
      val stage = graft.pipeline.Staging.tempDir("graft-dedup-stage")
      try timed("minhash-staged")(Dedup.minhashPairs(docs, threshold = 0.8,
        stagingDir = Some(stage)))
      finally graft.pipeline.Staging.deleteRecursively(stage)
      timed("simhash")(Dedup.simhashPairs(docs, maxHamming = 3))
      val stage2 = graft.pipeline.Staging.tempDir("graft-dedup-stage-sim")
      try timed("simhash-staged")(Dedup.simhashPairs(docs, maxHamming = 3,
        stagingDir = Some(stage2)))
      finally graft.pipeline.Staging.deleteRecursively(stage2)
      // pairs → components at the same scale (the keep/drop-list step).
      // Pair generation is staged to parquet UNTIMED so the number is the
      // connected-components step alone.
      val stage3 = graft.pipeline.Staging.tempDir("graft-dedup-stage-cc")
      try {
        Dedup.minhashPairs(docs, threshold = 0.8, stagingDir = Some(s"$stage3/collapse"))
          .write.parquet(s"$stage3/pairs")
        timed("clusters")(Dedup.clusters(spark.read.parquet(s"$stage3/pairs")))
      } finally graft.pipeline.Staging.deleteRecursively(stage3)
    } finally spark.stop()
  }
}

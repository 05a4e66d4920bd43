package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.Similarity
import graft.pipeline.Rng

/** ANN scale smoke: brute-force vs multi-table LSH top-k over a synthetic
  * corpus large enough that the bucket structure matters (the testdata
  * embeddings are only 2 k vectors). Vectors are drawn from a mixture of
  * `nClusters` centers plus noise, so near-neighbor structure is real and
  * recall is a meaningful number.
  *
  *   runMain graft.AnnScaleBench [nVectors] [dim] [nQueries] [cores]
  */
object AnnScaleBench {

  def vec(seed: Long, dim: Int, nClusters: Int): Array[Float] = {
    val cluster = Rng.bounded(Rng.mix(seed), nClusters)
    val out = new Array[Float](dim)
    var i = 0
    while (i < dim) {
      val center = ((Rng.mix2(cluster.toLong * 7919L, i.toLong) >>> 11).toDouble / (1L << 53) - 0.5) * 2.0
      val noise = ((Rng.mix2(seed, i.toLong) >>> 11).toDouble / (1L << 53) - 0.5) * 0.4
      out(i) = (center + noise).toFloat
      i += 1
    }
    out
  }

  def corpus(spark: SparkSession, n: Long, dim: Int, nClusters: Int = 256): DataFrame = {
    import spark.implicits._
    spark.range(n).map(id => (id, vec(id, dim, nClusters))).toDF("vec_id", "embedding")
  }

  def main(args: Array[String]): Unit = {
    val n = if (args.length > 0) args(0).toLong else 1000000L
    val dim = if (args.length > 1) args(1).toInt else 64
    val nQueries = if (args.length > 2) args(2).toInt else 100
    val cores = if (args.length > 3) args(3).toInt else Runtime.getRuntime.availableProcessors()

    val spark = SparkSession.builder()
      .master(s"local[$cores]")
      .appName("ann-scale-bench")
      .config("spark.sql.shuffle.partitions", math.max(16, cores * 4).toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    try {
      val emb = corpus(spark, n, dim).repartition(math.max(16, cores * 2)).persist()
      emb.count()
      val queries = emb.filter(col("vec_id") < nQueries)

      def run(name: String)(df: => DataFrame): Set[(Long, Long)] = {
        val t0 = System.nanoTime()
        val rows = df.collect().map(r => (r.getLong(0), r.getLong(2))).toSet
        val secs = (System.nanoTime() - t0) / 1e9
        println(f"[ann-scale] $name n=$n dim=$dim queries=$nQueries wall=$secs%.1fs cores=$cores")
        rows
      }
      val brute = run("brute")(Similarity.bruteForceKnn(emb, queries, k = 10))
      val lsh = run("lsh-oneshot")(Similarity.lshKnn(emb, queries, k = 10, nBits = 10, nTables = 4))
      val recall = lsh.intersect(brute).size.toDouble / brute.size
      println(f"[ann-scale] recall@10=$recall%.3f")

      // build-once-query-many: index staged to parquet (the 100 TB shape —
      // index build paid once, per-batch queries touch only the index)
      val stage = graft.pipeline.Staging.tempDir("graft-ann-index")
      try {
        val t0 = System.nanoTime()
        Similarity.lshIndex(emb, nBits = 10, nTables = 4).write.parquet(s"$stage/lsh")
        println(f"[ann-scale] lsh-index-build wall=${(System.nanoTime() - t0) / 1e9}%.1fs")
        val idx = spark.read.parquet(s"$stage/lsh")
        val staged = run("lsh-query-staged")(
          Similarity.lshKnnIndexed(idx, queries, k = 10, nBits = 10, nTables = 4))
        val recallStaged = staged.intersect(brute).size.toDouble / brute.size
        println(f"[ann-scale] staged recall@10=$recallStaged%.3f")
      } finally graft.pipeline.Staging.deleteRecursively(stage)
    } finally spark.stop()
  }
}

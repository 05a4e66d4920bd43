package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.functions.cosine_similarity
import graft.pipeline.Rng

/** Similarity search over an embedding column (ARRAY<FLOAT>).
  *
  *  - Brute-force top-k cosine: baseline and exactness oracle. The query set
  *    is tiny and explicitly `broadcast()`; the big side streams once —
  *    a broadcast nested-loop join scoring `dim` multiplies per row, no
  *    shuffle of the corpus. Top-k per query via window over score.
  *  - LSH (random hyperplane) ANN: the scale path. Sign bits of `nBits`
  *    deterministic hyperplanes bucket the corpus; queries probe their own
  *    bucket; candidates re-ranked by exact cosine. At 100 TB the bucket
  *    join shuffles only (bucket, id, vec-of-candidates), never the full
  *    cross product.
  */
object Similarity {

  /** Brute-force exact top-k neighbors for each query vector. Null
    * embeddings are dropped on BOTH sides — the same guard the approximate
    * paths apply, so exact-vs-ANN recall gates compare identical inputs.
    */
  def bruteForceKnn(corpus: DataFrame, queries: DataFrame, k: Int = 5): DataFrame = {
    val c = corpus.filter(col("embedding").isNotNull)
      .select(col("vec_id").as("id"), col("embedding").as("emb"))
    val q = queries.filter(col("embedding").isNotNull)
      .select(col("vec_id").as("query_id"), col("embedding").as("q_emb"))
    val scored = c.join(broadcast(q), col("id") =!= col("query_id"))
      .select(col("query_id"), col("id").as("neighbor_id"),
        cosine_similarity(col("q_emb"), col("emb")).as("score"))
    val w = Window.partitionBy("query_id").orderBy(col("score").desc, col("neighbor_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("neighbor_id"), round(col("score"), 4).as("score"))
  }

  /** Deterministic random hyperplanes: nBits × dim from splitmix64. */
  def hyperplanes(nBits: Int, dim: Int, seed: Long = 7L): Array[Array[Float]] =
    Array.tabulate(nBits) { b =>
      Array.tabulate(dim) { d =>
        // map 64-bit hash to approx N(0,1) via sum of uniforms
        val h1 = Rng.mix2(seed, b.toLong << 32 | d.toLong)
        val h2 = Rng.mix(h1)
        val u1 = (h1 >>> 11).toDouble / (1L << 53).toDouble
        val u2 = (h2 >>> 11).toDouble / (1L << 53).toDouble
        (u1 + u2 - 1.0).toFloat
      }
    }

  def signBucket(vec: Array[Float], planes: Array[Array[Float]]): Int = {
    var bucket = 0
    var b = 0
    while (b < planes.length) {
      val p = planes(b)
      var dot = 0.0
      var i = 0
      val n = math.min(vec.length, p.length)
      while (i < n) { dot += vec(i) * p(i); i += 1 }
      if (dot >= 0) bucket |= (1 << b)
      b += 1
    }
    bucket
  }

  /** IVF (inverted-file) ANN — the coarse-quantizer scale path: a small
    * deterministic k-means (Lloyd on a fixed sample, driver-side) defines
    * `nCells` centroids; corpus vectors are assigned to their nearest cell
    * (one pass, broadcast centroids); queries probe the `nProbe` nearest
    * cells and re-rank candidates by exact cosine. At 100 TB only
    * corpus/nCells·nProbe of the data is scored per query and the cell
    * assignment is a parquet-persistable index column.
    */
  def ivfKnn(corpus: DataFrame, queries: DataFrame, k: Int = 5,
             nCells: Int = 16, nProbe: Int = 4, sampleSize: Int = 256,
             iterations: Int = 5): DataFrame = {
    val spark = corpus.sparkSession
    import spark.implicits._

    // deterministic training sample: smallest vec_ids
    val sample = corpus.filter(col("embedding").isNotNull)
      .orderBy(col("vec_id")).limit(sampleSize)
      .select("embedding").as[Array[Float]].collect()
    require(sample.nonEmpty, "empty corpus")
    val dim = sample.head.length
    // init: evenly-strided sample vectors; refine with Lloyd iterations
    var centroids = Array.tabulate(math.min(nCells, sample.length)) { c =>
      sample((c.toLong * sample.length / math.min(nCells, sample.length)).toInt).clone()
    }
    def cos(a: Array[Float], b: Array[Float]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0
      var i = 0
      while (i < math.min(a.length, b.length)) { d += a(i).toDouble * b(i); na += a(i).toDouble * a(i); nb += b(i).toDouble * b(i); i += 1 }
      if (na == 0 || nb == 0) 0.0 else d / math.sqrt(na * nb)
    }
    def nearest(v: Array[Float], cs: Array[Array[Float]]): Int = {
      var best = 0; var bestS = Double.MinValue
      var c = 0
      while (c < cs.length) { val s = cos(v, cs(c)); if (s > bestS) { bestS = s; best = c }; c += 1 }
      best
    }
    var it = 0
    while (it < iterations) {
      val sums = Array.fill(centroids.length)(new Array[Double](dim))
      val counts = new Array[Int](centroids.length)
      sample.foreach { v =>
        val c = nearest(v, centroids)
        counts(c) += 1
        var i = 0
        while (i < dim) { sums(c)(i) += v(i); i += 1 }
      }
      centroids = centroids.indices.map { c =>
        if (counts(c) == 0) centroids(c)
        else Array.tabulate(dim)(i => (sums(c)(i) / counts(c)).toFloat)
      }.toArray
      it += 1
    }
    val bc = spark.sparkContext.broadcast(centroids)

    val assigned = corpus.filter(col("embedding").isNotNull)
      .select(col("vec_id").as("id"), col("embedding").as("emb"))
      .as[(Long, Array[Float])]
      .map { case (id, emb) => (nearest(emb, bc.value), id, emb) }
      .toDF("cell", "id", "emb")

    val probes = queries.filter(col("embedding").isNotNull)
      .select(col("vec_id").as("query_id"), col("embedding").as("q_emb"))
      .as[(Long, Array[Float])]
      .flatMap { case (qid, emb) =>
        bc.value.indices.map(c => (c, cos(emb, bc.value(c))))
          .sortBy(-_._2).take(nProbe)
          .map { case (c, _) => (c, qid, emb) }
      }.toDF("cell", "query_id", "q_emb")

    val scored = assigned.join(broadcast(probes), Seq("cell"))
      .filter(col("id") =!= col("query_id"))
      .select(col("query_id"), col("id").as("neighbor_id"),
        cosine_similarity(col("q_emb"), col("emb")).as("score"))
      .groupBy("query_id", "neighbor_id").agg(max("score").as("score"))
    val w = Window.partitionBy("query_id").orderBy(col("score").desc, col("neighbor_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("neighbor_id"), round(col("score"), 4).as("score"))
  }

  /** LSH-bucketed approximate top-k: `nTables` independent hyperplane sets
    * (standard multi-table LSH — recall is 1-(1-p^b)^L), each probed at the
    * query's bucket plus all 1-bit-flip neighbor buckets (multi-probe);
    * candidates re-ranked by exact cosine. Tune nBits to corpus size:
    * candidates/table ≈ corpus / 2^nBits × (nBits+1) probes.
    */
  def lshKnn(corpus: DataFrame, queries: DataFrame, k: Int = 5, nBits: Int = 8,
             nTables: Int = 4): DataFrame = {
    val spark = corpus.sparkSession
    import spark.implicits._
    val dimRow = corpus.filter(col("embedding").isNotNull)
      .select(size(col("embedding"))).head(1)
    if (dimRow.isEmpty)
      return spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        org.apache.spark.sql.types.StructType.fromDDL(
          "query_id BIGINT, rank INT, neighbor_id BIGINT, score DOUBLE"))
    val dim = dimRow(0).getInt(0)
    val planes = spark.sparkContext.broadcast(
      Array.tabulate(nTables)(t => hyperplanes(nBits, dim, seed = 7L + t * 1000L)))

    val bucketed = corpus.filter(col("embedding").isNotNull)
      .select(col("vec_id").as("id"), col("embedding").as("emb"))
      .as[(Long, Array[Float])]
      .flatMap { case (id, emb) =>
        planes.value.iterator.zipWithIndex.map { case (p, t) =>
          (t.toLong << 32 | signBucket(emb, p).toLong, id, emb)
        }
      }
      .toDF("bucket", "id", "emb")

    // per table: own bucket + all 1-bit-flip buckets (multi-probe LSH)
    val probes = queries.filter(col("embedding").isNotNull)
      .select(col("vec_id").as("query_id"), col("embedding").as("q_emb"))
      .as[(Long, Array[Float])]
      .flatMap { case (qid, emb) =>
        planes.value.iterator.zipWithIndex.flatMap { case (p, t) =>
          val b0 = signBucket(emb, p)
          (Seq(b0) ++ (0 until nBits).map(i => b0 ^ (1 << i)))
            .distinct.map(b => (t.toLong << 32 | b.toLong, qid, emb))
        }
      }.toDF("bucket", "query_id", "q_emb")

    val scored = bucketed.join(broadcast(probes), Seq("bucket"))
      .filter(col("id") =!= col("query_id"))
      .select(col("query_id"), col("id").as("neighbor_id"),
        cosine_similarity(col("q_emb"), col("emb")).as("score"))
      .groupBy("query_id", "neighbor_id").agg(max("score").as("score"))
    val w = Window.partitionBy("query_id").orderBy(col("score").desc, col("neighbor_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("neighbor_id"), round(col("score"), 4).as("score"))
  }
}

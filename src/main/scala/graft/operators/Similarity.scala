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

  /** Brute-force exact top-k neighbors for each query vector. */
  def bruteForceKnn(corpus: DataFrame, queries: DataFrame, k: Int = 5): DataFrame = {
    val c = corpus.select(col("vec_id").as("id"), col("embedding").as("emb"))
    val q = queries.select(col("vec_id").as("query_id"), col("embedding").as("q_emb"))
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
    val dim = corpus.select(size(col("embedding"))).first().getInt(0)
    val planes = spark.sparkContext.broadcast(
      Array.tabulate(nTables)(t => hyperplanes(nBits, dim, seed = 7L + t * 1000L)))

    val bucketed = corpus.select(col("vec_id").as("id"), col("embedding").as("emb"))
      .as[(Long, Array[Float])]
      .flatMap { case (id, emb) =>
        planes.value.iterator.zipWithIndex.map { case (p, t) =>
          (t.toLong << 32 | signBucket(emb, p).toLong, id, emb)
        }
      }
      .toDF("bucket", "id", "emb")

    // per table: own bucket + all 1-bit-flip buckets (multi-probe LSH)
    val probes = queries.select(col("vec_id").as("query_id"), col("embedding").as("q_emb"))
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

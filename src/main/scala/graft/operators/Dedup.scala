package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import graft.pipeline.Rng

/** Deduplication operators over the `documents` table, exact → fuzzy:
  *
  *  - exact / normalized: hash-groupBy — one shuffle on the (normalized)
  *    text, map-side partial agg; at 100 TB, group on a 128-bit hash of the
  *    text rather than the text itself to keep shuffle rows small (here we
  *    group on xxhash64(text) and never shuffle the body).
  *  - MinHash + LSH: shingle → minhash signature → banded bucket join →
  *    exact-Jaccard verification of candidates only. The O(n²) pair space is
  *    never materialized; cost is O(n · bands) shuffle rows.
  *  - SimHash: 64-bit signature via the native SimHash64 expression;
  *    near-dup = small hamming distance within LSH buckets of the top bits.
  */
object Dedup {

  /** Exact duplicate groups: smallest doc_id survives. Shuffles only
    * (hash, doc_id) — the text body never moves.
    */
  def exact(documents: DataFrame): DataFrame =
    documents
      .select(col("doc_id"), xxhash64(col("text")).as("h"))
      .groupBy("h")
      .agg(min("doc_id").as("keep_id"), count(lit(1)).as("n_dups"))
      .filter(col("n_dups") > 1)
      .select("keep_id", "n_dups")

  /** Normalized dedup: lowercase + whitespace-collapse before grouping. */
  def normalized(documents: DataFrame): DataFrame =
    documents
      .select(col("doc_id"),
        xxhash64(lower(regexp_replace(trim(col("text")), "\\s+", " "))).as("h"))
      .groupBy("h")
      .agg(min("doc_id").as("keep_id"), count(lit(1)).as("n_dups"))
      .filter(col("n_dups") > 1)
      .select("keep_id", "n_dups")

  /** Character shingles of a lowercased text (deterministic hash per
    * shingle). Pure function shared by the Spark path and the test oracle.
    */
  def shingleHashes(text: String, k: Int = 5): Array[Long] = {
    val s = text.toLowerCase.replaceAll("\\s+", " ").trim
    if (s.length < k) {
      if (s.isEmpty) Array.empty else Array(graft.functions.SimHash64.wordHash(s))
    } else {
      val out = new Array[Long](s.length - k + 1)
      var i = 0
      while (i + k <= s.length) { out(i) = graft.functions.SimHash64.wordHash(s.substring(i, i + k)); i += 1 }
      java.util.Arrays.sort(out)
      // distinct in place
      var n = 0
      var j = 0
      while (j < out.length) {
        if (n == 0 || out(n - 1) != out(j)) { out(n) = out(j); n += 1 }
        j += 1
      }
      java.util.Arrays.copyOf(out, n)
    }
  }

  /** MinHash signature: numHashes permutations simulated by splitmix-mixed
    * seeds (min over mixed shingle hashes).
    */
  def minhashSignature(shingles: Array[Long], numHashes: Int): Array[Long] = {
    val sig = Array.fill(numHashes)(Long.MaxValue)
    var i = 0
    while (i < shingles.length) {
      var h = 0
      while (h < numHashes) {
        val v = Rng.mix2(shingles(i), h.toLong * 0x9E3779B97F4A7C15L + 1)
        if (v < sig(h)) sig(h) = v
        h += 1
      }
      i += 1
    }
    sig
  }

  def exactJaccard(a: Array[Long], b: Array[Long]): Double = {
    // both sorted distinct
    var i = 0; var j = 0; var inter = 0
    while (i < a.length && j < b.length) {
      if (a(i) == b(j)) { inter += 1; i += 1; j += 1 }
      else if (a(i) < b(j)) i += 1
      else j += 1
    }
    val union = a.length + b.length - inter
    if (union == 0) 1.0 else inter.toDouble / union
  }

  /** MinHash-LSH near-duplicate pairs with exact-Jaccard verification.
    *
    * Plan shape (scale-reviewed): one pass computes (id, signature,
    * shingles); bands explode to `bands` rows per doc; groupBy bucket joins
    * candidates; exact verify joins the shingle sets back only for candidate
    * ids. With b=16 bands of r=8 rows the LSH S-curve crosses ~0.5 at
    * j≈0.84 — tuned for threshold 0.8.
    */
  def minhashPairs(
      documents: DataFrame,
      threshold: Double = 0.8,
      numHashes: Int = 128,
      bands: Int = 16,
      shingleK: Int = 5
  ): DataFrame = {
    val spark = documents.sparkSession
    import spark.implicits._
    require(numHashes % bands == 0)
    val rows = numHashes / bands

    val sigs = documents.select("doc_id", "text").as[(Long, String)].map { case (id, text) =>
      val sh = shingleHashes(text, shingleK)
      (id, minhashSignature(sh, numHashes), sh)
    }.toDF("doc_id", "sig", "shingles")
      .persist()

    try {
      // band buckets: (band, hash(sig slice)) → candidate id lists
      val banded = sigs.select(col("doc_id"), col("sig"))
        .as[(Long, Array[Long])]
        .flatMap { case (id, sig) =>
          (0 until bands).iterator.map { b =>
            var h = 1125899906842597L
            var r = 0
            while (r < rows) { h = h * 31 + sig(b * rows + r); r += 1 }
            (b, h, id)
          }
        }.toDF("band", "bucket", "doc_id")

      // candidate pairs: self-join within (band, bucket), ordered ids
      val x = banded.select(col("band"), col("bucket"), col("doc_id").as("id_a"))
      val y = banded.select(col("band"), col("bucket"), col("doc_id").as("id_b"))
      val candidates = x.join(y, Seq("band", "bucket"))
        .filter(col("id_a") < col("id_b"))
        .select("id_a", "id_b")
        .distinct()

      // exact verification on the candidate pairs only
      val shA = sigs.select(col("doc_id").as("id_a"), col("shingles").as("sh_a"))
      val shB = sigs.select(col("doc_id").as("id_b"), col("shingles").as("sh_b"))
      val verify = candidates.join(shA, "id_a").join(shB, "id_b")
        .select("id_a", "id_b", "sh_a", "sh_b")
        .as[(Long, Long, Array[Long], Array[Long])]
        .map { case (a, b, sha, shb) => (a, b, exactJaccard(sha, shb)) }
        .toDF("id_a", "id_b", "jaccard")
        .filter(col("jaccard") >= threshold)
        .select(col("id_a"), col("id_b"), round(col("jaccard"), 4).as("jaccard"))

      verify.persist()
      verify.count() // materialize before unpersisting sigs
      verify
    } finally {
      sigs.unpersist()
    }
  }

  /** SimHash near-dup pairs: bucket by the top 16 bits (4 rotations) then
    * verify hamming distance within buckets — LSH for hamming space.
    */
  def simhashPairs(documents: DataFrame, maxHamming: Int = 3): DataFrame = {
    val spark = documents.sparkSession
    import spark.implicits._
    val sigs = documents.select(col("doc_id"),
      graft.functions.functions.simhash64(col("text")).as("sig"))

    val banded = sigs.as[(Long, Long)].flatMap { case (id, sig) =>
      (0 until 4).iterator.map(b => (b, (sig >>> (b * 16)) & 0xFFFFL, id, sig))
    }.toDF("band", "bucket", "doc_id", "sig")

    banded.groupBy("band", "bucket")
      .agg(collect_list(struct(col("doc_id"), col("sig"))).as("xs"))
      .filter(size(col("xs")) > 1)
      .as[(Int, Long, Seq[(Long, Long)])]
      .flatMap { case (_, _, xs) =>
        for {
          i <- xs.indices.iterator
          j <- (i + 1) until xs.size
          if graft.functions.SimHash64.hamming(xs(i)._2, xs(j)._2) <= maxHamming
        } yield {
          val (a, b) = if (xs(i)._1 < xs(j)._1) (xs(i)._1, xs(j)._1) else (xs(j)._1, xs(i)._1)
          (a, b, graft.functions.SimHash64.hamming(xs(i)._2, xs(j)._2))
        }
      }
      .toDF("id_a", "id_b", "hamming")
      .distinct()
  }

  /** Word n-gram Jaccard similarity, blocked by `source` to bound the pair
    * space (exact within blocks — the brute-force comparison baseline).
    */
  def ngramJaccardPairs(documents: DataFrame, n: Int = 3, threshold: Double = 0.5): DataFrame = {
    val spark = documents.sparkSession
    import spark.implicits._
    val grams = documents.select("doc_id", "source", "text").as[(Long, String, String)]
      .map { case (id, src, text) =>
        val words = text.toLowerCase.split("\\s+").filter(_.nonEmpty)
        val gs: Array[Long] =
          if (words.length < n) Array(graft.functions.SimHash64.wordHash(words.mkString(" ")))
          else words.sliding(n).map(g => graft.functions.SimHash64.wordHash(g.mkString(" "))).toArray
        java.util.Arrays.sort(gs)
        (id, src, gs.distinct)
      }.toDF("doc_id", "source", "grams")

    val a = grams.select(col("source"), col("doc_id").as("id_a"), col("grams").as("g_a"))
    val b = grams.select(col("source"), col("doc_id").as("id_b"), col("grams").as("g_b"))
    a.join(b, Seq("source")).filter(col("id_a") < col("id_b"))
      .as[(String, Long, Array[Long], Long, Array[Long])]
      .map { case (_, ia, ga, ib, gb) => (ia, ib, exactJaccard(ga, gb)) }
      .toDF("id_a", "id_b", "jaccard")
      .filter(col("jaccard") >= threshold)
      .select(col("id_a"), col("id_b"), round(col("jaccard"), 4).as("jaccard"))
  }
}

package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll
import graft.operators.Dedup

/** Focused specs for the round-7 pair-verification rework: the
  * jaccard_sorted native expression must match [[Dedup.exactJaccard]] bit
  * for bit (it replaced the typed-map path in the all-pairs jobs and the
  * array_intersect composition in minhashPairs), the size-ratio prefilter
  * must be a SOUND upper bound (it drops pairs before scoring — a false
  * drop would silently lose a result row), and the hoisted minhash kernel
  * must reproduce the original mix2 formula exactly (bucket membership —
  * and therefore the d3 pair set — depends on every bit).
  */
class JaccardSortedSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .appName("jaccard-sorted-spec")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private def randSortedDistinct(rng: scala.util.Random, maxLen: Int): Array[Long] = {
    val n = rng.nextInt(maxLen + 1)
    // small value domain so random arrays actually overlap
    Array.fill(n)(rng.nextInt(40).toLong).distinct.sorted
  }

  test("jaccard_sorted expression == exactJaccard on random sorted-distinct arrays") {
    import spark.implicits._
    val rng = new scala.util.Random(7)
    val rows = Seq.tabulate(300)(i =>
      (i.toLong, randSortedDistinct(rng, 12), randSortedDistinct(rng, 12)))
    val got = rows.toDF("id", "a", "b")
      .select(col("id"), functions.jaccard_sorted(col("a"), col("b")).as("j"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    rows.foreach { case (id, a, b) =>
      assert(got(id) == Dedup.exactJaccard(a, b),
        s"id=$id a=${a.mkString(",")} b=${b.mkString(",")}")
    }
    // the empty/empty convention (1.0) and empty/non-empty (0.0)
    val edge = Seq((Array.empty[Long], Array.empty[Long]), (Array.empty[Long], Array(1L, 2L)))
      .toDF("a", "b").select(functions.jaccard_sorted(col("a"), col("b"))).collect()
    assert(edge(0).getDouble(0) == 1.0 && edge(1).getDouble(0) == 0.0)
  }

  test("size-ratio prefilter is a sound upper bound: min/max < t implies jaccard < t") {
    val rng = new scala.util.Random(13)
    (1 to 2000).foreach { _ =>
      val a = randSortedDistinct(rng, 15)
      val b = randSortedDistinct(rng, 15)
      val j = Dedup.exactJaccard(a, b)
      val mn = math.min(a.length, b.length).toDouble
      val mx = math.max(a.length, b.length).toDouble
      val bound = if (mx == 0.0) 1.0 else mn / mx
      // the prefilter drops a pair only when bound < threshold; soundness =
      // the true jaccard never exceeds the bound (monotone fp division keeps
      // this ordering in doubles — asserted directly on the computed values)
      assert(j <= bound, s"j=$j bound=$bound a=${a.mkString(",")} b=${b.mkString(",")}")
    }
  }

  test("hoisted minhash signature == direct mix2 formula (bit-identical)") {
    val rng = new scala.util.Random(99)
    (1 to 50).foreach { _ =>
      val shingles = Array.fill(rng.nextInt(64) + 1)(rng.nextLong())
      val numHashes = 32
      val expect = Array.fill(numHashes)(Long.MaxValue)
      shingles.foreach { sh =>
        var h = 0
        while (h < numHashes) {
          val v = graft.pipeline.Rng.mix2(sh, h.toLong * 0x9E3779B97F4A7C15L + 1)
          if (v < expect(h)) expect(h) = v
          h += 1
        }
      }
      assert(Dedup.minhashSignature(shingles, numHashes).sameElements(expect))
    }
  }
}

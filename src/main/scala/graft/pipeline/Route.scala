package graft.pipeline

import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.functions._
import org.apache.spark.util.LongAccumulator

/** P4 — route / fan-out stage: one parsed+enriched pass is persisted, then
  * four filtered writes (errors, tool_calls, assistant_text, unmatched).
  *
  * Skew handling is explicit (north rule): hot conversations (the Zipf head)
  * would otherwise pin a handful of write tasks, so each sink write is
  * `repartition(n, conv_id, salt)` with `salt = pmod(hash(turn_idx), S)` —
  * deterministic, spreads one conversation over at most S tasks while
  * keeping co-residence for typical conversations. AQE cannot fix skewed
  * *writes*, only skewed joins, hence the manual salt.
  */
object Route {

  /** Number of salt buckets a single hot conversation may spread over. */
  val SaltBuckets = 8

  def salted(df: DataFrame, partitions: Int): DataFrame =
    df.repartition(partitions, col("conv_id"), pmod(hash(col("turn_idx")), lit(SaltBuckets)))

  /** Write each category to `outDir/<category>` as parquet. Returns per-sink
    * row counts (from the write-side accumulators).
    */
  def writeSinks(
      enriched: DataFrame,
      outDir: String,
      partitions: Int,
      counters: Map[String, LongAccumulator] = Map.empty,
      categories: Seq[String] = Category.All
  ): Map[String, Long] = {
    val spark = enriched.sparkSession
    val cached = enriched.persist()
    try {
      categories.map { cat =>
        val sink = cached.filter(col("category") === cat)
        val acc = counters.get(cat)
        val counted = acc match {
          case Some(a) =>
            // count rows as they stream into the sink write, no extra job
            sink.map { r => a.add(1L); r }(org.apache.spark.sql.Encoders.row(sink.schema))
          case None => sink
        }
        salted(counted.toDF(), partitions)
          .write.mode(SaveMode.Overwrite)
          .parquet(s"$outDir/$cat")
        val n = acc.map(_.value.longValue()).getOrElse(
          spark.read.parquet(s"$outDir/$cat").count())
        cat -> n
      }.toMap
    } finally {
      cached.unpersist()
    }
  }

  /** Routed counts without writing (for tests / the flagship query). */
  def counts(enriched: DataFrame): DataFrame =
    enriched.groupBy("category").agg(count(lit(1)).as("n_turns"))
}

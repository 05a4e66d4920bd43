package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll
import graft.datagen.SyntheticTranscripts
import graft.lexer.PatternBank
import graft.pipeline.{Enrich, Parse, Route}

/** Physical-plan audits: the plans we ship are the plans we designed —
  * filters reach the parquet scan, projections prune columns, dimension
  * joins broadcast, the route write has exactly one shuffle. These guard
  * the 100 TB properties that small-scale correctness tests can't see.
  */
class PlanSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("plan-spec")
    .config("spark.sql.shuffle.partitions", "8")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private val sfDir = "/root/testdata/sf0.001"

  private def planOf(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.executedPlan.toString()

  test("q6 filter-agg pushes predicates into the parquet scan") {
    val plan = SparkEntry.queries("q6_filter_agg")(spark, sfDir)
      .queryExecution.executedPlan.toString()
    assert(plan.contains("PushedFilters"))
    assert(plan.contains("l_shipdate"), plan.linesIterator.filter(_.contains("Scan")).mkString("\n"))
    // the scan must not read unrelated columns
    assert(!plan.contains("l_returnflag"))
  }

  test("t1 quality reads only doc_id and text (column pruning)") {
    val plan = planOf(SparkEntry.queries("t1_quality")(spark, sfDir))
    val scanLine = plan.linesIterator.find(_.contains("ReadSchema")).getOrElse("")
    assert(scanLine.contains("doc_id") && scanLine.contains("text"))
    assert(!scanLine.contains("lang") && !scanLine.contains("source"))
  }

  test("q4 multijoin broadcasts nation and region (no shuffle join for dims)") {
    val plan = planOf(SparkEntry.queries("q4_multijoin")(spark, sfDir))
    assert(plan.contains("BroadcastHashJoin"))
  }

  test("route write plan has exactly one exchange (the salted repartition)") {
    import spark.implicits._
    val turns = SyntheticTranscripts.generate(spark, 20L)
    val bank = spark.sparkContext.broadcast(PatternBank.example)
    val salted = Route.salted(turns.toDF(), 8).as[graft.pipeline.Turn]
    val enriched = Enrich(Parse(salted, bank).toDF(),
      SyntheticTranscripts.dimTool(spark), SyntheticTranscripts.dimRole(spark))
    val plan = planOf(enriched)
    val nExchanges = plan.linesIterator.count(l => l.contains("Exchange") && !l.contains("Broadcast"))
    assert(nExchanges == 1, s"expected exactly the salted repartition exchange, got $nExchanges:\n$plan")
    assert(plan.contains("BroadcastHashJoin"))
  }

  test("whole-stage codegen covers the relational queries") {
    val df = SparkEntry.queries("q1_agg")(spark, sfDir)
    df.collect() // finalize the adaptive plan — codegen spans appear post-execution
    val plan = planOf(df)
    assert(plan.contains("isFinalPlan=true"))
    // codegen stages print as "*(n)" in the adaptive plan string
    assert("""\*\(\d+\)""".r.findFirstIn(plan).isDefined, plan)
  }

  test("parse_turn participates in whole-stage codegen (no interpreter fallback)") {
    val turns = SyntheticTranscripts.generate(spark, 30L).toDF()
    val parsed = Parse.expr(turns, PatternBank.example)
    // the Project carrying parse_turn must be inside a codegen stage ("*(n)")
    val line = parsed.queryExecution.executedPlan.toString()
      .linesIterator.find(_.contains("parse_turn")).getOrElse("")
    assert(line.contains("*("), s"parse_turn project not whole-stage codegen'd: $line")
    // the generated code must hold the reused ParseScratch state
    val cg = org.apache.spark.sql.execution.debug.codegenString(parsed.queryExecution.executedPlan)
    assert(cg.contains("graft.functions.ParseScratch"))
    // and it must COMPILE — forbid the silent Janino→interpreter fallback
    spark.conf.set("spark.sql.codegen.fallback", "false")
    try {
      val r = parsed.selectExpr("sum(n_tokens)").collect()(0).getLong(0)
      assert(r > 0)
    } finally spark.conf.set("spark.sql.codegen.fallback", "true")
  }

  test("q18 distinct aggregate plans via Expand + partial aggregation (no naive re-shuffle per distinct)") {
    val plan = planOf(SparkEntry.queries("q18_count_distinct")(spark, sfDir))
    // Catalyst rewrites multi-distinct into ONE Expand feeding a two-level
    // HashAggregate — the scalable shape (vs one shuffle per distinct column)
    assert(plan.contains("Expand"), plan)
    assert(plan.contains("HashAggregate"), plan)
    // scan reads only the three columns involved
    val scanLine = plan.linesIterator.find(_.contains("ReadSchema")).getOrElse("")
    assert(scanLine.contains("l_returnflag") && scanLine.contains("l_partkey")
      && scanLine.contains("l_suppkey"))
    assert(!scanLine.contains("l_quantity"))
  }

  test("q19 sketch distinct: HLL++ partial-aggregates map-side, pruned scan") {
    val plan = planOf(SparkEntry.queries("q19_approx_distinct")(spark, sfDir))
    // the sketch path must partial-aggregate (merge_approx_count_distinct on
    // the final level means per-partition sketches merged after ONE slim
    // exchange, never a per-key shuffle for the sketch side)
    assert(plan.contains("approx_count_distinct"), plan)
    assert(plan.toLowerCase.contains("partial_approx_count_distinct")
      || plan.contains("merge_approx_count_distinct"), plan)
    val scanLine = plan.linesIterator.find(_.contains("ReadSchema")).getOrElse("")
    assert(scanLine.contains("user_id") && !scanLine.contains("props"), scanLine)
  }

  test("q20 sketch quantiles: approx_percentile partial-aggregates map-side, pruned scan") {
    val plan = planOf(SparkEntry.queries("q20_approx_percentile")(spark, sfDir))
    // same contract as q19: per-partition sketches merged after one slim
    // exchange — never a per-group value shuffle for the sketch side
    assert(plan.contains("approx_percentile"), plan)
    assert(plan.contains("partial_approx_percentile")
      || plan.contains("merge_approx_percentile"), plan)
    val scanLine = plan.linesIterator.find(_.contains("ReadSchema")).getOrElse("")
    assert(scanLine.contains("l_returnflag") && scanLine.contains("l_extendedprice"), scanLine)
    assert(!scanLine.contains("l_quantity"), scanLine)
  }

  test("s12 filtered ANN pushes the label predicate into the attribute scan") {
    // the predicate feeding the allowed-id semi-join must land in the
    // embeddings parquet scan as a pushed filter, not a post-scan Filter
    // over all rows — at 100 TB the attribute table is read predicate-first
    val plan = planOf(SparkEntry.queries("s12_knn_filtered")(spark, sfDir))
    val scanLines = plan.linesIterator.filter(l =>
      l.contains("PushedFilters") && l.contains("label")).toSeq
    assert(scanLines.nonEmpty,
      plan.linesIterator.filter(_.contains("Scan")).mkString("\n"))
    assert(plan.contains("LeftSemi"))
  }

  test("brute-force knn broadcasts the query side (no corpus shuffle before scoring)") {
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val plan = planOf(graft.operators.Similarity.bruteForceKnn(emb, emb.filter(col("vec_id") < 3), 3))
    assert(plan.contains("BroadcastNestedLoopJoin") || plan.contains("BroadcastHashJoin"), plan)
  }
}

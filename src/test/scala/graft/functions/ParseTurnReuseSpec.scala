package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll
import graft.datagen.SyntheticTranscripts
import graft.lexer.PatternBank

/** Buffer-reuse safety of parse_turn: the default (copyResult=true) column
  * must stay correct under consumers that RETAIN the struct reference across
  * input rows — aggregate buffers, collected lists — and the zero-copy fast
  * path used by Parse.expr must agree with the typed oracle (covered in
  * PipelineSpec; re-checked here through retaining consumers).
  */
class ParseTurnReuseSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("parse-turn-reuse-spec")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  test("first(parse_turn) and collect_list over the struct survive buffer reuse") {
    val turns = SyntheticTranscripts.generate(spark, 50L).toDF()
    val bank = PatternBank.example
    val p = ParseTurnExpression.parse_turn(col("text"), col("role"), col("tool"), bank)

    // typed-oracle per-conversation truth: every (n_tokens, category) a conv contains
    val typed = graft.pipeline.Parse(
      turns.as[graft.pipeline.Turn](org.apache.spark.sql.Encoders.product[graft.pipeline.Turn]),
      spark.sparkContext.broadcast(bank)).toDF()
      .select(col("conv_id"), col("n_tokens"), col("category")).collect()
      .groupBy(_.getString(0))
      .map { case (k, rs) => k -> rs.map(r => (r.getInt(1), r.getString(2))).toSet }

    // a retaining consumer: first() keeps the struct in its aggregation buffer
    val firsts = turns.groupBy("conv_id").agg(first(p).as("fp"))
      .select(col("conv_id"), col("fp.n_tokens"), col("fp.category")).collect()
    assert(firsts.nonEmpty)
    firsts.foreach { r =>
      assert(typed(r.getString(0)).contains((r.getInt(1), r.getString(2))),
        s"corrupted first() for conv ${r.getString(0)}")
    }

    // collect_list of the whole struct: every element must be a genuine turn
    val lists = turns.withColumn("p", p).groupBy("conv_id")
      .agg(collect_list(col("p")).as("ps")).collect()
    lists.foreach { r =>
      val convTruth = typed(r.getString(0))
      val elems = r.getSeq[org.apache.spark.sql.Row](1)
      assert(elems.nonEmpty)
      elems.foreach { e =>
        val nt = e.getInt(ParseTurnExpression.schema.fieldIndex("n_tokens"))
        val cat = e.getString(ParseTurnExpression.schema.fieldIndex("category"))
        assert(convTruth.contains((nt, cat)), s"corrupted collected struct in ${r.getString(0)}")
      }
    }
  }
}

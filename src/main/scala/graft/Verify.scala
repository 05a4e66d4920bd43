package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import java.nio.file.{Files, Paths}
import graft.datagen.SyntheticTranscripts
import graft.lexer.PatternBank
import graft.pipeline.Parse

/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. Also stages the
  * TYPED-path parse output (the independently-coded oracle implementation)
  * as parquet so the p* oracle SQL can re-aggregate it in DuckDB — the
  * queries themselves run the native-expression path.
  */
object Verify {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir) = args
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    // staged parquet lives NEXT TO outDir, not inside it — the driver
    // iterates outDir subdirs as query results
    val stagedDir = Paths.get(outDir + "_staged").toAbsolutePath.normalize().toString
    try stageTypedParse(spark, sfDir, stagedDir)
    catch { case e: Throwable =>
      System.err.println(s"[verify] staging failed (p* oracles will miss): ${e.getMessage}")
    }
    SparkEntry.queries.foreach { case (name, fn) =>
      try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
        .parquet(s"$outDir/$name")
      catch { case e: Throwable =>
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
      }
    }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v.replace("{STAGED}", stagedDir))}" }
      .mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    spark.stop()
  }

  /** Materialize the typed (mapPartitions) parse of the same synthetic
    * transcripts the p* queries use — slim scalar columns for the p1/p3/p4
    * oracles and the exploded token stream for p2.
    */
  def stageTypedParse(spark: SparkSession, sfDir: String, stagedDir: String): Unit = {
    val turns = SyntheticTranscripts.generate(spark, SyntheticTranscripts.convsForSfDir(sfDir))
    val bank = Parse.broadcastBank(spark, PatternBank.example)
    val parsed = Parse(turns, bank).toDF()
    parsed.select("conv_id", "turn_idx", "role", "tool", "ts", "category",
        "n_tokens", "n_errors", "error_signature")
      .coalesce(1).write.mode("overwrite").parquet(s"$stagedDir/parsed")
    parsed.select(explode(col("tokens")).as("tok"))
      .select(col("tok.token_type").as("token_type"), col("tok.schema_id").as("schema_id"))
      .coalesce(1).write.mode("overwrite").parquet(s"$stagedDir/tokens")
  }
}

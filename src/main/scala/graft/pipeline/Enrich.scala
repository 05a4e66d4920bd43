package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.broadcast

/** P3 — enrich stage: broadcast-hash-join the small tool/role dimension
  * tables onto the parsed turns. The explicit `broadcast()` hints keep the
  * plan shuffle-free regardless of statistics: a ~16-row and a 4-row dim
  * must never become a sort-merge join at 100 TB.
  */
object Enrich {
  def apply(parsed: DataFrame, dimTool: DataFrame, dimRole: DataFrame): DataFrame =
    parsed
      .join(broadcast(dimTool), Seq("tool"), "left")
      .join(broadcast(dimRole), Seq("role"), "left")
}

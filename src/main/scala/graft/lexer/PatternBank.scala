package graft.lexer

import graft.automata.DenseDfa
import graft.schema.SchemaConfig

/** Compiled, serializable pattern bank: the two merged matcher tables
  * (timestamps, variables) plus the delimiter bitmap and variable names.
  *
  * Compiled ONCE on the driver and shipped to executors via
  * `sparkContext.broadcast` — the Spark analogue of the reference sharing
  * `Rc<SchemaConfig>` across its lexer/parser
  * (/root/reference/src/parser/schema_parser/parser.rs:87-98). At 100 TB /
  * 1000 executors this keeps pattern compilation O(1) per job instead of
  * O(rows), and the dense Int tables (DenseDfa) make the per-byte scan a
  * single array read.
  */
final class PatternBank(
    val tsDfa: DenseDfa,
    val varDfa: DenseDfa,
    val delimiters: Array[Boolean],
    val tsPatterns: Array[String],
    val varNames: Array[String]
) extends Serializable {
  @inline def isDelimiter(c: Int): Boolean = c >= 0 && c < 128 && delimiters(c)
  def varName(id: Int): String = if (id >= 0 && id < varNames.length) varNames(id) else null
  def varId(name: String): Int = varNames.indexOf(name)
}

object PatternBank {
  def compile(config: SchemaConfig): PatternBank =
    new PatternBank(
      DenseDfa.compile(config.tsPatterns),
      DenseDfa.compile(config.varSchemas.map(_._2)),
      config.delimiters,
      config.tsPatterns.toArray,
      config.varNames.toArray
    )

  lazy val example: PatternBank = compile(SchemaConfig.example)
}

package graft.schema

import org.yaml.snakeyaml.Yaml
import scala.jdk.CollectionConverters._

/** Ordered schema configuration: timestamp patterns, named variable patterns,
  * delimiter set. Pattern *position is semantic* — it is the priority id used
  * for ambiguity resolution (reference: /root/reference/src/parser/
  * schema_parser/parser.rs:59-174 and docs/Schema.md:53-71).
  *
  * '\n' is always a delimiter even if absent from the config
  * (parser.rs:167); all characters must be ASCII (parser.rs:158-163).
  */
final case class SchemaConfig(
    tsPatterns: Vector[String],
    varSchemas: Vector[(String, String)], // (name, pattern), definition order
    delimiterChars: String,
    /** Optional routing-variable overrides (our extension, not in the
      * reference dialect): which variable carries the log level and which
      * bracketed variable carries the tool invocation. When absent, the
      * defaults accept both names the reference has used for the bracket
      * variable: `thread_identifier` (docs/Schema.md:67) and
      * `field_identifier` (examples/schema.yaml:20).
      */
    routing: Map[String, String] = Map.empty
) extends Serializable {

  /** 128-entry delimiter bitmap, '\n' forced on. */
  val delimiters: Array[Boolean] = {
    val d = new Array[Boolean](128)
    delimiterChars.foreach { c =>
      require(c < 128, s"non-ASCII delimiter '$c'")
      d(c) = true
    }
    d('\n') = true
    d
  }

  def hasDelimiter(c: Int): Boolean = c < 128 && c >= 0 && delimiters(c)
  def varNames: Vector[String] = varSchemas.map(_._1)
}

object SchemaConfig {

  /** Parse the reference's YAML dialect:
    * {{{
    * timestamp:    [ regex, ... ]        # ordered sequence
    * delimiters:   " \t\r\n:,!;%"        # one string, each char a delimiter
    * variables:    { name: regex, ... }  # ordered mapping
    * }}}
    */
  def parseYaml(yaml: String): SchemaConfig = {
    val root = new Yaml().load[java.util.Map[String, Object]](yaml)
    require(root != null, "empty schema config")
    val ts = root.get("timestamp") match {
      case null => Vector.empty[String]
      case l: java.util.List[_] => l.asScala.map(_.toString).toVector
      case other => throw new IllegalArgumentException(s"timestamp: expected sequence, got $other")
    }
    val vars = root.get("variables") match {
      case null => Vector.empty[(String, String)]
      case m: java.util.Map[_, _] =>
        // snakeyaml yields LinkedHashMap → preserves definition order, which
        // is the variable priority (docs/Schema.md:70-71). Iterate entries
        // directly — going through a Scala Map would scramble the order.
        m.entrySet().asScala.iterator.map(e => (e.getKey.toString, e.getValue.toString)).toVector
      case other => throw new IllegalArgumentException(s"variables: expected mapping, got $other")
    }
    val delims = root.get("delimiters") match {
      case null => ""
      case s => s.toString
    }
    val routing = root.get("routing") match {
      case null => Map.empty[String, String]
      case m: java.util.Map[_, _] =>
        m.entrySet().asScala.iterator.map(e => (e.getKey.toString, e.getValue.toString)).toMap
      case other => throw new IllegalArgumentException(s"routing: expected mapping, got $other")
    }
    SchemaConfig(ts, vars, delims, routing)
  }

  def fromFile(path: String): SchemaConfig =
    parseYaml(new String(java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(path)),
      java.nio.charset.StandardCharsets.UTF_8))

  /** The reference's example schema (/root/reference/examples/schema.yaml),
    * embedded as the default fixture per FIXTURES.md §1.
    */
  val ExampleYaml: String =
    """timestamp:
      |  - '\d{4}\-\d{2}\-\d{2}T\d{2}:\d{2}:\d{2}\.\d{3}'
      |  - '\d{4}\-\d{2}\-\d{2}T\d{2}:\d{2}:\d{2},\d{3}'
      |  - '\d{4}\-\d{2}\-\d{2} \d{2}:\d{2}:\d{2}\.\d{3}'
      |  - '\d{4}\-\d{2}\-\d{2} \d{2}:\d{2}:\d{2},\d{3}'
      |  - '\d{4}\-\d{2}\-\d{2} \d{2}:\d{2}:\d{2}'
      |delimiters: " \t\r\n:,!;%"
      |variables:
      |  int: '\-{0,1}\d+'
      |  float: '\-{0,1}[0-9]+\.[0-9]+'
      |  hex: '0x(((\d|[a-f])+)|((\d|[A-F])+))'
      |  loglevel: '(INFO)|(DEBUG)|(WARN)|(ERROR)|(TRACE)|(FATAL)'
      |  thread_identifier: '\[(\w)+\]'
      |  path: '(/(\w|\.|\-|\*)+)+(/)*'
      |""".stripMargin

  lazy val example: SchemaConfig = parseYaml(ExampleYaml)
}

package graft.filter

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}

import scala.jdk.CollectionConverters._

/** Minimal JSON value model for the filter language (the 6 JSON types the
  * reference supports, SURVEY.md §1.2; numbers compare as f64 per
  * reference: src/metadata.rs:1396-1416).
  */
sealed trait JValue
case object JNull extends JValue
final case class JBool(value: Boolean) extends JValue
final case class JNum(value: Double) extends JValue
final case class JStr(value: String) extends JValue
final case class JArr(values: Vector[JValue]) extends JValue
final case class JObj(fields: Vector[(String, JValue)]) extends JValue

object JValue {
  private val mapper = new ObjectMapper()

  def parse(json: String): JValue = fromNode(mapper.readTree(json))

  def fromNode(n: JsonNode): JValue =
    if (n == null || n.isNull) JNull
    else if (n.isBoolean) JBool(n.asBoolean())
    else if (n.isNumber) JNum(n.asDouble())
    else if (n.isTextual) JStr(n.asText())
    else if (n.isArray) JArr(n.elements().asScala.map(fromNode).toVector)
    else if (n.isObject)
      JObj(n.properties().asScala.map(e => e.getKey -> fromNode(e.getValue)).toVector)
    else throw new IllegalArgumentException(s"Unsupported JSON node: $n")

  /** Scala literal for use in Spark `lit(...)`. */
  def toLiteral(v: JValue): Any = v match {
    case JNull    => null
    case JBool(b) => b
    case JNum(d)  => d
    case JStr(s)  => s
    case other    => throw new IllegalArgumentException(
      s"Not a scalar JSON value: $other")
  }
}

package graft.kernel

import org.json4s._
import org.json4s.jackson.JsonMethods

/** Loader for the reference-generated golden fixtures in
  * src/test/resources/golden (produced by tools/gen_golden.py, which runs the
  * actual reference library with numba stubbed to plain numpy). */
object GoldenJson {
  def load(name: String): JValue = {
    val in = getClass.getResourceAsStream(s"/golden/$name.json")
    require(in != null, s"missing golden fixture $name — run tools/gen_golden.py")
    val txt = scala.io.Source.fromInputStream(in, "UTF-8").mkString
    JsonMethods.parse(txt)
  }

  def doubles(v: JValue): Array[Double] = v match {
    case JArray(items) => items.map {
      case JDouble(d) => d
      case JInt(i) => i.toDouble
      case JLong(l) => l.toDouble
      case JDecimal(d) => d.toDouble
      case JNull => Double.NaN
      case other => throw new IllegalArgumentException(s"not a number: $other")
    }.toArray
    case other => throw new IllegalArgumentException(s"not an array: $other")
  }

  def ints(v: JValue): Array[Int] = v match {
    case JArray(items) => items.map {
      case JInt(i) => i.toInt
      case JLong(l) => l.toInt
      case JDouble(d) => d.toInt
      case other => throw new IllegalArgumentException(s"not an int: $other")
    }.toArray
    case other => throw new IllegalArgumentException(s"not an array: $other")
  }

  def intMatrix(v: JValue): Array[Array[Int]] = v match {
    case JArray(rows) => rows.map(ints).toArray
    case other => throw new IllegalArgumentException(s"not a matrix: $other")
  }

  def doubleMatrix(v: JValue): Array[Array[Double]] = v match {
    case JArray(rows) => rows.map(doubles).toArray
    case other => throw new IllegalArgumentException(s"not a matrix: $other")
  }
}

package graft

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import graft.functions.GraftPropertyGet
import org.apache.spark.unsafe.types.UTF8String
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

import scala.jdk.CollectionConverters._

/** Property-based check of the flat-JSON tokenizer: for arbitrary flat
  * objects serialized by a real JSON library (Jackson), extract(key)
  * must agree with the parsed map — including keys/values full of
  * quotes, backslashes, control characters, unicode, and key-shaped
  * text embedded in values.
  */
class PropertyGetPropSpec extends AnyFunSuite {

  private val mapper = new ObjectMapper

  private val keyGen: Gen[String] = Gen.oneOf(
    Gen.alphaNumStr.suchThat(_.nonEmpty).map(_.take(8)),
    Gen.oneOf("""a"b""", """c\d""", "k k", "K", "éé", "tab\tkey", "new\nline"))

  private val strValGen: Gen[String] = Gen.oneOf(
    Gen.asciiPrintableStr.map(_.take(20)),
    // adversarial: value contains a key-shaped fragment
    keyGen.map(k => s"""see "$k": 1 inside"""),
    Gen.oneOf("line\nbreak", "q\"uote", """b\slash""", "ctl", "", "ünïcode"))

  private val valGen: Gen[Any] = Gen.oneOf[Any](
    strValGen,
    Gen.chooseNum(-1000000, 1000000),
    Gen.chooseNum(-1e6, 1e6),
    Gen.oneOf(true, false))

  private def extract(json: String, key: String): String = {
    val r = GraftPropertyGet.extract(UTF8String.fromString(json), UTF8String.fromString(key))
    if (r == null) null else r.toString
  }

  private def lowerA(c: Char): Char = if (c >= 'A' && c <= 'Z') (c + 32).toChar else c

  test("extract agrees with Jackson on arbitrary flat objects") {
    val objGen = Gen.mapOf(Gen.zip(keyGen, valGen)).map(_.take(6))
    val prop = Prop.forAll(objGen, keyGen) { (m, probe) =>
      val node = mapper.createObjectNode()
      m.foreach {
        case (k, v: String) => node.put(k, v)
        case (k, v: Int) => node.put(k, v)
        case (k, v: Double) => node.put(k, v)
        case (k, v: Boolean) => node.put(k, v)
        case _ => ()
      }
      val json = mapper.writeValueAsString(node)
      // the tokenizer is ASCII-case-insensitive and first-match like the
      // reference, so compare against the first case-insensitive hit
      def lookup(key: String): Option[JsonNode] =
        node.properties().asScala.toSeq
          .find(e => e.getKey.length == key.length &&
            e.getKey.zip(key).forall { case (a, b) => lowerA(a) == lowerA(b) })
          .map(_.getValue)
      val probes = (probe +: m.keys.toSeq).distinct
      probes.forall { k =>
        val got = Option(extract(json, k))
        val want = lookup(k).map(v => if (v.isTextual) v.asText() else v.toString)
        got == want
      }
    }
    val result = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(300), prop)
    assert(result.passed, s"scalacheck: ${result.status}")
  }
}

package graft

import org.scalacheck.{Gen, Prop, Properties}
import org.apache.spark.unsafe.types.UTF8String

import graft.functions.RomanOps

/** Property suite for the native roman_to_int kernel (JVM-level — no Spark
  * session needed, so the whole 1..3999 space is effectively covered).
  */
object RomanProps extends Properties("RomanOps") {

  private val Pairs = Seq(
    1000 -> "M", 900 -> "CM", 500 -> "D", 400 -> "CD", 100 -> "C",
    90 -> "XC", 50 -> "L", 40 -> "XL", 10 -> "X", 9 -> "IX",
    5 -> "V", 4 -> "IV", 1 -> "I")

  private def toRoman(n: Int): String = {
    var r = n
    val sb = new StringBuilder
    Pairs.foreach { case (v, s) => while (r >= v) { sb.append(s); r -= v } }
    sb.toString
  }

  private def convert(s: String): String =
    RomanOps.convert(UTF8String.fromString(s)).toString

  property("roundtrip: convert(toRoman(n)) == n for 1..3999") =
    Prop.forAll(Gen.choose(1, 3999)) { n => convert(toRoman(n)) == n.toString }

  property("non-canonical or non-roman strings pass through unchanged") =
    Prop.forAll(Gen.oneOf("IIII", "VV", "XXXX", "IC", "abc", "M3", "")) { s =>
      convert(s) == s
    }

  property("strict-form numerals never pass through as-is") =
    Prop.forAll(Gen.choose(1, 3999)) { n =>
      val r = toRoman(n)
      convert(r) != r || r.forall(_.isDigit)
    }
}

package graft.functions

import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll
import org.apache.spark.unsafe.types.UTF8String

/** Property tests for the NFC kernel over arbitrary unicode —
  * including combining marks, precomposed characters, and mixes —
  * the invariants Unicode TR15 guarantees and the optimizer rule
  * ([[graft.plans.CollapseNfcNormalize]]) depends on.
  */
object NfcNormalizeProps extends Properties("NfcNormalize") {

  // strings over a charset that actually exercises composition:
  // ascii, precomposed latin-1 accents, combining marks, CJK
  private val uChar: Gen[Char] = Gen.frequency(
    6 -> Gen.alphaNumChar,
    2 -> Gen.oneOf('\u00e9', '\u00c5', '\u00fc', '\u00f1', '\u00e7'),
    3 -> Gen.oneOf('\u0301', '\u030A', '\u0308', '\u0303', '\u0327'),
    1 -> Gen.oneOf('\u6f22', '\u5b57', '\u304b', '\u306a'))

  private val uString: Gen[String] =
    Gen.chooseNum(0, 32).flatMap(n =>
      Gen.listOfN(n, uChar).map(_.mkString))

  private def nfc(s: String): String =
    NfcNormalize.normalize(UTF8String.fromString(s)).toString

  property("idempotent: nfc(nfc(x)) == nfc(x)") = forAll(uString) { s =>
    nfc(nfc(s)) == nfc(s)
  }

  property("agrees with java.text.Normalizer") = forAll(uString) { s =>
    nfc(s) == java.text.Normalizer
      .normalize(s, java.text.Normalizer.Form.NFC)
  }

  property("never longer than the input (NFC only composes)") =
    forAll(uString) { s => nfc(s).length <= s.length }

  property("canonically equivalent: NFD of both sides agrees") =
    forAll(uString) { s =>
      java.text.Normalizer.normalize(s, java.text.Normalizer.Form.NFD) ==
        java.text.Normalizer
          .normalize(nfc(s), java.text.Normalizer.Form.NFD)
    }

  property("already-NFC input returns the same reference") =
    forAll(uString) { s =>
      val n = UTF8String.fromString(nfc(s))
      NfcNormalize.normalize(n) eq n
    }
}

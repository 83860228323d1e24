package graft.functions

import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll

/** Property tests for the Porter2 stemmer (SURVEY §5.2): structural
  * invariants that must hold for arbitrary lowercase inputs.
  */
object Porter2Props extends Properties("Porter2") {

  private val lowerWord: Gen[String] =
    Gen.chooseNum(1, 24).flatMap { n =>
      Gen.listOfN(n, Gen.alphaLowerChar).map(_.mkString)
    }

  property("never longer than the input") = forAll(lowerWord) { w =>
    Porter2.stem(w).length <= w.length
  }

  property("nonempty for nonempty input") = forAll(lowerWord) { w =>
    Porter2.stem(w).nonEmpty
  }

  property("stays lowercase-alpha for lowercase-alpha input") =
    forAll(lowerWord) { w =>
      Porter2.stem(w).forall(c => c >= 'a' && c <= 'z')
    }

  property("words of length <= 2 are unchanged") =
    forAll(Gen.chooseNum(1, 2).flatMap(n =>
      Gen.listOfN(n, Gen.alphaLowerChar).map(_.mkString))) { w =>
      Porter2.stem(w) == w
    }

  property("a stem of a stem is never longer") = forAll(lowerWord) { w =>
    val s = Porter2.stem(w)
    Porter2.stem(s).length <= s.length
  }
}

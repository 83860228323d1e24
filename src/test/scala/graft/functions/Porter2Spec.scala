package graft.functions

import org.scalatest.funsuite.AnyFunSuite

/** Golden tests for the Porter2 stemmer.
  *
  * Two evidence classes: (a) stems observed in the reference run's
  * transcript vocabulary (`/root/reference/Week5_datingNLP.out.txt:1` —
  * `intellectu`, `recit`, `clich`, `hous`, `favorit`, `lazi`, `danc`),
  * (b) behavior pinned by the published Snowball English algorithm
  * (exceptional forms, each step's rules, the find_among_b
  * region-fall-through that stems argument → argum).
  */
class Porter2Spec extends AnyFunSuite {

  private def check(pairs: (String, String)*): Unit =
    pairs.foreach { case (in, out) =>
      assert(Porter2.stem(in) == out, s"stem($in) => ${Porter2.stem(in)}, expected $out")
    }

  test("reference-observed stems") {
    check(
      "intellectual" -> "intellectu",
      "intellectually" -> "intellectu",
      "recite" -> "recit",
      "cliche" -> "clich",
      "house" -> "hous",
      "houses" -> "hous",
      "favorite" -> "favorit",
      "lazy" -> "lazi",
      "dancing" -> "danc",
      "girls" -> "girl",
      "guy" -> "guy",
      "think" -> "think",
      "kind" -> "kind")
  }

  test("exceptional forms and invariants") {
    check(
      "skis" -> "ski", "skies" -> "sky", "dying" -> "die",
      "lying" -> "lie", "tying" -> "tie", "idly" -> "idl",
      "gently" -> "gentl", "ugly" -> "ugli", "early" -> "earli",
      "only" -> "onli", "singly" -> "singl",
      "sky" -> "sky", "news" -> "news", "howe" -> "howe",
      "atlas" -> "atlas", "cosmos" -> "cosmos", "bias" -> "bias",
      "andes" -> "andes",
      "inning" -> "inning", "outing" -> "outing", "canning" -> "canning",
      "herring" -> "herring", "earring" -> "earring",
      "proceed" -> "proceed", "exceed" -> "exceed", "succeed" -> "succeed")
  }

  test("short words unchanged") {
    check("a" -> "a", "is" -> "is", "am" -> "am", "be" -> "be")
  }

  test("step 1a plurals") {
    check(
      "caresses" -> "caress", "ties" -> "tie", "cries" -> "cri",
      "gaps" -> "gap", "gas" -> "gas", "kiwis" -> "kiwi",
      "this" -> "this", "dies" -> "die")
  }

  test("step 1b ed/ing") {
    check(
      "agreed" -> "agre", "feed" -> "feed", "bled" -> "bled",
      "sing" -> "sing", "motoring" -> "motor", "hopping" -> "hop",
      "hoping" -> "hope", "falling" -> "fall", "skating" -> "skate",
      "controlling" -> "control", "conflated" -> "conflat")
  }

  test("step 1c y → i") {
    check(
      "cry" -> "cri", "by" -> "by", "say" -> "say",
      "enjoy" -> "enjoy", "happy" -> "happi")
  }

  test("steps 2-4 suffix chains") {
    check(
      "relational" -> "relat",
      "conditional" -> "condit",
      "rational" -> "ration",
      "valenci" -> "valenc",
      "digitizer" -> "digit",
      "hopeful" -> "hope",
      "goodness" -> "good",
      "adoption" -> "adopt",
      "generate" -> "generat",
      "generous" -> "generous",
      "argument" -> "argum")
  }

  test("step 5") {
    check("rate" -> "rate", "agree" -> "agre", "roll" -> "roll")
  }

  test("null and apostrophes") {
    assert(Porter2.stem(null) == null)
    check("'cause" -> "caus", "dog's" -> "dog", "dogs'" -> "dog")
  }
}

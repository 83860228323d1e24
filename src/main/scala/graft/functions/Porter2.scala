package graft.functions

/** Porter2 ("Snowball English") stemmer, implemented from the published
  * algorithm description (snowballstem.org/algorithms/english/stemmer.html).
  *
  * This is the stemmer behind the reference's `tokens_wordstem(language
  * = "english")` (`/root/reference/Week5_datingNLP.R:84`, via SnowballC);
  * observed outputs in the reference transcript — `intellectu`, `clich`,
  * `hous`, `favorit`, `lazi`, `danc` — all reproduce here (see
  * Porter2Spec).
  *
  * Pure JVM function of one lowercase word; thread-safe, allocation-light,
  * called from the codegen'd [[StemExpression]] on the hot path.
  */
object Porter2 {

  private val exceptions1: java.util.HashMap[String, String] = {
    val m = new java.util.HashMap[String, String]()
    m.put("skis", "ski"); m.put("skies", "sky"); m.put("dying", "die")
    m.put("lying", "lie"); m.put("tying", "tie"); m.put("idly", "idl")
    m.put("gently", "gentl"); m.put("ugly", "ugli"); m.put("early", "earli")
    m.put("only", "onli"); m.put("singly", "singl")
    // invariants
    m.put("sky", "sky"); m.put("news", "news"); m.put("howe", "howe")
    m.put("atlas", "atlas"); m.put("cosmos", "cosmos"); m.put("bias", "bias")
    m.put("andes", "andes")
    m
  }

  private val exceptions2 = Set(
    "inning", "outing", "canning", "herring", "earring",
    "proceed", "exceed", "succeed")

  @inline private def isV(c: Char): Boolean =
    c == 'a' || c == 'e' || c == 'i' || c == 'o' || c == 'u' || c == 'y'

  @inline private def isDouble(a: Char, b: Char): Boolean =
    a == b && (a == 'b' || a == 'd' || a == 'f' || a == 'g' || a == 'm' ||
      a == 'n' || a == 'p' || a == 'r' || a == 't')

  @inline private def isLiEnding(c: Char): Boolean =
    c == 'c' || c == 'd' || c == 'e' || c == 'g' || c == 'h' || c == 'k' ||
      c == 'm' || c == 'n' || c == 'r' || c == 't'

  /** `gopast v gopast non-v` from `from`; returns the mark (or n). */
  private def gopastVNonV(w: CharSequence, from: Int): Int = {
    val n = w.length
    var i = from
    while (i < n && !isV(w.charAt(i))) i += 1
    if (i >= n) return n
    i += 1 // passed the vowel
    while (i < n && isV(w.charAt(i))) i += 1
    if (i >= n) return n
    i + 1 // passed the non-vowel
  }

  /** shortv test with cursor at `pos` (backwards): either
    * non-v, v, non-v-other-than-w/x/Y ending at pos, or the word starts
    * vowel + non-vowel and pos == 2.
    */
  private def shortV(w: CharSequence, pos: Int): Boolean = {
    if (pos >= 3) {
      val c1 = w.charAt(pos - 1); val c2 = w.charAt(pos - 2)
      val c3 = w.charAt(pos - 3)
      if (!isV(c1) && c1 != 'w' && c1 != 'x' && c1 != 'Y' &&
        isV(c2) && !isV(c3)) return true
    }
    pos == 2 && isV(w.charAt(0)) && !isV(w.charAt(1))
  }

  def stem(input: String): String = {
    if (input == null) return null
    val exc = exceptions1.get(input)
    if (exc != null) return exc
    if (input.length < 3) return input

    // ---- prelude: drop initial apostrophe; mark consonant y as Y ----
    val start = if (input.charAt(0) == '\'') 1 else 0
    val sb = new StringBuilder(input.length - start)
    var i = start
    var yFound = false
    while (i < input.length) {
      val c = input.charAt(i)
      // consonant-y marking looks at the already-transformed previous
      // char ("sayyes" → saYyes, the second y stays)
      if (c == 'y' && (sb.isEmpty || isV(sb.charAt(sb.length - 1)))) {
        sb.append('Y'); yFound = true
      } else sb.append(c)
      i += 1
    }
    val w = sb

    // ---- mark regions ----
    def str = w.toString
    val p1 = {
      val s0 = str
      if (s0.startsWith("gener")) 5
      else if (s0.startsWith("commun")) 6
      else if (s0.startsWith("arsen")) 5
      else gopastVNonV(w, 0)
    }
    val p2 = gopastVNonV(w, p1)

    @inline def len = w.length
    @inline def endsWith(sfx: String): Boolean = {
      val n = len; val m = sfx.length
      if (m > n) false
      else {
        var k = 0; var ok = true
        while (ok && k < m) { ok = w.charAt(n - m + k) == sfx.charAt(k); k += 1 }
        ok
      }
    }
    @inline def inR1(sfx: String): Boolean = len - sfx.length >= p1
    @inline def inR2(sfx: String): Boolean = len - sfx.length >= p2
    def chop(k: Int): Unit = w.setLength(len - k)
    def replace(sfxLen: Int, by: String): Unit = {
      w.setLength(len - sfxLen); w.append(by)
    }
    def hasVowelBefore(limit: Int): Boolean = {
      var k = 0
      while (k < limit) { if (isV(w.charAt(k))) return true; k += 1 }
      false
    }

    // ---- Step 0: strip ', 's, 's' ----
    if (endsWith("'s'")) chop(3)
    else if (endsWith("'s")) chop(2)
    else if (endsWith("'")) chop(1)

    // ---- Step 1a ----
    if (endsWith("sses")) chop(2)
    else if (endsWith("ied") || endsWith("ies")) {
      if (len - 3 >= 2) replace(3, "i") else replace(3, "ie")
    } else if (endsWith("us") || endsWith("ss")) { /* nothing */ }
    else if (endsWith("s")) {
      // delete if a vowel exists at index <= len-3
      if (len >= 2 && hasVowelBefore(len - 2)) chop(1)
    }

    if (exceptions2.contains(str)) return str

    // ---- Step 1b (longest match: eedly|ingly, edly, eed|ing, ed;
    //      "eed(ly)" beats "ed(ly)" and the pairs are otherwise
    //      mutually exclusive, so an if-chain is exact) ----
    {
      if (endsWith("eedly")) { if (inR1("eedly")) replace(5, "ee") }
      else if (endsWith("eed")) { if (inR1("eed")) replace(3, "ee") }
      else {
        val sfxLen =
          if (endsWith("ingly")) 5
          else if (endsWith("edly")) 4
          else if (endsWith("ing")) 3
          else if (endsWith("ed")) 2
          else 0
        if (sfxLen > 0 && hasVowelBefore(len - sfxLen)) {
          chop(sfxLen)
          if (endsWith("at") || endsWith("bl") || endsWith("iz")) w.append('e')
          else if (len >= 2 && isDouble(w.charAt(len - 2), w.charAt(len - 1)))
            chop(1)
          else if (p1 == len && shortV(w, len)) w.append('e')
        }
      }
    }

    // ---- Step 1c: y/Y → i ----
    if (len >= 3) {
      val last = w.charAt(len - 1)
      if ((last == 'y' || last == 'Y') && !isV(w.charAt(len - 2)))
        w.setCharAt(len - 1, 'i')
    }

    // ---- Step 2 (suffix must lie in R1; region failure falls through
    //      to shorter suffixes, rule-condition failure does not) ----
    {
      // (suffix, replacement, extra condition code) ordered by length desc
      var done = false
      def rule(sfx: String, by: String): Boolean = {
        if (endsWith(sfx)) {
          if (inR1(sfx)) { replace(sfx.length, by); done = true; true }
          else false // outside R1 → keep looking at shorter suffixes
        } else false
      }
      def ruleStop(sfx: String)(apply: => Unit): Boolean = {
        // matched within R1 → apply (condition inside), stop either way
        if (endsWith(sfx)) {
          if (inR1(sfx)) { apply; done = true; true }
          else false
        } else false
      }
      val matched =
        rule("ational", "ate") || rule("fulness", "ful") ||
        rule("iveness", "ive") || rule("ization", "ize") ||
        rule("ousness", "ous") || rule("biliti", "ble") ||
        rule("lessli", "less") || rule("tional", "tion") ||
        rule("alism", "al") || rule("aliti", "al") || rule("ation", "ate") ||
        rule("entli", "ent") || rule("fulli", "ful") ||
        rule("iviti", "ive") || rule("ousli", "ous") ||
        rule("abli", "able") || rule("alli", "al") || rule("anci", "ance") ||
        rule("ator", "ate") || rule("enci", "ence") || rule("izer", "ize") ||
        rule("bli", "ble") ||
        ruleStop("ogi") {
          if (len >= 4 && w.charAt(len - 4) == 'l') replace(3, "og")
        } ||
        ruleStop("li") {
          if (len >= 3 && isLiEnding(w.charAt(len - 3))) chop(2)
        }
      val _ = matched
    }

    // ---- Step 3 (in R1) ----
    {
      def rule(sfx: String, by: String): Boolean =
        if (endsWith(sfx)) {
          if (inR1(sfx)) { replace(sfx.length, by); true } else false
        } else false
      def ruleDel(sfx: String): Boolean =
        if (endsWith(sfx)) {
          if (inR1(sfx)) { chop(sfx.length); true } else false
        } else false
      val matched =
        rule("ational", "ate") || rule("tional", "tion") ||
        rule("alize", "al") ||
        rule("icate", "ic") || rule("iciti", "ic") ||
        (if (endsWith("ative")) {
          if (inR1("ative")) { if (inR2("ative")) chop(5); true } else false
        } else false) ||
        rule("ical", "ic") || ruleDel("ness") || ruleDel("ful")
      val _ = matched
    }

    // ---- Step 4 (in R2) ----
    {
      def del(sfx: String): Boolean =
        if (endsWith(sfx)) {
          if (inR2(sfx)) { chop(sfx.length); true } else false
        } else false
      // Region (R2) failure falls through to the next-shorter nested
      // suffix, exactly like snowball's find_among_b under setlimit —
      // this is why porter2 stems "argument" → "argum" ('ement' and
      // 'ment' start before p2, 'ent' doesn't).
      val matched =
        del("ement") ||
        del("ance") || del("ence") || del("able") || del("ible") ||
        del("ment") ||
        (if (endsWith("ion")) {
          if (inR2("ion")) {
            if (len >= 4 && {
              val c = w.charAt(len - 4); c == 's' || c == 't'
            }) chop(3)
            true
          } else false
        } else false) ||
        del("ent") || del("ant") || del("ism") || del("ate") ||
        del("iti") || del("ous") || del("ive") || del("ize") ||
        del("al") || del("er") || del("ic")
      val _ = matched
    }

    // ---- Step 5 ----
    if (len >= 1 && w.charAt(len - 1) == 'e') {
      if (len - 1 >= p2 || (len - 1 >= p1 && !shortV(w, len - 1))) chop(1)
    } else if (len >= 2 && w.charAt(len - 1) == 'l') {
      if (len - 1 >= p2 && w.charAt(len - 2) == 'l') chop(1)
    }

    // ---- postlude: Y → y ----
    if (yFound) {
      var k = 0
      while (k < len) { if (w.charAt(k) == 'Y') w.setCharAt(k, 'y'); k += 1 }
    }
    w.toString
  }
}

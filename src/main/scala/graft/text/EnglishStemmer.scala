package graft.text

/** English (Porter2-style) stemmer, behaviorally equivalent to the
  * reference's `pkg/textanalyzer/stemmer_english.go:106-330` — including its
  * deliberate deviations from canonical Snowball (plural-s removal requires
  * any vowel in the stem; step-5 e-removal tests the recomputed stem region;
  * double-consonant undoubling excludes only l/s/z). BM25 parity depends on
  * producing identical tokens, so this is a spec-level port, not a canonical
  * Porter2.
  */
object EnglishStemmer {

  private val exceptions1 = Map(
    "skis" -> "ski", "skies" -> "sky", "dying" -> "die", "lying" -> "lie",
    "tying" -> "tie", "idly" -> "idl", "gently" -> "gentl", "ugly" -> "ugli",
    "early" -> "earli", "only" -> "onli", "singly" -> "singl", "news" -> "news",
    "howe" -> "howe", "atlas" -> "atlas", "cosmos" -> "cosmos", "bias" -> "bias",
    "andes" -> "andes")

  private val exceptions2 = Set(
    "inning", "outing", "canning", "herring", "earring", "proceed", "exceed",
    "succeed")

  private def isVowel(s: String, i: Int): Boolean = {
    if (i < 0 || i >= s.length) return false
    s.charAt(i) match {
      case 'a' | 'e' | 'i' | 'o' | 'u' => true
      case 'y' =>
        if (i == 0) false
        else s.charAt(i - 1) match {
          case 'a' | 'e' | 'i' | 'o' | 'u' => false
          case _ => true
        }
      case _ => false
    }
  }

  /** r1/r2 per reference `getEnglishRegions` (r2 scan starts at r1+1). */
  private def regions(s: String): (Int, Int) = {
    var r1 = s.length
    var r2 = s.length
    var i = 1
    var found = false
    while (i < s.length && !found) {
      if (!isVowel(s, i) && isVowel(s, i - 1)) { r1 = i + 1; found = true }
      i += 1
    }
    i = r1 + 1
    found = false
    while (i < s.length && !found) {
      if (!isVowel(s, i) && isVowel(s, i - 1)) { r2 = i + 1; found = true }
      i += 1
    }
    (r1, r2)
  }

  private def endsWithShortSyllable(s: String): Boolean = {
    val l = s.length
    if (l < 2) return false
    if (l >= 3 && !isVowel(s, l - 3) && isVowel(s, l - 2) && !isVowel(s, l - 1)) {
      val last = s.charAt(l - 1)
      if (last != 'w' && last != 'x' && last != 'y') return true
    }
    l == 2 && isVowel(s, 0) && !isVowel(s, 1)
  }

  private def replaceSuffixIfInRegion(s: String, regionStart: Int, old: String, nw: String): Option[String] =
    if (s.endsWith(old) && s.length - old.length >= regionStart)
      Some(s.substring(0, s.length - old.length) + nw)
    else None

  private def hasVowel(s: String): Boolean = {
    var i = 0
    while (i < s.length) { if (isVowel(s, i)) return true; i += 1 }
    false
  }

  def stem(word: String): String = {
    if (word.length <= 2) return word
    exceptions1.get(word) match {
      case Some(st) => return st
      case None =>
    }
    var s = word
    if (s.charAt(0) == '\'') s = s.substring(1)
    if (s.charAt(0) == 'y') s = "Y" + s.substring(1)
    val (r1, r2) = regions(s)

    s = step0(s)
    s = step1a(s)
    if (exceptions2.contains(s)) return s
    s = step1b(s, r1)
    s = step1c(s)
    s = step2(s, r1)
    s = step3(s, r1, r2)
    s = step4(s, r2)
    s = step5(s, r1)
    s.toLowerCase
  }

  private def step0(s: String): String =
    if (s.endsWith("'s'")) s.substring(0, s.length - 3)
    else if (s.endsWith("'s")) s.substring(0, s.length - 2)
    else if (s.endsWith("'")) s.substring(0, s.length - 1)
    else s

  private def step1a(s: String): String = {
    if (s.endsWith("sses")) return s.substring(0, s.length - 2)
    if (s.endsWith("ies")) return s.substring(0, s.length - 2)
    if (s.endsWith("s") && !s.endsWith("ss") && s.length > 2 &&
        hasVowel(s.substring(0, s.length - 1)))
      return s.substring(0, s.length - 1)
    s
  }

  private def step1b(s0: String, r1: Int): String = {
    var s = s0
    if (s.endsWith("eed") || s.endsWith("eedly")) {
      replaceSuffixIfInRegion(s, r1, "eed", "ee").foreach(return _)
      replaceSuffixIfInRegion(s, r1, "eedly", "ee").foreach(return _)
      return s
    }
    var stem = ""
    var removed = false
    if (s.endsWith("ed") || s.endsWith("edly")) {
      stem = if (s.endsWith("edly")) s.substring(0, s.length - 4)
             else s.substring(0, s.length - 2)
      removed = true
    } else if (s.endsWith("ing") || s.endsWith("ingly")) {
      stem = if (s.endsWith("ingly")) s.substring(0, s.length - 5)
             else s.substring(0, s.length - 3)
      removed = true
    }
    if (removed && hasVowel(stem)) {
      s = stem
      if (s.endsWith("at") || s.endsWith("bl") || s.endsWith("iz")) s += "e"
      else {
        val l = s.length
        if (l > 1 && s.charAt(l - 1) == s.charAt(l - 2)) {
          val last = s.charAt(l - 1)
          if (last != 'l' && last != 's' && last != 'z') s = s.substring(0, l - 1)
        } else {
          val (r1Stem, _) = regions(s)
          if (endsWithShortSyllable(s) && r1Stem == s.length) s += "e"
        }
      }
    }
    s
  }

  private def step1c(s: String): String = {
    val l = s.length
    if (l > 2 && (s.charAt(l - 1) == 'y' || s.charAt(l - 1) == 'Y') && !isVowel(s, l - 2))
      s.substring(0, l - 1) + "i"
    else s
  }

  private val step2Suffixes = Seq(
    "ational" -> "ate", "tional" -> "tion", "enci" -> "ence", "anci" -> "ance",
    "izer" -> "ize", "abli" -> "able", "alli" -> "al", "entli" -> "ent",
    "eli" -> "e", "ousli" -> "ous", "ization" -> "ize", "ation" -> "ate",
    "ator" -> "ate", "alism" -> "al", "iveness" -> "ive", "fulness" -> "ful",
    "ousness" -> "ous", "aliti" -> "al", "iviti" -> "ive", "biliti" -> "ble",
    "logi" -> "log")

  private def step2(s: String, r1: Int): String = {
    for ((s1, s2) <- step2Suffixes)
      replaceSuffixIfInRegion(s, r1, s1, s2).foreach(return _)
    s
  }

  private val step3Suffixes = Seq(
    "icate" -> "ic", "ative" -> "", "alize" -> "al", "iciti" -> "ic",
    "ical" -> "ic", "ful" -> "", "ness" -> "")

  private def step3(s: String, r1: Int, r2: Int): String = {
    for ((s1, s2) <- step3Suffixes) {
      val region = if (s1 == "ative") r2 else r1
      replaceSuffixIfInRegion(s, region, s1, s2).foreach(return _)
    }
    s
  }

  private val step4Suffixes = Seq(
    "al", "ance", "ence", "er", "ic", "able", "ible", "ant", "ement",
    "ment", "ent", "ism", "ate", "iti", "ous", "ive", "ize")

  private def step4(s: String, r2: Int): String = {
    if (s.endsWith("ion") && s.length - 3 >= r2) {
      val stem = s.substring(0, s.length - 3)
      if (stem.endsWith("s") || stem.endsWith("t")) return stem
    }
    for (suf <- step4Suffixes)
      replaceSuffixIfInRegion(s, r2, suf, "").foreach(return _)
    s
  }

  private def step5(s0: String, r1: Int): String = {
    var s = s0
    if (s.endsWith("e")) {
      val stem = s.substring(0, s.length - 1)
      if (stem.length >= r1) {
        val (r1Stem, _) = regions(stem)
        if (!endsWithShortSyllable(stem) || r1Stem != stem.length) s = stem
      }
    }
    if (s.endsWith("ll") && s.length - 2 >= r1) s = s.substring(0, s.length - 1)
    s
  }
}

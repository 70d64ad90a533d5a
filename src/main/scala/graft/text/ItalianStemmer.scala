package graft.text

/** Italian (Snowball-style) stemmer, behaviorally matching the reference's
  * `pkg/textanalyzer/stemmer_italian.go:91-225` — including entries that are
  * unreachable after accent normalization (e.g. the `istà`/`ità` suffixes)
  * and the `I`/`U` intervocalic marking, which excludes marked chars from
  * vowel tests.
  */
object ItalianStemmer {

  private def isVowel(c: Char): Boolean = c match {
    case 'a' | 'e' | 'i' | 'o' | 'u' => true
    case _ => false
  }

  /** (r1, r2, rv) per reference `getItalianRegions`. */
  private def regions(s: String): (Int, Int, Int) = {
    val n = s.length
    var r1 = n; var r2 = n; var rv = n
    if (n == 0) return (r1, r2, rv)
    if (n > 2) {
      if (!isVowel(s.charAt(1))) {
        var i = 2
        var done = false
        while (i < n && !done) { if (isVowel(s.charAt(i))) { rv = i + 1; done = true }; i += 1 }
      } else if (isVowel(s.charAt(0)) && isVowel(s.charAt(1))) {
        var i = 2
        var done = false
        while (i < n && !done) { if (!isVowel(s.charAt(i))) { rv = i + 1; done = true }; i += 1 }
      } else rv = 3
    }
    var i = 1
    var done = false
    while (i < n && !done) {
      if (isVowel(s.charAt(i - 1)) && !isVowel(s.charAt(i))) { r1 = i + 1; done = true }
      i += 1
    }
    i = r1
    done = false
    while (i < n && !done) {
      if (isVowel(s.charAt(i - 1)) && !isVowel(s.charAt(i))) { r2 = i + 1; done = true }
      i += 1
    }
    (r1, r2, rv)
  }

  private def replaceSuffix(s: String, region: Int, old: String, nw: String): Option[String] =
    if (s.endsWith(old) && s.length - old.length >= region)
      Some(s.substring(0, s.length - old.length) + nw)
    else None

  def stem(word: String): String = {
    if (word.length < 3) return word
    var s = word.toLowerCase
      .replace("à", "a").replace("è", "e").replace("ì", "i")
      .replace("ò", "o").replace("ù", "u")
    val chars = s.toCharArray
    var i = 1
    while (i < chars.length - 1) {
      if ((chars(i) == 'i' || chars(i) == 'u') &&
          isVowel(chars(i - 1)) && isVowel(chars(i + 1)))
        chars(i) = chars(i).toUpper
      i += 1
    }
    s = new String(chars)
    val (r1, r2, rv) = regions(s)

    s = step0Pronouns(s, rv)
    val before1 = s
    s = step1Standard(s, r1, r2, rv)
    if (s == before1) s = step2Verbs(s, rv)
    s = step3FinalVowels(s, rv)
    s.replace('I', 'i').replace('U', 'u')
  }

  private val pronouns = Seq(
    "gliela", "gliele", "glieli", "glielo", "gliene", "cela", "cele", "celi",
    "celo", "cene", "mela", "mele", "meli", "melo", "mene", "tela", "tele",
    "teli", "telo", "tene", "vela", "vele", "veli", "velo", "vene", "ci",
    "gli", "la", "le", "li", "lo", "mi", "ne", "si", "ti", "vi")

  private def step0Pronouns(s: String, rv: Int): String = {
    for (p <- pronouns) replaceSuffix(s, rv, p, "").foreach { ns =>
      return if (ns.endsWith("cher") || ns.endsWith("gher"))
        ns.substring(0, ns.length - 2)
      else ns
    }
    s
  }

  // (suffix, replacement, region selector: 0=r1, 1=r2, 2=rv)
  private val step1Suffixes: Seq[(String, String, Int)] = Seq(
    ("mente", "", 2), ("atrice", "", 1), ("atrici", "", 1),
    ("anza", "", 0), ("anze", "", 0), ("ico", "", 0), ("ici", "", 0),
    ("ica", "", 0), ("ice", "", 0), ("iche", "", 0), ("ichi", "", 0),
    ("ismo", "", 0), ("ismi", "", 0), ("ista", "", 0), ("iste", "", 0),
    ("isti", "", 0), ("istà", "", 0), ("istè", "", 0), ("istì", "", 0),
    ("oso", "", 0), ("osi", "", 0), ("osa", "", 0), ("ose", "", 0),
    ("ità", "", 0), ("logia", "log", 0), ("logie", "log", 0),
    ("azione", "", 1), ("azioni", "", 1), ("atore", "", 1),
    ("abilità", "", 1), ("ibili", "", 1), ("abile", "", 1),
    ("ività", "", 2), ("ivo", "", 2), ("ivi", "", 2), ("iva", "", 2), ("ive", "", 2))

  private def step1Standard(s: String, r1: Int, r2: Int, rv: Int): String = {
    for ((suf, repl, rs) <- step1Suffixes) {
      val region = rs match { case 0 => r1; case 1 => r2; case _ => rv }
      replaceSuffix(s, region, suf, repl).foreach(return _)
    }
    s
  }

  private val verbSuffixes = Seq(
    "erebbero", "irebbero", "assero", "assimo", "eranno", "erebbe", "eremmo",
    "ereste", "eresti", "essero", "iranno", "irebbe", "iremmo", "ireste",
    "iresti", "arono", "avamo", "avano", "avate", "eremo", "erete", "erono",
    "evamo", "evano", "evate", "iremo", "irete", "irono", "ivamo", "ivano",
    "ivate", "ammo", "ando", "asse", "assi", "emmo", "endo", "erai", "erei",
    "Yamo", "iamo", "immo", "irai", "irei", "isca", "isce", "isci", "isco",
    "ano", "are", "ata", "ate", "ati", "ato", "ava", "avi", "avo", "erà",
    "ere", "erò", "ete", "eva", "evi", "evo", "irà", "ire", "irò", "ita",
    "ite", "iti", "ito", "iva", "ivi", "ivo", "ono", "uta", "ute", "uti",
    "uto", "ar", "ir")

  private def step2Verbs(s: String, rv: Int): String = {
    for (suf <- verbSuffixes) replaceSuffix(s, rv, suf, "").foreach(return _)
    s
  }

  private def step3FinalVowels(s: String, rv: Int): String = {
    if (s.endsWith("a") || s.endsWith("e") || s.endsWith("i") || s.endsWith("o")) {
      replaceSuffix(s, rv, s.substring(s.length - 1), "").foreach(return _)
    }
    if (s.endsWith("chi") || s.endsWith("ghi")) {
      replaceSuffix(s, rv, s.substring(s.length - 1), "").foreach { ns =>
        return ns.substring(0, ns.length - 1)
      }
    }
    s
  }
}

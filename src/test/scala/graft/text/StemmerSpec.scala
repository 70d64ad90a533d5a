package graft.text

import org.scalatest.funsuite.AnyFunSuite

/** Golden vectors mirroring the reference's
  * `pkg/textanalyzer/stemmer_english_test.go` / `stemmer_italian_test.go`.
  */
class StemmerSpec extends AnyFunSuite {

  private val englishGolden = Seq(
    "" -> "", "a" -> "a", "run" -> "run", "cat's" -> "cat", "cats'" -> "cat",
    "caresses" -> "caress", "ponies" -> "poni", "ties" -> "ti",
    "caress" -> "caress", "cats" -> "cat", "feed" -> "feed",
    "agreed" -> "agre", "plastered" -> "plaster", "motoring" -> "motor",
    "sing" -> "sing", "conflated" -> "conflat", "troubled" -> "troubl",
    "sized" -> "size", "hopping" -> "hop", "tanning" -> "tan",
    "falling" -> "fall", "hissing" -> "hiss", "fizzed" -> "fizz",
    "failing" -> "fail", "filing" -> "file", "happy" -> "happi",
    "sky" -> "ski", "relational" -> "relat", "conditional" -> "condit",
    "rational" -> "ration", "valency" -> "valenc", "hesitancy" -> "hesit",
    "digitizer" -> "digit", "conformabli" -> "conform",
    "radicalli" -> "radic", "differentli" -> "differ", "vileli" -> "vile",
    "analogousli" -> "analog", "vietnamization" -> "vietnam",
    "predication" -> "predic", "operator" -> "oper", "feudalism" -> "feudal",
    "decisiveness" -> "decis", "hopefulness" -> "hope",
    "callousness" -> "callous", "formaliti" -> "formal",
    "sensitiviti" -> "sensit", "sensibiliti" -> "sensibl",
    "triplicate" -> "triplic", "formative" -> "format",
    "formalize" -> "formal", "electriciti" -> "electr",
    "electrical" -> "electr", "hopeful" -> "hope", "goodness" -> "good",
    "revival" -> "reviv", "allowance" -> "allow", "inference" -> "infer",
    "airliner" -> "airlin", "gyroscopic" -> "gyroscop",
    "adjustable" -> "adjust", "defensible" -> "defens",
    "irritant" -> "irrit", "replacement" -> "replac",
    "adjustment" -> "adjust", "probate" -> "probat", "rate" -> "rate",
    "cease" -> "ceas", "controll" -> "control", "roll" -> "roll")

  /** The reference SKIPS its Italian golden test (`stemmer_italian_test.go:6`
    * — the implementation diverges from official Snowball). We pin the
    * IMPLEMENTATION's behavior, traced from `stemmer_italian.go:91-225`:
    * é is never normalized (only à/è/ì/ò/ù); the pronoun step strips
    * lookalike suffixes from ordinary nouns ("tavolo"→"tav",
    * "nazionale"→"nazion", "dammelo"→"dam"); and the final-vowel step fires
    * before the chi/ghi normalization can ("banchi"→"banch").
    */
  private val italianGolden = Seq(
    "" -> "", "il" -> "il", "casa" -> "cas", "gatto" -> "gatt",
    "tavolo" -> "tav", "strada" -> "strad", "case" -> "cas",
    "gatti" -> "gat", "tavoli" -> "tav", "strade" -> "strad",
    "parlare" -> "parl", "parlava" -> "parl", "parlato" -> "parl",
    "parleranno" -> "parl", "parlando" -> "parl", "vedo" -> "ved",
    "vedere" -> "ved", "visto" -> "vist", "finire" -> "fin",
    "finisco" -> "fin", "finito" -> "fin", "velocemente" -> "veloc",
    "felicemente" -> "felic", "nazionale" -> "nazion",
    "globalizzazione" -> "globalizzazi", "operatore" -> "oper",
    "operatrice" -> "oper", "città" -> "citt", "perché" -> "perché",
    "poté" -> "poté", "trovarlo" -> "trov", "vederla" -> "veder",
    "dammelo" -> "dam", "banchi" -> "banch", "funghi" -> "fungh",
    "chiodo" -> "chiod", "gioia" -> "gioi", "aiuola" -> "aiu",
    "io" -> "io", "noi" -> "noi", "lui" -> "lui", "lei" -> "lei")

  test("English stemmer matches reference golden vectors") {
    for ((in, want) <- englishGolden)
      assert(EnglishStemmer.stem(in) == want, s"stem('$in')")
  }

  test("Italian stemmer matches reference golden vectors") {
    for ((in, want) <- italianGolden)
      assert(ItalianStemmer.stem(in) == want, s"stem('$in')")
  }

  test("Analyzer pipeline: tokenize → stopwords → stem") {
    assert(Analyzer.analyze("The quick foxes are running!") ==
      Seq("quick", "fox", "run"))
    assert(Analyzer.tokenize("Hello, World_42!") == Seq("hello", "world_42"))
  }

  test("Compressor preserves negations and logical operators") {
    assert(Compressor.compress("The cat is not on the table") == "cat not table")
    assert(Compressor.compress("I will do it if you ask") == "I it if you ask")
    assert(Compressor.compress("a b") == "a b") // 'a' is important, kept
  }
}

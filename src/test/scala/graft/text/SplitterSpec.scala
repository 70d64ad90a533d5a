package graft.text

import org.scalatest.funsuite.AnyFunSuite

/** Golden behavior of the recursive character splitter port
  * (`pkg/rag/splitter.go` semantics).
  */
class SplitterSpec extends AnyFunSuite {

  test("short text stays one chunk") {
    val s = RecursiveSplitter(chunkSize = 100)
    assert(s.split("hello world") === Seq("hello world"))
  }

  test("paragraph separator splits before word separator") {
    val s = RecursiveSplitter(chunkSize = 12)
    val out = s.split("aaa bbb\n\nccc ddd")
    // Each paragraph fits the chunk size; no intra-paragraph split.
    assert(out === Seq("aaa bbb", "ccc ddd"))
  }

  test("oversized paragraph recurses into word splits merged to size") {
    val s = RecursiveSplitter(chunkSize = 10)
    val out = s.split("one two three four five")
    assert(out.forall(_.length <= 10))
    // Every input word survives, in order.
    assert(out.flatMap(_.split(" ")).toSeq ===
      Seq("one", "two", "three", "four", "five"))
  }

  test("overlap carries the tail of the previous chunk") {
    val s = RecursiveSplitter(chunkSize = 10, chunkOverlap = 4)
    val out = s.split("one two three four five")
    // With overlap, consecutive chunks share trailing words.
    val shared = out.sliding(2).exists {
      case Seq(a, b) => a.split(" ").lastOption.exists(b.split(" ").contains)
      case _         => false
    }
    assert(shared, out.toString)
  }

  test("fixed strategy splits by characters") {
    val s = Splitter.forStrategy("fixed", chunkSize = 4)
    val out = s.split("abcdefghij")
    assert(out === Seq("abcd", "efgh", "ij"))
  }

  test("oversized words char-split via the empty separator; kept whole without it") {
    // Default separators end in "" → long words are character-chunked.
    val s = RecursiveSplitter(chunkSize = 5)
    assert(s.split("abcdefghij xy").mkString === "abcdefghijxy")
    assert(s.split("abcdefghij xy").forall(_.length <= 5))
    // No "" fallback → the oversized part is kept whole (splitter.go:160-166).
    val noFallback = RecursiveSplitter(chunkSize = 5, separators = Seq(" "))
    assert(noFallback.split("abcdefghij xy").contains("abcdefghij"))
  }

  test("markdown strategy prefers header boundaries") {
    val s = Splitter.forStrategy("markdown", chunkSize = 30)
    val out = s.split("intro text\n## Section A\nbody a\n## Section B\nbody b")
    assert(out.size >= 2)
    assert(out.flatMap(_.split("\n")).mkString(" ").contains("Section A"))
  }
}

package graft.text

import scala.annotation.tailrec

/** S10 — text splitters, a faithful port of the reference's
  * `RecursiveCharacterSplitter` (`pkg/rag/splitter.go:22-230`): try
  * separators in order, recurse into oversized parts with the remaining
  * separators, then re-stitch pieces up to `chunkSize` with a greedy
  * tail-overlap (`mergeSplits` + `removeFirstUntilOverlap`).
  *
  * Pure function of the input — used inside Spark via `flatMap`/`explode`
  * (each document splits independently; perfectly data-parallel).
  */
final case class RecursiveSplitter(
    chunkSize: Int = 500,
    chunkOverlap: Int = 0,
    separators: Seq[String] = Seq("\n\n", "\n", " ", "")) {

  def split(text: String): Seq[String] = {
    val goodSplits = recursiveSplit(text, separators.toList)
    // Top-level final merge (SplitText, splitter.go:90-125): concatenation
    // without separator, greedy reset on overflow.
    val out = Seq.newBuilder[String]
    var current = ""
    for (s <- goodSplits) {
      if (current.length + s.length > chunkSize && current.nonEmpty) {
        out += current
        current = ""
      }
      current += s
    }
    if (current.nonEmpty) out += current
    out.result()
  }

  private def recursiveSplit(text: String, seps: List[String]): Seq[String] =
    seps match {
      case Nil => Seq(text)
      case sep :: rest =>
        val parts =
          if (sep.isEmpty) text.map(_.toString)
          else text.split(java.util.regex.Pattern.quote(sep), -1).toSeq
        if (parts.length == 1 && sep.nonEmpty) recursiveSplit(text, rest)
        else {
          val good = parts.filter(_.nonEmpty).flatMap { p =>
            if (p.length < chunkSize) Seq(p)
            else if (rest.nonEmpty) recursiveSplit(p, rest)
            else Seq(p)
          }
          mergeSplits(good, sep)
        }
    }

  /** splitter.go:180-230 — combine small pieces with the separator until
    * chunkSize, carrying a tail overlap into the next chunk.
    */
  private def mergeSplits(splits: Seq[String], separator: String): Seq[String] = {
    val sepLen = separator.length
    val merged = Seq.newBuilder[String]
    var current = Vector.empty[String]
    var currentLen = 0
    for (s <- splits) {
      val sLen = s.length
      if (currentLen + sLen + current.length * sepLen > chunkSize &&
        current.nonEmpty) {
        merged += current.mkString(separator)
        if (chunkOverlap > 0) {
          current = removeFirstUntilOverlap(current, sepLen)
          currentLen = current.map(_.length).sum +
            math.max(0, current.length - 1) * sepLen
        } else {
          current = Vector.empty
          currentLen = 0
        }
      }
      current :+= s
      currentLen += sLen
    }
    if (current.nonEmpty) merged += current.mkString(separator)
    merged.result()
  }

  @tailrec
  private def removeFirstUntilOverlap(parts: Vector[String], sepLen: Int): Vector[String] = {
    val total = parts.map(_.length).sum + math.max(0, parts.length - 1) * sepLen
    if (total <= chunkOverlap || parts.isEmpty) parts
    else removeFirstUntilOverlap(parts.tail, sepLen)
  }
}

object Splitter {
  /** Factory mirroring `NewSplitterFactory` (splitter.go:22-64). */
  def forStrategy(strategy: String, chunkSize: Int = 500, overlap: Int = 0): RecursiveSplitter =
    strategy match {
      case "markdown" | "md" =>
        RecursiveSplitter(chunkSize, overlap, Seq("\n## ", "\n### ", "\n\n", "\n", " ", ""))
      case "code" | "go" | "python" =>
        RecursiveSplitter(chunkSize, overlap, Seq("\nfunc", "\ntype", "\nclass", "\n\n", "\n", " ", ""))
      case "fixed" =>
        RecursiveSplitter(chunkSize, overlap, Seq(""))
      case _ =>
        RecursiveSplitter(chunkSize, overlap)
    }
}

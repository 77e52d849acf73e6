package graft

import org.scalatest.funsuite.AnyFunSuite

/** Source lint locking in the higher-order-function lesson this repo has
  * now hit twice (bigrams in round 2, repetition scoring in round 3): a
  * lambda that references `split(text)` re-evaluates the split once PER
  * ELEMENT — quadratic in document length (measured 6.7 s vs 0.6 s at
  * sf0.1). The fix is always to materialize the token array in its own
  * projection first (Curation.tokenized, Dedup.shingleDocs). This spec
  * scans every main-source file and fails if a `split(` call appears
  * inside the balanced-paren span of an array higher-order function whose
  * argument list contains a lambda (`=>`). */
class HofLintSpec extends AnyFunSuite {

  // array HOFs whose lambdas execute per element; DataFrame.filter/agg are
  // excluded because their spans carry no lambda at call sites here (the
  // `=>` requirement keeps ordinary Column filters out anyway)
  private val hofs = Seq("transform(", "zip_with(", "aggregate(",
    "exists(", "forall(", "array_sort(")

  private def spans(src: String, opener: String): Seq[String] = {
    var out = List.empty[String]
    var from = src.indexOf(opener)
    while (from >= 0) {
      var depth = 1
      var i = from + opener.length
      while (depth > 0 && i < src.length) {
        src.charAt(i) match {
          case '(' => depth += 1
          case ')' => depth -= 1
          case _ =>
        }
        i += 1
      }
      out ::= src.substring(from, i)
      from = src.indexOf(opener, from + 1)
    }
    out
  }

  test("no split() inside array higher-order-function lambdas") {
    val root = java.nio.file.Paths.get("src/main/scala/graft")
    val files = java.nio.file.Files.walk(root).iterator()
    val bad = scala.collection.mutable.ArrayBuffer.empty[String]
    files.forEachRemaining { p =>
      if (p.toString.endsWith(".scala")) {
        val src = new String(java.nio.file.Files.readAllBytes(p))
        for {
          h <- hofs
          span <- spans(src, h)
          if span.contains("=>") && span.contains("split(")
        } bad += s"$p: ${span.linesIterator.next().take(100)}"
      }
    }
    assert(bad.isEmpty,
      "split() inside a HOF lambda re-splits per element " +
        "(materialize the token array first):\n" + bad.mkString("\n"))
  }
}

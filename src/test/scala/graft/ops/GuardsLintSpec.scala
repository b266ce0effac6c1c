package graft.ops

import org.scalatest.funsuite.AnyFunSuite

/** Source lint that makes the one-row-broadcast convention STRUCTURAL:
  * every `crossJoin(broadcast(...))` in the main tree must route its
  * broadcast side through `Guards.scalar` (one-row contract) or
  * `Guards.bounded` (documented small-constant table), so a future
  * refactor that turns a scalar into a multi-row frame fails loudly at
  * run time instead of silently becoming a real cartesian. The single
  * allowed raw form is inside Guards.scala itself (doc text). */
class GuardsLintSpec extends AnyFunSuite {

  test("every crossJoin(broadcast(...)) in src/main routes through Guards") {
    val root = java.nio.file.Paths.get("src/main/scala/graft")
    val bad = scala.collection.mutable.ArrayBuffer.empty[String]
    val pat = java.util.regex.Pattern.compile(
      "crossJoin\\(\\s*broadcast\\(\\s*(?!graft\\.ops\\.Guards\\.|Guards\\.)")
    java.nio.file.Files.walk(root).forEach { p =>
      if (p.toString.endsWith(".scala")
          && !p.getFileName.toString.equals("Guards.scala")) {
        val s = new String(java.nio.file.Files.readAllBytes(p), "UTF-8")
        val m = pat.matcher(s)
        while (m.find()) {
          val line = s.substring(0, m.start()).count(_ == '\n') + 1
          bad += s"$p:$line"
        }
      }
    }
    assert(bad.isEmpty,
      s"unguarded crossJoin(broadcast(...)) sites — wrap the broadcast side " +
        s"in Guards.scalar (one-row) or Guards.bounded (small-constant): " +
        s"${bad.mkString(", ")}")
  }
}

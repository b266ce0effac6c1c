package graft.ops

import org.scalatest.funsuite.AnyFunSuite

/** Source lint that makes the loop-audit convention STRUCTURAL (the
  * round-14 verdict's last silent-demotion hole): every hand-rolled
  * DataFrame loop in the main tree — a `var` reassigned to a frame
  * expression inside a `for`/`while` body — must sit in a method that
  * requests a [[PlanProbe]] loop id (or routes through
  * [[IterativeLoop]], whose combinators request one themselves).
  * Without the id, PlanCheck's probe-independence gate
  * ([[PlanProbe.requireAllLoopsCaptured]]) cannot see the loop at all,
  * and the query silently records as `linear-by-plan` in the ×10
  * registry — exactly how `Graph.bfsHops` hid q413_diameter's 2×16-round
  * BFS for two rounds.
  *
  * Heuristic, deliberately conservative: a frame reassignment is a
  * statement `name = <expr>` where `name` was `var`-declared in the same
  * method and `<expr>` calls a frame combinator (`.join(`/`.union`/
  * `.groupBy(`/`lazyCut(`/`lineageCut`). Driver-side Scala-state loops
  * (Quantiles' interval refinement, BPE's merge list) reassign plain
  * collections and are not flagged. `graft/tools` is excluded — dev
  * tools (BuildX10's replica union) are not catalog plans.
  */
class ProbeLintSpec extends AnyFunSuite {

  private val frameRhs =
    Seq(".join(", ".union", ".groupBy(", "lazyCut(", "lineageCut")

  test("every hand-rolled DataFrame loop in src/main requests a PlanProbe loop id") {
    val root = java.nio.file.Paths.get("src/main/scala/graft")
    val bad = scala.collection.mutable.ArrayBuffer.empty[String]
    java.nio.file.Files.walk(root).forEach { p =>
      val name = p.getFileName.toString
      if (p.toString.endsWith(".scala")
          && !p.toString.contains("/tools/")
          && name != "IterativeLoop.scala" && name != "PlanProbe.scala") {
        val s = new String(java.nio.file.Files.readAllBytes(p), "UTF-8")
        val lines = s.linesIterator.toVector
        // method boundaries: lines starting a `def` at any indent
        val defStarts = lines.zipWithIndex
          .collect { case (l, i) if l.matches("\\s*(private\\s+|final\\s+)*def .*") => i }
        def methodOf(i: Int): (Int, Int) = {
          val start = defStarts.filter(_ <= i).lastOption.getOrElse(0)
          val end = defStarts.find(_ > i).getOrElse(lines.length)
          (start, end)
        }
        // loop headers
        val loopHeads = lines.zipWithIndex.collect {
          case (l, i) if l.matches(".*\\b(for|while)\\s*\\(.*") => i
        }
        loopHeads.foreach { lh =>
          val (mStart, mEnd) = methodOf(lh)
          val method = lines.slice(mStart, mEnd)
          val varNames = method.flatMap(
            "\\bvar\\s+([A-Za-z_]\\w*)".r.findAllMatchIn(_).map(_.group(1)))
          // scan the ~40 lines after the loop head (bounded loop bodies)
          val body = lines.slice(lh + 1, math.min(mEnd, lh + 41))
          val reassignsFrame = body.zipWithIndex.exists { case (l, off) =>
            varNames.exists { v =>
              l.matches(s"\\s*$v\\s*=[^=].*") && {
                // RHS may continue over following lines: take 4
                val rhs = body.slice(off, math.min(body.length, off + 4)).mkString("\n")
                frameRhs.exists(rhs.contains)
              }
            }
          }
          if (reassignsFrame) {
            val probed = method.exists(l =>
              l.contains("PlanProbe.loopId") || l.contains("IterativeLoop."))
            if (!probed) bad += s"$p:${lh + 1}"
          }
        }
      }
    }
    assert(bad.isEmpty,
      "hand-rolled DataFrame loop(s) without PlanProbe.loopId() — the plan " +
        "audit cannot see them and the x10 registry records their queries " +
        s"as linear-by-plan: ${bad.mkString(", ")}")
  }
}

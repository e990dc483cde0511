package graft

import org.scalatest.funsuite.AnyFunSuite

/** The concurrent-construction helper's contract (r17 optimization): the
  * evaluation matrices build independent cells through [[Par.ordered]],
  * and their union order / guard-exception determinism must not depend
  * on thread scheduling. */
class ParSpec extends AnyFunSuite {

  test("ordered preserves input order regardless of completion order") {
    val out = Par.ordered(Seq(30, 1, 20, 2, 10)) { ms =>
      Thread.sleep(ms.toLong); ms
    }
    assert(out === Seq(30, 1, 20, 2, 10))
  }

  test("first failure BY POSITION propagates, not the first by wall-clock") {
    val ex = intercept[IllegalArgumentException] {
      Par.ordered(Seq("slow-fail", "fast-fail")) {
        case "slow-fail" =>
          Thread.sleep(120)
          throw new IllegalArgumentException("positional-first")
        case "fast-fail" =>
          throw new IllegalArgumentException("wall-clock-first")
      }
    }
    assert(ex.getMessage === "positional-first",
      "the FIRST input's failure must win even when a later input fails sooner")
  }

  test("single-element and empty inputs run inline") {
    assert(Par.ordered(Seq(7))(_ * 2) === Seq(14))
    assert(Par.ordered(Seq.empty[Int])(_ * 2) === Seq.empty)
  }
}

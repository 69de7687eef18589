package graft

import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.expr.SafeEval
import graft.expr.SafeEval._

/** Property-based differential test for the safe_eval compiler: random
  * expression trees are evaluated both by the compiled Catalyst Column
  * (through Spark) and by a tiny in-test interpreter implementing
  * Python's semantics (floor division/modulo toward -inf, truthiness,
  * value-returning and/or). Results must agree exactly.
  */
class SafeEvalPropSpec extends SparkSpec {
  import spark.implicits._

  private lazy val df = Seq(1).toDF("dummy")

  // ---- generator: arithmetic/boolean trees over int literals --------

  private def leaf: Gen[Ast] = Gen.choose(-99L, 99L).map(Lit(_))

  private def arith(depth: Int): Gen[Ast] =
    if (depth == 0) leaf
    else Gen.frequency(
      2 -> leaf,
      2 -> (for {
        op <- Gen.oneOf("+", "-", "*")
        l <- arith(depth - 1); r <- arith(depth - 1)
      } yield BinOp(op, l, r)),
      1 -> (for {
        op <- Gen.oneOf("//", "%")
        l <- arith(depth - 1)
        r <- Gen.choose(1L, 20L).flatMap(v =>
          Gen.oneOf(v, -v)).map(Lit(_)) // non-zero divisor, either sign
      } yield BinOp(op, l, r)),
      1 -> arith(depth - 1).map(UnaryOp("-", _)))

  private def boolTree(depth: Int): Gen[Ast] =
    if (depth == 0) arith(1)
    else Gen.frequency(
      2 -> (for {
        op <- Gen.oneOf("<", "<=", ">", ">=", "==", "!=")
        l <- arith(depth - 1); r <- arith(depth - 1)
      } yield Compare(l, Seq(op), Seq(r))),
      2 -> (for {
        op <- Gen.oneOf("and", "or")
        l <- boolTree(depth - 1); r <- boolTree(depth - 1)
      } yield BoolOp(op, Seq(l, r))),
      1 -> boolTree(depth - 1).map(UnaryOp("not", _)),
      1 -> (for {
        c <- boolTree(depth - 1); t <- arith(1); f <- arith(1)
      } yield Ternary(c, t, f)))

  // ---- reference interpreter (python semantics for longs) -----------

  private def truthy(v: Any): Boolean = v match {
    case b: Boolean => b
    case l: Long => l != 0L
    case _ => v != null
  }

  private def pyEval(a: Ast): Any = a match {
    case Lit(v) => v
    case UnaryOp("-", e) => -pyEval(e).asInstanceOf[Long]
    case UnaryOp("not", e) => !truthy(pyEval(e))
    case BinOp(op, l, r) =>
      val (x, y) = (pyEval(l).asInstanceOf[Long], pyEval(r).asInstanceOf[Long])
      op match {
        case "+" => x + y
        case "-" => x - y
        case "*" => x * y
        case "//" => Math.floorDiv(x, y) // python floors toward -inf
        case "%" => Math.floorMod(x, y) // python mod sign follows divisor
      }
    case Compare(l, Seq(op), Seq(r)) =>
      val (x, y) = (pyEval(l).asInstanceOf[Long], pyEval(r).asInstanceOf[Long])
      op match {
        case "<" => x < y; case "<=" => x <= y; case ">" => x > y
        case ">=" => x >= y; case "==" => x == y; case "!=" => x != y
      }
    case BoolOp("and", Seq(l, r)) =>
      val lv = pyEval(l); if (truthy(lv)) pyEval(r) else lv
    case BoolOp("or", Seq(l, r)) =>
      val lv = pyEval(l); if (truthy(lv)) lv else pyEval(r)
    case Ternary(c, t, f) => if (truthy(pyEval(c))) pyEval(t) else pyEval(f)
    case other => fail(s"unexpected node $other")
  }

  private def sparkEval(a: Ast): Any =
    df.select(SafeEval.compileTyped(a, df.schema).col.as("r")).head().get(0)

  private def norm(v: Any): Any = v match {
    case d: Double if d.isWhole => d.toLong // `//` comes back long-cast already; safety
    case b: Boolean => if (b) 1L else 0L // python bool IS int (True == 1)
    case i: Int => i.toLong
    case other => other
  }

  private def samples(g: Gen[Ast], n: Int): Seq[Ast] =
    (0 until n).flatMap(i => g(Gen.Parameters.default, Seed(i.toLong)))

  test("compiled arithmetic matches python semantics on 200 random trees") {
    samples(arith(3), 200).foreach { ast =>
      assert(norm(sparkEval(ast)) == norm(pyEval(ast)), s"ast: $ast")
    }
  }

  test("compiled boolean/comparison/ternary matches python semantics on 200 random trees") {
    samples(boolTree(3), 200).foreach { ast =>
      assert(norm(sparkEval(ast)) == norm(pyEval(ast)), s"ast: $ast")
    }
  }
}

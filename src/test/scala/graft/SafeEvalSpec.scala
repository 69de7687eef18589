package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import graft.expr.SafeEval

/** Semantics lock for the safe_eval→Column compiler, against a table
  * of expressions with hand-computed Python results (mirroring
  * `safe_eval.py`'s own test surface).
  */
class SafeEvalSpec extends SparkSpec {
  import spark.implicits._

  // one row: output=5, name="hello world", flag=true, empty="", zero=0,
  // score=2.5, items=[1,2,3], none_col=null
  private lazy val df = Seq(
    (5L, "hello world", true, "", 0L, 2.5, Seq(1L, 2L, 3L))
  ).toDF("output", "name", "flag", "empty", "zero", "score", "items")
    .withColumn("none_col", lit(null).cast("string"))

  private def eval(expr: String): Any =
    df.select(SafeEval.compile(expr, df.schema).as("r")).head().get(0)

  private def pred(expr: String): Boolean =
    df.select(SafeEval.predicate(expr, df.schema).as("r")).head().getBoolean(0)

  test("arithmetic: + - * / // % **") {
    assert(eval("output + 2") == 7L)
    assert(eval("output - 7") == -2L)
    assert(eval("output * 3") == 15L)
    assert(eval("output / 2") == 2.5) // true division
    assert(eval("output // 2") == 2L) // floor division
    assert(eval("output % 3") == 2L)
    assert(eval("2 ** 3") == 8.0)
    assert(eval("-output") == -5L)
  }

  test("bitwise and shifts") {
    assert(eval("output << 1") == 10L)
    assert(eval("output >> 1") == 2L)
    assert(eval("output | 2") == 7L)
    assert(eval("output & 1") == 1L)
    assert(eval("output ^ 1") == 4L)
  }

  test("comparisons incl. chained (`a < b < c`)") {
    assert(pred("output > 3"))
    assert(pred("3 < output < 10"))
    assert(!pred("3 < output < 5"))
    assert(pred("output == 5"))
    assert(pred("output != 4"))
  }

  test("membership: in / not in on arrays, strings, dicts") {
    assert(pred("2 in items"))
    assert(!pred("9 in items"))
    assert(pred("9 not in items"))
    assert(pred("'hello' in name"))
    assert(pred("output in [1, 5, 7]"))
    assert(pred("'a' in {'a': 1, 'b': 2}"))
  }

  test("is / is not None") {
    assert(pred("none_col is None"))
    assert(!pred("name is None"))
    assert(pred("name is not None"))
  }

  test("python truthiness: '' 0 [] None are falsy") {
    assert(!pred("empty"))
    assert(!pred("zero"))
    assert(!pred("none_col"))
    assert(pred("name"))
    assert(pred("output"))
    assert(pred("flag"))
    assert(pred("items"))
  }

  test("and/or return operand values (python semantics)") {
    assert(eval("zero or output") == 5L) // falsy or x -> x
    assert(eval("output or zero") == 5L) // truthy or _ -> first
    assert(eval("output and zero") == 0L) // truthy and x -> x
    assert(eval("zero and output") == 0L) // falsy and _ -> first
    assert(eval("empty or name") == "hello world")
  }

  test("not and ternary") {
    assert(pred("not empty"))
    assert(!pred("not name"))
    assert(eval("1 if output > 3 else 2") == 1L)
    assert(eval("1 if output > 9 else 2") == 2L)
  }

  test("whitelisted functions: int float str bool len abs round min max sum") {
    assert(eval("int(score)") == 2L)
    assert(eval("float(output)") == 5.0)
    assert(eval("str(output)") == "5")
    assert(eval("bool(zero)") == false)
    assert(eval("len(name)") == 11)
    assert(eval("len(items)") == 3)
    assert(eval("abs(0 - output)") == 5L)
    assert(eval("round(score)") == 2.0) // python banker's rounding: round(2.5) == 2
    assert(eval("min(output, 3)") == 3L)
    assert(eval("max(output, 3)") == 5L)
    assert(eval("min(items)") == 1L)
    assert(eval("sum(items)") == 6L)
  }

  test("string methods: lower upper strip startswith endswith split subscription") {
    assert(eval("name.upper()") == "HELLO WORLD")
    assert(eval("'  x  '.strip()") == "x")
    assert(pred("name.startswith('hello')"))
    assert(pred("name.endswith('world')"))
    assert(eval("name.split(' ')").asInstanceOf[scala.collection.Seq[_]].toSeq == Seq("hello", "world"))
    assert(eval("name.split()").asInstanceOf[scala.collection.Seq[_]].toSeq == Seq("hello", "world"))
    assert(eval("name[0]") == "h")
    assert(eval("items[1]") == 2L)
    // python negative indices count from the end
    assert(eval("items[-1]") == 3L)
    assert(eval("items[-3]") == 1L)
    assert(eval("name[-1]") == "d")
    assert(eval("name[-5]") == "w")
  }

  test("dict methods: get keys values") {
    assert(eval("{'a': 1, 'b': 2}.get('a')") == 1L)
    assert(eval("{'a': 1}.get('z', 9)") == 9L)
    assert(eval("{'a': 1, 'b': 2}.keys()").asInstanceOf[scala.collection.Seq[_]].toSeq == Seq("a", "b"))
  }

  test("eval failure → predicate false (`edge.py:200-204`)") {
    // unknown name fails at compile; a null-producing expression at runtime → false
    assert(!pred("none_col.upper() == 'X'"))
    intercept[SafeEval.SafeEvalError] { SafeEval.compile("no_such_col > 1", df.schema) }
  }

  test("private attribute access is blocked (`safe_eval.py:146-171`)") {
    intercept[SafeEval.SafeEvalError] { SafeEval.parse("name._private") }
  }

  test("non-whitelisted calls are blocked") {
    intercept[SafeEval.SafeEvalError] { SafeEval.compile("open('/etc/passwd')", df.schema) }
    intercept[SafeEval.SafeEvalError] {
      SafeEval.compile("name.replace('a','b')", df.schema)
    }
  }

  test("filter integration: edge-condition shape over a real table") {
    graft.core.Engine.open(spark, sfDir)
    val events = graft.core.Engine.table(spark, sfDir, "events")
    val n = events.filter(
      SafeEval.predicate("value > 100 and event_type != 'error'", events.schema)).count()
    val expected = events.filter(col("value") > 100 && col("event_type") =!= "error").count()
    assert(n == expected && n > 0)
  }
}

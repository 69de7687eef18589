package graft.expr

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Compiler from the reference's safe expression language
  * (`core/framework/graph/safe_eval.py:56-253` — a whitelisted Python
  * expression subset used as the predicate/projection language on graph
  * edges) to Catalyst `Column`s.
  *
  * Semantics preserved from the reference:
  *  - Python truthiness ('' / 0 / [] / {} / None are false) — bridged
  *    per compile-time type (`safe_eval.py:117-130`).
  *  - `and`/`or` return operand values, not booleans; all operands are
  *    evaluated (non-short-circuit, `safe_eval.py:117-123`).
  *  - chained comparisons `a < b < c` (`safe_eval.py:105-115`).
  *  - whitelisted calls `int float str bool len min max sum abs round
  *    all any` and methods `.lower .upper .strip .split .get .keys
  *    .values .items` (`safe_eval.py:36-52, 199-208`).
  *  - attribute access with private-underscore block
  *    (`safe_eval.py:146-171`).
  *  - evaluation failure → predicate false (`edge.py:200-204`):
  *    [[predicate]] wraps the compiled expression in coalesce(_, false).
  *
  * Compiling to `Column` (instead of interpreting per row) means edge
  * predicates run inside whole-stage codegen at full scan speed — the
  * 100 TB path needs no interpreter.
  */
object SafeEval {

  // ============================================================ AST

  sealed trait Ast
  final case class Lit(v: Any) extends Ast
  final case class Name(id: String) extends Ast
  final case class ListLit(items: Seq[Ast]) extends Ast
  final case class DictLit(items: Seq[(Ast, Ast)]) extends Ast
  final case class BinOp(op: String, l: Ast, r: Ast) extends Ast
  final case class UnaryOp(op: String, e: Ast) extends Ast
  final case class BoolOp(op: String, items: Seq[Ast]) extends Ast
  final case class Compare(left: Ast, ops: Seq[String], rights: Seq[Ast]) extends Ast
  final case class Ternary(cond: Ast, ifTrue: Ast, ifFalse: Ast) extends Ast
  final case class Call(fn: String, args: Seq[Ast]) extends Ast
  final case class Method(obj: Ast, name: String, args: Seq[Ast]) extends Ast
  final case class Attr(obj: Ast, name: String) extends Ast
  final case class Subscript(obj: Ast, index: Ast) extends Ast

  final case class SafeEvalError(msg: String) extends IllegalArgumentException(msg)

  // ======================================================== Tokenizer

  private sealed trait Tok
  private case class TNum(v: Any) extends Tok
  private case class TStr(v: String) extends Tok
  private case class TName(v: String) extends Tok
  private case class TOp(v: String) extends Tok
  private case object TEnd extends Tok

  private val multiOps = Seq("**", "//", "<<", ">>", "<=", ">=", "==", "!=")
  private val singleOps = "+-*/%<>|^&~()[]{},:.".toSet

  private def tokenize(s: String): Vector[Tok] = {
    val out = Vector.newBuilder[Tok]
    var i = 0
    while (i < s.length) {
      val c = s(i)
      if (c.isWhitespace) i += 1
      else if (c.isDigit || (c == '.' && i + 1 < s.length && s(i + 1).isDigit)) {
        val start = i
        while (i < s.length && (s(i).isDigit || s(i) == '.' || s(i) == 'e' || s(i) == 'E' ||
          ((s(i) == '+' || s(i) == '-') && i > start && (s(i - 1) == 'e' || s(i - 1) == 'E')))) i += 1
        val text = s.substring(start, i)
        out += TNum(if (text.exists(ch => ch == '.' || ch == 'e' || ch == 'E')) text.toDouble else text.toLong)
      } else if (c == '\'' || c == '"') {
        val quote = c
        val sb = new StringBuilder
        i += 1
        while (i < s.length && s(i) != quote) {
          if (s(i) == '\\' && i + 1 < s.length) {
            i += 1
            sb += (s(i) match {
              case 'n' => '\n'; case 't' => '\t'; case 'r' => '\r'
              case other => other
            })
          } else sb += s(i)
          i += 1
        }
        if (i >= s.length) throw SafeEvalError(s"unterminated string literal")
        i += 1
        out += TStr(sb.toString)
      } else if (c.isLetter || c == '_') {
        val start = i
        while (i < s.length && (s(i).isLetterOrDigit || s(i) == '_')) i += 1
        out += TName(s.substring(start, i))
      } else if (i + 1 < s.length && multiOps.contains(s.substring(i, i + 2))) {
        out += TOp(s.substring(i, i + 2)); i += 2
      } else if (singleOps(c)) {
        out += TOp(c.toString); i += 1
      } else throw SafeEvalError(s"unexpected character '$c' at $i")
    }
    out += TEnd
    out.result()
  }

  // =========================================================== Parser

  private final class Parser(toks: Vector[Tok]) {
    private var pos = 0
    private def peek: Tok = toks(pos)
    private def next(): Tok = { val t = toks(pos); pos += 1; t }
    private def expectOp(op: String): Unit = next() match {
      case TOp(`op`) => ()
      case other => throw SafeEvalError(s"expected '$op', got $other")
    }
    private def isName(v: String): Boolean = peek == TName(v)
    private def isOp(v: String): Boolean = peek == TOp(v)

    def parse(): Ast = {
      val e = ternary()
      if (peek != TEnd) throw SafeEvalError(s"trailing tokens at $pos: $peek")
      e
    }

    private def ternary(): Ast = {
      val e = orExpr()
      if (isName("if")) {
        next()
        val cond = orExpr()
        if (!isName("else")) throw SafeEvalError("ternary requires else")
        next()
        Ternary(cond, e, ternary())
      } else e
    }

    private def orExpr(): Ast = {
      var items = Seq(andExpr())
      while (isName("or")) { next(); items :+= andExpr() }
      if (items.size == 1) items.head else BoolOp("or", items)
    }

    private def andExpr(): Ast = {
      var items = Seq(notExpr())
      while (isName("and")) { next(); items :+= notExpr() }
      if (items.size == 1) items.head else BoolOp("and", items)
    }

    private def notExpr(): Ast =
      if (isName("not")) { next(); UnaryOp("not", notExpr()) } else comparison()

    private def comparison(): Ast = {
      val left = bitOr()
      var ops = Seq.empty[String]
      var rights = Seq.empty[Ast]
      var going = true
      while (going) {
        peek match {
          case TOp(o) if Seq("==", "!=", "<", "<=", ">", ">=").contains(o) =>
            next(); ops :+= o; rights :+= bitOr()
          case TName("in") => next(); ops :+= "in"; rights :+= bitOr()
          case TName("not") =>
            next()
            if (!isName("in")) throw SafeEvalError("expected 'in' after 'not'")
            next(); ops :+= "not in"; rights :+= bitOr()
          case TName("is") =>
            next()
            val op = if (isName("not")) { next(); "is not" } else "is"
            ops :+= op; rights :+= bitOr()
          case _ => going = false
        }
      }
      if (ops.isEmpty) left else Compare(left, ops, rights)
    }

    private def binLevel(ops: Seq[String], sub: () => Ast): Ast = {
      var e = sub()
      var going = true
      while (going) {
        peek match {
          case TOp(o) if ops.contains(o) => next(); e = BinOp(o, e, sub())
          case _ => going = false
        }
      }
      e
    }

    private def bitOr(): Ast = binLevel(Seq("|"), () => bitXor())
    private def bitXor(): Ast = binLevel(Seq("^"), () => bitAnd())
    private def bitAnd(): Ast = binLevel(Seq("&"), () => shift())
    private def shift(): Ast = binLevel(Seq("<<", ">>"), () => arith())
    private def arith(): Ast = binLevel(Seq("+", "-"), () => term())
    private def term(): Ast = binLevel(Seq("*", "/", "//", "%"), () => factor())

    private def factor(): Ast = peek match {
      case TOp("-") => next(); UnaryOp("-", factor())
      case TOp("+") => next(); UnaryOp("+", factor())
      case TOp("~") => next(); UnaryOp("~", factor())
      case _ => power()
    }

    private def power(): Ast = {
      val base = postfix()
      if (isOp("**")) { next(); BinOp("**", base, factor()) } else base
    }

    private def postfix(): Ast = {
      var e = atom()
      var going = true
      while (going) {
        peek match {
          case TOp(".") =>
            next()
            val name = next() match {
              case TName(n) => n
              case other => throw SafeEvalError(s"expected attribute name, got $other")
            }
            if (name.startsWith("_")) throw SafeEvalError(s"private attribute '$name' blocked")
            if (isOp("(")) {
              next()
              e = Method(e, name, callArgs())
            } else e = Attr(e, name)
          case TOp("[") =>
            next()
            val idx = ternary()
            expectOp("]")
            e = Subscript(e, idx)
          case TOp("(") =>
            e match {
              case Name(fn) => next(); e = Call(fn, callArgs())
              case _ => throw SafeEvalError("only whitelisted function calls allowed")
            }
          case _ => going = false
        }
      }
      e
    }

    private def callArgs(): Seq[Ast] = {
      var args = Seq.empty[Ast]
      if (!isOp(")")) {
        args :+= ternary()
        while (isOp(",")) { next(); args :+= ternary() }
      }
      expectOp(")")
      args
    }

    private def atom(): Ast = next() match {
      case TNum(v) => Lit(v)
      case TStr(v) => Lit(v)
      case TName("True") => Lit(true)
      case TName("False") => Lit(false)
      case TName("None") => Lit(null)
      case TName(n) => Name(n)
      case TOp("(") =>
        val e = ternary()
        if (isOp(",")) { // tuple → list semantics
          var items = Seq(e)
          while (isOp(",")) { next(); if (!isOp(")")) items :+= ternary() }
          expectOp(")")
          ListLit(items)
        } else { expectOp(")"); e }
      case TOp("[") =>
        var items = Seq.empty[Ast]
        if (!isOp("]")) {
          items :+= ternary()
          while (isOp(",")) { next(); if (!isOp("]")) items :+= ternary() }
        }
        expectOp("]")
        ListLit(items)
      case TOp("{") =>
        var items = Seq.empty[(Ast, Ast)]
        if (!isOp("}")) {
          def entry(): Unit = {
            val k = ternary()
            expectOp(":")
            items :+= (k -> ternary())
          }
          entry()
          while (isOp(",")) { next(); if (!isOp("}")) entry() }
        }
        expectOp("}")
        DictLit(items)
      case other => throw SafeEvalError(s"unexpected token $other")
    }
  }

  def parse(expr: String): Ast = new Parser(tokenize(expr)).parse()

  // ========================================================= Compiler

  /** Compiled column + enough type info for truthiness bridging. */
  final case class Typed(col: Column, dt: DataType)

  private val Unknown: DataType = NullType

  /** Python truthiness per compile-time type (`safe_eval.py:117-130`):
    * None/''/0/[]/{} → false. Unknown types fall back to isNotNull.
    */
  def truthy(t: Typed): Column = t.dt match {
    case BooleanType => coalesce(t.col, lit(false))
    case StringType => coalesce(length(t.col) > 0, lit(false))
    case _: NumericType => coalesce(t.col =!= 0, lit(false))
    case _: ArrayType => coalesce(size(t.col) > 0, lit(false))
    case _: MapType => coalesce(size(map_keys(t.col)) > 0, lit(false))
    case NullType => lit(false)
    case _ => t.col.isNotNull
  }

  def compile(expr: String, schema: StructType): Column =
    compileTyped(parse(expr), schema).col

  /** Edge-predicate form: eval failure (null) → false
    * (`edge.py:200-204`), result coerced to boolean truthiness.
    *
    * Compiled in boolean context: and/or over boolean-valued children
    * become plain SQL conjunction/disjunction rather than the
    * value-returning CASE ladder. Under the final `coalesce(_, false)`
    * SQL's three-valued && / || produce identical truth values to the
    * python-truthiness bridge (unknown collapses to false either way),
    * and — unlike CASE — plain comparisons push down to the parquet
    * scan (locked by PlanAudit). `not` keeps the truthiness bridge:
    * python `not None` is True, which 3VL `!null` is not.
    */
  def predicate(expr: String, schema: StructType): Column =
    coalesce(booleanCtx(parse(expr), schema), lit(false))

  /** Filter-context form: same truth semantics as [[predicate]] under
    * `DataFrame.filter` (a null predicate drops the row, exactly what
    * coalesce-to-false does) but without the outer coalesce wrapper —
    * which is what lets the comparisons inside reach the parquet
    * scan's PushedFilters. Use this for edge conditions / row routing;
    * use [[predicate]] when projecting the boolean as a value.
    */
  def filterCondition(expr: String, schema: StructType): Column =
    booleanCtx(parse(expr), schema)

  private def booleanCtx(ast: Ast, schema: StructType): Column = ast match {
    case BoolOp(op, items) =>
      // plain 3VL is safe here: Kleene && / || are monotone in
      // F < U < T, so a null (U) child can never turn the tree true
      // where eager-false truthiness would not — the outer coalesce
      // collapses a U result to false either way. Keeping the children
      // coalesce-free is what lets comparisons reach PushedFilters.
      val cols = items.map(booleanCtx(_, schema))
      if (op == "and") cols.reduce(_ && _) else cols.reduce(_ || _)
    case UnaryOp("not", e) =>
      // `not` is NOT monotone (python: not None is True; 3VL: !U = U)
      !coalesce(booleanCtx(e, schema), lit(false))
    case Ternary(c, t, f) =>
      // when() already treats a null condition as false (python: else)
      when(booleanCtx(c, schema), booleanCtx(t, schema))
        .otherwise(booleanCtx(f, schema))
    case _ =>
      val typed = compileTyped(ast, schema)
      if (typed.dt == BooleanType) typed.col else truthy(typed)
  }

  def compileTyped(ast: Ast, schema: StructType): Typed = {
    def field(n: String): Option[StructField] = schema.fields.find(_.name == n)

    def go(a: Ast): Typed = a match {
      case Lit(null) => Typed(lit(null), NullType)
      case Lit(v: Long) => Typed(lit(v), LongType)
      case Lit(v: Double) => Typed(lit(v), DoubleType)
      case Lit(v: Boolean) => Typed(lit(v), BooleanType)
      case Lit(v: String) => Typed(lit(v), StringType)
      case Lit(v) => throw SafeEvalError(s"unsupported literal $v")

      case Name(n) => field(n) match {
        case Some(f) => Typed(col(n), f.dataType)
        case None => throw SafeEvalError(s"unknown name '$n' (not a column of the input)")
      }

      case ListLit(items) =>
        val ts = items.map(go)
        val elemDt = ts.headOption.map(_.dt).getOrElse(NullType)
        Typed(array(ts.map(_.col): _*), ArrayType(elemDt))

      case DictLit(items) =>
        val ks = items.map(i => go(i._1))
        val vs = items.map(i => go(i._2))
        val pairs = ks.zip(vs).flatMap { case (k, v) => Seq(k.col, v.col) }
        Typed(map(pairs: _*),
          MapType(ks.headOption.map(_.dt).getOrElse(StringType),
            vs.headOption.map(_.dt).getOrElse(StringType)))

      case Ternary(c, tE, fE) =>
        val (tv, fv) = (go(tE), go(fE))
        Typed(when(truthy(go(c)), tv.col).otherwise(fv.col), unify(tv.dt, fv.dt))

      case BoolOp(op, items) =>
        // Python returns the deciding operand's *value*. Uniform types
        // preserve that directly; mixed bool/numeric unify to the wide
        // numeric (python bool IS int: True == 1), since truthiness is
        // invariant under that cast. Other mixes (e.g. str|int, which a
        // single Column type cannot represent) bridge to boolean — the
        // predicate contexts the reference uses this language in
        // coerce to bool anyway (`edge.py:160-204`).
        val ts = items.map(go)
        def fold(ops: Seq[Typed]): Typed = ops.reduceLeft { (acc, nxt) =>
          val c = if (op == "and") when(truthy(acc), nxt.col).otherwise(acc.col)
                  else when(truthy(acc), acc.col).otherwise(nxt.col)
          Typed(c, acc.dt)
        }
        val dts = ts.map(_.dt).distinct
        if (dts.size == 1 && dts.head != NullType) fold(ts)
        else if (ts.forall(t => t.dt == BooleanType || t.dt.isInstanceOf[NumericType])) {
          val target = ts.map(_.dt)
            .map { case BooleanType => IntegerType; case d => d }
            .reduce(widen)
          fold(ts.map(t => Typed(t.col.cast(target), target)))
        } else {
          val bools = ts.map(truthy)
          Typed(if (op == "and") bools.reduce(_ && _) else bools.reduce(_ || _), BooleanType)
        }

      case UnaryOp("not", e) => Typed(!truthy(go(e)), BooleanType)
      case UnaryOp("-", e) => val t = go(e); Typed(negate(t.col), t.dt)
      case UnaryOp("+", e) => go(e)
      case UnaryOp("~", e) => val t = go(e); Typed(bitwise_not(t.col), t.dt)
      case UnaryOp(op, _) => throw SafeEvalError(s"unsupported unary op $op")

      case Compare(left, ops, rights) =>
        // chained a < b < c  →  a < b AND b < c (`safe_eval.py:105-115`)
        val operands = (left +: rights).map(go)
        val conds = ops.zipWithIndex.map { case (op, i) =>
          cmp(op, operands(i), operands(i + 1))
        }
        Typed(conds.reduce(_ && _), BooleanType)

      case BinOp(op, l, r) =>
        val (lt, rt) = (go(l), go(r))
        op match {
          case "+" if lt.dt == StringType || rt.dt == StringType =>
            Typed(concat(lt.col, rt.col), StringType)
          case "+" => arith(lt, rt)(_ + _)
          case "-" => arith(lt, rt)(_ - _)
          case "*" => arith(lt, rt)(_ * _)
          case "/" => Typed(lt.col.cast(DoubleType) / rt.col.cast(DoubleType), DoubleType)
          case "//" => Typed(floor(lt.col.cast(DoubleType) / rt.col.cast(DoubleType))
            .cast(widen(lt.dt, rt.dt)), widen(lt.dt, rt.dt))
          case "%" =>
            // python modulo: sign follows the divisor (floorMod), which
            // pmod only matches for positive divisors
            val dt = widen(lt.dt, rt.dt)
            val floored = floor(lt.col.cast(DoubleType) / rt.col.cast(DoubleType)).cast(dt)
            Typed(lt.col - rt.col * floored, dt)
          case "**" => Typed(pow(lt.col, rt.col), DoubleType)
          case "<<" => Typed(call_function("shiftleft", lt.col, rt.col.cast(IntegerType)), widen(lt.dt, rt.dt))
          case ">>" => Typed(call_function("shiftright", lt.col, rt.col.cast(IntegerType)), widen(lt.dt, rt.dt))
          case "|" => Typed(lt.col.bitwiseOR(rt.col), widen(lt.dt, rt.dt))
          case "^" => Typed(lt.col.bitwiseXOR(rt.col), widen(lt.dt, rt.dt))
          case "&" => Typed(lt.col.bitwiseAND(rt.col), widen(lt.dt, rt.dt))
          case other => throw SafeEvalError(s"unsupported operator $other")
        }

      case Attr(obj, name) =>
        val t = go(obj)
        t.dt match {
          case st: StructType =>
            val f = st.fields.find(_.name == name)
              .getOrElse(throw SafeEvalError(s"no field '$name' on struct"))
            Typed(t.col.getField(name), f.dataType)
          case _ => throw SafeEvalError(s"attribute access on non-struct type ${t.dt}")
        }

      case Subscript(obj, idx) =>
        val (t, i) = (go(obj), go(idx))
        t.dt match {
          case ArrayType(elem, _) =>
            // Python 0-based (negatives count from the end); element_at
            // is 1-based with the same negative-index semantics
            Typed(element_at(t.col,
              when(i.col >= 0, i.col + 1).otherwise(i.col).cast(IntegerType)), elem)
          case MapType(_, v, _) => Typed(element_at(t.col, i.col), v)
          case st: StructType => idx match {
            case Lit(name: String) =>
              val f = st.fields.find(_.name == name)
                .getOrElse(throw SafeEvalError(s"no field '$name' on struct"))
              Typed(t.col.getField(name), f.dataType)
            case _ => throw SafeEvalError("struct subscript requires a string literal")
          }
          case StringType =>
            // Python s[i] character access (0-based; substr is 1-based;
            // negatives count from the end)
            val pos = when(i.col >= 0, i.col + 1)
              .otherwise(length(t.col) + i.col + 1)
            Typed(t.col.substr(pos.cast(IntegerType), lit(1)), StringType)
          case other => throw SafeEvalError(s"subscript on $other unsupported")
        }

      case Call(fn, args) =>
        val ts = args.map(go)
        fn match {
          case "int" => Typed(ts.head.col.cast(LongType), LongType)
          case "float" => Typed(ts.head.col.cast(DoubleType), DoubleType)
          case "str" => Typed(ts.head.col.cast(StringType), StringType)
          case "bool" => Typed(truthy(ts.head), BooleanType)
          case "len" => ts.head.dt match {
            case StringType => Typed(length(ts.head.col), IntegerType)
            case _: ArrayType => Typed(size(ts.head.col), IntegerType)
            case _: MapType => Typed(size(map_keys(ts.head.col)), IntegerType)
            case other => throw SafeEvalError(s"len() on $other")
          }
          case "abs" => Typed(abs(ts.head.col), ts.head.dt)
          case "round" =>
            val scale = args.drop(1).headOption match {
              case Some(Lit(n: Long)) => n.toInt
              case None => 0
              case _ => throw SafeEvalError("round() scale must be an integer literal")
            }
            // bround = HALF_EVEN, matching python's banker's rounding
            Typed(bround(ts.head.col.cast(DoubleType), scale), DoubleType)
          case "min" | "max" =>
            if (ts.size == 1) ts.head.dt match {
              case ArrayType(e, _) =>
                Typed(if (fn == "min") array_min(ts.head.col) else array_max(ts.head.col), e)
              case other => throw SafeEvalError(s"$fn() on single $other")
            } else Typed(if (fn == "min") least(ts.map(_.col): _*) else greatest(ts.map(_.col): _*),
              ts.map(_.dt).reduce(widen))
          case "sum" => ts.head.dt match {
            case ArrayType(e, _) =>
              Typed(aggregate(ts.head.col, lit(0).cast(widen(e, LongType)), (acc, x) => acc + x),
                widen(e, LongType))
            case other => throw SafeEvalError(s"sum() on $other")
          }
          case "all" => Typed(forall(ts.head.col, x => coalesce(x.cast(BooleanType), lit(false))), BooleanType)
          case "any" => Typed(exists(ts.head.col, x => coalesce(x.cast(BooleanType), lit(false))), BooleanType)
          case other => throw SafeEvalError(s"function '$other' not whitelisted")
        }

      case Method(obj, name, args) =>
        val t = go(obj)
        val ts = args.map(go)
        (t.dt, name) match {
          case (StringType, "lower") => Typed(lower(t.col), StringType)
          case (StringType, "upper") => Typed(upper(t.col), StringType)
          case (StringType, "strip") => Typed(trim(t.col), StringType)
          case (StringType, "startswith") => Typed(t.col.startsWith(ts.head.col), BooleanType)
          case (StringType, "endswith") => Typed(t.col.endsWith(ts.head.col), BooleanType)
          case (StringType, "split") => args.headOption match {
            case Some(Lit(sep: String)) =>
              Typed(split(t.col, java.util.regex.Pattern.quote(sep)), ArrayType(StringType))
            case None =>
              // Python no-arg split: whitespace runs, empties dropped
              Typed(filter(split(trim(t.col), "\\s+"), x => length(x) > 0), ArrayType(StringType))
            case _ => throw SafeEvalError("split() separator must be a string literal")
          }
          case (MapType(_, v, _), "get") =>
            val default = if (ts.size > 1) ts(1).col else lit(null)
            Typed(coalesce(element_at(t.col, ts.head.col), default), v)
          case (MapType(k, _, _), "keys") => Typed(map_keys(t.col), ArrayType(k))
          case (MapType(_, v, _), "values") => Typed(map_values(t.col), ArrayType(v))
          case (MapType(k, v, _), "items") =>
            Typed(map_entries(t.col), ArrayType(StructType(Seq(
              StructField("key", k), StructField("value", v)))))
          case (dt, m) => throw SafeEvalError(s"method '$m' not allowed on $dt")
        }
    }

    go(ast)
  }

  private def cmp(op: String, l: Typed, r: Typed): Column = op match {
    case "==" => l.col === r.col
    case "!=" => l.col =!= r.col
    case "<" => l.col < r.col
    case "<=" => l.col <= r.col
    case ">" => l.col > r.col
    case ">=" => l.col >= r.col
    case "is" => if (r.dt == NullType) l.col.isNull else l.col <=> r.col
    case "is not" => if (r.dt == NullType) l.col.isNotNull else !(l.col <=> r.col)
    case "in" => r.dt match {
      case _: ArrayType => array_contains(r.col, l.col)
      case StringType => r.col.contains(l.col)
      case _: MapType => array_contains(map_keys(r.col), l.col)
      case other => throw SafeEvalError(s"'in' on $other unsupported")
    }
    case "not in" => !cmp("in", l, r)
    case other => throw SafeEvalError(s"comparison $other unsupported")
  }

  private def arith(l: Typed, r: Typed)(f: (Column, Column) => Column): Typed =
    Typed(f(l.col, r.col), widen(l.dt, r.dt))

  private def widen(a: DataType, b: DataType): DataType = (a, b) match {
    case (DoubleType, _) | (_, DoubleType) => DoubleType
    case (FloatType, _) | (_, FloatType) => DoubleType
    case (LongType, _) | (_, LongType) => LongType
    case (IntegerType, _) | (_, IntegerType) => IntegerType
    case (x, NullType) => x
    case (NullType, x) => x
    case (x, _) => x
  }

  private def unify(a: DataType, b: DataType): DataType =
    if (a == b) a else widen(a, b)
}

package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.FunctionRegistry
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.types._

/** DuckDB function-name surface for `sqlOverride` users (reference:
  * src/lib/pipelineRunner.js:73 hands users DuckDB SQL to edit and
  * re-run). Together with [[graft.compile.DuckSqlShim]] (which handles
  * the syntax-level deltas) this lets a DuckDB-dialect override run
  * unmodified: the function-NAME deltas from docs/sql-dialect.md are
  * registered here as session functions resolving to the native
  * Catalyst expressions Spark already codegens — aliases where a
  * builtin matches 1:1, thin expression compositions where it doesn't.
  * No UDFs anywhere; everything stays inside whole-stage codegen
  * except [[DuckRegexpReplace]] (CodegenFallback, dialect-surface
  * only — never in an engine-emitted plan).
  */
object DuckFunctions {

  /** DuckDB `len(x)`: BIGINT length of a list, map or string — Spark
    * splits this across `size` (INT) and `length` (INT); the dispatch
    * happens on the resolved child type and the result widens to
    * BIGINT for DuckDB parity.
    */
  case class DuckLen(child: Expression) extends RuntimeReplaceable {
    override lazy val replacement: Expression = child.dataType match {
      case _: ArrayType | _: MapType => Cast(Size(child), LongType)
      case _                         => Cast(Length(child), LongType)
    }
    override def children: Seq[Expression] = Seq(child)
    override protected def withNewChildrenInternal(
        newChildren: IndexedSeq[Expression]): Expression = copy(child = newChildren.head)
  }

  /** DuckDB `list_sum(l)`: a left-to-right fold skipping NULL elements
    * (DuckDB aggregate semantics). Integrals fold in BIGINT, decimals
    * in their own type, floats in DOUBLE.
    *
    * @note delta vs DuckDB: an empty or all-NULL list yields the fold
    *       zero (0), where DuckDB yields NULL; and BIGINT sums do not
    *       widen to HUGEINT (overflow raises under ANSI).
    */
  case class DuckListSum(child: Expression) extends RuntimeReplaceable {
    override lazy val replacement: Expression = {
      val elemType = child.dataType match {
        case ArrayType(et, _) => et
        case other =>
          throw new IllegalArgumentException(s"list_sum expects an array, got $other")
      }
      val (accType, zero) = elemType match {
        case ByteType | ShortType | IntegerType | LongType => (LongType, Literal(0L))
        case d: DecimalType => (d, Literal(Decimal(0), d))
        case _              => (DoubleType, Literal(0.0))
      }
      val acc  = NamedLambdaVariable("acc", accType, nullable = true)
      val x    = NamedLambdaVariable("x", elemType, nullable = true)
      val merge = LambdaFunction(
        If(IsNull(x), acc, Add(acc, Cast(x, accType))), Seq(acc, x))
      val accF = NamedLambdaVariable("acc", accType, nullable = true)
      val fin  = LambdaFunction(accF, Seq(accF))
      ArrayAggregate(child, zero, merge, fin)
    }
    override def children: Seq[Expression] = Seq(child)
    override protected def withNewChildrenInternal(
        newChildren: IndexedSeq[Expression]): Expression = copy(child = newChildren.head)
  }

  /** DuckDB `list_slice(l, begin, end[, step])` / `l[begin:end]` slice
    * conventions (verified against DuckDB 1.0), which differ from
    * Spark's `slice(l, start, length)` on every axis: 1-based
    * INCLUSIVE end, negative indices count from the end (-1 = last),
    * and out-of-range bounds clamp instead of erroring. `begin > end`
    * yields an empty list, as does a begin past the end. A NULL list,
    * bound or step yields NULL. The optional `step` keeps every
    * step-th element of the slice (`[4,5,6][1:3:2]` = `[4,6]`);
    * step 0 raises, a negative step walks from begin DOWN to end
    * (`[1..5][5:1:-2]` = `[5,3,1]`). (The shim
    * encodes omitted bracket bounds `[a:]`/`[:b]` as `-1`/`1`, which
    * is how DuckDB's list-boundary behavior lands here.)
    *
    * Composed from codegen'd builtins (Size/Slice/ArrayFilter) — the
    * bound arithmetic is folded when the bounds are literals.
    */
  case class DuckListSlice(children: Seq[Expression]) extends RuntimeReplaceable {
    require(children.length == 3 || children.length == 4,
      s"list_slice expects 3 or 4 arguments, got ${children.length}")
    override lazy val replacement: Expression =
      if (children.head.dataType == StringType) stringSlice
      else arraySlice

    /** DuckDB's array_slice also runs on STRINGS: character-based,
      * same 1-based/negative/clamp conventions, inclusive end. Steps
      * on strings are unimplemented in DuckDB 1.0 too.
      */
    private lazy val stringSlice: Expression = {
      val Seq(l, b, e) = children.take(3)
      if (children.length == 4)
        throw new IllegalArgumentException(
          "list_slice: a step is not supported for strings (DuckDB raises here too)")
      val one = Literal(1L)
      val n   = Cast(Length(l), LongType)
      val bL  = Cast(b, LongType)
      val b1  = If(LessThan(bL, Literal(0L)), Add(Add(n, bL), one), bL)
      val b2  = If(LessThan(b1, one), one, b1)
      val bb  = If(GreaterThan(b2, Add(n, one)), Add(n, one), b2)
      val eL  = Cast(e, LongType)
      val e1  = If(LessThan(eL, Literal(0L)), Add(Add(n, eL), one), eL)
      val ee  = If(GreaterThan(e1, n), n, e1)
      val lenRaw = Subtract(Add(ee, one), bb)
      val len    = If(LessThan(lenRaw, Literal(0L)), Literal(0L), lenRaw)
      Substring(l, Cast(bb, IntegerType), Cast(len, IntegerType))
    }

    private lazy val arraySlice: Expression = {
      val Seq(l, b, e) = children.take(3)
      val one          = Literal(1L)
      val n            = Cast(new Size(l), LongType)
      // normalize to clamped 1-based positions; arithmetic in BIGINT so
      // user-supplied 64-bit bounds can't overflow before the clamp.
      // NULL bounds propagate through the arithmetic into Slice — but
      // Least/Greatest skip NULLs, so clamp via CASE instead
      val bL = Cast(b, LongType)
      val b1 = If(LessThan(bL, Literal(0L)), Add(Add(n, bL), one), bL)
      val b2 = If(LessThan(b1, one), one, b1)
      val bb = If(GreaterThan(b2, Add(n, one)), Add(n, one), b2)
      val eL = Cast(e, LongType)
      val e1 = If(LessThan(eL, Literal(0L)), Add(Add(n, eL), one), eL)
      val ee = If(GreaterThan(e1, n), n, e1)
      val lenRaw = Subtract(Add(ee, one), bb)
      val len    = If(LessThan(lenRaw, Literal(0L)), Literal(0L), lenRaw)
      val sliced: Expression =
        Slice(l, Cast(bb, IntegerType), Cast(len, IntegerType))
      children.lift(3) match {
        case None                                             => sliced
        case Some(Literal(s: Number, _)) if s.longValue == 1L => sliced
        case Some(step) =>
          val ArrayType(et, cn) = l.dataType: @unchecked
          val stepL = Cast(step, LongType)
          def everyNth(src: Expression, s: Expression): Expression = {
            val x  = NamedLambdaVariable("x", et, cn)
            val ix = NamedLambdaVariable("i", IntegerType, nullable = false)
            ArrayFilter(src, LambdaFunction(
              EqualTo(Pmod(Cast(ix, LongType), s), Literal(0L)), Seq(x, ix)))
          }
          // negative step walks from begin DOWN to end — and its
          // clamps are asymmetric vs the positive direction (probed
          // against DuckDB 1.0: begin clamps high to n but NOT low to
          // 1, end clamps low to 1 but NOT high to n; a bound outside
          // the walk yields empty). Realized as every-|step|-th
          // element of the REVERSED forward slice [end, begin].
          val bbN   = If(GreaterThan(b1, n), n, b1)
          val eeN   = If(LessThan(e1, one), one, e1)
          val lenN  = Subtract(Add(bbN, one), eeN)
          val lenNc = If(LessThan(lenN, Literal(0L)), Literal(0L), lenN)
          // start arg is irrelevant when len=0 but must not overflow
          // the Int cast for huge user bounds
          val startN = If(GreaterThan(eeN, n), Add(n, one), eeN)
          val revWalk = everyNth(
            Reverse(Slice(l, Cast(startN, IntegerType), Cast(lenNc, IntegerType))),
            Subtract(Literal(0L), stepL))
          CaseWhen(Seq(
            IsNull(stepL) -> Literal(null, l.dataType),
            EqualTo(stepL, Literal(0L)) ->
              Cast(new RaiseError(Literal("list_slice: step cannot be zero")), l.dataType),
            LessThan(stepL, Literal(0L)) -> revWalk),
            Some(everyNth(sliced, stepL)))
      }
    }
    override protected def withNewChildrenInternal(
        newChildren: IndexedSeq[Expression]): Expression = copy(children = newChildren)
  }

  /** DuckDB `l[i]` subscript: 1-based, negative from the end, and NULL
    * for ANY out-of-range index INCLUDING 0 — where Spark's
    * try_element_at still raises INVALID_INDEX_OF_ZERO. A zero index
    * is detoured to Int.MaxValue (an always-out-of-range position) so
    * nothing ever evaluates element_at(·, 0), keeping the expression
    * safe under constant folding too.
    */
  case class DuckElementAt(left: Expression, right: Expression) extends RuntimeReplaceable {
    override lazy val replacement: Expression = left.dataType match {
      case _: ArrayType =>
        val idx = If(EqualTo(Cast(right, LongType), Literal(0L)),
          Literal(Int.MaxValue), Cast(right, IntegerType))
        new ElementAt(left, idx, None, false)
      case StringType =>
        // DuckDB string subscript: ONE CHARACTER, 1-based, negative
        // from the end, '' (not NULL) for 0 or out of range. The
        // range guard also keeps the Int cast safe under ANSI for
        // absurd 64-bit indices.
        val iL = Cast(right, LongType)
        val n  = Cast(Length(left), LongType)
        If(Or(Or(EqualTo(iL, Literal(0L)), GreaterThan(iL, n)),
            LessThan(iL, Subtract(Literal(0L), n))),
          Literal(""),
          Substring(left, Cast(iL, IntegerType), Literal(1)))
      case _ => // map subscript: keys aren't positions, pass through
        new ElementAt(left, right, None, false)
    }
    override def children: Seq[Expression] = Seq(left, right)
    override protected def withNewChildrenInternal(
        newChildren: IndexedSeq[Expression]): Expression =
      copy(left = newChildren(0), right = newChildren(1))
  }

  /** DuckDB `regexp_replace(s, pattern, replacement[, flags])`:
    * replaces the FIRST match unless flags contain 'g'; supports
    * 'i' (case-insensitive), 's' (dot matches newline), 'm'
    * (multiline); replacement backreferences are `\1`-style (converted
    * to Java's `$1`). Not a hot-path expression — the shim routes
    * dialect text here; Spark-dialect regexp_replace is untouched.
    */
  case class DuckRegexpReplace(children: Seq[Expression])
      extends Expression with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {
    require(children.length == 3 || children.length == 4,
      s"regexp_replace expects 3 or 4 arguments, got ${children.length}")
    override def dataType: DataType = StringType
    override def nullable: Boolean = true
    override def prettyName: String = "duck_regexp_replace"

    @transient private var cachedKey: (String, String) = _
    @transient private var cachedPattern: java.util.regex.Pattern = _

    private def compiled(re: String, flags: String): java.util.regex.Pattern = {
      if (cachedKey != (re, flags)) {
        var f = 0
        if (flags.contains('i')) f |= java.util.regex.Pattern.CASE_INSENSITIVE |
          java.util.regex.Pattern.UNICODE_CASE
        if (flags.contains('s')) f |= java.util.regex.Pattern.DOTALL
        if (flags.contains('m')) f |= java.util.regex.Pattern.MULTILINE
        cachedPattern = java.util.regex.Pattern.compile(re, f)
        cachedKey = (re, flags)
      }
      cachedPattern
    }

    /** `\1` backreferences → `$1`; literal `$`/stray `\` escaped for
      * Java's replacement syntax.
      */
    private def javaRepl(r: String): String = {
      val b = new StringBuilder
      var i = 0
      while (i < r.length) {
        val c = r.charAt(i)
        if (c == '\\' && i + 1 < r.length && r.charAt(i + 1).isDigit) {
          b.append('$').append(r.charAt(i + 1)); i += 2
        } else if (c == '\\' && i + 1 < r.length && r.charAt(i + 1) == '\\') {
          b.append("\\\\"); i += 2
        } else if (c == '$') { b.append("\\$"); i += 1 }
        else { b.append(c); i += 1 }
      }
      b.toString
    }

    override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
      val vals = children.map(_.eval(input))
      if (vals.exists(_ == null)) return null
      val Seq(s, re, repl) = vals.take(3).map(_.asInstanceOf[UTF8String].toString)
      val flags = if (vals.length == 4) vals(3).asInstanceOf[UTF8String].toString else ""
      val m = compiled(re, flags).matcher(s)
      val out = if (flags.contains('g')) m.replaceAll(javaRepl(repl))
      else m.replaceFirst(javaRepl(repl))
      UTF8String.fromString(out)
    }
    override protected def withNewChildrenInternal(
        newChildren: IndexedSeq[Expression]): Expression = copy(children = newChildren)
  }

  /** Codegen'd binary call into a [[StringKernels]] byte kernel
    * (jaccard / hamming / levenshtein).
    */
  case class StringKernelCall(left: Expression, right: Expression,
                              fn: String, dt: DataType) extends BinaryExpression {
    override def nullIntolerant: Boolean = true
    override def dataType: DataType = dt
    override def prettyName: String = fn
    override protected def nullSafeEval(l: Any, r: Any): Any = fn match {
      case "jaccard" =>
        StringKernels.jaccard(l.asInstanceOf[UTF8String], r.asInstanceOf[UTF8String])
      case "hamming" =>
        StringKernels.hamming(l.asInstanceOf[UTF8String], r.asInstanceOf[UTF8String])
      case _ =>
        StringKernels.levenshtein(l.asInstanceOf[UTF8String], r.asInstanceOf[UTF8String])
    }
    override protected def doGenCode(
        ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
        ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
        : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
      defineCodeGen(ctx, ev, (a, b) => s"graft.functions.StringKernels.$fn($a, $b)")
    override protected def withNewChildrenInternal(
        newLeft: Expression, newRight: Expression): Expression =
      copy(left = newLeft, right = newRight)
  }

  /** Jaro(-Winkler) string similarity, matching DuckDB's
    * jaro_winkler_similarity / jaro_similarity (standard parameters:
    * scaling 0.1, max prefix 4, boost only when jaro > 0.7). Carries real
    * `doGenCode` (static call into [[StringKernels]]) so a blocked
    * fuzzy join stays one whole-stage-codegen span — this IS a hot
    * path under Dedup.fuzzyNamePairs.
    */
  case class JaroWinkler(left: Expression, right: Expression, winkler: Boolean = true)
      extends BinaryExpression {
    override def nullIntolerant: Boolean = true
    override def dataType: DataType = DoubleType
    override def prettyName: String =
      if (winkler) "jaro_winkler_similarity" else "jaro_similarity"
    override protected def nullSafeEval(l: Any, r: Any): Any =
      StringKernels.jaroWinkler(
        l.asInstanceOf[UTF8String], r.asInstanceOf[UTF8String], winkler)
    override protected def doGenCode(
        ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
        ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
        : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
      defineCodeGen(ctx, ev,
        (a, b) => s"graft.functions.StringKernels.jaroWinkler($a, $b, $winkler)")
    override protected def withNewChildrenInternal(
        newLeft: Expression, newRight: Expression): Expression =
      copy(left = newLeft, right = newRight)
  }

  /** DuckDB name → Spark builtin resolving identically (same argument
    * order and semantics); registered by builder lookup so they stay
    * in lock-step with the session's builtin implementations.
    */
  private val aliases: Seq[(String, String)] = Seq(
    "list_transform"     -> "transform",
    "list_filter"        -> "filter",
    "list_distinct"      -> "array_distinct",
    "list_concat"        -> "concat",
    "list_cat"           -> "concat",
    "list_intersect"     -> "array_intersect",
    "list_contains"      -> "array_contains",
    "list_has"           -> "array_contains",
    "list_value"         -> "array",
    "list_append"        -> "array_append", // both (list, element)
    "list_reverse"       -> "reverse",
    "list_sort"          -> "array_sort",   // both ASC NULLS LAST
    "string_split_regex" -> "split",
    "str_split_regex"    -> "split",
    "starts_with"        -> "startswith", // same (string, affix) order
    "ends_with"          -> "endswith",
    "prefix"             -> "startswith",
    "suffix"             -> "endswith",
    // generate_series registers via DuckSeries (Spark's sequence
    // auto-DESCENDS on b < a where DuckDB returns empty)
    "unnest"             -> "explode",
    "strpos"             -> "instr",    // both (string, needle), 1-based, 0 = absent
    "regexp_matches"     -> "rlike",    // partial-match boolean in both
    "string_agg"         -> "listagg",  // unordered form only (no ORDER BY in args)
    // aggregates (same-name bool_and/bool_or/count_if/mode/median/
    // bit_* already resolve identically)
    // hashing / encoding (md5, hex, bin, ascii, chr, printf resolve
    // identically by name; DuckDB's 64-bit hash() is engine-specific
    // and intentionally NOT aliased)
    "unicode"            -> "ascii",
    "ord"                -> "ascii",
    "to_hex"             -> "hex",
    "to_base64"          -> "base64",
    "from_base64"        -> "unbase64",
    "quantile_cont"      -> "percentile", // both exact + interpolating
    "arg_max"            -> "max_by",     // both (returned, ordering)
    "arg_min"            -> "min_by",
    "argmax"             -> "max_by",
    "argmin"             -> "min_by",
    "favg"               -> "avg"         // Kahan avg; same value
  )

  /** Register the DuckDB-name surface on `spark`'s session function
    * registry. Idempotent; session-scoped (the builtin registry is
    * never mutated).
    */
  def register(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    aliases.foreach { case (duck, target) =>
      FunctionRegistry.builtin
        .lookupFunctionBuilder(FunctionIdentifier(target))
        .foreach(b => reg.createOrReplaceTempFunction(duck, b, "built-in"))
    }
    reg.createOrReplaceTempFunction("len", es => DuckLen(es.head), "built-in")
    reg.createOrReplaceTempFunction("array_length", es => DuckLen(es.head), "built-in")
    reg.createOrReplaceTempFunction("list_sum", es => DuckListSum(es.head), "built-in")
    reg.createOrReplaceTempFunction("list_min", es => ArrayMin(es.head), "built-in")
    reg.createOrReplaceTempFunction("list_max", es => ArrayMax(es.head), "built-in")
    // list_aggregate(l, 'name') dispatches on the (literal) name
    reg.createOrReplaceTempFunction("list_aggregate",
      es => {
        val fname = es(1) match {
          case Literal(s, StringType) if s != null => s.toString.toLowerCase
          case other =>
            throw new IllegalArgumentException(
              s"list_aggregate expects a literal function name, got $other")
        }
        fname match {
          case "min"   => ArrayMin(es.head)
          case "max"   => ArrayMax(es.head)
          case "sum"   => DuckListSum(es.head)
          case "count" => DuckLen(es.head)
          case other =>
            throw new IllegalArgumentException(s"unsupported list_aggregate function '$other'")
        }
      }, "built-in")
    // array_to_string(arr, delim) — Spark's concat_ws takes the
    // delimiter FIRST; and DuckDB (string_agg-based) yields NULL for
    // an empty or all-NULL list where concat_ws yields '' (fixture-
    // caught: [''] must stay '', so the emptiness test is on the
    // NULL-compacted list, not the joined text)
    reg.createOrReplaceTempFunction("array_to_string",
      es => If(EqualTo(new Size(ArrayCompact(es(0))), Literal(0)),
        Literal(null, StringType), ConcatWs(Seq(es(1), es(0)))), "built-in")
    // list_position: 0 when absent, NULL only for a NULL search
    // element — DuckDB 1.0 (the oracle engine) matches Spark's
    // array_position exactly (fixture-caught; docs describe the older
    // NULL-when-absent behavior)
    reg.createOrReplaceTempFunction("list_position",
      es => ArrayPosition(es(0), es(1)), "built-in")
    reg.createOrReplaceTempFunction("list_indexof",
      es => ArrayPosition(es(0), es(1)), "built-in")
    // list_prepend(element, list) — Spark's array_prepend takes the
    // list FIRST.
    reg.createOrReplaceTempFunction("list_prepend",
      es => ArrayPrepend(es(1), es(0)), "built-in")
    // list_slice carries DuckDB's full slice conventions (inclusive
    // end, negatives, NULL boundaries, clamping, step) — the shim's
    // [a:b] rewrite targets this same expression
    reg.createOrReplaceTempFunction("list_slice", es => DuckListSlice(es), "built-in")
    reg.createOrReplaceTempFunction("array_slice", es => DuckListSlice(es), "built-in")
    // sha256(x) — Spark spells it sha2(x, 256)
    reg.createOrReplaceTempFunction("sha256",
      es => Sha2(es.head, Literal(256)), "built-in")
    // list_unique = COUNT of distinct non-NULL elements (not the
    // deduplicated list); list_has_any/_all with DuckDB's empty-list
    // conventions (any([])=false, all([])=true, NULLs ignored);
    // list_any_value = first non-NULL element
    reg.createOrReplaceTempFunction("list_unique",
      es => Cast(new Size(ArrayDistinct(ArrayCompact(es.head))), LongType), "built-in")
    // compact both sides first: Spark's ArraysOverlap returns NULL
    // (not false) when either list holds a NULL element and no
    // non-null overlap exists; DuckDB ignores NULL elements outright
    // (list_has_any([1,NULL],[2]) = false). NULL *arguments* still
    // propagate NULL through ArrayCompact, matching DuckDB.
    reg.createOrReplaceTempFunction("list_has_any",
      es => ArraysOverlap(ArrayCompact(es(0)), ArrayCompact(es(1))), "built-in")
    reg.createOrReplaceTempFunction("list_has_all",
      es => EqualTo(new Size(ArrayExcept(ArrayCompact(es(1)), es(0))), Literal(0)),
      "built-in")
    reg.createOrReplaceTempFunction("list_any_value",
      es => DuckElementAt(ArrayCompact(es.head), Literal(1)), "built-in")
    // range([a,] b[, step]): EXCLUSIVE end, direction honored, empty on
    // a wrong-direction bound (where Spark's sequence would raise);
    // the 1-arg form is range(0, n)
    reg.createOrReplaceTempFunction("range",
      es => DuckSeries(es, exclusive = true), "built-in")
    reg.createOrReplaceTempFunction("generate_series",
      es => DuckSeries(es, exclusive = false), "built-in")
    // the shim's [i] subscript rewrite targets this (zero-index-safe
    // try_element_at)
    reg.createOrReplaceTempFunction("list_extract",
      es => DuckElementAt(es(0), es(1)), "built-in")
    reg.createOrReplaceTempFunction("array_extract",
      es => DuckElementAt(es(0), es(1)), "built-in")
    reg.createOrReplaceTempFunction("epoch_us",
      es => UnixMicros(Cast(es.head, TimestampType)), "built-in")
    reg.createOrReplaceTempFunction("epoch_ms",
      es => UnixMillis(Cast(es.head, TimestampType)), "built-in")
    // DuckDB's 1-arg make_timestamp(µs) vs the 6-arg ANSI form Spark
    // also has — arity-dispatch keeps both callable.
    reg.createOrReplaceTempFunction("make_timestamp",
      es =>
        if (es.length == 1) MicrosToTimestamp(es.head)
        else MakeTimestamp(es(0), es(1), es(2), es(3), es(4), es(5)),
      "built-in")
    // list_reverse_sort: DESC NULLS LAST in both engines via sort_array
    reg.createOrReplaceTempFunction("list_reverse_sort",
      es => SortArray(es.head, Literal(false)), "built-in")
    // concat skips NULL arguments in DuckDB ('a'||NULL is NULL, but
    // concat('a', NULL, 'b') = 'ab'); string arguments only
    reg.createOrReplaceTempFunction("concat",
      es => ConcatWs(Literal("") +: es.map(e => Cast(e, StringType))), "built-in")
    // substr(s, 0, n): DuckDB clamps Postgres-style (the window starts
    // before the string, so one fewer char arrives); Spark treats 0 as
    // 1. Negative starts (count from end) already agree.
    def duckSubstr(es: Seq[Expression]): Expression =
      if (es.length == 2) Substring(es(0), es(1), Literal(Int.MaxValue))
      else If(EqualTo(Cast(es(1), LongType), Literal(0L)),
        Substring(es(0), Literal(1),
          Greatest(Seq(Subtract(Cast(es(2), IntegerType), Literal(1)), Literal(0)))),
        Substring(es(0), es(1), es(2)))
    reg.createOrReplaceTempFunction("substr", duckSubstr, "built-in")
    reg.createOrReplaceTempFunction("substring", duckSubstr, "built-in")
    // left/right with negative n drop |n| chars from the other end in
    // DuckDB; Spark returns ''
    reg.createOrReplaceTempFunction("left",
      es => If(GreaterThanOrEqual(Cast(es(1), IntegerType), Literal(0)),
        Substring(es(0), Literal(1), Cast(es(1), IntegerType)),
        Substring(es(0), Literal(1),
          Greatest(Seq(Add(Length(es(0)), Cast(es(1), IntegerType)), Literal(0))))),
      "built-in")
    reg.createOrReplaceTempFunction("right",
      es => {
        val k = Cast(es(1), IntegerType)
        CaseWhen(Seq(
          (EqualTo(k, Literal(0)), Literal("")),
          // positive: Spark's negative-start substring clamps to the
          // string head, so right(s, k > len) is the whole string
          (GreaterThan(k, Literal(0)),
            Substring(es(0), Subtract(Literal(0), k), Literal(Int.MaxValue)))),
          // negative: drop the first |k| chars
          Some(Substring(es(0), Subtract(Literal(1), k), Literal(Int.MaxValue))))
      }, "built-in")
    // date_trunc collapses to DATE for day-or-coarser parts in DuckDB
    // (year/quarter/month/week/day → DATE; hour and finer → TIMESTAMP).
    // decade/century/millennium are realized as year arithmetic —
    // Spark's TruncTimestamp has no such units (it would yield NULL) —
    // with DuckDB's simple floor convention (century of 2026 → 2000,
    // not the calendrical 2001; verified against DuckDB 1.0).
    val dateParts = Set("year", "quarter", "month", "week", "day")
    val coarseYears = Map("decade" -> 10, "century" -> 100, "millennium" -> 1000)
    reg.createOrReplaceTempFunction("date_trunc",
      es => {
        val t = TruncTimestamp(es(0), Cast(es(1), TimestampType))
        es(0) match {
          case Literal(p, StringType) if p != null &&
              coarseYears.contains(p.toString.toLowerCase) =>
            val n  = coarseYears(p.toString.toLowerCase)
            val yr = Year(Cast(es(1), DateType))
            // Pmod (not %) keeps the floor semantics for BC years
            MakeDate(Subtract(yr, Pmod(yr, Literal(n))), Literal(1), Literal(1))
          case Literal(p, StringType) if p != null && dateParts(p.toString.toLowerCase) =>
            Cast(t, DateType)
          case _ => t
        }
      }, "built-in")
    // datediff(part, start, end): DuckDB counts PART BOUNDARIES crossed
    // (datediff('month', Jan 31, Feb 1) = 1), not full periods like
    // Spark's timestampdiff — realized as exact boundary arithmetic
    def boundaryDiff(es: Seq[Expression]): Expression = {
      if (es.length == 2) // Spark's own 2-arg datediff(end, start)
        return DateDiff(Cast(es(0), DateType), Cast(es(1), DateType))
      val part = es(0) match {
        case Literal(p, StringType) if p != null => p.toString.toLowerCase
        case other =>
          throw new IllegalArgumentException(
            s"datediff expects a literal part name, got $other")
      }
      val (s, e) = (es(1), es(2))
      def ym(x: Expression) =
        Add(Multiply(Cast(Year(Cast(x, DateType)), LongType), Literal(12L)),
          Cast(Month(Cast(x, DateType)), LongType))
      def usDiv(x: Expression, unitUs: Long) =
        IntegralDivide(UnixMicros(Cast(x, TimestampType)), Literal(unitUs))
      part match {
        case "year"  => Cast(Subtract(Year(Cast(e, DateType)), Year(Cast(s, DateType))), LongType)
        case "month" => Subtract(ym(e), ym(s))
        case "day"   => Cast(DateDiff(Cast(e, DateType), Cast(s, DateType)), LongType)
        case "week"  => IntegralDivide(Cast(DateDiff(
          TruncDate(Cast(e, DateType), Literal("week")),
          TruncDate(Cast(s, DateType), Literal("week"))), LongType), Literal(7L))
        case "hour"   => Subtract(usDiv(e, 3600000000L), usDiv(s, 3600000000L))
        case "minute" => Subtract(usDiv(e, 60000000L), usDiv(s, 60000000L))
        case "second" => Subtract(usDiv(e, 1000000L), usDiv(s, 1000000L))
        case other =>
          throw new IllegalArgumentException(
            s"datediff part '$other' not supported; use year/month/week/day/hour/minute/second")
      }
    }
    // Spark's parser intercepts datediff/date_diff as timestampdiff
    // syntax (unquoted unit) before function resolution, so the duck
    // forms can only arrive under a fresh name — the shim renames
    // 3-arg datediff/date_diff calls to duck_datediff
    reg.createOrReplaceTempFunction("duck_datediff", boundaryDiff, "built-in")
    // DuckDB regexp_replace is FIRST-match unless the 'g' flag is
    // given; Spark's is always global — the shim renames to this
    reg.createOrReplaceTempFunction("duck_regexp_replace",
      es => DuckRegexpReplace(es), "built-in")
    // strftime(ts, '%Y-%m-%d') / strptime(s, fmt): the C-style format
    // codes translate to DateTimeFormatter patterns (literal text
    // quoted); format must be a literal. Spark has neither name.
    def fmtOf(e: Expression, fn: String): String = e match {
      case Literal(f, StringType) if f != null => strftimeToJava(f.toString)
      case other =>
        throw new IllegalArgumentException(s"$fn expects a literal format string, got $other")
    }
    reg.createOrReplaceTempFunction("strftime",
      es => new DateFormatClass(Cast(es(0), TimestampType),
        Literal(fmtOf(es(1), "strftime"))), "built-in")
    reg.createOrReplaceTempFunction("strptime",
      es => new ParseToTimestamp(es(0), Literal(fmtOf(es(1), "strptime"))), "built-in")
    // string-distance family — ALL byte-oriented in DuckDB (its
    // levenshtein('café','cafe') is 2; hamming compares byte
    // positions; jaccard is a byte-set measure), so all four route to
    // StringKernels byte kernels. levenshtein SHADOWS Spark's builtin,
    // which counts characters — the session-wide DuckDB-compatibility
    // contract, same as the concat/substr/left/right shadows.
    reg.createOrReplaceTempFunction("jaccard",
      es => StringKernelCall(es(0), es(1), "jaccard", DoubleType), "built-in")
    reg.createOrReplaceTempFunction("hamming",
      es => StringKernelCall(es(0), es(1), "hamming", LongType), "built-in")
    reg.createOrReplaceTempFunction("mismatches",
      es => StringKernelCall(es(0), es(1), "hamming", LongType), "built-in")
    reg.createOrReplaceTempFunction("levenshtein",
      es => StringKernelCall(es(0), es(1), "levenshtein", IntegerType), "built-in")
    reg.createOrReplaceTempFunction("editdist3",
      es => StringKernelCall(es(0), es(1), "levenshtein", IntegerType), "built-in")
    reg.createOrReplaceTempFunction("jaro_winkler_similarity",
      es => JaroWinkler(es(0), es(1)), "built-in")
    reg.createOrReplaceTempFunction("jaro_similarity",
      es => JaroWinkler(es(0), es(1), winkler = false), "built-in")
    // struct surface: struct_pack's := args are rewritten by the shim
    // to named_struct; struct_extract is the analyzer's generic
    // field extractor (name-based)
    reg.createOrReplaceTempFunction("struct_extract",
      es => org.apache.spark.sql.catalyst.analysis.UnresolvedExtractValue(es(0), es(1)),
      "built-in")
    // DuckDB's map accessors (map-only there) return the value wrapped
    // in a LIST — [v] on a hit, [] on a miss (fixture-verified); Spark's
    // own element_at yields the bare value, so both names shadow to a
    // type-dispatching replacement (array operands keep Spark ElementAt
    // — the engine's own canonical projections use element_at(arr, 1)).
    reg.createOrReplaceTempFunction("map_extract", es => DuckMapExtract(es), "built-in")
    reg.createOrReplaceTempFunction("element_at", es => DuckMapExtract(es), "built-in")
    // product: DOUBLE multiply-fold skipping NULLs (all-NULL -> NULL),
    // fixture-verified incl. the signed-zero case product(2,-3,0) = -0.0
    reg.createOrReplaceTempFunction("product", es => DuckProduct(es.head), "built-in")
    // quantile_disc / quantile (same function in DuckDB): the ELEMENT at
    // 1-based index max(ceil(q*n), 1) of the sorted non-NULL values —
    // verified at the 0.33/0.34 boundary for n=3. Composed over a
    // sorted collect_list: the group's values must sit in one buffer by
    // definition of an exact discrete quantile (DuckDB holds them in
    // memory too); identical agg subtrees dedup in physical planning.
    def quantileDisc(es: Seq[Expression]): Expression = {
      val sorted = new SortArray(
        aggregate.CollectList(es(0)).toAggregateExpression(), Literal(true))
      val idx = Greatest(Seq(
        Ceil(Multiply(Cast(es(1), DoubleType), Cast(Size(sorted), DoubleType))),
        Literal(1L)))
      DuckElementAt(sorted, idx)
    }
    reg.createOrReplaceTempFunction("quantile_disc", quantileDisc, "built-in")
    reg.createOrReplaceTempFunction("quantile", quantileDisc, "built-in")
    // list / array_agg: DuckDB keeps NULL elements where collect_list
    // drops them — collect the value wrapped in a (never-NULL) struct
    // and unwrap, mirroring the parser's `s -> s.v` lambda shape. The
    // ordered in-args form is rewritten by the shim over the same
    // struct trick.
    // field extraction over the array of structs (GetArrayStructFields)
    // — no lambda, so it resolves in any context
    def duckListAgg(es: Seq[Expression]): Expression =
      org.apache.spark.sql.catalyst.analysis.UnresolvedExtractValue(
        aggregate.CollectList(
          CreateNamedStruct(Seq(Literal("v"), es.head))).toAggregateExpression(),
        Literal("v"))
    reg.createOrReplaceTempFunction("list", duckListAgg, "built-in")
    reg.createOrReplaceTempFunction("array_agg", duckListAgg, "built-in")
    // vector math over embedding lists: DuckDB's list_* kernels map to
    // the engine's native one-pass vector expressions (same kernels the
    // ANN operators run on); operands cast to array<double> so decimal
    // literals work
    locally {
      import VectorExpressions.{VecDot, VecNorm, VecDist}
      def vd(e: Expression)  = Cast(e, ArrayType(DoubleType))
      reg.createOrReplaceTempFunction("list_dot_product",
        es => VecDot(vd(es(0)), vd(es(1))), "built-in")
      reg.createOrReplaceTempFunction("list_inner_product",
        es => VecDot(vd(es(0)), vd(es(1))), "built-in")
      reg.createOrReplaceTempFunction("list_cosine_similarity",
        es => Divide(VecDot(vd(es(0)), vd(es(1))),
          Multiply(VecNorm(vd(es(0))), VecNorm(vd(es(1))))), "built-in")
      reg.createOrReplaceTempFunction("list_distance",
        es => VecDist(vd(es(0)), vd(es(1))), "built-in")
    }
    // to_timestamp: NUMERIC epoch seconds in DuckDB (fractions kept);
    // Spark's to_timestamp parses strings — shadow with the numeric
    // meaning (DuckDB has no string form, so nothing is lost)
    reg.createOrReplaceTempFunction("to_timestamp",
      es => SecondsToTimestamp(Cast(es.head, DoubleType)), "built-in")
    // date-part surface with DuckDB semantics — the shim routes
    // extract(part FROM x) and date_part('part', x) here, and the
    // DuckDB scalar names register directly (dayofweek SHADOWS Spark's
    // 1-based builtin with DuckDB's 0-based count — session-registry
    // only). Spark rejects isodow/epoch/microsecond/millisecond/
    // century/decade/millennium/era outright, and its second/dow
    // values differ (fractional seconds, 1-based dow).
    reg.createOrReplaceTempFunction("duck_datepart",
      es => {
        val p = es(0) match {
          case Literal(s, StringType) if s != null => s.toString
          case other => throw new IllegalArgumentException(
            s"duck_datepart expects a literal part name, got $other")
        }
        duckDatePartExpr(p, es(1))
      }, "built-in")
    Seq("dayofweek", "weekday", "isodow", "millisecond", "microsecond",
      "epoch", "decade", "century", "millennium", "era", "yearweek",
      "isoyear").foreach { nm =>
      reg.createOrReplaceTempFunction(nm,
        es => duckDatePartExpr(nm, es.head), "built-in")
    }
    // even(x): round to the next even integer AWAY from zero
    // (even(-0.5) = -2, even(2.0) = 2 — DuckDB-verified); isinf /
    // isfinite compose from abs-compare (NaN input: both false, as
    // DuckDB's; isnan resolves natively)
    reg.createOrReplaceTempFunction("even", es => {
      val x = Cast(es.head, DoubleType)
      Multiply(Signum(x),
        Cast(Multiply(Ceil(Divide(Abs(x), Literal(2.0))), Literal(2L)), DoubleType))
    }, "built-in")
    def isInf(e: Expression): Expression =
      EqualTo(Abs(Cast(e, DoubleType)), Literal(Double.PositiveInfinity))
    reg.createOrReplaceTempFunction("isinf", es => isInf(es.head), "built-in")
    reg.createOrReplaceTempFunction("isfinite", es =>
      Not(Or(IsNaN(Cast(es.head, DoubleType)), isInf(es.head))), "built-in")
    // JSON extraction: json_extract_string / the ->> operator (shim-
    // routed) → get_json_object semantics. DuckDB accepts bare keys
    // and integer indices as paths; Spark wants $-rooted JsonPath —
    // literal paths normalize here. json_extract (JSON-typed result,
    // quoted strings) has no Spark twin and is NOT mapped.
    def jpath(e: Expression): Expression = e match {
      case Literal(s, StringType) if s != null =>
        val p = s.toString
        if (p.startsWith("$")) Literal(p)
        else if (p.nonEmpty && p.forall(_.isDigit)) Literal(s"$$[$p]")
        else Literal(s"$$.$p")
      case Literal(n, IntegerType | LongType | ShortType | ByteType) if n != null => Literal(s"$$[$n]")
      case other => other
    }
    reg.createOrReplaceTempFunction("json_extract_string",
      es => GetJsonObject(es(0), jpath(es(1))), "built-in")
    reg.createOrReplaceTempFunction("json_extract_path_text",
      es => GetJsonObject(es(0), jpath(es(1))), "built-in")
    // string_split / str_split / string_to_array: LITERAL delimiter
    // (DuckDB's '.' splits on dots) — aliasing to Spark's regex
    // `split` would be silently wrong; StringSplitSQL is the literal
    // splitter Spark's own split_part builds on
    // empty delimiter splits per CHARACTER in DuckDB; StringSplitSQL
    // would return the whole string — dispatch to a lookahead regex
    // the lookahead pair splits BETWEEN characters only (no trailing
    // empty element); '' in gives [''] in both engines. (?s) makes the
    // dot match line terminators too — without it no boundary fires
    // before \n or \r, so 'a\nb' split to ['a\n','b'] not ['a','\n','b']
    def litSplit(es: Seq[Expression]): Expression =
      If(EqualTo(es(1), Literal("")),
        StringSplit(es(0), Literal("(?!^)(?s)(?=.)"), Literal(-1)),
        StringSplitSQL(es(0), es(1)))
    reg.createOrReplaceTempFunction("string_split", litSplit, "built-in")
    reg.createOrReplaceTempFunction("str_split", litSplit, "built-in")
    reg.createOrReplaceTempFunction("string_to_array", litSplit, "built-in")
    // 2-arg trim family: DuckDB trim(s, chars) strips any of `chars`
    // from both ends (Spark spells that btrim); ltrim/rtrim likewise.
    // 1-arg forms keep whitespace-trim semantics (identical engines).
    reg.createOrReplaceTempFunction("trim",
      es => if (es.length >= 2) StringTrim(es(0), Some(es(1))) else StringTrim(es(0)),
      "built-in")
    reg.createOrReplaceTempFunction("ltrim",
      es => if (es.length >= 2) StringTrimLeft(es(0), Some(es(1))) else StringTrimLeft(es(0)),
      "built-in")
    reg.createOrReplaceTempFunction("rtrim",
      es => if (es.length >= 2) StringTrimRight(es(0), Some(es(1))) else StringTrimRight(es(0)),
      "built-in")
    // regexp_full_match (also the SIMILAR TO rewrite target): DuckDB
    // anchors the whole string; RLike is partial-match, so wrap the
    // pattern in ^(?: )$
    reg.createOrReplaceTempFunction("regexp_full_match",
      es => RLike(es(0), Concat(Seq(Literal("^(?:"), es(1), Literal(")$")))),
      "built-in")
    // scalar xor — DuckDB's `^` operator is POWER (the shim rewrites
    // it), so bitwise xor needs the function name
    reg.createOrReplaceTempFunction("xor",
      es => BitwiseXor(es(0), es(1)), "built-in")
    // struct_insert(s, 'name', value, ...) — the shim flattens the
    // := pairs; folds to UpdateFields. Delta: an existing name is
    // REPLACED here where DuckDB raises a binder error.
    reg.createOrReplaceTempFunction("struct_insert",
      es => {
        if (es.length < 3 || es.length % 2 == 0)
          throw new IllegalArgumentException(
            "struct_insert expects (struct, 'name', value, ...)")
        es.drop(1).grouped(2).foldLeft(es.head) {
          case (acc, Seq(Literal(nm, StringType), v)) if nm != null =>
            UpdateFields(acc, nm.toString, v)
          case _ =>
            throw new IllegalArgumentException(
              "struct_insert field names must be string literals")
        }
      }, "built-in")
  }

  /** DuckDB `map_extract`/`element_at`: the value under the key wrapped
    * in a LIST — `[v]` on a hit, `[]` on a miss. A NULL stored under an
    * existing key still yields `[NULL]`, hence the key-containment test
    * rather than a NULL-check on the lookup. Non-map operands fall back
    * to Spark's own ElementAt (array indexing — used by the engine's
    * canonical projections, and not a DuckDB form, so no conflict).
    */
  case class DuckMapExtract(children: Seq[Expression]) extends RuntimeReplaceable {
    override lazy val replacement: Expression = children.head.dataType match {
      case _: MapType =>
        val hit = CreateArray(Seq(GetMapValue(children(0), children(1))))
        If(ArrayContains(MapKeys(children(0)), children(1)),
          hit, Slice(hit, Literal(1), Literal(0)))
      case _ => ElementAt(children(0), children(1))
    }
    override protected def withNewChildrenInternal(
        newChildren: IndexedSeq[Expression]): Expression = copy(children = newChildren)
  }

  /** DuckDB date-part semantics over native Catalyst expressions.
    * Values verified against DuckDB 1.0: `second` is the WHOLE second
    * (no fraction), `dow`/`dayofweek`/`weekday` are 0-based Sunday,
    * `isodow` is Mon=1..Sun=7, `epoch` is DOUBLE seconds with the
    * fraction, `microsecond`/`millisecond` count within the minute
    * (truncated), `decade` = floor(y/10), `century`/`millennium` =
    * ceil, `era` flags CE, `isoyear`/`yearweek` use the ISO week-year
    * (the year of the week's Thursday).
    */
  private def duckDatePartExpr(part0: String, x: Expression): Expression = {
    val aliases = Map(
      "years" -> "year", "months" -> "month", "days" -> "day",
      "hours" -> "hour", "minutes" -> "minute", "seconds" -> "second",
      "dayofmonth" -> "day", "dayofyear" -> "doy", "weekofyear" -> "week",
      "weeks" -> "week", "quarters" -> "quarter", "decades" -> "decade",
      "centuries" -> "century", "millenniums" -> "millennium",
      "millennia" -> "millennium", "microseconds" -> "microsecond",
      "milliseconds" -> "millisecond", "weekday" -> "dow",
      "dayofweek" -> "dow")
    def yearE  = Year(x)
    def micros = Pmod(UnixMicros(Cast(x, TimestampType)), Literal(60000000L))
    def isoYear =
      Year(DateAdd(Cast(x, DateType), Subtract(Literal(3), WeekDay(x))))
    aliases.getOrElse(part0.toLowerCase, part0.toLowerCase) match {
      case "year"    => yearE
      case "month"   => Month(x)
      case "day"     => DayOfMonth(x)
      case "hour"    => Hour(x)
      case "minute"  => Minute(x)
      case "second"  => Second(x) // whole seconds, as DuckDB's
      case "quarter" => Quarter(x)
      case "doy"     => DayOfYear(x)
      case "week"    => WeekOfYear(x) // ISO week in both engines
      case "dow"     => Subtract(DayOfWeek(x), Literal(1))
      case "isodow"  => Add(WeekDay(x), Literal(1))
      case "epoch" =>
        Divide(Cast(UnixMicros(Cast(x, TimestampType)), DoubleType),
          Literal(1000000.0))
      case "microsecond" => micros
      case "millisecond" => IntegralDivide(micros, Literal(1000L))
      case "decade" =>
        Floor(Divide(Cast(yearE, DoubleType), Literal(10.0)))
      case "century" =>
        Ceil(Divide(Cast(yearE, DoubleType), Literal(100.0)))
      case "millennium" =>
        Ceil(Divide(Cast(yearE, DoubleType), Literal(1000.0)))
      case "era"     => If(GreaterThan(yearE, Literal(0)), Literal(1), Literal(0))
      case "isoyear" => isoYear
      case "yearweek" =>
        Add(Multiply(isoYear, Literal(100)), WeekOfYear(x))
      case other => throw new IllegalArgumentException(
        s"date part '$other' has no registered DuckDB mapping " +
          "(see docs/sql-dialect.md)")
    }
  }

  /** DuckDB `range` (exclusive end) / `generate_series` (inclusive)
    * with the engine-verified conventions, type-dispatched:
    *
    *  - numeric: wrong-direction bounds → EMPTY (Spark's `sequence`
    *    would auto-descend), `generate_series` step 0 → empty while
    *    `range` step 0 RAISES (DuckDB's own asymmetry), negative
    *    steps walk down
    *  - temporal: DATE operands promote to TIMESTAMP (as DuckDB's
    *    TIMESTAMP[] result), interval step required; the exclusive
    *    `range` end is realized as stop − 1 µs
    */
  case class DuckSeries(children: Seq[Expression], exclusive: Boolean)
      extends RuntimeReplaceable {
    // a RuntimeReplaceable's replacement must be RESOLVED immediately;
    // Sequence/Cast/TimestampAdd are TimeZoneAware (unresolved until a
    // zone is set — normally the analyzer's job), so stamp the session
    // zone on the built tree
    override lazy val replacement: Expression = built.transform {
      case t: TimeZoneAwareExpression if t.timeZoneId.isEmpty =>
        t.withTimeZone(org.apache.spark.sql.internal.SQLConf.get.sessionLocalTimeZone)
    }
    private lazy val built: Expression = {
      def empty(of: Expression) =
        Slice(Sequence(of, of, Some(Literal(1L)), None), Literal(1), Literal(0))
      def isTemporal(dt: DataType) =
        dt == DateType || dt == TimestampType || dt == TimestampNTZType
      if (children.take(2).exists(e => isTemporal(e.dataType))) {
        if (children.length != 3)
          throw new IllegalArgumentException(
            "temporal range/generate_series needs (start, stop, step INTERVAL)")
        def ts(e: Expression) =
          if (e.dataType == DateType) Cast(e, TimestampType) else e
        val a    = ts(children(0))
        val b0   = ts(children(1))
        val step = children(2)
        // DuckDB direction semantics (engine-verified): negative steps
        // walk down with the exclusive end realized as stop + 1 µs (so
        // the stop stays EXCLUDED when the walk lands on it);
        // wrong-direction bounds and a zero step are EMPTY, never an
        // error (unlike the numeric range, whose zero step raises).
        // Step sign at runtime: ANSI interval types compare against a
        // same-typed zero; CalendarIntervalType (make_interval) is not
        // orderable, so its sign is read off an epoch-shift.
        val (pos, neg) = step.dataType match {
          case t: DayTimeIntervalType =>
            val z = Literal(0L, t)
            (GreaterThan(step, z), LessThan(step, z))
          case t: YearMonthIntervalType =>
            val z = Literal(0, t)
            (GreaterThan(step, z), LessThan(step, z))
          case _ =>
            val ep = Literal(0L, TimestampType)
            val sh = TimestampAddInterval(ep, step)
            (GreaterThan(sh, ep), LessThan(sh, ep))
        }
        def seq(end: Expression) = Sequence(a, end, Some(step), None)
        val emptyT =
          Literal.create(Array.empty[Any], ArrayType(a.dataType, containsNull = false))
        if (exclusive)
          CaseWhen(Seq(
            And(pos, GreaterThan(b0, a)) ->
              seq(TimestampAdd("MICROSECOND", Literal(-1L), b0)),
            And(neg, LessThan(b0, a)) ->
              seq(TimestampAdd("MICROSECOND", Literal(1L), b0))),
            Some(emptyT))
        else
          CaseWhen(Seq(
            And(pos, GreaterThanOrEqual(b0, a)) -> seq(b0),
            And(neg, LessThanOrEqual(b0, a))    -> seq(b0)),
            Some(emptyT))
      } else {
        val a = if (children.length == 1) Literal(0L) else Cast(children(0), LongType)
        val b = Cast(if (children.length == 1) children(0) else children(1), LongType)
        if (children.length <= 2) {
          if (exclusive)
            If(LessThanOrEqual(b, a), empty(a),
              Sequence(a, Subtract(b, Literal(1L)), Some(Literal(1L)), None))
          else
            If(LessThan(b, a), empty(a),
              Sequence(a, b, Some(Literal(1L)), None))
        } else {
          val s = Cast(children(2), LongType)
          if (exclusive)
            CaseWhen(Seq(
              EqualTo(s, Literal(0L)) ->
                Cast(new RaiseError(Literal("range: step cannot be zero")),
                  ArrayType(LongType)),
              And(GreaterThan(s, Literal(0L)), GreaterThan(b, a)) ->
                Sequence(a, Subtract(b, Literal(1L)), Some(s), None),
              And(LessThan(s, Literal(0L)), LessThan(b, a)) ->
                Sequence(a, Add(b, Literal(1L)), Some(s), None)),
              Some(empty(a)))
          else
            CaseWhen(Seq(
              And(GreaterThan(s, Literal(0L)), GreaterThanOrEqual(b, a)) ->
                Sequence(a, b, Some(s), None),
              And(LessThan(s, Literal(0L)), LessThanOrEqual(b, a)) ->
                Sequence(a, b, Some(s), None)),
              Some(empty(a))) // covers step 0 (empty, not an error)
        }
      }
    }
    override protected def withNewChildrenInternal(
        newChildren: IndexedSeq[Expression]): Expression = copy(children = newChildren)
  }

  /** DuckDB `product(x)`: DOUBLE multiply-fold over the group, NULLs
    * skipped, all-NULL/empty group → NULL. A declarative aggregate —
    * codegen'd update/merge, partial-aggregation (map-side combine)
    * for free, so a 100 TB group-by products without a shuffle of raw
    * rows.
    */
  case class DuckProduct(child: Expression)
      extends aggregate.DeclarativeAggregate
      with org.apache.spark.sql.catalyst.trees.UnaryLike[Expression] {
    private lazy val prod = AttributeReference("prod", DoubleType)()
    override def dataType: DataType = DoubleType
    override def nullable: Boolean = true
    override lazy val aggBufferAttributes: Seq[AttributeReference] = Seq(prod)
    override lazy val initialValues: Seq[Expression] =
      Seq(Literal.create(null, DoubleType))
    override lazy val updateExpressions: Seq[Expression] = {
      val x = Cast(child, DoubleType)
      Seq(If(IsNull(x), prod, If(IsNull(prod), x, Multiply(prod, x))))
    }
    override lazy val mergeExpressions: Seq[Expression] = Seq(
      If(IsNull(prod.right), prod.left,
        If(IsNull(prod.left), prod.right, Multiply(prod.left, prod.right))))
    override lazy val evaluateExpression: Expression = prod
    override protected def withNewChildInternal(newChild: Expression): DuckProduct =
      copy(child = newChild)
  }

  /** C-style strftime codes → java.time.format.DateTimeFormatter
    * patterns, with literal runs quoted (letters would otherwise be
    * pattern codes). Unsupported codes raise rather than silently
    * formatting wrong.
    */
  private val StrftimeCodes: Map[Char, String] = Map(
    'Y' -> "yyyy", 'y' -> "yy", 'm' -> "MM", 'd' -> "dd",
    'H' -> "HH", 'I' -> "hh", 'M' -> "mm", 'S' -> "ss",
    'f' -> "SSSSSS", 'g' -> "SSS", 'j' -> "DDD",
    'a' -> "EEE", 'A' -> "EEEE", 'b' -> "MMM", 'B' -> "MMMM",
    'p' -> "a")
  private val StrftimeNoPad: Map[Char, String] = Map(
    'd' -> "d", 'm' -> "M", 'H' -> "H", 'I' -> "h", 'M' -> "m",
    'S' -> "s", 'j' -> "D")

  private[functions] def strftimeToJava(fmt: String): String = {
    val out = new StringBuilder
    val lit = new StringBuilder
    def flush(): Unit = if (lit.nonEmpty) {
      out.append('\'').append(lit.toString.replace("'", "''")).append('\'')
      lit.clear()
    }
    var i = 0
    while (i < fmt.length) {
      val c = fmt.charAt(i)
      if (c == '%' && i + 1 < fmt.length) {
        val (code, noPad, adv) =
          if (fmt.charAt(i + 1) == '-' && i + 2 < fmt.length)
            (fmt.charAt(i + 2), true, 3)
          else (fmt.charAt(i + 1), false, 2)
        if (code == '%') { lit.append('%'); i += 2 }
        else {
          val pat =
            if (noPad) StrftimeNoPad.get(code)
            else StrftimeCodes.get(code)
          pat match {
            case Some(p) => flush(); out.append(p); i += adv
            case None =>
              throw new IllegalArgumentException(
                s"strftime code %${if (noPad) "-" else ""}$code is not supported " +
                  "(supported: %Y %y %m %d %H %I %M %S %f %g %j %a %A %b %B %p, " +
                  "%-padded variants, %%)")
          }
        }
      } else { lit.append(c); i += 1 }
    }
    flush()
    out.toString
  }
}

package graft.lake

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.{UnresolvedFunction, UnresolvedInlineTable}
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.types._

/** Pre-analysis implicit-coercion repair (r14 VERDICT task 1).
  *
  * DuckDB's coercion lattice diverges from Spark's ANSI lattice in a
  * handful of everyday shapes (each MEASURED on real DuckDB 1.0,
  * pinned in CoercionDifferentialSpec; reachable verbatim through the
  * reference's `ducklakexl.py:394` pass-through):
  *
  *  - set operations resolve a string branch against ANYTHING to
  *    VARCHAR (`1 UNION ALL 'a'` -> VARCHAR; Spark silently casts the
  *    string branch to BIGINT — wrong VALUES, not just a different
  *    error); a boolean branch against numeric resolves to the numeric
  *    (`true UNION ALL 2` -> INTEGER; Spark refuses)
  *  - VALUES lists take the type of the NON-string rows and convert
  *    string rows to it at bind time (`(VALUES (1),(2.5),('3'))` ->
  *    DECIMAL; `(VALUES (1),('a'))` is a conversion error)
  *  - CASE / COALESCE resolve string literals to the non-string branch
  *    type with a LAZY cast (dead branches never convert)
  *  - greatest/least convert string literals to BIGINT (integral
  *    siblings) / DOUBLE (fractional siblings) / the sibling date type
  *  - IN-lists convert boolean literals to the numeric siblings' type
  *
  * All repairs run on the PARSED (unresolved) plan, before Spark's own
  * coercion can resolve the types away from DuckDB's lattice. Literal
  * repairs are purely structural; the set-op repair analyzes each
  * branch independently (branches are self-contained queries) and only
  * rewrites when the measured lattice disagrees — a branch that fails
  * standalone analysis (e.g. references a CTE of the outer query)
  * is left to Spark untouched.
  */
object CoercionRepair {

  def preAnalysis(spark: SparkSession, plan: LogicalPlan): LogicalPlan =
    repairPlan(spark, plan, Nil)

  private val LiteralCoerceFns =
    Set("greatest", "least", "coalesce", "ifnull", "nvl")

  // ------------------------------------------------------------ helpers

  private def litType(e: Expression): Option[DataType] = e match {
    case Literal(null, _) => None
    case l: Literal => Some(l.dataType)
    // the parser wraps negative numbers as UnaryMinus(Literal) — same
    // type, still a literal for lattice purposes (r14 review find:
    // VALUES (-1),(2.5),('3') was invisibly skipped)
    case u: UnaryMinus => litType(u.child).filter(_.isInstanceOf[NumericType])
    case _ => None
  }

  private def isStringLit(e: Expression): Boolean =
    litType(e).contains(StringType)

  private val IvFns = Set("__graft_iv_make", "__graft_iv_add",
    "__graft_iv_sub", "__graft_iv_mul", "__graft_iv_div")

  /** an interval-typed LITERAL (any flavor) or an already-routed
    * interval-native call — the operands the r14 per-field arithmetic
    * rewrite recognizes pre-analysis */
  private def ivLit(e: Expression): Boolean = e match {
    case l: Literal => l.dataType match {
      case _: DayTimeIntervalType | _: YearMonthIntervalType |
           CalendarIntervalType => true
      case _ => false
    }
    case f: UnresolvedFunction =>
      f.nameParts.length == 1 &&
        IvFns(f.nameParts.head.toLowerCase(java.util.Locale.ROOT))
    case u: UnaryMinus => ivLit(u.child)
    case _ => false
  }

  private def ivFn(name: String, a: Expression, b: Expression): Expression =
    UnresolvedFunction(Seq(name), Seq(a, b), isDistinct = false)

  private def dateLit(e: Expression): Boolean =
    litType(e).contains(DateType)

  private def boolNumericPair(l: Expression, r: Expression): Boolean =
    (litType(l).contains(BooleanType) &&
      litType(r).exists(_.isInstanceOf[NumericType])) ||
    (litType(r).contains(BooleanType) &&
      litType(l).exists(_.isInstanceOf[NumericType]))

  private def isIntegral(t: DataType): Boolean = t match {
    case ByteType | ShortType | IntegerType | LongType => true
    case _ => false
  }

  /** widen within ONE family (numeric / datetime); None across families */
  private def widen(ts: Seq[DataType]): Option[DataType] = {
    if (ts.isEmpty) None
    else if (ts.forall(_.isInstanceOf[NumericType])) {
      if (ts.exists(t => t == DoubleType || t == FloatType)) Some(DoubleType)
      else if (ts.exists(_.isInstanceOf[DecimalType])) {
        val ds = ts.map {
          case d: DecimalType => d
          case ByteType => DecimalType(3, 0)
          case ShortType => DecimalType(5, 0)
          case IntegerType => DecimalType(10, 0)
          case LongType => DecimalType(20, 0)
          case _ => DecimalType(38, 18)
        }
        val scale = ds.map(_.scale).max
        val intDigits = ds.map(d => d.precision - d.scale).max
        Some(DecimalType(math.min(intDigits + scale, 38), scale))
      } else {
        val order: Seq[DataType] = Seq(ByteType, ShortType, IntegerType, LongType)
        Some(ts.maxBy(order.indexOf))
      }
    } else if (ts.forall(t =>
        t == DateType || t == TimestampType || t == TimestampNTZType)) {
      if (ts.forall(_ == DateType)) Some(DateType)
      else Some(ts.find(_ != DateType).get)
    } else if (ts.distinct.size == 1) Some(ts.head)
    else None
  }

  // -------------------------------------------------- literal repairs

  /** VALUES rows: strings (and booleans) convert to the non-string
    * rows' widened type — eager, a bad string is a bind-time error on
    * both engines */
  private def repairInlineTable(t: UnresolvedInlineTable): UnresolvedInlineTable = {
    val ncols = t.rows.headOption.map(_.length).getOrElse(0)
    if (ncols == 0 || !t.rows.forall(_.length == ncols)) return t
    var changed = false
    val targets: Seq[Option[DataType]] = (0 until ncols).map { j =>
      val col = t.rows.map(_(j))
      if (!col.forall(e => litType(e).isDefined || e.isInstanceOf[Literal])) None
      else {
        val ts = col.flatMap(litType)
        val strs = ts.count(_ == StringType)
        val bools = ts.count(_ == BooleanType)
        val others = ts.filterNot(x => x == StringType || x == BooleanType)
        if (strs > 0 && others.nonEmpty) widen(others)
        else if (bools > 0 && others.nonEmpty && others.forall(_.isInstanceOf[NumericType]))
          widen(others)
        else None
      }
    }
    if (targets.forall(_.isEmpty)) t
    else {
      val rows = t.rows.map(_.zipWithIndex.map { case (e, j) =>
        targets(j) match {
          case Some(tt) if litType(e).exists(x => x == StringType || x == BooleanType) =>
            changed = true; Cast(e, tt)
          case _ => e
        }
      })
      if (changed) t.copy(rows = rows) else t
    }
  }

  /** IN-list: boolean literals convert to the numeric siblings' type */
  private def repairIn(in: In): In = {
    val all = in.value +: in.list
    val ts = all.flatMap(litType)
    val numerics = ts.filter(_.isInstanceOf[NumericType])
    if (!ts.contains(BooleanType) || numerics.isEmpty) in
    else widen(numerics) match {
      case Some(tt) =>
        def fix(e: Expression) =
          if (litType(e).contains(BooleanType)) Cast(e, tt) else e
        In(fix(in.value), in.list.map(fix))
      case None => in
    }
  }

  /** CASE branches: string literals take the non-string literal
    * branches' widened type, LAZILY (the dead-branch cast never runs);
    * boolean literals convert to numeric siblings eagerly
    * (`CASE WHEN p THEN true ELSE 2 END` is INT in DuckDB, true -> 1) */
  private def repairCase(cw: CaseWhen): CaseWhen = {
    val values = cw.branches.map(_._2) ++ cw.elseValue
    val ts = values.flatMap(litType)
    val strs = values.exists(isStringLit)
    val bools = values.exists(e => litType(e).contains(BooleanType))
    val others = ts.filterNot(x => x == StringType || x == BooleanType)
    if ((!strs && !bools) || others.isEmpty) cw
    else {
      val target =
        if (strs) widen(others)
        else if (others.forall(_.isInstanceOf[NumericType])) widen(others)
        else None
      target match {
        case Some(tt) =>
          def fix(e: Expression) =
            if (isStringLit(e)) graft.functions.LazyCoerce(Cast(e, tt))
            else if (litType(e).contains(BooleanType) && tt.isInstanceOf[NumericType])
              Cast(e, tt)
            else e
          CaseWhen(cw.branches.map { case (c, v) => (c, fix(v)) },
            cw.elseValue.map(fix))
        case None => cw
      }
    }
  }

  /** greatest/least: string literals convert to BIGINT (integral
    * siblings) / DOUBLE (fractional) / the sibling datetime type —
    * EAGER (greatest('abc', 1) is a bind error on both engines).
    * coalesce/ifnull/nvl: sibling widened type, LAZY like CASE. */
  private def repairFn(f: UnresolvedFunction): UnresolvedFunction = {
    val name = f.nameParts.head.toLowerCase(java.util.Locale.ROOT)
    val args = f.arguments
    val nonStr = args.flatMap(litType).filterNot(_ == StringType)
    if (!args.exists(isStringLit) || nonStr.isEmpty) f
    else {
      val target: Option[DataType] =
        if (name == "greatest" || name == "least") {
          if (nonStr.forall(_.isInstanceOf[NumericType]))
            Some(if (nonStr.forall(isIntegral)) LongType else DoubleType)
          else widen(nonStr)
        } else widen(nonStr)
      target match {
        case Some(tt) =>
          val lazily = name != "greatest" && name != "least"
          val fixed = args.map { e =>
            if (isStringLit(e)) {
              val c = Cast(e, tt)
              if (lazily) graft.functions.LazyCoerce(c) else c
            } else e
          }
          f.copy(arguments = fixed)
        case None => f
      }
    }
  }

  // ------------------------------------------------------ set-op repair

  private type CteScope = Seq[(String, org.apache.spark.sql.catalyst.plans
    .logical.SubqueryAlias, Option[Int])]

  /** analyze a set-op branch standalone; branches inside a WITH get the
    * in-scope CTE definitions re-attached so they still resolve. A
    * branch that cannot analyze standalone (e.g. correlated to the
    * outer query) is skipped — Spark's own coercion then applies. */
  private def analyzedChild(spark: SparkSession, p: LogicalPlan,
      ctes: CteScope): Option[LogicalPlan] =
    try {
      if (p.resolved) Some(p)
      else {
        val wrapped =
          if (ctes.isEmpty) p
          else org.apache.spark.sql.catalyst.plans.logical.UnresolvedWith(p, ctes)
        Some(org.apache.spark.sql.graftshim.DatasetBridge
          .ofRows(spark, wrapped).queryExecution.analyzed)
      }
    } catch { case _: Exception => None }

  private def isSetOp(p: LogicalPlan): Boolean =
    p.isInstanceOf[Union] || p.isInstanceOf[Intersect] || p.isInstanceOf[Except]

  /** single recursive walk: CTE definitions and subquery-expression
    * plans are innerChildren the stock transformUp/transformAllExpressions
    * never visit, so BOTH the literal repairs and the set-op repair are
    * applied here, threading the in-scope CTE definitions down. */
  private def repairPlan(spark: SparkSession, plan: LogicalPlan,
      ctes0: CteScope): LogicalPlan = {
    def go(p: LogicalPlan, ctes: CteScope): LogicalPlan = {
      val rebuilt = p match {
        case w: org.apache.spark.sql.catalyst.plans.logical.UnresolvedWith =>
          // each CTE definition sees the ones defined before it
          var scope = ctes
          val rels = w.cteRelations.map { case (n, sq, mx) =>
            val nsq = sq.copy(child = go(sq.child, scope))
            scope = scope :+ ((n, nsq, mx))
            (n, nsq, mx)
          }
          w.copy(child = go(w.child, scope), cteRelations = rels)
        case t: UnresolvedInlineTable => repairInlineTable(t)
        case other =>
          other.withNewChildren(other.children.map(go(_, ctes)))
      }
      // this node's expressions: literal coercions + set-ops nested in
      // subquery EXPRESSIONS (IN/EXISTS/scalar/lateral)
      val withExprs = rebuilt.transformExpressions {
        case in: In => repairIn(in)
        case bc: BinaryComparison if boolNumericPair(bc.left, bc.right) =>
          // true = 1 is TRUE in DuckDB (bool converts to the numeric);
          // Spark's type system rejects the comparison outright
          widen(Seq(bc.left, bc.right).flatMap(litType)
              .filter(_.isInstanceOf[NumericType])) match {
            case Some(tt) =>
              def fix(e: Expression) =
                if (litType(e).contains(BooleanType)) Cast(e, tt) else e
              bc.withNewChildren(Seq(fix(bc.left), fix(bc.right)))
                .asInstanceOf[Expression]
            case None => bc
          }
        case cw: CaseWhen => repairCase(cw)
        case f: UnresolvedFunction
            if f.nameParts.length == 1 && LiteralCoerceFns(
              f.nameParts.head.toLowerCase(java.util.Locale.ROOT)) =>
          repairFn(f)
        // r14 interval arithmetic: interval-literal * / + - route to
        // the per-field natives (DuckDB's interval is a (months, days,
        // micros) triple; Spark's flat-micros ops diverge — see
        // functions/IntervalArith)
        case m: Multiply if ivLit(m.left) || ivLit(m.right) =>
          val (iv, n) = if (ivLit(m.left)) (m.left, m.right) else (m.right, m.left)
          ivFn("__graft_iv_mul", iv, n)
        case dv: Divide if ivLit(dv.left) =>
          ivFn("__graft_iv_div", dv.left, dv.right)
        // r18: the dialect's full-precision `/` rewrite now captures a
        // typed-literal LHS (primaryStart walks INTERVAL '…' as one
        // primary for the slice work), so interval division arrives as
        // __graft_div(interval, n) instead of a raw Divide — route it
        // to the same per-field native
        case f: UnresolvedFunction
            if f.nameParts.length == 1 &&
              f.nameParts.head.equalsIgnoreCase("__graft_div") &&
              f.arguments.length == 2 && ivLit(f.arguments.head) =>
          ivFn("__graft_iv_div", f.arguments.head, f.arguments(1))
        case a: Add if ivLit(a.left) && ivLit(a.right) =>
          ivFn("__graft_iv_add", a.left, a.right)
        case sx: Subtract if ivLit(sx.left) && ivLit(sx.right) =>
          ivFn("__graft_iv_sub", sx.left, sx.right)
        // DATE literal ± interval is a TIMESTAMP in DuckDB (renders
        // '2024-01-16 00:00:00'); Spark would keep DATE for day/month
        // intervals. Literal-only — a date COLUMN keeps Spark's date
        // result (values agree, the render divergence is documented).
        case a: Add if (ivLit(a.left) && dateLit(a.right)) ||
            (ivLit(a.right) && dateLit(a.left)) =>
          val (d, iv) = if (dateLit(a.left)) (a.left, a.right) else (a.right, a.left)
          Add(Cast(d, TimestampNTZType), iv)
        case sx: Subtract if dateLit(sx.left) && ivLit(sx.right) =>
          Subtract(Cast(sx.left, TimestampNTZType), sx.right)
        // cross-flavor interval-literal comparison micros-normalizes
        // with 1 month = 30 days (measured; closes the r13 pinned
        // refusal `INTERVAL 1 MONTH = INTERVAL 30 DAY`)
        case bc: BinaryComparison if ivLit(bc.left) && ivLit(bc.right) =>
          bc.withNewChildren(Seq(
            UnresolvedFunction(Seq("__graft_iv_norm"), Seq(bc.left), isDistinct = false),
            UnresolvedFunction(Seq("__graft_iv_norm"), Seq(bc.right), isDistinct = false)))
            .asInstanceOf[Expression]
        case um: UnaryMinus if (um.child match {
              case f: UnresolvedFunction =>
                f.nameParts.length == 1 &&
                  f.nameParts.head.equalsIgnoreCase("__graft_iv_make")
              case _ => false
            }) =>
          ivFn("__graft_iv_mul", um.child, Literal(-1))
        case se: SubqueryExpression => se.withNewPlan(go(se.plan, ctes))
      }
      if (isSetOp(withExprs)) harmonize(spark, withExprs, ctes) else withExprs
    }
    go(plan, ctes0)
  }

  /** r15 advice: harmonize analyzes every branch standalone, and parsed
    * set-op chains are binary-nested, so an N-branch UNION paid O(N^2)
    * branch analyses even when no string/boolean divergence could exist.
    * Cheap structural pre-filter: skip the analysis when EVERY branch
    * output is PROVABLY free of string/boolean-typed columns (numeric /
    * temporal literals, casts to definite non-string types, arithmetic —
    * the literal-chain shapes that make long unions). Anything
    * unprovable (attributes, functions, stars, CASE) still takes the
    * measured harmonize path: a string COLUMN union'd against a numeric
    * is exactly the silent-wrong-values case this repair exists for
    * (Spark casts the string branch to the numeric type), so the filter
    * must never guess it away. */
  private def provablyNoStringBool(e: Expression): Boolean = e match {
    case a: Alias => provablyNoStringBool(a.child)
    case u: org.apache.spark.sql.catalyst.analysis.UnresolvedAlias =>
      provablyNoStringBool(u.child)
    case l: Literal =>
      l.dataType != StringType && l.dataType != BooleanType
    case c: Cast => c.dataType != StringType && c.dataType != BooleanType
    case lc: graft.functions.LazyCoerce => provablyNoStringBool(lc.child)
    case _: Add | _: Subtract | _: Multiply | _: Divide |
         _: IntegralDivide | _: Remainder | _: UnaryMinus |
         _: UnaryPositive => true // arithmetic never yields string/bool
    case _ => false
  }
  private def branchProvablySafe(p: LogicalPlan): Boolean = p match {
    case _ if p.resolved => // an inner already-harmonized set-op
      p.output.forall(a =>
        a.dataType != StringType && a.dataType != BooleanType)
    case Distinct(c) => branchProvablySafe(c)
    case GlobalLimit(_, c) => branchProvablySafe(c)
    case LocalLimit(_, c) => branchProvablySafe(c)
    case st: Sort => branchProvablySafe(st.child)
    case SubqueryAlias(_, c) => branchProvablySafe(c)
    case Project(list, _) => list.forall(provablyNoStringBool)
    case ag: Aggregate => ag.aggregateExpressions.forall(provablyNoStringBool)
    case u: Union => u.children.forall(branchProvablySafe)
    case s: SetOperation =>
      branchProvablySafe(s.left) && branchProvablySafe(s.right)
    case _ => false
  }

  private def harmonize(spark: SparkSession, sop: LogicalPlan,
      ctes: CteScope): LogicalPlan = {
    if (sop.children.forall(branchProvablySafe)) return sop
    val an = sop.children.map(analyzedChild(spark, _, ctes))
    if (an.exists(_.isEmpty)) return sop
    val kids = an.flatten
    val n = kids.head.output.length
    if (!kids.forall(_.output.length == n)) return sop
    val targets: Seq[Option[DataType]] = (0 until n).map { j =>
      val ts = kids.map(_.output(j).dataType).filterNot(_ == NullType)
      if (ts.isEmpty) None
      else if (ts.contains(StringType) && ts.exists(_ != StringType))
        Some(StringType)
      else if (ts.contains(BooleanType) && ts.exists(_.isInstanceOf[NumericType]))
        widen(ts.filter(_.isInstanceOf[NumericType]))
      else None
    }
    if (targets.forall(_.isEmpty)) return sop
    val newKids = kids.map { k =>
      val exprs: Seq[NamedExpression] = k.output.zipWithIndex.map {
        case (a0, j) => targets(j) match {
          case Some(tt) if a0.dataType != tt =>
            Alias(Cast(a0, tt), a0.name)()
          case _ => a0
        }
      }
      Project(exprs, k)
    }
    sop.withNewChildren(newKids)
  }
}

package graft.plans

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{Alias, Attribute, AttributeReference, EqualTo, Expression, IsNotNull, NamedExpression, PredicateHelper}
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Join, JoinHint, LogicalPlan, Project, SubqueryAlias}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.LogicalRelation
import org.apache.spark.sql.functions._

/** Transparent materialized-view rewrite — the summary-table answer
  * without the user knowing the summary exists: a Catalyst optimizer
  * rule (injected through SparkSessionExtensions) recognizes an
  * aggregate over the WHOLE lineitem fact relation whose groupings and
  * aggregates are derivable from the maintained daily rollup, and
  * rewrites the plan to re-aggregate the rollup instead. The rollup
  * partials are exact decimals, so the rewrite is bit-identical to the
  * fact scan (the declared key's DuckDB oracle states the direct
  * aggregate; MvRewriteSpec locks that the executed plan scans the
  * rollup and never the fact table).
  *
  * Safety is structural, not heuristic:
  *   - the child must be the BARE fact relation (attribute-only
  *     projections and aliases stripped; any Filter/Join/expression
  *     disqualifies — a filtered aggregate must never be answered from
  *     an unfiltered summary);
  *   - every grouping and aggregate expression must be SEMANTICALLY
  *     EQUAL (Catalyst canonicalization over the candidate's own
  *     attribute ids) to a template built from the registered view
  *     definition — so a near-miss (different rounding, extra column,
  *     another date bucket) simply does not match;
  *   - the output attributes keep the original names AND expr ids, so
  *     the parent plan resolves unchanged.
  *
  * At 100 TB this turns a fact-table scan into a days×flags metadata
  * read — the standing-rollup serving story with zero query rewrite
  * burden on the user. The registry is session-scoped and explicit
  * (registering the MV is the materialization step's job); an empty
  * registry makes the rule a single map lookup.
  */
/** The join shape of a STAR-SCHEMA view (fact ⋈ dim): the rewrite only
  * answers a candidate whose subtree is exactly the declared inner
  * equi-join — both sides bare relations (the fact bound by the
  * registration marker, the dim by `dimMarker`) and the condition a
  * single equality on the declared key pair. Anything else — another
  * join key, an extra conjunct, a filter on a join side — is a
  * different query and keeps the fact scan. */
final case class MvJoinSpec(
    dimMarker: String, factKey: String, dimKey: String)

/** One registered materialized view, everything the rewrite rule needs
  * to recognize and answer it:
  *   - `viewInputs`: fact columns the definition reads — a candidate
  *     whose relation lacks any of them cannot be this view;
  *   - `overFact`: the view definition itself, planned over the
  *     candidate's own relation to build the semantic-equality
  *     template (grouping/aggregate output NAMES are read from the
  *     template, so they need no separate declaration);
  *   - `rollupBase`: the maintained rollup with its derived dimension
  *     columns, named exactly as the template's grouping outputs;
  *   - `reAgg`: the re-aggregation over (a possibly filtered)
  *     rollupBase for ANY grouping subset — output names must match
  *     the template's aggregate outputs (counts coalesced to 0);
  *   - `join`: None for a single-table view; Some(spec) for a
  *     star-schema view over fact ⋈ dim (viewInputs may then span
  *     both sides);
  *   - `gate`: a FRESHNESS/IDENTITY check evaluated at rewrite time,
  *     after the marker binds and before any template work — the
  *     staleness stamp of an INCREMENTALLY MAINTAINED view. It
  *     receives the candidate relation's input files; returning false
  *     keeps the fact scan (the safe fallback — a rewrite is an
  *     optimization, staleness must degrade to correctness, never to
  *     a stale answer). A maintained-view registration checks "view
  *     maintained through = table head AND the candidate reads
  *     exactly the head's live files"; the default (static rollups,
  *     re-registered fresh by their materialization step each run)
  *     is always-fresh. Gates must return false rather than throw —
  *     the rule treats any failure as no-match for the whole
  *     candidate. Single-table views only (a star candidate's
  *     side-file attribution is ambiguous; star views keep the
  *     default). */
final case class MvViewDef(
    viewInputs: Set[String],
    overFact: Dataset[org.apache.spark.sql.Row] =>
      Dataset[org.apache.spark.sql.Row],
    rollupBase: (SparkSession, String) =>
      Dataset[org.apache.spark.sql.Row],
    reAgg: (Dataset[org.apache.spark.sql.Row], Seq[String]) =>
      Dataset[org.apache.spark.sql.Row],
    join: Option[MvJoinSpec] = None,
    gate: (SparkSession, Seq[String]) => Boolean = (_, _) => true)

object MvRewrite {

  /** (applicationId) → fact-path marker → rollup path → view def: the
    * session's MV CATALOG. Several views may be registered at once —
    * over different fact tables, or the SAME one (e.g. the single-table
    * monthly view and a star view keyed by the same fact) — and the
    * rule answers each candidate from the first registration whose
    * marker binds and whose derivability check passes. Keying the inner
    * map by rollup path makes re-registration idempotent (every MV
    * query key re-registers its view on each call). */
  private val registry = new java.util.concurrent.ConcurrentHashMap[
    String, Map[String, Map[String, MvViewDef]]]()

  def registerView(s: SparkSession, factMarker: String,
      rollupPath: String, view: MvViewDef): Unit =
    registry.merge(s.sparkContext.applicationId,
      Map(factMarker -> Map(rollupPath -> view)),
      (a, b) => a ++ b.map { case (m, inner) =>
        m -> (a.getOrElse(m, Map.empty) ++ inner)
      }): Unit

  /** Back-compat single-view registration: the lineitem monthly view. */
  def register(s: SparkSession, factMarker: String,
      rollupPath: String): Unit =
    registerView(s, factMarker, rollupPath, LineitemMonthlyView)

  def unregister(s: SparkSession): Unit =
    registry.remove(s.sparkContext.applicationId): Unit

  private[plans] def registered(s: SparkSession)
      : Seq[(String, String, MvViewDef)] =
    Option(registry.get(s.sparkContext.applicationId))
      .map(_.toSeq.flatMap { case (m, inner) =>
        inner.toSeq.map { case (p, v) => (m, p, v) }
      })
      .getOrElse(Seq.empty)

  // Matching must compare like with like: the candidate reaches the
  // rule CONSTANT-FOLDED (1.00, cast-as-date …), so the template must
  // run through the full optimizer as well — and this guard keeps the
  // rule from firing on its own template (the template is itself an
  // eligible fact aggregate; without the guard it recurses). STATIC on
  // the companion: the optimizer may hold more than one rule instance,
  // and all of them must honor one thread's in-progress template build.
  private[plans] val buildingTemplate = new ThreadLocal[java.lang.Boolean] {
    override def initialValue(): java.lang.Boolean = false
  }

  /** Columns the view definition reads — a candidate whose projection
    * lacks any of them cannot be the registered aggregate. */
  private[plans] val ViewInputs = Set("l_shipdate", "l_returnflag",
    "l_quantity", "l_extendedprice", "l_discount")

  /** The view definition both the materialization and the template
    * share — month/flag monthly re-aggregation in exact decimals. Must
    * stay in lockstep with Olap2.rollupOf's partials. */
  private def d12(c: org.apache.spark.sql.Column) = c.cast("decimal(12,2)")

  private[graft] def monthlyOverFact(df: Dataset[org.apache.spark.sql.Row])
      : Dataset[org.apache.spark.sql.Row] = {
    val one = lit(1).cast("decimal(4,2)")
    val disc = d12(col("l_extendedprice")) *
      (one - col("l_discount").cast("decimal(4,2)"))
    df.groupBy(
        date_format(to_date(col("l_shipdate")), "yyyy-MM").as("month"),
        col("l_returnflag"))
      .agg(sum(d12(col("l_quantity"))).cast("double").as("sum_qty"),
        sum(disc).cast("double").as("revenue"),
        count(lit(1)).as("n_items"))
  }

  /** The lineitem monthly view as an [[MvViewDef]]: the rollup
    * re-aggregation works for ANY grouping subset of the view's
    * dimensions (the derivability lattice: monthly partials re-sum to
    * month-only, flag-only, or global answers — decimal partials are
    * associative, counts are exact; the count coalesces to 0 on an
    * empty or filtered-to-empty input, matching count(*) semantics),
    * and the rollup base carries the derived month dimension the
    * filtered-rewrite path applies dimension predicates to BEFORE the
    * re-aggregation. */
  private[graft] val LineitemMonthlyView: MvViewDef = MvViewDef(
    viewInputs = ViewInputs,
    overFact = monthlyOverFact,
    rollupBase = (s, rollupPath) => s.read.parquet(rollupPath)
      .withColumn("month", date_format(col("day"), "yyyy-MM")),
    reAgg = (base, groupNames) =>
      base.groupBy(groupNames.map(col): _*)
        .agg(sum(col("qty_d")).cast("double").as("sum_qty"),
          sum(col("rev_d")).cast("double").as("revenue"),
          coalesce(sum(col("n_items")), lit(0L)).as("n_items")))
}

case class MvRewriteRule(spark: SparkSession) extends Rule[LogicalPlan]
    with PredicateHelper {

  /** Strip attribute-only wrappers down to the relation; None if the
    * subtree contains anything that changes row content (a Filter, a
    * computed projection, a join …). */
  private def bareRelation(plan: LogicalPlan): Option[LogicalRelation] =
    plan match {
      case r: LogicalRelation => Some(r)
      case SubqueryAlias(_, child) => bareRelation(child)
      case Project(exprs, child)
          if exprs.forall(_.isInstanceOf[AttributeReference]) =>
        bareRelation(child)
      case _ => None
    }

  /** A join SIDE stripped to its relation. Inner-join planning pushes
    * `isnotnull(<join key>)` filters into both sides (null-intolerant
    * condition inference) — those are implied by the equi-join itself,
    * so they strip too; any OTHER filter means a row-content change the
    * registered view never saw and disqualifies the side. */
  private def bareJoinSide(plan: LogicalPlan,
      joinKeys: org.apache.spark.sql.catalyst.expressions.AttributeSet)
      : Option[LogicalRelation] =
    plan match {
      case r: LogicalRelation => Some(r)
      case SubqueryAlias(_, child) => bareJoinSide(child, joinKeys)
      case Project(exprs, child)
          if exprs.forall(_.isInstanceOf[AttributeReference]) =>
        bareJoinSide(child, joinKeys)
      case org.apache.spark.sql.catalyst.plans.logical.Filter(c, child)
          if splitConjunctivePredicates(c).forall {
            case IsNotNull(a: Attribute) => joinKeys.contains(a)
            case _ => false
          } =>
        bareJoinSide(child, joinKeys)
      case _ => None
    }

  /** The candidate's source as the declared star join, rebuilt over the
    * BARE relations (full column sets — the template needs view inputs
    * the candidate pruned) with the candidate's own condition. None
    * unless the subtree is exactly: inner join, single-equality
    * condition on the declared (factKey, dimKey) pair, both sides
    * stripping to relations bound by the declared markers. */
  private def matchStarJoin(plan: LogicalPlan, factMarker: String,
      js: MvJoinSpec): Option[LogicalPlan] =
    stripAttrWrappers(plan) match {
      case Join(l, r, Inner, Some(cond @ EqualTo(
          a: AttributeReference, b: AttributeReference)), _) =>
        val keys = org.apache.spark.sql.catalyst.expressions
          .AttributeSet(Seq(a, b))
        for {
          lr <- bareJoinSide(l, keys)
          rr <- bareJoinSide(r, keys)
          // bind sides to (fact, dim) by marker, either order
          (factRel, dimRel) <-
            if (relationFiles(lr).exists(atTableBoundary(_, factMarker)) &&
              relationFiles(rr).exists(atTableBoundary(_, js.dimMarker)))
              Some((lr, rr))
            else if (
              relationFiles(rr).exists(atTableBoundary(_, factMarker)) &&
              relationFiles(lr).exists(atTableBoundary(_, js.dimMarker)))
              Some((rr, lr))
            else None
          // the condition must be the declared key equality (either
          // attribute order), each key resolving to its own side
          if (a.name == js.factKey && factRel.outputSet.contains(a) &&
            b.name == js.dimKey && dimRel.outputSet.contains(b)) ||
            (b.name == js.factKey && factRel.outputSet.contains(b) &&
              a.name == js.dimKey && dimRel.outputSet.contains(a))
        } yield Join(lr, rr, Inner, Some(cond), JoinHint.NONE)
      case _ => None
    }

  /** Strip the row-content-preserving wrappers only (attribute pruning
    * projections, aliases), WITHOUT requiring a bare relation below —
    * so a Filter wrapped in column pruning (the shape a global count
    * leaves) is still recognized as the Filter it is. */
  private def stripAttrWrappers(plan: LogicalPlan): LogicalPlan =
    plan match {
      case SubqueryAlias(_, child) => stripAttrWrappers(child)
      case Project(exprs, child)
          if exprs.forall(_.isInstanceOf[AttributeReference]) =>
        stripAttrWrappers(child)
      case other => other
    }

  private def relationFiles(r: LogicalRelation): Seq[String] =
    r.relation match {
      case h: org.apache.spark.sql.execution.datasources.HadoopFsRelation =>
        h.location.inputFiles.toSeq
      case _ => Seq.empty
    }

  /** Marker match at a PATH BOUNDARY: the char after the marker must be
    * a path separator, an extension dot, or end-of-string — a bare
    * substring test would bind a sibling table sharing the prefix
    * (`…/lineitem_sample.parquet`) to the registered rollup and answer
    * the WRONG table's aggregate. */
  private def atTableBoundary(file: String, marker: String): Boolean = {
    val i = file.indexOf(marker)
    i >= 0 && (i + marker.length == file.length ||
      file.charAt(i + marker.length) == '/' ||
      file.charAt(i + marker.length) == '.')
  }

  private def stripAlias(e: Expression): Expression = e match {
    case a: Alias => stripAlias(a.child)
    case other => other
  }

  private def buildingTemplate = MvRewrite.buildingTemplate

  /** The optimizer's PullOutGroupingExpressions (which runs before
    * user rules) moves computed groupings into a Project of
    * `_groupingexpression` aliases below the Aggregate — inline them
    * back so matching sees the aggregate the user wrote. Bails unless
    * the Project is pure (attributes + deterministic aliases only). */
  private def inlined(agg: Aggregate): Option[(Aggregate, LogicalPlan)] =
    agg.child match {
      case Project(projList, inner)
          if projList.forall {
            case _: AttributeReference => true
            case a: Alias => a.child.deterministic
            case _ => false
          } && projList.exists(_.isInstanceOf[Alias]) =>
        val aliasMap = projList.collect {
          case a: Alias => a.toAttribute.exprId -> a.child
        }.toMap
        def sub(e: Expression): Expression = e.transform {
          case a: Attribute if aliasMap.contains(a.exprId) =>
            aliasMap(a.exprId)
        }
        Some((Aggregate(
          agg.groupingExpressions.map(sub),
          agg.aggregateExpressions.map(sub(_).asInstanceOf[NamedExpression]),
          inner), inner))
      case other => Some((agg, other))
    }

  override def apply(plan: LogicalPlan): LogicalPlan = {
    val views = MvRewrite.registered(spark)
    if (views.isEmpty || buildingTemplate.get()) plan
    else plan.transformUp {
      case agg @ Aggregate(groupings, aggExprs, _, _)
          if groupings.size <= 3 && aggExprs.size <= 7 &&
            aggExprs.size > groupings.size =>
        // a rewrite is an optimization: ANY failure to match —
        // including a template that cannot even analyze because the
        // candidate's projection lacks the view's columns — must
        // leave the query untouched, never break it
        // the template plans over the RELATION itself (for a star
        // view: the join rebuilt over the bare relations), not any
        // pruned pass-through projection above it — attribute-only
        // projections preserve expr ids, so semantic comparison
        // still runs over identical attributes while the template
        // keeps access to every view input the candidate pruned.
        // A Filter directly over the (possibly attr-projected)
        // source is admissible IF its predicate rewrites to pure
        // view dimensions — see rewriteIfDerivable; anything else
        // in the subtree still disqualifies. The CATALOG loop: the
        // candidate is answered from the first registration whose
        // marker binds (boundary-exact), whose inputs are present,
        // and whose derivability check passes.
        scala.util.Try(for {
          (flat, base) <- inlined(agg)
          (cond, inner) <- Some(stripAttrWrappers(base) match {
            case org.apache.spark.sql.catalyst.plans.logical
                .Filter(c, fchild) =>
              (Some(c): Option[Expression], fchild)
            case other => (None: Option[Expression], other)
          })
          rewritten <- views.view.flatMap {
            case (marker, rollupPath, vd) =>
              val source: Option[LogicalPlan] = vd.join match {
                case None => bareRelation(inner).filter { rel =>
                  relationFiles(rel).exists(atTableBoundary(_, marker)) &&
                    vd.viewInputs.subsetOf(rel.output.map(_.name).toSet) &&
                    vd.gate(spark, relationFiles(rel))
                }
                case Some(js) =>
                  matchStarJoin(inner, marker, js).filter(j =>
                    vd.viewInputs.subsetOf(j.output.map(_.name).toSet))
              }
              source.flatMap(src => scala.util.Try(
                rewriteIfDerivable(flat, cond, src, rollupPath, vd))
                .toOption.flatten)
          }.headOption
        } yield rewritten).toOption.flatten.getOrElse(agg)
    }
  }

  private def rewriteIfDerivable(agg: Aggregate,
      cond: Option[Expression], child: LogicalPlan,
      rollupPath: String, vd: MvViewDef): Option[LogicalPlan] = {
    // template: the registered view definition planned AND OPTIMIZED
    // over the candidate's OWN child, so semantic equality runs over
    // identical attribute ids and identically-folded constants; the
    // thread-local guard keeps this nested optimize from re-entering
    // the rule
    val templateRaw = {
      buildingTemplate.set(true)
      try vd.overFact(org.apache.spark.sql.GraftBridge.ofRows(
          spark, child))
        .queryExecution.optimizedPlan
      finally buildingTemplate.set(false)
    }
    val template = templateRaw match {
      case a: Aggregate => inlined(a).map(_._1).getOrElse(a)
      case _ => return None
    }
    // the view's dimension / aggregate OUTPUT NAMES, read from the
    // template itself (grouping outputs lead the aggregate list in
    // grouping order — the groupBy().agg() contract) — these are the
    // names rollupBase/reAgg expose by the MvViewDef contract
    val nGroups = template.groupingExpressions.size
    val groupColNames =
      template.aggregateExpressions.take(nGroups).map(_.name)
    val aggColNames =
      template.aggregateExpressions.drop(nGroups).map(_.name)
    // derivability: every candidate GROUPING must be one of the view's
    // dimensions (a grouping SUBSET re-aggregates from the partials —
    // the MV lattice), and every candidate output must semantically
    // equal either a grouped dimension or one of the view's aggregates
    val gIdx: Seq[Int] = agg.groupingExpressions.map(g =>
      template.groupingExpressions.indexWhere(_.semanticEquals(g)))
    if (gIdx.contains(-1) || gIdx.distinct.size != gIdx.size) return None
    val tAggChildren = template.aggregateExpressions
      .drop(nGroups).map(stripAlias)
    // each candidate output → a rollup re-aggregation column name
    val outNames: Seq[String] = agg.aggregateExpressions.map { ne =>
      val e = stripAlias(ne)
      val g = template.groupingExpressions.indexWhere(_.semanticEquals(e))
      if (g >= 0) {
        if (!gIdx.contains(g)) return None // output not in GROUP BY
        groupColNames(g)
      } else {
        val a = tAggChildren.indexWhere(_.semanticEquals(e))
        if (a < 0) return None
        aggColNames(a)
      }
    }
    // FILTERED candidates: a predicate over the fact rewrites to the
    // same predicate over the rollup IFF every fact reference in it is
    // one of the view's grouping DIMENSIONS (substituted by semantic
    // equality with the template's grouping expressions) — dimension
    // predicates commute with the partial aggregation, so filtering
    // the rollup then re-aggregating ≡ filtering the fact then
    // aggregating. A predicate touching anything else (a measure, a
    // non-view column, a non-deterministic term) keeps the fact scan.
    val base = vd.rollupBase(spark, rollupPath)
    val baseOut = base.queryExecution.analyzed.output
    val dims: Seq[Attribute] =
      groupColNames.map(n => baseOut.find(_.name == n).get)
    val filteredBase = cond match {
      case None => base
      case Some(c) =>
        def dimOf(e: Expression): Option[Attribute] =
          groupColNames.indices.collectFirst {
            case i if template.groupingExpressions(i).semanticEquals(e) =>
              dims(i)
          }
        val mapped = c.transform {
          case e if dimOf(e).isDefined => dimOf(e).get
        }
        val dimIds = dims.map(_.exprId).toSet
        if (!mapped.deterministic ||
          !mapped.references.forall(a => dimIds.contains(a.exprId)))
          return None // filter-on-measure (or unknown column): bail
        org.apache.spark.sql.GraftBridge.ofRows(spark,
          org.apache.spark.sql.catalyst.plans.logical.Filter(
            mapped, base.queryExecution.analyzed))
    }
    // the rollup re-aggregation over exactly the candidate's grouping
    // subset; surface it under the candidate's names and expr ids so
    // the parent plan resolves unchanged
    val rewritten = vd.reAgg(filteredBase,
      gIdx.map(groupColNames)).queryExecution.analyzed
    val byName = rewritten.output.map(a => a.name -> a).toMap
    val out: Seq[NamedExpression] =
      agg.aggregateExpressions.zip(outNames).map { case (orig, n) =>
        Alias(byName(n), orig.name)(exprId = orig.exprId)
      }
    Some(Project(out, rewritten))
  }
}

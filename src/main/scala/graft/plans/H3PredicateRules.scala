package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{IntegerType, LongType}

import graft.h3.H3
import graft.h3.expr.H3ToParent

/**
 * Catalyst optimizer rule: infer raw-`h3index` RANGE predicates from
 * `h3_to_parent` filters, so spatial probes push down to the parquet scan.
 *
 * `WHERE h3_to_parent(x, 5) = P` is a per-row expression — as written, no
 * file format can skip data for it. But the preimage of `toParent` is a
 * handful of contiguous numeric ranges over the raw index
 * ([[H3.parentPreimageRanges]]), so the rule rewrites the filter to
 *
 *   h3_to_parent(x, 5) = P  AND  (x = P OR x BETWEEN lo6 AND hi6 OR ...)
 *
 * The added conjunct is EXACT (same preimage, garbage longs included — see
 * the proof at [[H3.parentPreimageRanges]]), so results never change; it is
 * a plain comparison on the stored column, so `FileSourceStrategy` pushes
 * it into the scan and parquet row-group min/max stats (the files are
 * h3index-sorted at write, `CellStore.writePartitioned`) skip every row
 * group outside the probed subtrees. This generalizes to ARBITRARY user SQL
 * the envelope planting that `CellStore.queryCells` does by hand for its
 * own probe plans — the reference gets the same effect from ClickHouse's
 * primary-key analysis of its generated `h3ToParent` SQL only when the
 * predicate is on the raw key; a Spark user gets it on the parent form too.
 *
 * Handles `=` (both orientations), `IN`, and the optimizer's `InSet` form,
 * when the resolution and parent cells are foldable literals and every
 * parent is a VALID cell at exactly that resolution (else no rewrite: the
 * equality can then also hold for garbage inputs outside any subtree — not
 * worth modeling, and such probes are user bugs anyway).
 *
 * Installed per-session via [[install]] (`experimental.extraOptimizations`,
 * runtime) or for every session via `spark.sql.extensions=`
 * [[graft.h3.expr.GraftExtensions]] (`injectOptimizerRule`, which also lets
 * the inferred conjunct propagate through joins in the main optimization
 * fixed point). Idempotent under re-application: an inferred conjunct that
 * is already present (semantically) is not added again.
 */
object H3ParentPredicateRewrite extends Rule[LogicalPlan] with PredicateHelper {

  /** Beyond this many inferred ranges the OR chain stops paying for itself
    * (parquet evaluates it per row group) — large IN probes keep their
    * existing plans (the store's own probe path handles those). */
  private val MaxRanges = 128

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case f @ Filter(cond, child) =>
      val conjuncts = splitConjunctivePredicates(cond)
      val inferred = conjuncts.flatMap(preimagePredicate)
        .filterNot(e => conjuncts.exists(_.semanticEquals(e)))
      if (inferred.isEmpty) f
      else Filter((conjuncts ++ inferred).reduce(And), child)
  }

  private def preimagePredicate(p: Expression): Option[Expression] = p match {
    case EqualTo(H3ToParent(x: Attribute, Literal(r: Int, IntegerType)),
        Literal(c: Long, LongType)) => build(x, r, Seq(c))
    case EqualTo(Literal(c: Long, LongType),
        H3ToParent(x: Attribute, Literal(r: Int, IntegerType))) => build(x, r, Seq(c))
    case In(H3ToParent(x: Attribute, Literal(r: Int, IntegerType)), cells)
        if cells.nonEmpty && cells.forall {
          case Literal(_: Long, LongType) => true
          case _ => false
        } =>
      build(x, r, cells.map(_.asInstanceOf[Literal].value.asInstanceOf[Long]))
    case InSet(H3ToParent(x: Attribute, Literal(r: Int, IntegerType)), cells)
        if cells.nonEmpty && cells.forall(_.isInstanceOf[java.lang.Long]) =>
      build(x, r, cells.toSeq.map(_.asInstanceOf[java.lang.Long].longValue()))
    case _ => None
  }

  private def build(x: Attribute, r: Int, cells: Seq[Long]): Option[Expression] = {
    if (r < 0 || r > H3.MaxRes) return None
    if (!cells.forall(c => H3.isValidCell(c) && H3.getResolution(c) == r)) return None
    val ranges = cells.distinct.sorted.flatMap(H3.parentPreimageRanges(_, r))
    if (ranges.size > MaxRanges) return None
    val disjuncts: Seq[Expression] = ranges.map { case (lo, hi) =>
      if (lo == hi) EqualTo(x, Literal(lo))
      else And(GreaterThanOrEqual(x, Literal(lo)), LessThanOrEqual(x, Literal(hi)))
    }
    Some(disjuncts.reduce(Or))
  }

  /** Install into an existing session (no-op if already installed). */
  def install(spark: SparkSession): Unit = synchronized {
    val em = spark.experimental
    if (!em.extraOptimizations.contains(this))
      em.extraOptimizations = em.extraOptimizations :+ this
  }
}

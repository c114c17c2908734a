package graft.plans

import org.apache.spark.internal.Logging
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.ExprId
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.execution.joins.BroadcastHashJoinExec
import org.apache.spark.sql.types.{ArrayType, FloatType}

/** Runtime twin of the CI hint-class audit (`PlanAuditSpec`'s registry
  * sweeps): a deployment guard that inspects every AQE-prepared
  * physical plan for the one failure shape that has shipped twice
  * (q115 in r14, q117 in r15) — a shuffle Exchange whose input
  * subtree contains a corpus file scan, whose output still carries a
  * raw float-vector payload, with no broadcast-bounded join between
  * scan and exchange. Bounded-by-contract candidate frames
  * (`localCheckpoint` lineage) carry no stats, so Catalyst cannot
  * choose broadcast on its own — a missed `broadcast()` hint
  * silently becomes a full-corpus vector shuffle, invisible at test
  * scale and ruinous at 100 TB. CI catches the registry; this rule
  * catches USER compositions of the library's operators in
  * production.
  *
  * Injected via [[graft.GraftExtensions]] as a query-stage-prep rule
  * (runs under adaptive execution, before stages materialize — early
  * enough for `fail` mode to stop the shuffle from ever running).
  * Knobs (read per query, so they can be flipped mid-session):
  *
  *  - `spark.graft.guard.vectorShuffle` = `off` | `warn` (default) |
  *    `fail`. `warn` logs one line per offending exchange; `fail`
  *    throws [[VectorShuffleGuardRule.VectorShuffleException]].
  *  - `spark.graft.guard.corpusPattern` — substring-regex over the
  *    scan's root paths that marks a relation as corpus-scale
  *    (default `.*`: any file-backed vector relation qualifies).
  *
  * Intentional vector movement — the blocked all-pairs cosine
  * primitive, cell/band-keyed repartitions whose per-key volume is
  * bounded by construction — should run under `warn` (the default)
  * or scope `off`/`corpusPattern` around the job; `fail` is the
  * strictness for retrieval/serving pipelines where no plan should
  * ever move corpus vectors wholesale. The rule never rewrites the
  * plan — it only observes (and, in `fail` mode, vetoes).
  *
  * Cost discipline (round 18): the guard runs on EVERY query-stage
  * prep, so it must be cheap on plans it will never flag. The naive
  * shape — `collect` over each exchange's subtree — is
  * O(exchanges × nodes) per application and showed up as a measurable
  * ~10-20% driver-side tax on multi-stage queries in the r17 drift
  * adjudication (BASELINE.md round-18 table). Both rules now compute
  * one post-order pass per plan: each node folds its children's facts
  * (corpus scans seen, broadcast cut seen) and every exchange is
  * checked against its child's already-folded facts — O(nodes) total,
  * identical verdicts.
  */
case class VectorShuffleGuardRule(session: SparkSession)
  extends Rule[SparkPlan] with Logging {

  import VectorShuffleGuardRule._

  override def apply(plan: SparkPlan): SparkPlan = {
    val mode = session.conf.get(ModeKey, "warn").toLowerCase
    if (mode == "off") return plan
    val pattern = session.conf.get(PatternKey, ".*").r

    // one post-order pass: facts(node) = fold(facts(children)) + node
    def walk(p: SparkPlan): Facts = {
      val kids = p.children
      var paths: List[String] = Nil
      var cut = false
      var i = 0
      while (i < kids.length) {
        val f = walk(kids(i))
        if (f.corpusVecPaths.nonEmpty) paths = f.corpusVecPaths ::: paths
        cut ||= f.hasCut
        i += 1
      }
      p match {
        case s: FileSourceScanExec if s.output.exists(a => isVec(a.dataType)) =>
          val root = s.relation.location.rootPaths.mkString(",")
          if (pattern.findFirstIn(root).isDefined) paths = root :: paths
        case _: BroadcastHashJoinExec => cut = true
        case ex: ShuffleExchangeExec if carriesVec(ex) && paths.nonEmpty && !cut =>
          // `paths`/`cut` here are exactly the exchange child's facts:
          // the exchange node itself contributes neither
          val msg =
            s"un-pruned corpus-vector shuffle: Exchange ${ex.outputPartitioning} moves " +
              s"columns ${ex.output.map(_.name).mkString("[", ", ", "]")} fed by corpus " +
              s"scan(s) ${paths.distinct.mkString("; ")} " +
              "with no broadcast-bounded cut below it. At corpus scale this shuffles every " +
              "vector; a bounded candidate frame should be broadcast() into a semi-join " +
              s"prune first. (Set $ModeKey=off to silence, =fail to enforce.)"
          if (mode == "fail") throw new VectorShuffleException(msg)
          else logWarning(s"[graft-guard] $msg")
        case _ =>
      }
      Facts(paths, cut)
    }
    walk(plan)
    plan
  }
}

object VectorShuffleGuardRule {
  val ModeKey = "spark.graft.guard.vectorShuffle"
  val PatternKey = "spark.graft.guard.corpusPattern"

  class VectorShuffleException(msg: String) extends IllegalStateException(msg)

  /** Folded subtree facts: corpus vector-scan root paths below this
    * node, and whether any broadcast hash join (a bounded cut) sits
    * below it.
    */
  private final case class Facts(corpusVecPaths: List[String], hasCut: Boolean)

  private def isVec(dt: org.apache.spark.sql.types.DataType): Boolean = dt match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  private def carriesVec(ex: ShuffleExchangeExec): Boolean =
    ex.output.exists(a => isVec(a.dataType))
}

/** The TEXT-payload sibling of [[VectorShuffleGuardRule]] — closes the
  * production gap the round-16 review named: the "corpus text never
  * rides an exchange" discipline was CI-swept for registry queries
  * (`PlanAuditSpec`) but nothing caught a USER composition that
  * shuffles `documents.text` un-cut.
  *
  * Text needs more precision than vectors: every plan is full of
  * StringType columns (keys, codes, tokens), so flagging any string in
  * an exchange would be noise. Two filters make the check exact:
  *
  *  1. only columns whose NAME matches `spark.graft.guard.textColumns`
  *     (anchored regex, default `text|content|body|html|raw` — the
  *     names document-payload columns actually carry; extend for your
  *     schema) on a corpus file scan count as text payload;
  *  2. the exchange is flagged only when its output carries the SAME
  *     attribute (by exprId) the scan produced — a derived cut
  *     (`substring(text, 1, 16)`, tokens, hashes) is a NEW attribute
  *     and passes. That is precisely the doctrine: derive bounded
  *     keys from text, never move the payload itself.
  *
  * Same escape as the vector rule: a broadcast-bounded join below the
  * exchange marks the row count as cut. Intentional wholesale movers
  * (a one-off corpus re-layout) run under `warn` or scope the
  * pattern/columns out. Knobs: `spark.graft.guard.textShuffle` =
  * `off` | `warn` (default) | `fail`; shares
  * [[VectorShuffleGuardRule.PatternKey]]. Same single-pass cost
  * discipline as the vector rule (see its scaladoc).
  */
case class TextShuffleGuardRule(session: SparkSession)
  extends Rule[SparkPlan] with Logging {

  import TextShuffleGuardRule._

  override def apply(plan: SparkPlan): SparkPlan = {
    val mode = session.conf.get(ModeKey, "warn").toLowerCase
    if (mode == "off") return plan
    val pattern = session.conf.get(VectorShuffleGuardRule.PatternKey, ".*").r
    val nameRe = session.conf.get(ColumnsKey, DefaultColumns).r

    def walk(p: SparkPlan): Facts = {
      val kids = p.children
      var ids: Set[ExprId] = Set.empty
      var cut = false
      var i = 0
      while (i < kids.length) {
        val f = walk(kids(i))
        if (f.corpusTextIds.nonEmpty)
          ids = if (ids.isEmpty) f.corpusTextIds else ids ++ f.corpusTextIds
        cut ||= f.hasCut
        i += 1
      }
      p match {
        case s: FileSourceScanExec
            if pattern.findFirstIn(s.relation.location.rootPaths.mkString(",")).isDefined =>
          s.output.foreach { a =>
            if (a.dataType == org.apache.spark.sql.types.StringType &&
              nameRe.pattern.matcher(a.name).matches()) ids += a.exprId
          }
        case _: BroadcastHashJoinExec => cut = true
        case ex: ShuffleExchangeExec if ids.nonEmpty && !cut =>
          val carried = ex.output.filter(a => ids.contains(a.exprId))
          if (carried.nonEmpty) {
            val msg =
              s"un-pruned corpus-text shuffle: Exchange ${ex.outputPartitioning} moves raw " +
                s"text column(s) ${carried.map(_.name).mkString("[", ", ", "]")} straight " +
                "from a corpus scan with no broadcast-bounded cut below it. At corpus " +
                "scale this shuffles every document body; derive a bounded key " +
                "(fingerprint, prefix, token hash) and move that instead. " +
                s"(Set $ModeKey=off to silence, =fail to enforce.)"
            if (mode == "fail") throw new TextShuffleException(msg)
            else logWarning(s"[graft-guard] $msg")
          }
        case _ =>
      }
      Facts(ids, cut)
    }
    walk(plan)
    plan
  }
}

object TextShuffleGuardRule {
  val ModeKey = "spark.graft.guard.textShuffle"
  val ColumnsKey = "spark.graft.guard.textColumns"
  val DefaultColumns = "text|content|body|html|raw"

  class TextShuffleException(msg: String) extends IllegalStateException(msg)

  /** Folded subtree facts: exprIds of raw corpus text attributes below
    * this node, and whether a broadcast-bounded cut sits below it.
    */
  private final case class Facts(corpusTextIds: Set[ExprId], hasCut: Boolean)
}

/** The guards' second injection point — closes the round-17 review's
  * streaming gap: `injectQueryStagePrepRule` fires only under ADAPTIVE
  * execution, and streaming micro-batch plans skip AQE, so a USER
  * streaming composition that shuffled corpus text straight through a
  * `writeStream` sink never met either rule. Columnar rules run in
  * EVERY `QueryExecution`'s physical preparations — batch,
  * `IncrementalExecution` micro-batch, and each AQE query stage — so
  * injecting the same checks as a pass-through
  * `preColumnarTransitions` makes coverage universal. (Under AQE both
  * injection points observe; the checks are pure observers, O(nodes)
  * each, and a duplicate warn line is the worst case. `foreachBatch`
  * bodies were always covered: they plan as ordinary batch queries.)
  */
case class ShuffleGuardColumnarRule(session: SparkSession)
  extends org.apache.spark.sql.execution.ColumnarRule {

  override def preColumnarTransitions: Rule[SparkPlan] = new Rule[SparkPlan] {
    override def apply(plan: SparkPlan): SparkPlan =
      TextShuffleGuardRule(session)(VectorShuffleGuardRule(session)(plan))
  }
}

package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.catalyst.expressions.AttributeReference
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.aggregate.BaseAggregateExec
import org.apache.spark.sql.execution.window.WindowExec

/** Board-wide generalization of PlanShapeSpec's q68 straggler guard
  * (SCALE.md: "Windows partition by a real entity key"). A window whose
  * ONLY partition keys are bounded enums (event_type, lang, ...) puts an
  * entire key-group into one task — correct at fixture scale, a
  * single-task straggler over a 100 TB fact table. Such a window is legal
  * only over bounded inputs: bucket/key SUMMARIES (an aggregate beneath
  * it) or a pigeonhole-capped finer window (the q111 shape) — never over
  * scan-level rows.
  *
  * The per-query form of this assertion existed since round 6 (q68) but
  * round 8's q116 landed the exact banned shape in its final commit —
  * a per-query guard cannot catch the NEXT query. This sweep walks every
  * registered query's physical plan, so any future registration with a
  * bounded-enum-only scan-level window fails CI by construction. */
class StragglerGuardSpec extends AnyFunSuite {
  import SparkTestSession.{sfDir, spark}

  /** Partition keys whose cardinality does not grow with the data: a
    * fixed enum vocabulary, not an entity id. Grow this set with any new
    * bounded column a fixture table gains. */
  private val boundedEnumKeys = Set(
    "event_type", "lang", "label", "source", "relation", "modality",
    "segment", "stage", "verdict", "region", "band",
    // dim-bounded hierarchy names: TPC-H fixes nation at 25 rows and
    // region at 5 — a summary grouped by these is dim-sized, not
    // fact-sized (q151's share-of-total frame)
    "nation", "nation_name", "region_name", "n_name", "r_name")

  /** Grouping keys that are DERIVED BUCKETS (floor-scaled quantization
    * grids, rank deciles): an aggregate grouping only by these produces a
    * grid-bounded summary frame, which an unpartitioned offset window may
    * legally consume (the q116/q138/q180 two-phase discipline). A name
    * outside both this set and [[boundedEnumKeys]] — an entity id, a raw
    * continuous value — marks the aggregate as corpus-sized. */
  private val bucketKeys = Set("b", "vb", "decile", "bucket", "blk", "band")

  /** Banned windows in one query's physical plan. */
  private def stragglerWindows(df: org.apache.spark.sql.DataFrame): Seq[WindowExec] = {
    // pre-execution initial plan: window shapes are static under AQE
    val exec = df.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }
    exec.collect { case w: WindowExec => w }.filter { w =>
      val enumOnly = w.partitionSpec.nonEmpty && w.partitionSpec.forall {
        case a: AttributeReference =>
          boundedEnumKeys.contains(a.name.toLowerCase)
        case _ => false
      }
      // summaries are fine: an aggregate beneath the window bounds its
      // input to per-group rows, the q68 two-phase discipline
      def overSummaries =
        w.child.collectFirst { case a: BaseAggregateExec => a }.nonEmpty
      // the q111 pigeonhole is also fine: a filter over a FINER
      // (more-keys) window caps each sub-bucket (row_number <= k), so
      // the enum-only window consumes at most buckets x k rows per
      // group — dropping that cap filter re-fails this sweep
      def cappedByFinerWindow =
        w.child.collect {
          case f: org.apache.spark.sql.execution.FilterExec
            if f.child.collectFirst {
              case inner: WindowExec
                if inner.partitionSpec.size > w.partitionSpec.size => inner
            }.nonEmpty => f
        }.nonEmpty
      // Round 9's blind spot (q174): an EMPTY-partition window IS a
      // single task by construction, so it is legal only over a frame
      // whose size cannot grow with the data — an aggregate grouping
      // exclusively by bounded enums and/or derived bucket grids (the
      // offset-window discipline), or a global (no-grouping) scalar.
      // An aggregate keyed by a raw entity/value column ("summaries"
      // that approach corpus size — groupBy over a continuous double)
      // makes the empty window a 100x straggler even though an
      // aggregate technically sits beneath it.
      def emptyOverUnbounded = w.partitionSpec.isEmpty && {
        w.child.collectFirst { case a: BaseAggregateExec => a } match {
          case None => true // scan-level rows straight into one task
          case Some(a) => !a.groupingExpressions.forall {
            case ar: AttributeReference =>
              val n = ar.name.toLowerCase
              boundedEnumKeys.contains(n) || bucketKeys.contains(n)
            case _ => false
          }
        }
      }
      (enumOnly && !overSummaries && !cappedByFinerWindow) ||
        (emptyOverUnbounded && !cappedByFinerWindow)
    }
  }

  /** Exchange budget: a single query plan with a runaway shuffle count
    * is either re-deriving a subtree that should be staged (the
    * q86/q150 discipline) or joining without reuse. The cap is a loose
    * regression tripwire, not a target — today's worst plans sit well
    * under it (measured by this sweep's failure message when tripped). */
  private val exchangeBudget = 24

  test("board sweep: no bounded-enum-only window consumes scan-level rows," +
      " and every plan stays inside the exchange budget") {
    val offenders = scala.collection.mutable.ArrayBuffer.empty[String]
    val budgetBreaches = scala.collection.mutable.ArrayBuffer.empty[String]
    for ((name, fn) <- SparkEntry.queries.toSeq.sortBy(_._1)) {
      val df = fn(spark, sfDir)
      offenders ++= stragglerWindows(df).map { w =>
        s"$name: window partitioned by " +
          s"(${w.partitionSpec.mkString(", ")}) over scan-level rows"
      }
      val exec = df.queryExecution.executedPlan match {
        case a: AdaptiveSparkPlanExec => a.executedPlan
        case p => p
      }
      val nEx = exec.collect {
        case e: org.apache.spark.sql.execution.exchange.Exchange => e
      }.size
      if (nEx > exchangeBudget)
        budgetBreaches += s"$name: $nEx exchanges (budget $exchangeBudget)"
    }
    assert(offenders.isEmpty,
      "bounded-enum-only windows over scan-level rows (single-task " +
        "stragglers at scale) — use the q68/q111 two-phase bucket form:\n" +
        offenders.mkString("\n"))
    assert(budgetBreaches.isEmpty,
      "plans exceeding the exchange budget — stage the re-derived " +
        "subtree (SCALE.md):\n" + budgetBreaches.mkString("\n"))
  }

  test("negative control: the round-8 naive q116 shape trips the detector") {
    // relativeRankNaive IS round 8's registration (one event_type-only
    // window straight over the events scan) — kept test-only as the
    // equivalence baseline. If the detector ever stops seeing it, the
    // sweep above is vacuous.
    val naive = graft.operators.RelationalQueries.relativeRankNaive(spark, sfDir)
    assert(stragglerWindows(naive).nonEmpty,
      "the detector must flag the naive one-window q116 form")
    // ...and the registered two-phase q116 is clean
    val fixed = SparkEntry.queries("q116_relative_rank")(spark, sfDir)
    assert(stragglerWindows(fixed).isEmpty)
  }

  test("negative control: the round-9 naive q174 shape trips the detector") {
    // ksDriftNaive IS round 9's registration: groupBy over a CONTINUOUS
    // double ("per-value summaries" that approach corpus size) feeding
    // EMPTY-partition cumulative/max windows — the single-task CDF sort
    // round 9's sweep could not see because it required a non-empty
    // partition spec. Kept test-only as the equivalence baseline.
    val naive = graft.operators.SegmentationQueries.ksDriftNaive(spark, sfDir)
    assert(stragglerWindows(naive).nonEmpty,
      "the detector must flag the naive empty-partition-window q174 form")
    // ...and the registered two-phase q174 is clean: its only empty
    // window rides the <=1024-row bucket-grid summary
    val fixed = SparkEntry.queries("q174_ks_drift")(spark, sfDir)
    assert(stragglerWindows(fixed).isEmpty)
  }
}

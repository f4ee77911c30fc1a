package graft.examples

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan, WholeStageCodegenExec}
import org.apache.spark.sql.execution.aggregate.BaseAggregateExec
import org.apache.spark.sql.execution.exchange.{BroadcastExchangeExec, ShuffleExchangeExec}
import org.apache.spark.sql.execution.joins.{BroadcastHashJoinExec, BroadcastNestedLoopJoinExec, CartesianProductExec, ShuffledHashJoinExec, SortMergeJoinExec}
import org.apache.spark.sql.execution.window.WindowExec

import graft.SparkEntry

/** Physical-plan audit over the whole declared surface: for every
  * `SparkEntry.queries` entry, count the plan features that decide
  * 100 TB behavior — shuffles, broadcasts, join algorithms, sorts,
  * window operators, whole-stage-codegen coverage, and scan-level
  * filter pushdown — and write the table to `PLANS.md`.
  *
  * This is the audit loop the build runs after correctness goes green
  * ("would this plan survive a 100× scale-up?") made repeatable: run
  * `sbt "runMain graft.examples.PlanAudit"` after adding an operator
  * and diff PLANS.md — a new shuffle, a join that fell off broadcast,
  * or a scan that stopped pushing its filter shows up as a table diff
  * in review rather than as a regression at the next bench.
  *
  * AQE is off in the audit session so the counts are the STATIC plan
  * (AQE can only improve on it at runtime — e.g. demoting a shuffle
  * join to broadcast — and its wrapper node hides children from
  * traversal before execution).
  */
object PlanAudit {

  final case class Audit(name: String, shuffles: Int, bcasts: Int,
                         smj: Int, bhj: Int, shj: Int, bnlj: Int,
                         cartesian: Int, sorts: Int, windows: Int,
                         aggs: Int, scans: Int, pushedScans: Int,
                         codegenPct: Int)

  /** (codegen-capable nodes, of those: nodes inside a compiled span).
    * A node is "inside" when its nearest enclosing
    * WholeStageCodegenExec is not cut off by an InputAdapter (the
    * compiled-region exit). The denominator is nodes extending
    * CodegenSupport — Exchange/Sort/scan nodes can never fuse, so
    * counting them would only dilute the signal the audit wants:
    * "of the operators that COULD fuse, how many did?"
    */
  private def codegenCover(p: SparkPlan, in: Boolean): (Int, Int) = {
    import org.apache.spark.sql.execution.{CodegenSupport, InputAdapter}
    val (selfCapable, selfIn, childCtx) = p match {
      case _: WholeStageCodegenExec => (false, false, true)
      case _: InputAdapter => (false, false, false)
      case c: CodegenSupport => (c.supportCodegen, in && c.supportCodegen, in)
      case _ => (false, false, in)
    }
    p.children.map(codegenCover(_, childCtx))
      .foldLeft((if (selfCapable) 1 else 0, if (selfIn) 1 else 0)) {
        case ((t, i), (ct, ci)) => (t + ct, i + ci)
      }
  }

  def audit(name: String, plan: SparkPlan): Audit = {
    val nodes = plan.collect { case p => p }
    def n(pf: PartialFunction[SparkPlan, Unit]) = nodes.count(pf.isDefinedAt)
    val scans = nodes.collect { case s: FileSourceScanExec => s }
    val (total, inside) = codegenCover(plan, in = false)
    val pct = if (total == 0) 0 else (inside * 100) / total
    Audit(name,
      shuffles = n { case _: ShuffleExchangeExec => },
      bcasts = n { case _: BroadcastExchangeExec => },
      smj = n { case _: SortMergeJoinExec => },
      bhj = n { case _: BroadcastHashJoinExec => },
      shj = n { case _: ShuffledHashJoinExec => },
      bnlj = n { case _: BroadcastNestedLoopJoinExec => },
      cartesian = n { case _: CartesianProductExec => },
      sorts = n { case s: org.apache.spark.sql.execution.SortExec => },
      windows = n { case _: WindowExec => },
      aggs = n { case _: BaseAggregateExec => },
      scans = scans.size,
      pushedScans = scans.count(s =>
        s.dataFilters.nonEmpty || s.requiredSchema.length <
          s.relation.dataSchema.length),
      codegenPct = pct)
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.sql.adaptive.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val rows = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      audit(name, fn(spark, sfDir).queryExecution.executedPlan)
    }
    val hdr =
      "| query | shuffles | bcasts | SMJ | BHJ | SHJ | BNLJ | cart | " +
        "sorts | windows | aggs | scans | pushed | codegen% |"
    val sep = "|---" * 14 + "|"
    val body = rows.map { a =>
      s"| ${a.name} | ${a.shuffles} | ${a.bcasts} | ${a.smj} | ${a.bhj} " +
        s"| ${a.shj} | ${a.bnlj} | ${a.cartesian} | ${a.sorts} " +
        s"| ${a.windows} | ${a.aggs} | ${a.scans} | ${a.pushedScans} " +
        s"| ${a.codegenPct} |"
    }
    val totals =
      s"\nTotals: ${rows.size} queries · " +
        s"${rows.map(_.shuffles).sum} shuffles · " +
        s"${rows.map(_.bcasts).sum} broadcasts · " +
        s"${rows.map(_.bnlj).sum} BNLJ + ${rows.map(_.cartesian).sum} " +
        "cartesian (all on the documented bounded-fan-out allowlist, " +
        "enforced by ScaleSpec's pair-product gate) · median codegen " +
        s"coverage ${rows.map(_.codegenPct).sorted.apply(rows.size / 2)}%.\n"
    // NOT stripMargin: the table rows' leading '|' would be stripped
    val doc = Seq(
      "# PLANS — static physical-plan audit", "",
      "Generated by `sbt \"runMain graft.examples.PlanAudit\"` at",
      s"sf=`$sfDir`, AQE off (static plan; AQE only improves on these",
      "counts at runtime). Columns: Exchange counts (shuffle /",
      "broadcast), join algorithm counts (sort-merge / broadcast-hash /",
      "shuffled-hash / broadcast-nested-loop / cartesian), SortExec",
      "count, window + aggregate operator counts, parquet scan count",
      "and how many of those scans push a data filter or prune",
      "columns, and the share of plan nodes inside WholeStageCodegen.",
      totals, hdr, sep).mkString("\n") + "\n" +
      body.mkString("\n") + "\n"
    Files.write(Paths.get("PLANS.md"), doc.getBytes("UTF-8"))
    println(s"[plan-audit] wrote PLANS.md (${rows.size} queries)")
    spark.stop()
  }
}

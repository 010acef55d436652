package graft.plans

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, Average, Complete, Count, Sum}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
import org.apache.spark.sql.types.{DecimalType, LongType}

/** Transparent CONTINUOUS-AGGREGATE query rewrite — the TimescaleDB
  * "materialized rollup read path" (public pattern: real-time/continuous
  * aggregates; also Druid/Pinot rollup-aware querying): a logical
  * `Aggregate` over the RAW events relation whose grouping is exactly
  * (user_id, date_trunc('hour', ts)) and whose aggregate functions are
  * derivable from the stored 1h rollup's (cnt, vsum) columns is rewritten
  * to RE-AGGREGATE THE STORED ROLLUP instead — an event-sized scan+shuffle
  * becomes a bucket-sized one, transparently to the query author. At
  * 100 TB this is the difference between touching the raw corpus and
  * touching ~1/3600 of it for every hour-aligned dashboard query.
  *
  * Correctness contract (all enforced or documented):
  *  - the stored rollup must be COMPLETE for the raw table (the refresh
  *    loop's invariant, q68; for a half-fresh store use
  *    [[graft.pipeline.Rollup.realtimeRead]] instead, q81);
  *  - it may hold MULTIPLE partial rows per (user, bucket) (incremental
  *    refresh appends): the rewrite re-aggregates with `sum`, never
  *    assumes one row per bucket;
  *  - count(*) ↦ coalesce(sum(cnt), 0) (non-nullable, like count);
  *    sum(cast(value as decimal(12,2))) ↦ cast(sum(vsum), original type)
  *    — decimal arithmetic, so the rewrite is EXACT, not approximate;
  *    avg(cast(value as decimal)) ↦ sum(vsum) / sum(cnt) rebuilt with
  *    Average's own internal operand types, bit-identical (see mapOutput);
  *  - output attribute ids are preserved, so parent operators (and the
  *    analyzed schema) are untouched;
  *  - anything it cannot prove rewritable (extra grouping keys, other
  *    aggregate functions, non-hour truncation, filters below the
  *    aggregate) is left alone.
  *
  * Registration: [[RollupRewrite.register]] adds the rule to the session's
  * `experimental.extraOptimizations` (the public per-session optimizer
  * seam); for spark-submit deployments [[RollupRewriteExtensions]] is the
  * `spark.sql.extensions`-compatible injector.
  */
final class RollupRewriteRule(
    rawPathContains: String,
    rollupPlan: LogicalPlan) extends Rule[LogicalPlan] {

  private val rUser = rollupPlan.output.find(_.name == "user_id").get
  private val rBucket = rollupPlan.output.find(_.name == "bucket_start").get
  private val rCnt = rollupPlan.output.find(_.name == "cnt").get
  private val rVsum = rollupPlan.output.find(_.name == "vsum").get
  // optional extreme columns: when the store carries them, min/max of the
  // raw value are served too (min/max re-aggregate exactly for ANY type)
  private val rVmin = rollupPlan.output.find(_.name == "vmin")
  private val rVmax = rollupPlan.output.find(_.name == "vmax")
  private val vsumScale: Option[Int] = rVsum.dataType match {
    case d: DecimalType => Some(d.scale)
    case _ => None
  }

  private def isRawScan(p: LogicalPlan): Boolean = p match {
    case l: LogicalRelation => l.relation match {
      case fs: HadoopFsRelation =>
        fs.location.rootPaths.exists(_.toString.contains(rawPathContains))
      case _ => false
    }
    case _ => false
  }

  private def isHourTrunc(e: Expression): Boolean = e match {
    case TruncTimestamp(StringLiteral(fmt), ts, _)
      if fmt.equalsIgnoreCase("hour") =>
      // the trunc argument must be the BARE ts attribute (modulo the
      // ntz→tz cast Spark inserts): date_trunc('hour', ts + INTERVAL …)
      // or any derived expression must NOT be served from bucket_start
      ts match {
        case a: AttributeReference => a.name == "ts"
        case Cast(a: AttributeReference, _: org.apache.spark.sql.types.TimestampType, _, _) =>
          a.name == "ts"
        case _ => false
      }
    case _ => false
  }

  private object StringLiteral {
    def unapply(e: Expression): Option[String] = e match {
      case Literal(s, _: org.apache.spark.sql.types.StringType) =>
        Option(s).map(_.toString)
      case _ => None
    }
  }

  private def sumOf(attr: Attribute): Expression =
    AggregateExpression(Sum(attr), Complete, isDistinct = false)

  /** Map one output column of the original aggregate onto the rollup, or
    * None if it isn't derivable. `truncId` is the exprId of the pulled-out
    * hour-trunc grouping expression (see [[apply]]). */
  private def mapOutput(ne: NamedExpression, truncId: ExprId): Option[NamedExpression] =
    ne match {
      case a: AttributeReference if a.name == "user_id" =>
        Some(Alias(rUser, a.name)(exprId = a.exprId))
      case a: AttributeReference if a.exprId == truncId =>
        Some(Alias(rBucket, a.name)(exprId = a.exprId))
      case Alias(a: AttributeReference, name) if a.exprId == truncId =>
        Some(Alias(rBucket, name)(exprId = ne.exprId))
      // count(NULL) is always 0 — only a NON-null literal is row count
      case Alias(AggregateExpression(Count(Seq(Literal(v, _))), _, false, _, _), name)
          if v != null =>
        Some(Alias(Coalesce(Seq(sumOf(rCnt), Literal(0L, LongType))), name)(
          exprId = ne.exprId))
      case Alias(ae @ AggregateExpression(Sum(se, _), _, false, _, _), name) =>
        se match {
          // the cast SCALE must match the store's (per-row rounding at a
          // different scale is NOT recoverable from vsum: rounding to 0
          // decimals then summing ≠ summing 2-decimal partials then
          // rounding); precision only bounds overflow, so any >= works
          case Cast(v: AttributeReference, dt: DecimalType, _, _)
              if v.name == "value" && vsumScale.contains(dt.scale) =>
            Some(Alias(Cast(sumOf(rVsum), ae.dataType), name)(exprId = ne.exprId))
          case _ => None
        }
      // avg(cast(value as decimal(s-scale))) ↦ sum(vsum) / sum(cnt),
      // rebuilt to mirror Average's OWN decimal evaluation exactly: Spark
      // evaluates a decimal Average as Divide(sum: DECIMAL(p+10, s),
      // count cast DECIMAL(20,0)) cast to DECIMAL(p+4, s+4) — we feed that
      // same division the SAME operand types and (exact-decimal) values,
      // so every rounding step is bit-identical to the raw-scan answer.
      // The store's re-aggregated totals are exact (decimal sums), hence
      // the rewrite serves avg EXACTLY, not approximately — the
      // TimescaleDB finalized-aggregate read for mean.
      case Alias(ae @ AggregateExpression(Average(se, _), _, false, _, _), name) =>
        se match {
          case Cast(v: AttributeReference, dt: DecimalType, _, _)
              if v.name == "value" && vsumScale.contains(dt.scale) =>
            // DecimalType.bounded / LongDecimal are private[sql]; these are
            // their public definitions (sum type = p+10 capped at 38; count
            // cast = DECIMAL(20,0))
            val sumT = DecimalType(math.min(dt.precision + 10, 38), dt.scale)
            val divided = Divide(
              Cast(sumOf(rVsum), sumT),
              Cast(Coalesce(Seq(sumOf(rCnt), Literal(0L, LongType))),
                DecimalType(20, 0)))
            Some(Alias(Cast(divided, ae.dataType), name)(exprId = ne.exprId))
          case _ => None
        }
      case Alias(AggregateExpression(
          org.apache.spark.sql.catalyst.expressions.aggregate.Min(v: AttributeReference),
          _, false, _, _), name) if v.name == "value" && rVmin.isDefined =>
        Some(Alias(AggregateExpression(
          org.apache.spark.sql.catalyst.expressions.aggregate.Min(rVmin.get),
          Complete, isDistinct = false), name)(exprId = ne.exprId))
      case Alias(AggregateExpression(
          org.apache.spark.sql.catalyst.expressions.aggregate.Max(v: AttributeReference),
          _, false, _, _), name) if v.name == "value" && rVmax.isDefined =>
        Some(Alias(AggregateExpression(
          org.apache.spark.sql.catalyst.expressions.aggregate.Max(rVmax.get),
          Complete, isDistinct = false), name)(exprId = ne.exprId))
      case _ => None
    }

  /** By the time user rules run, Catalyst has pulled complex grouping
    * expressions into a child Project (`PullOutGroupingExpressions`), so
    * the shape to match is
    *   Aggregate([user_id, g], out, Project([…attrs…, trunc AS g], Raw)).
    * The Project may only carry pass-through attributes besides the trunc
    * alias — anything else (a filter pushed into it, a computed column the
    * aggregate consumes) disqualifies the rewrite. */
  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case agg @ Aggregate(groupExprs, aggExprs, Project(plist, rel), _)
        if isRawScan(rel) && groupExprs.size == 2 =>
      val truncAlias = plist.collectFirst {
        case al @ Alias(t, _) if isHourTrunc(t) => al
      }
      val cleanProject = plist.forall {
        case _: AttributeReference => true
        case al: Alias => truncAlias.exists(_.exprId == al.exprId)
        case _ => false
      }
      val groupsMatch = truncAlias.exists { ta =>
        groupExprs.exists {
          case a: AttributeReference => a.name == "user_id"
          case _ => false
        } &&
        groupExprs.exists {
          case a: AttributeReference => a.exprId == ta.exprId
          case _ => false
        }
      }
      if (truncAlias.isDefined && cleanProject && groupsMatch) {
        val mapped = aggExprs.map(mapOutput(_, truncAlias.get.exprId))
        if (mapped.forall(_.isDefined))
          Aggregate(Seq(rUser, rBucket), mapped.map(_.get), rollupPlan)
        else agg
      } else agg
  }
}

/** Per-session registration + the `spark.sql.extensions` injector. */
object RollupRewrite {

  /** Register the rewrite on a live session: hour-aligned aggregates over
    * any parquet relation whose path contains `rawPathContains` are served
    * from `rollup` (columns: user_id, bucket_start TIMESTAMP-compatible
    * with date_trunc('hour', ts), cnt LONG, vsum DECIMAL). Returns the
    * rule so callers can deregister (remove it from
    * `spark.experimental.extraOptimizations`) when done. */
  def register(
      spark: SparkSession,
      rawPathContains: String,
      rollup: DataFrame): RollupRewriteRule = {
    val out = rollup.queryExecution.analyzed.output.map(_.name).toSet
    require(Set("user_id", "bucket_start", "cnt", "vsum").subsetOf(out),
      s"rollup must expose user_id/bucket_start/cnt/vsum, got $out")
    val rule = new RollupRewriteRule(rawPathContains,
      rollup.queryExecution.analyzed)
    spark.experimental.extraOptimizations =
      spark.experimental.extraOptimizations :+ rule
    rule
  }

  /** Apply the rewrite to ONE query without touching session-global
    * optimizer state: builds the rule for `stored`, applies it to `q`'s
    * optimized plan, fails loudly if it does not fire, and returns the
    * rewritten frame (q98/q100's shape). */
  def servedFrom(
      spark: SparkSession,
      rawPathContains: String,
      stored: DataFrame,
      q: DataFrame): DataFrame = {
    val rule = new RollupRewriteRule(rawPathContains,
      stored.queryExecution.analyzed)
    val rewritten = rule(q.queryExecution.optimizedPlan)
    require(rewritten ne q.queryExecution.optimizedPlan,
      "the continuous-aggregate rewrite must fire for this query shape")
    org.apache.spark.sql.graft.Bridge.ofRows(spark, rewritten)
  }
}

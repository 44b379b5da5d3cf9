package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Dataset, Encoder, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, AttributeSet, SortOrder}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution}
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}

import graft.model.Turn
import graft.state.TurnAutomaton

/** Custom whole-operator extension (SURVEY.md §4.2 / §7 M8): a sort-based
  * per-conversation automaton fold as a first-class Catalyst operator —
  * LogicalPlan node + Strategy + SparkPlan, injected via
  * `spark.experimental.extraStrategies`.
  *
  * Why a custom operator instead of `groupByKey(...).flatMapGroups`: the
  * object path MATERIALIZES each group (we sort a conversation's turns in
  * an array) — a conversation with tens of millions of turns is an OOM.
  * This exec instead declares `requiredChildDistribution` (clustered by
  * conv_id) + `requiredChildOrdering` (conv_id, turn_idx), so Catalyst's
  * EnsureRequirements plants exactly one shuffle + one external (spillable)
  * sort, and the fold then streams over rows one at a time — O(automaton
  * state) memory per key regardless of conversation size. This is the
  * batch twin of the streaming contiguity rule.
  */
case class ConversationFoldPlan(
    a: TurnAutomaton[Any, Any],
    override val output: Seq[Attribute],
    child: LogicalPlan) extends UnaryNode {
  override def producedAttributes: AttributeSet = AttributeSet(output)
  // the fold deserializes whole Turn rows: every child column is consumed
  // (without this, ColumnPruning would project the child down to nothing)
  override lazy val references: AttributeSet = child.outputSet
  override protected def withNewChildInternal(newChild: LogicalPlan): ConversationFoldPlan =
    copy(child = newChild)
}

case class ConversationFoldExec(
    a: TurnAutomaton[Any, Any],
    override val output: Seq[Attribute],
    outSerializer: ExpressionEncoder.Serializer[Any],
    child: SparkPlan) extends UnaryExecNode {

  // all rows of one conversation in one partition...
  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(Seq(convIdAttr)) :: Nil
  // ...sorted by (conv_id, turn_idx): Catalyst inserts the external sort
  override def requiredChildOrdering: Seq[Seq[SortOrder]] =
    Seq(Seq(SortOrder(convIdAttr, Ascending), SortOrder(turnIdxAttr, Ascending)))

  private def attr(name: String) = child.output.find(_.name == name).getOrElse(
    throw new IllegalStateException(s"child of ConversationFold lacks column $name"))
  private def convIdAttr = attr("conv_id")
  private def turnIdxAttr = attr("turn_idx")

  override protected def doExecute(): RDD[InternalRow] = {
    val childOutput = child.output
    val autom = a
    val ser = outSerializer
    child.execute().mapPartitions({ rows =>
      val turnEnc = ExpressionEncoder[Turn]().resolveAndBind(childOutput)
      val fromRow = turnEnc.createDeserializer()
      new Iterator[InternalRow] {
        private var curKey: String = null
        private var state: Any = null
        private val pending = scala.collection.mutable.Queue.empty[Any]
        private var done = false

        private def flushKey(): Unit =
          if (curKey != null) { autom.onComplete(state).foreach(pending.enqueue(_)) }

        @annotation.tailrec
        private def fill(): Unit =
          if (pending.isEmpty && !done) {
            if (rows.hasNext) {
              val t = fromRow(rows.next())
              if (t.conv_id != curKey) {
                flushKey()
                curKey = t.conv_id
                state = autom.initial
              }
              val (s2, out) = autom.onTurn(state, t)
              state = s2
              out.foreach(pending.enqueue(_))
              fill()
            } else {
              flushKey(); done = true
            }
          }

        override def hasNext: Boolean = { fill(); pending.nonEmpty }
        override def next(): InternalRow = {
          fill(); ser(pending.dequeue())
        }
      }
    }, preservesPartitioning = true)
  }

  override protected def withNewChildInternal(newChild: SparkPlan): ConversationFoldExec =
    copy(child = newChild)
}

object ConversationFoldStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case ConversationFoldPlan(a, out, child) =>
      // serializer is built at planning time from the output attributes'
      // schema; the encoder travels inside the exec (task-serialized once)
      val enc = FoldRegistry.encoderFor(out)
      ConversationFoldExec(a, out,
        enc.createSerializer().asInstanceOf[ExpressionEncoder.Serializer[Any]],
        planLater(child)) :: Nil
    case _ => Nil
  }
}

/** Planning-time handoff of the output encoder (the logical plan carries
  * only attributes; Catalyst nodes must stay case classes of plan types). */
object FoldRegistry {
  private val byExprIds =
    new java.util.concurrent.ConcurrentHashMap[Seq[Long], ExpressionEncoder[_]]()
  def register(out: Seq[Attribute], enc: ExpressionEncoder[_]): Unit =
    byExprIds.put(out.map(_.exprId.id), enc)
  def encoderFor(out: Seq[Attribute]): ExpressionEncoder[_] = {
    val e = byExprIds.get(out.map(_.exprId.id))
    require(e != null, "ConversationFold output encoder not registered")
    e
  }
}

object ConversationFold {

  /** Run the automaton as a native Catalyst operator: one shuffle + one
    * spillable sort + a streaming fold. Returns a typed Dataset[O]. */
  def run[S, O](turns: Dataset[Turn], a: TurnAutomaton[S, O])(
      implicit oEnc: Encoder[O]): Dataset[O] = {
    val spark = turns.sparkSession
    // `planner.strategies` includes extension-injected strategies: on a
    // session built with spark.sql.extensions=graft.GraftExtensions the
    // convenience self-registration is a no-op, so the extension path (the
    // production spark-submit route) is what actually plans the node
    if (!spark.sessionState.planner.strategies.contains(ConversationFoldStrategy))
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ ConversationFoldStrategy
    val expr = oEnc match {
      case e: ExpressionEncoder[O] => e
      case ag: org.apache.spark.sql.catalyst.encoders.AgnosticEncoder[O] =>
        ExpressionEncoder(ag)
      case other => throw new IllegalArgumentException(
        s"unsupported encoder ${other.getClass}")
    }
    val outAttrs = org.apache.spark.sql.graftbridge.Bridge.toAttributes(expr.schema)
    FoldRegistry.register(outAttrs, expr.resolveAndBind(outAttrs))
    val plan = ConversationFoldPlan(
      a.asInstanceOf[TurnAutomaton[Any, Any]], outAttrs,
      org.apache.spark.sql.graftbridge.Bridge.logicalPlanOf(turns))
    org.apache.spark.sql.graftbridge.Bridge.ofRows(spark, plan).as[O]
  }
}

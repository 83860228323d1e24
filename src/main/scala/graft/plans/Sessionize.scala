package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, AttributeReference, AttributeSet, BindReferences, GenericInternalRow, JoinedRow, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, CodeGenerator, ExprCode, JavaCode}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.execution.{CodegenSupport, SparkPlan, SparkStrategy, UnaryExecNode}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{BinaryType, LongType, StringType, TimestampType}

/** Whole-operator sessionization as a first-class Catalyst operator —
  * the engine's demonstration of extension tier (c) from the build
  * rules: custom `LogicalPlan` + `SparkStrategy` + `SparkPlan`.
  *
  * Semantics: within each `user` partition ordered by `ts`, assign a
  * 1-based `session_id` that increments whenever the gap to the
  * previous event exceeds `gapMicros` (strictly — matching the batch
  * lag-window twin in EventQueries and the streaming sessionizer).
  *
  * Why an operator instead of the lag-window formulation: the physical
  * node declares `ClusteredDistribution(user)` + per-partition
  * ordering `(user, ts)`, so EnsureRequirements plans exactly one
  * exchange + one sort, the session pass itself is a single streaming
  * iterator (no window-frame buffering), and — because
  * `outputPartitioning` is preserved — a downstream `groupBy(user)`
  * needs NO second shuffle. The lag-window twin costs the same
  * exchange + sort but adds window machinery and re-shuffles for the
  * aggregate unless AQE notices.
  */
case class SessionizeLogical(
    user: Attribute,
    ts: Attribute,
    gapMicros: Long,
    sessionAttr: AttributeReference,
    child: LogicalPlan)
    extends UnaryNode {
  override def output: Seq[Attribute] = child.output :+ sessionAttr
  override def producedAttributes: AttributeSet = AttributeSet(sessionAttr)
  override protected def withNewChildInternal(
      newChild: LogicalPlan): SessionizeLogical = copy(child = newChild)
}

/** Plans [[SessionizeLogical]] into [[SessionizeExec]]. Registered via
  * `spark.experimental.extraStrategies` (equivalently injectable with
  * `SparkSessionExtensions.injectPlannerStrategy` when building the
  * session).
  */
object SessionizeStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case SessionizeLogical(u, t, gap, out, child) =>
      SessionizeExec(u, t, gap, out, planLater(child)) :: Nil
    case _ => Nil
  }
}

case class SessionizeExec(
    user: Attribute,
    ts: Attribute,
    gapMicros: Long,
    sessionAttr: AttributeReference,
    child: SparkPlan)
    extends UnaryExecNode with CodegenSupport {

  override def output: Seq[Attribute] = child.output :+ sessionAttr

  override def producedAttributes: AttributeSet = AttributeSet(sessionAttr)

  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(Seq(user)) :: Nil

  override def requiredChildOrdering: Seq[Seq[SortOrder]] =
    Seq(Seq(SortOrder(user, Ascending), SortOrder(ts, Ascending)))

  override def outputPartitioning: Partitioning = child.outputPartitioning

  override def outputOrdering: Seq[SortOrder] =
    Seq(SortOrder(user, Ascending), SortOrder(ts, Ascending))

  // ---- whole-stage codegen ----------------------------------------
  // The session pass is a per-row map with three words of carried
  // state, so it fuses into the surrounding codegen span (typically
  // Sort → this → HashAggregate) instead of forcing a codegen boundary
  // with per-row iterator dispatch + an UnsafeProjection copy. State
  // lives in generated-class fields; WholeStageCodegenExec instantiates
  // one generated instance per partition, so fields start zeroed
  // exactly where the interpreted path resets its locals.

  override def inputRDDs(): Seq[RDD[InternalRow]] =
    child.asInstanceOf[CodegenSupport].inputRDDs()

  override protected def doProduce(ctx: CodegenContext): String =
    child.asInstanceOf[CodegenSupport].produce(ctx, this)

  override def doConsume(
      ctx: CodegenContext, input: Seq[ExprCode], row: ExprCode): String = {
    val userEv = input(child.output.indexWhere(_.exprId == user.exprId))
    val tsEv = input(child.output.indexWhere(_.exprId == ts.exprId))
    // usedInputs (= references = {user, ts}) are force-evaluated by
    // consume() before this runs, so userEv/tsEv values are live here;
    // the passthrough columns keep their deferred code for downstream.
    val haveUser = ctx.addMutableState(CodeGenerator.JAVA_BOOLEAN, "sessHaveUser")
    val curUserNull = ctx.addMutableState(CodeGenerator.JAVA_BOOLEAN, "sessCurUserNull")
    val curUser =
      ctx.addMutableState(CodeGenerator.javaType(user.dataType), "sessCurUser")
    val lastTs = ctx.addMutableState(CodeGenerator.JAVA_LONG, "sessLastTs")
    val lastTsNull = ctx.addMutableState(CodeGenerator.JAVA_BOOLEAN, "sessLastTsNull")
    val sid = ctx.addMutableState(CodeGenerator.JAVA_LONG, "sessSid")
    val changed = ctx.freshName("groupChanged")
    val sidLocal = ctx.freshName("sessionId")
    val userNull = if (user.nullable) userEv.isNull.toString else "false"
    val tsNull = if (ts.nullable) tsEv.isNull.toString else "false"
    // retained keys must not alias the producer's reused buffers (the
    // sort iterator recycles its record memory) — same clone the
    // interpreted path does
    val store = user.dataType match {
      case StringType => s"$curUser = ${userEv.value}.clone();"
      case BinaryType =>
        s"$curUser = java.util.Arrays.copyOf(${userEv.value}, ${userEv.value}.length);"
      case _ => s"$curUser = ${userEv.value};"
    }
    val sidEv = ExprCode.forNonNullValue(JavaCode.variable(sidLocal, LongType))
    s"""
       |boolean $changed;
       |if (!$haveUser) { $changed = true; }
       |else if ($userNull != $curUserNull) { $changed = true; }
       |else if ($userNull) { $changed = false; }
       |else { $changed = !(${ctx.genEqual(user.dataType, curUser, userEv.value.toString)}); }
       |if ($changed) {
       |  $haveUser = true; $curUserNull = $userNull;
       |  if (!$userNull) { $store }
       |  $sid = 1L; $lastTsNull = true;
       |} else if ($lastTsNull) {
       |  // null previous ts always opens a session (lag-twin semantics)
       |  $sid += 1L;
       |} else if (!$tsNull && ${tsEv.value} - $lastTs > ${gapMicros}L) {
       |  $sid += 1L;
       |}
       |if ($tsNull) { $lastTsNull = true; }
       |else { $lastTsNull = false; $lastTs = ${tsEv.value}; }
       |long $sidLocal = $sid;
       |${consume(ctx, input :+ sidEv)}
     """.stripMargin
  }

  override protected def doExecute(): RDD[InternalRow] = {
    val userBound = BindReferences.bindReference(
      user: org.apache.spark.sql.catalyst.expressions.Expression, child.output)
    val tsBound = BindReferences.bindReference(
      ts: org.apache.spark.sql.catalyst.expressions.Expression, child.output)
    val childOutput = child.output
    val sessAttr = sessionAttr
    val gap = gapMicros
    child.execute().mapPartitions({ iter =>
      val proj = UnsafeProjection.create(
        childOutput :+ sessAttr, childOutput :+ sessAttr)
      val sessRow = new GenericInternalRow(1)
      val joined = new JoinedRow
      var curUser: Any = null
      var haveUser = false
      var lastTs = Long.MinValue
      var lastTsNull = true
      var sid = 0L
      iter.map { row =>
        // copy buffer-backed keys: a UTF8String from eval points into
        // the sort iterator's (reused) record buffer, so retaining it
        // across rows without a clone compares corrupted bytes after
        // a spill
        val u = userBound.eval(row) match {
          case s: org.apache.spark.unsafe.types.UTF8String => s.clone()
          case b: Array[Byte] => java.util.Arrays.copyOf(b, b.length)
          case other => other
        }
        // content equality for binary keys — Scala != on Array[Byte]
        // is reference inequality, which would open a new group on
        // EVERY row (session_id 1 forever) while the codegen path
        // compares bytes; keep both paths agreeing
        val same = (u, curUser) match {
          case (x: Array[Byte], y: Array[Byte]) =>
            java.util.Arrays.equals(x, y)
          case (x, y) => x == y
        }
        val tRaw = tsBound.eval(row)
        if (!haveUser || !same) {
          haveUser = true; curUser = u; sid = 1L; lastTsNull = true
        } else if (lastTsNull) {
          // matches the lag-window twin: a null previous ts (NULLS
          // FIRST under the ascending sort) always opens a session
          sid += 1L
        } else if (tRaw != null &&
            tRaw.asInstanceOf[Long] - lastTs > gap) {
          sid += 1L
        }
        if (tRaw == null) lastTsNull = true
        else { lastTsNull = false; lastTs = tRaw.asInstanceOf[Long] }
        sessRow.setLong(0, sid)
        proj(joined(row, sessRow))
      }
    }, preservesPartitioning = true)
  }

  override protected def withNewChildInternal(
      newChild: SparkPlan): SessionizeExec = copy(child = newChild)
}

/** Public API: append a `session_id` column via the custom operator. */
object Sessionize {

  def apply(
      df: DataFrame,
      userCol: String,
      tsCol: String,
      gapSeconds: Long,
      outCol: String = "session_id"): DataFrame = {
    val spark = df.sparkSession
    if (!spark.experimental.extraStrategies.exists(_ eq SessionizeStrategy))
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ SessionizeStrategy
    val plan = df.queryExecution.analyzed
    def attr(name: String): Attribute =
      plan.output.find(_.name == name).getOrElse(
        throw new IllegalArgumentException(
          s"column $name not in ${plan.output.map(_.name).mkString(",")}"))
    val t = attr(tsCol)
    require(t.dataType == TimestampType || t.dataType == LongType,
      s"$tsCol must be timestamp (µs) or long, got ${t.dataType}")
    // degenerate gaps fail fast: gap <= 0 (a millis-vs-seconds mixup
    // rounding to 0) or a gap whose µs conversion wraps Long would
    // both silently split every event into its own session
    require(gapSeconds > 0 && gapSeconds <= Long.MaxValue / 1000000L,
      s"gapSeconds must be in (0, ${Long.MaxValue / 1000000L}]: " +
        s"$gapSeconds")
    // float/double group keys are rejected: primitive == (codegen)
    // and boxed equals (interpreted) disagree on NaN and ±0.0, so
    // the two execution paths would sessionize differently
    val u0 = attr(userCol)
    require(u0.dataType != org.apache.spark.sql.types.FloatType &&
      u0.dataType != org.apache.spark.sql.types.DoubleType,
      s"$userCol: float/double keys are not supported " +
        "(NaN/±0.0 equality differs between execution paths) — " +
        "cast to a stable key type")
    val out = AttributeReference(outCol, LongType, nullable = false)()
    Bridge.dataFrame(spark,
      SessionizeLogical(attr(userCol), t, gapSeconds * 1000000L, out, plan))
  }
}

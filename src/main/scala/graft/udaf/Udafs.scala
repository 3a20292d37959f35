package graft.udaf

import org.apache.spark.sql.{Column, Encoder, Encoders, SparkSession}
import org.apache.spark.sql.catalyst.dsl.expressions._
import org.apache.spark.sql.catalyst.expressions.{Add, AttributeReference, Cast, Coalesce, EvalMode, Expression, Literal}
import org.apache.spark.sql.catalyst.expressions.aggregate.DeclarativeAggregate
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions
import org.apache.spark.sql.types._

/** `sum_custom(x) -> Float32` — same observable semantics as the
  * reference's `sum_cudarc` UDAF (reference: src/cudarc_sum_udaf.rs):
  *
  *  - exactly one argument, coerced to Float32 regardless of the input's
  *    numeric type (coerce_types, src/cudarc_sum_udaf.rs:71);
  *  - returns Float32 (src/cudarc_sum_udaf.rs:45-47) — unlike Spark's
  *    built-in `sum`, which widens FloatType to DoubleType;
  *  - the partial/final protocol is partial sums merged by addition
  *    (state()/merge_batch, src/cudarc_sum_udaf.rs:154-160), which is
  *    exactly the Aggregator reduce/merge split;
  *  - over zero rows the result is 0.0f, NOT NULL (the accumulator starts
  *    at 0.0 and evaluate returns it; see the cubecl twin at
  *    src/cubecl_sum_udaf.rs:105,207-209).
  *
  * The reference's GPU offload (host→device copy + block-reduction kernel,
  * src/sum.cu:18-29) is an engine detail, not an observable semantic; the
  * Aggregator's reduce/merge is the Spark-native equivalent of the
  * batchwise partial reduction. Float32 accumulation order differs from the
  * 256-thread tree reduction, so tests compare with tolerance.
  */
class SumCustomAgg extends Aggregator[java.lang.Float, Float, Float] {
  override def zero: Float = 0.0f
  override def reduce(b: Float, a: java.lang.Float): Float =
    if (a == null) b else b + a.floatValue()
  override def merge(b1: Float, b2: Float): Float = b1 + b2
  override def finish(reduction: Float): Float = reduction
  override def bufferEncoder: Encoder[Float] = Encoders.scalaFloat
  override def outputEncoder: Encoder[Float] = Encoders.scalaFloat
}

/** `sum_coercing(x) -> Float32` — same observable semantics as the
  * reference's `sum_cubecl` UDAF (reference: src/cubecl_sum_udaf.rs):
  *
  *  - coerce_types trichotomy (src/cubecl_sum_udaf.rs:69-75): signed ints
  *    sum as Int32, unsigned ints as UInt32, floats as Float32; anything
  *    else is a type error;
  *  - the on-device sum therefore happens at 32-bit width, and the final
  *    result is cast to Float32 (src/cubecl_sum_udaf.rs:195-199);
  *  - empty input yields 0.0f, not NULL (src/cubecl_sum_udaf.rs:105,207-209).
  *
  * Spark has no unsigned types (SURVEY §2.4 deviation 3): unsigned inputs
  * cannot occur; signed integer inputs take the Int32 path with Java 32-bit
  * wraparound, matching the reference's i32 device arithmetic.
  *
  * Implemented as a DeclarativeAggregate (pure Catalyst expressions) so the
  * whole aggregate stays inside whole-stage codegen — the type-dependent
  * buffer width cannot be expressed with a single `Aggregator`, and a
  * declarative form beats an imperative buffer at 100 TB because partial
  * aggregation happens map-side in generated code with no serialization.
  *
  * The reference's merge_batch skips zero-valued partial states
  * (src/cubecl_sum_udaf.rs:222-232); for sum that quirk is value-neutral,
  * so plain addition here is observationally equivalent (SURVEY §7
  * deviation 4 — documented, not replicated).
  */
case class SumCoercingAgg(child: Expression, name: String = "sum_coercing")
    extends DeclarativeAggregate {

  // lazy: child.dataType is unavailable until the plan is resolved
  private lazy val sumType: DataType = child.dataType match {
    case FloatType | DoubleType => FloatType
    case ByteType | ShortType | IntegerType | LongType => IntegerType
    case NullType => FloatType
    case other =>
      throw new IllegalArgumentException(
        s"$name: unsupported input type $other (reference coerce_types rejects it)")
  }

  private lazy val sum = AttributeReference("sum", sumType, nullable = false)()

  override lazy val aggBufferAttributes: Seq[AttributeReference] = sum :: Nil

  override lazy val initialValues: Seq[Expression] = Seq(sumType match {
    case FloatType => Literal(0.0f)
    case IntegerType => Literal(0)
  })

  // LEGACY eval mode: the reference's device arithmetic is wrapping i32
  // (src/sum.cu adds in 32-bit); ANSI Add would throw on overflow instead
  private def wrapAdd(l: Expression, r: Expression): Expression =
    Add(l, r, EvalMode.LEGACY)

  override lazy val updateExpressions: Seq[Expression] = Seq(
    wrapAdd(sum, Coalesce(Seq(Cast(child, sumType, None, EvalMode.LEGACY), sumType match {
      case FloatType => Literal(0.0f)
      case IntegerType => Literal(0)
    })))
  )

  override lazy val mergeExpressions: Seq[Expression] = Seq(wrapAdd(sum.left, sum.right))

  // result always Float32 (reference: src/cubecl_sum_udaf.rs:40-42,195-199)
  override lazy val evaluateExpression: Expression = Cast(sum, FloatType)

  override def dataType: DataType = FloatType
  override def nullable: Boolean = false
  override def children: Seq[Expression] = child :: Nil
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
  // registered under both our name and the reference's (`sum_cubecl`);
  // carrying the invoked name keeps REPL output headers verbatim
  override def prettyName: String = name
}

object Udafs {

  /** Register both custom aggregates in the session's function registry,
    * the analogue of `ctx.register_udaf(...)` (reference: src/lib.rs:53-55).
    * Each is registered under BOTH our descriptive name and the
    * reference's published name (`sum_cudarc` / `sum_cubecl`,
    * reference: src/lib.rs:53-55), so the README's REPL transcript
    * (reference: README.md:71-75) replays verbatim. */
  def registerAll(spark: SparkSession): Unit = {
    Seq("sum_custom", "sum_cudarc").foreach { name =>
      spark.udf.register(name, functions.udaf(new SumCustomAgg, Encoders.FLOAT))
    }
    Seq("sum_coercing", "sum_cubecl").foreach { name =>
      spark.sessionState.functionRegistry.createOrReplaceTempFunction(
        name,
        exprs => SumCoercingAgg(exprs.head, name).toAggregateExpression(),
        "scala_udf")
    }
    graft.functions.Registry.registerAll(spark)
  }

  /** Column-API forms. */
  def sum_custom(c: Column): Column = {
    val agg = functions.udaf(new SumCustomAgg, Encoders.FLOAT)
    agg(c)
  }
  def sum_coercing(c: Column): Column = {
    import org.apache.spark.sql.graftbridge.Bridge
    Bridge.column(SumCoercingAgg(Bridge.expression(c)).toAggregateExpression())
  }
}

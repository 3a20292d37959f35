package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo

/** Library entry point for cluster-wide installation: the standard Spark
  * extension hook, enabled with
  *
  *   spark.sql.extensions=graft.GraftExtensions
  *
  * Injects every native graft expression into the session's function
  * registry at session build time — the deployment path a real cluster
  * uses (no code call required), equivalent to the reference registering
  * its UDAFs when the context is constructed (reference: src/lib.rs:53-55).
  * `Engine.configure` remains the programmatic path for an existing
  * session; both share [[graft.functions.Registry.builders]].
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    functions.Registry.builders.foreach { case (name, builder) =>
      ext.injectFunction((
        FunctionIdentifier(name),
        new ExpressionInfo(functions.HashExpressions.getClass.getName, name),
        builder))
    }
}

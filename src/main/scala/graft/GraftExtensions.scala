package graft

import org.apache.spark.sql.SparkSessionExtensions

/** Spark extension entry point: the library's SQL surface injected at
  * session construction, the idiomatic packaging for cluster deploys —
  *
  * {{{
  *   spark-submit --conf spark.sql.extensions=graft.GraftExtensions ...
  * }}}
  *
  * Every session the cluster builds then resolves the engine's
  * functions (currently [[graft.functions.FloatDot float_dot]], the
  * codegen'd ANN dot product) in plain SQL strings with no per-session
  * registration call — notebooks, thrift server, and structured
  * streaming jobs included. Single-JVM harnesses that construct their
  * own bare sessions (the driver contract's Verify/Bench) keep using
  * `FloatDot.register(spark)`; both paths share one builder so the
  * resolved expression is identical.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(extensions: SparkSessionExtensions): Unit = {
    extensions.injectFunction(
      (graft.functions.FloatDot.identifier,
        graft.functions.FloatDot.info,
        graft.functions.FloatDot.builder))
  }
}

package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge into spark-sql's package-private Column ⇄ Expression
  * conversions (`classic.ExpressionUtils` is `private[sql]` in Spark 4).
  * The one sanctioned-by-convention way for an external library to wire a
  * custom Catalyst `Expression` (e.g. graft.functions.HyperplaneSignature)
  * into the public DataFrame API. */
object GraftColumnBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)

  /** Unload every loaded state-store provider on THIS JVM. A
    * bench/verify session that replays hundreds of streaming queries
    * leaves each query's HDFSBacked providers loaded until the
    * maintenance cycle notices the query is gone; in a 656-query sweep
    * the accumulated provider set inflates later STATEFUL entries' task
    * CPU (round-11 measurement: identical state rows/bytes and
    * near-zero GC but multi-x executorRunTime — provider bookkeeping,
    * not the plan). Spark scopes StateStore private[sql], hence this
    * bridge. Safe between queries: the next stateful query reloads its
    * providers from the checkpoint.
    *
    * SCOPE: local-mode only — under local-cluster / a real cluster the
    * providers live in executor processes this call never reaches; use
    * [[unloadStateStores(spark*]] there. */
  def unloadStateStores(): Unit =
    org.apache.spark.sql.execution.streaming.state.StateStore.unloadAll()

  /** [[unloadStateStores()]] on the driver AND (best-effort) on every
    * executor JVM — the multi-JVM certification mode
    * (SPARK_GRAFT_MASTER=local-cluster) keeps providers in executor
    * processes, where the no-arg form silently no-ops. One short task
    * per executor slot ×2 statistically covers every executor; a missed
    * one just keeps paying the bookkeeping it already paid, so
    * best-effort is sound. */
  def unloadStateStores(spark: SparkSession): Unit = {
    org.apache.spark.sql.execution.streaming.state.StateStore.unloadAll()
    val sc = spark.sparkContext
    if (!sc.isLocal) {
      val slots = math.max(1, sc.defaultParallelism * 2)
      sc.parallelize(0 until slots, slots).foreach { _ =>
        org.apache.spark.sql.execution.streaming.state.StateStore.unloadAll()
      }
    }
  }

  /** Eager Column → Catalyst conversion for FunctionRegistry builders
    * (GraftFunctions): `expression` returns a LAZY ColumnNodeExpression
    * wrapper that only DataFrame API boundaries unwrap — inside SQL
    * analysis it would reach codegen unconverted. This walks the node
    * tree to a real (possibly unresolved) Catalyst expression the
    * analyzer then resolves like any parsed SQL. */
  def sqlExpression(c: Column): Expression =
    classic.ColumnNodeToExpressionConverter(c.node)

  /** Test seam for the config-driven injection path
    * (`spark.sql.extensions=graft.GraftExtensions`):
    * `SparkSessionExtensions.registerFunctions` is `private[sql]`, so the
    * extensions-spec applies an injected extensions object to a cloned
    * registry through here. */
  def registerFunctions(ext: SparkSessionExtensions,
      reg: org.apache.spark.sql.catalyst.analysis.FunctionRegistry)
      : org.apache.spark.sql.catalyst.analysis.FunctionRegistry =
    ext.registerFunctions(reg)
}

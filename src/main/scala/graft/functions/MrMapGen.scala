package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, Generator}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types.{StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** SQL-visible form of the MapReduce kernel's user map — a Catalyst
  * `Generator` so a plain SQL user can run a plugin map without the
  * Scala API (the reference's map contract, `mr/types.go:56-58`):
  *
  * {{{ SELECT mr_map('wc', file, contents) AS (key, value) FROM t }}}
  *
  * The app name must be a LITERAL: it binds at plan time through
  * `Apps.lookup` — registry names ('wc', 'indexer', ...) hit the
  * static map and dotted fully-qualified class names take the dynamic
  * load path — so an unknown app fails at ANALYSIS, the way a bad
  * `.so` path fails worker startup (`mr_worker.go:26-43`), never per
  * task. Executors re-resolve the app by name on first use
  * (@transient lazy), exactly as each reference worker process
  * dlopens the plugin itself.
  *
  * The reduce side needs no counterpart expression: grouped
  * aggregation over the generated (key, value) rows IS the reduce,
  * declared in SQL (`GROUP BY key`) where Catalyst can pick
  * partial-aggregation — which the opaque `Reduce(key, values)`
  * closure of the kernel path cannot.
  */
case class MrMapGen(appName: Expression, file: Expression, contents: Expression)
    extends Generator with CodegenFallback {

  override def children: Seq[Expression] = Seq(appName, file, contents)

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(appName = newChildren(0), file = newChildren(1), contents = newChildren(2))

  private def resolvedName: String = String.valueOf(appName.eval(null))

  override def checkInputDataTypes(): TypeCheckResult =
    if (children.exists(_.dataType != StringType))
      TypeCheckResult.TypeCheckFailure("mr_map(app, file, contents) takes three strings")
    else if (!appName.foldable)
      TypeCheckResult.TypeCheckFailure(
        "mr_map: the app name must be a literal (it binds at plan time, " +
          "like a worker's plugin path)")
    else
      try {
        graft.engine.Apps.lookup(resolvedName) // unknown app = analysis error
        TypeCheckResult.TypeCheckSuccess
      } catch {
        case e: Throwable => TypeCheckResult.TypeCheckFailure(s"mr_map: $e")
      }

  // per-executor-JVM resolution, like a worker's own dlopen
  @transient private lazy val app: graft.engine.MrApp =
    graft.engine.Apps.lookup(resolvedName)

  override def elementSchema: StructType = StructType(Seq(
    StructField("key", StringType, nullable = false),
    StructField("value", StringType, nullable = false)))

  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val f = file.eval(input)
    val c = contents.eval(input)
    if (f == null || c == null) Iterator.empty
    else
      app.map(f.toString, c.toString).iterator.map { kv =>
        InternalRow(UTF8String.fromString(kv.key), UTF8String.fromString(kv.value))
      }
  }
}

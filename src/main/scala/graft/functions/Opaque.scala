package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.DataType

/** Identity wrapper that the optimizer must treat as a black box
  * (`deterministic = false`): evaluation and codegen delegate to the child
  * unchanged, but alias substitution, filter pushdown, and constraint
  * inference all stop at it.
  *
  * Exists for the SYNTHETIC FIXTURE columns (url/html/robots planes): the
  * driver's testdata ships one parquet row group per table, so the scan
  * cannot split below one task and [[graft.util.Tables]] round-robins it to
  * the session floor right above the scan. A downstream filter on a fixture
  * column (`urlParses(url)`, `url_norm IS NOT NULL`) is deterministic, so
  * the optimizer pushes it BELOW that repartition with the whole fixture
  * expression tree substituted — and the un-splittable scan task then
  * evaluates the fixture construction serially per row (measured r20:
  * 0.55–0.9 s single-task scan stages on every url-plane query; x124 paid
  * three of them). Wrapping the fixture column in `Opaque` pins the filter
  * ABOVE the repartition, so the scan task decodes parquet and nothing
  * else, and the fixture + filter run at the session's scan-floor
  * parallelism.
  *
  * FIXTURE-ONLY by policy: production operators keep their deterministic
  * predicates (`Curation.urlParses` et al.) exactly so they DO reach a real
  * deployment's splittable scan (guide §6 pushdown discipline). A fixture
  * is bench surface — there is no real scan to prune, only a serial task
  * to avoid. Results are bit-identical (identity), only plan placement
  * changes. */
case class Opaque(child: Expression) extends UnaryExpression {

  override lazy val deterministic: Boolean = false

  override def nullable: Boolean = child.nullable

  override def dataType: DataType = child.dataType

  override def prettyName: String = "opaque"

  override def eval(input: InternalRow): Any = child.eval(input)

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    val c = child.genCode(ctx)
    ev.copy(code = c.code, isNull = c.isNull, value = c.value)
  }

  override protected def withNewChildInternal(newChild: Expression): Opaque =
    copy(child = newChild)
}

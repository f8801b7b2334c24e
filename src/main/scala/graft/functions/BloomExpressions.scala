package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream}

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{BooleanType, DataType, LongType}
import org.apache.spark.util.sketch.BloomFilter

/** Bloom-filter membership as a native codegen'd predicate.
  *
  * Spark's own runtime-filter machinery (`InjectRuntimeFilter`) plants the
  * same shape automatically for eligible shuffle joins; this is the
  * explicit, user-directed variant for the 100 TB semi-join pattern where
  * the dimension key set is known to be small relative to the fact table
  * (see [[graft.ops.BloomJoin]]).
  */
object BloomExpressions {

  /** Serialized image of a `spark-sketch` Bloom filter — the stable wire
    * form, so the expression tree stays serializable and `transient`-safe.
    */
  def serialize(bf: BloomFilter): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    bf.writeTo(out)
    out.toByteArray
  }

  /** `mightContainLong(child)` over a fixed filter image. One hash-probe
    * per row through a codegen reference-table object — no UDF boxing, no
    * per-row deserialization (the filter is rebuilt once per task from the
    * byte image). NULL keys yield NULL (row filtered), matching semi-join
    * semantics where NULL never matches.
    */
  case class BloomMightContainLong(child: Expression, bytes: Array[Byte])
      extends UnaryExpression {

    override def dataType: DataType = BooleanType
    override def checkInputDataTypes()
        : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
      if (child.dataType == LongType)
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      else
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"bloom_might_contain expects BIGINT, got ${child.dataType.sql}")
    }

    @transient private lazy val filter: BloomFilter =
      BloomFilter.readFrom(new ByteArrayInputStream(bytes))

    /** Called from generated code — must be public. */
    def probe(v: Long): Boolean = filter.mightContainLong(v)

    override protected def nullSafeEval(v: Any): Any =
      filter.mightContainLong(v.asInstanceOf[Long])

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val ref = ctx.addReferenceObj("bloomProbe", this,
        classOf[BloomMightContainLong].getName)
      defineCodeGen(ctx, ev, c => s"$ref.probe($c)")
    }

    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  def mightContainLong(key: Column, bytes: Array[Byte]): Column =
    ColumnBridge.column(
      BloomMightContainLong(ColumnBridge.expression(key), bytes))
}

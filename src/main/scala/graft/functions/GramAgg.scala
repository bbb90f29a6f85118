package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Mutable upper-triangle Gram accumulator: cell (i, j≥i) of XᵀX over
  * scaled-integer vectors, flattened row-major (i ascending, j from i).
  */
final class GramBuffer(var dims: Int, var cells: Array[Long]) {
  def ensure(n: Int): Unit = {
    if (dims == -1) { dims = n; cells = new Array[Long](n * (n + 1) / 2) }
    else require(dims == n, s"graft_gram_upper: vector length $n != first row's $dims")
  }

  def add(qv: ArrayData): Unit = {
    val n = qv.numElements()
    ensure(n)
    // Null ELEMENTS are skipped like an aggregate sum skips null
    // products (ADVICE r15: the unguarded getLong NPE'd on
    // GenericArrayData and silently read 0 on UnsafeArrayData —
    // divergent physical-format behavior). Lake vectors carry no
    // nulls; on hostile input each null term now contributes nothing,
    // on BOTH formats. Deliberate residual divergence from the
    // composed explode form: a position that is null in EVERY vector
    // yields no (i, j) group there vs a g=0 cell here.
    var k = 0
    var i = 0
    while (i < n) {
      if (!qv.isNullAt(i)) {
        val vi = qv.getLong(i)
        var j = i
        while (j < n) {
          if (!qv.isNullAt(j)) cells(k) += vi * qv.getLong(j)
          k += 1; j += 1
        }
      } else k += n - i
      i += 1
    }
  }

  def mergeFrom(o: GramBuffer): Unit = {
    if (o.dims != -1) {
      if (dims == -1) { dims = o.dims; cells = o.cells.clone() }
      else {
        require(dims == o.dims, s"graft_gram_upper: merge $dims != ${o.dims}")
        var k = 0
        while (k < cells.length) { cells(k) += o.cells(k); k += 1 }
      }
    }
  }

  def serialize(): Array[Byte] = {
    val len = if (dims == -1) 0 else cells.length
    val bb = ByteBuffer.allocate(4 + 8 * len)
    bb.putInt(dims)
    var k = 0
    while (k < len) { bb.putLong(cells(k)); k += 1 }
    bb.array()
  }
}

object GramBuffer {
  def empty: GramBuffer = new GramBuffer(-1, null)

  def deserialize(bytes: Array[Byte]): GramBuffer = {
    val bb = ByteBuffer.wrap(bytes)
    val dims = bb.getInt
    if (dims == -1) empty
    else {
      val cells = new Array[Long](dims * (dims + 1) / 2)
      var k = 0
      while (k < cells.length) { cells(k) = bb.getLong; k += 1 }
      new GramBuffer(dims, cells)
    }
  }

  val cellType: StructType = StructType(Seq(
    StructField("i", LongType, nullable = false),
    StructField("j", LongType, nullable = false),
    StructField("g", LongType, nullable = false)))
}

/** `graft_gram_upper(qv)` — the upper triangle of the exact integer
  * Gram/scatter matrix XᵀX over array<long> vectors, as ONE aggregate:
  * an array of {i, j, g} structs (i ≤ j, (i, j) ascending).
  *
  * Why an aggregate and not a double explode: the composed form
  * (posexplode × posexplode → groupBy (i, j) → sum) feeds
  * n·d(d+1)/2 rows through the aggregation machinery — 2080 rows per
  * vector at d=64, 416M at the sf10 decade — to produce 2080 groups.
  * This accumulator reads each VECTOR once (one row per vector into
  * the agg), does the d(d+1)/2 multiply-adds in a tight primitive
  * loop, and merges one 2080-cell long array per partition. Exact
  * integer sums in any partitioning/merge order (addition commutes);
  * identical to the composed form by construction (GramAggSpec pins
  * the equality on random inputs).
  */
case class GramUpperAgg(
    child: Expression,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[GramBuffer] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(GramBuffer.cellType, containsNull = false)
  override def prettyName: String = "graft_gram_upper"

  override def createAggregationBuffer(): GramBuffer = GramBuffer.empty

  override def update(buffer: GramBuffer, input: InternalRow): GramBuffer = {
    val v = child.eval(input)
    if (v != null) buffer.add(v.asInstanceOf[ArrayData])
    buffer
  }

  override def merge(buffer: GramBuffer, input: GramBuffer): GramBuffer = {
    buffer.mergeFrom(input); buffer
  }

  override def eval(buffer: GramBuffer): Any = {
    val n = if (buffer.dims == -1) 0 else buffer.dims
    val out = new Array[Any](n * (n + 1) / 2)
    var k = 0
    var i = 0
    while (i < n) {
      var j = i
      while (j < n) {
        out(k) = InternalRow(i.toLong, j.toLong, buffer.cells(k))
        k += 1; j += 1
      }
      i += 1
    }
    new GenericArrayData(out)
  }

  override def serialize(buffer: GramBuffer): Array[Byte] = buffer.serialize()
  override def deserialize(storageFormat: Array[Byte]): GramBuffer =
    GramBuffer.deserialize(storageFormat)

  override def withNewMutableAggBufferOffset(newOffset: Int): GramUpperAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): GramUpperAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): GramUpperAgg =
    copy(child = newChildren(0))
}

package graft.functions

import scala.collection.mutable.ArrayBuffer
import scala.jdk.CollectionConverters._
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.types.{BinaryType, DataType}
import org.locationtech.jts.geom.Geometry
import graft.geo.Geo

/** Dissolving geometry union as a native TypedImperativeAggregate
  * (SURVEY §2.10 UDAF row: "TypedImperativeAggregate if we need
  * partial-merge efficiency").
  *
  * Unlike the collect_list-based `st_union_array` (which ships every
  * input geometry through the shuffle and unions once at the reducer),
  * this aggregate compacts its buffer with a cascaded union whenever it
  * exceeds [[CompactAt]] — so map-side partial aggregation dissolves
  * geometry BEFORE the exchange, and the shuffle carries at most one
  * compacted geometry per partition per group. At 100 TB (millions of
  * parcels per group) that is the difference between shuffling the
  * dataset and shuffling one polygon per task.
  */
case class GeoUnionAgg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[ArrayBuffer[Geometry]]
  with UnaryLike[Expression] {

  private val CompactAt = 16

  override def createAggregationBuffer(): ArrayBuffer[Geometry] =
    ArrayBuffer.empty

  private def compact(b: ArrayBuffer[Geometry]): Unit =
    if (b.length >= CompactAt) {
      val u = Geo.unionAll(b.toSeq)
      b.clear()
      b += u
    }

  override def update(b: ArrayBuffer[Geometry],
      input: InternalRow): ArrayBuffer[Geometry] = {
    val v = child.eval(input)
    if (v != null) {
      b += Geo.fromWkb(v.asInstanceOf[Array[Byte]])
      compact(b)
    }
    b
  }

  override def merge(b: ArrayBuffer[Geometry],
      o: ArrayBuffer[Geometry]): ArrayBuffer[Geometry] = {
    b ++= o
    compact(b)
    b
  }

  override def eval(b: ArrayBuffer[Geometry]): Any =
    Geo.toWkb(Geo.unionAll(b.toSeq))

  override def serialize(b: ArrayBuffer[Geometry]): Array[Byte] =
    Geo.toWkb(Geo.factory.createGeometryCollection(b.toArray))

  override def deserialize(bytes: Array[Byte]): ArrayBuffer[Geometry] = {
    val gc = Geo.fromWkb(bytes)
    val out = ArrayBuffer.empty[Geometry]
    (0 until gc.getNumGeometries).foreach(i => out += gc.getGeometryN(i))
    out
  }

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def withNewMutableAggBufferOffset(
      offset: Int): GeoUnionAgg = copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(
      offset: Int): GeoUnionAgg = copy(inputAggBufferOffset = offset)
  override protected def withNewChildInternal(
      newChild: Expression): GeoUnionAgg = copy(child = newChild)
  override def prettyName: String = "st_union_agg"
}

package graft.sources

import org.apache.spark.sql.types.{DataType, Decimal, LongType}
import org.apache.spark.sql.vectorized.{ColumnVector, ColumnarArray, ColumnarMap}
import org.apache.spark.unsafe.types.UTF8String

/** d66 (ALTER COLUMN TYPE widening): presents a vector decoded with a
  * file's NARROW stored type (int32 / float) as the table's widened
  * type (bigint / double) — zero copy, the upcast happens per access.
  * Only files that predate the widen pay the (virtual-call) adapter;
  * post-widen files store the wide type and take the direct vectorized
  * path. This is the columnar face of Iceberg's lossless type
  * promotion: the bytes stay narrow on disk forever, readers widen. */
class UpcastColumnVector(child: ColumnVector, target: DataType)
  extends ColumnVector(target) {
  private val intToLong = target == LongType // else float -> double

  override def close(): Unit = child.close()
  override def hasNull: Boolean = child.hasNull
  override def numNulls: Int = child.numNulls
  override def isNullAt(i: Int): Boolean = child.isNullAt(i)
  override def getBoolean(i: Int): Boolean = child.getBoolean(i)
  override def getByte(i: Int): Byte = child.getByte(i)
  override def getShort(i: Int): Short = child.getShort(i)
  override def getInt(i: Int): Int = child.getInt(i)
  override def getLong(i: Int): Long =
    if (intToLong) child.getInt(i).toLong else child.getLong(i)
  override def getFloat(i: Int): Float = child.getFloat(i)
  override def getDouble(i: Int): Double =
    if (intToLong) child.getDouble(i) else child.getFloat(i).toDouble
  override def getArray(i: Int): ColumnarArray = child.getArray(i)
  override def getMap(i: Int): ColumnarMap = child.getMap(i)
  override def getDecimal(i: Int, precision: Int, scale: Int): Decimal =
    child.getDecimal(i, precision, scale)
  override def getUTF8String(i: Int): UTF8String = child.getUTF8String(i)
  override def getBinary(i: Int): Array[Byte] = child.getBinary(i)
  override def getChild(i: Int): ColumnVector = child.getChild(i)
}

package graft.sources

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.functions.{BoundFunction, ScalarFunction, UnboundFunction}
import org.apache.spark.sql.types._

/** d90: the connector's catalog FUNCTIONS — the piece Spark needs to
  * plan storage-partitioned joins over TRANSFORM layouts (Iceberg's
  * `SparkFunctions` pattern). When a scan reports
  * `KeyGroupedPartitioning(bucket(n, col))`, Catalyst resolves the
  * `bucket` transform through the relation's FunctionCatalog and
  * compares both join sides by the bound function's canonical name —
  * without the function the report silently degrades to unknown
  * partitioning and a bucketed fact⋈fact join pays both exchanges.
  *
  * The bound function's semantics MUST equal the write layout's dir
  * derivation (`IceLite.transformExpr`: `pmod(hash(col), n)`, Spark's
  * Murmur3 with seed 42) — it is also what Spark executes if it
  * chooses to shuffle a non-bucketed side INTO this layout
  * (spark.sql.sources.v2.bucketing.shuffle.enabled), so a mismatch
  * would co-locate the wrong rows. Canonical names carry the key type
  * (Murmur3 of an Int ≠ of a Long): two sides match only when their
  * key columns hash identically. */
object GraftFunctions {
  val names: Seq[String] = Seq("bucket")

  def load(name: String): Option[UnboundFunction] = name match {
    case "bucket" => Some(BucketUnbound)
    case _ => None
  }

  object BucketUnbound extends UnboundFunction {
    override def name(): String = "bucket"
    override def description(): String =
      "bucket(numBuckets, col) — Murmur3 pmod numBuckets, the hidden-partition write layout's hash"
    override def bind(inputType: StructType): BoundFunction = {
      require(inputType.fields.length == 2,
        s"bucket takes (numBuckets int, value), got ${inputType.catalogString}")
      require(inputType.fields(0).dataType == IntegerType,
        s"bucket's first argument is the int bucket count, got " +
          inputType.fields(0).dataType.catalogString)
      new BucketBound(inputType.fields(1).dataType)
    }
  }

  final class BucketBound(keyType: DataType) extends ScalarFunction[Integer] {
    override def inputTypes(): Array[DataType] = Array(IntegerType, keyType)
    override def resultType(): DataType = IntegerType
    override def name(): String = "bucket"
    override def canonicalName(): String =
      s"graft.bucket(${keyType.catalogString})"
    override def isResultNullable: Boolean = false
    override def produceResult(input: InternalRow): Integer = {
      val n = input.getInt(0)
      val v = input.get(1, keyType)
      // null keeps the seed unchanged — exactly what the write path's
      // `hash()` expression does with a null column value
      val h =
        if (v == null) 42
        else org.apache.spark.sql.catalyst.expressions.Murmur3HashFunction
          .hash(v, keyType, 42L).toInt
      val m = h % n
      Integer.valueOf(if (m < 0) m + n else m)
    }
  }
}

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
/** The FunctionCatalog face both catalogs mix in — ONE copy of the
  * resolution contract (Catalyst asks for `Identifier.of(Array.empty,
  * name)`; `system` is the user-facing alias Iceberg also serves), so
  * the owner and the REST attachment can never drift apart and break
  * SPJ through whichever face missed an edit. */
trait GraftFunctionCatalog
  extends org.apache.spark.sql.connector.catalog.FunctionCatalog
  with org.apache.spark.sql.connector.catalog.SupportsNamespaces {
  import org.apache.spark.sql.connector.catalog.Identifier

  private def isFnNamespace(ns: Array[String]): Boolean =
    ns.isEmpty || ns.sameElements(Array("system"))

  override def listFunctions(namespace: Array[String]): Array[Identifier] =
    if (isFnNamespace(namespace))
      GraftFunctions.names.map(Identifier.of(namespace, _)).toArray
    else if (namespaceExists(namespace)) Array.empty
    else throw new org.apache.spark.sql.catalyst.analysis
      .NoSuchNamespaceException(name() +: namespace.toSeq)

  override def loadFunction(ident: Identifier)
      : org.apache.spark.sql.connector.catalog.functions.UnboundFunction =
    (if (isFnNamespace(ident.namespace)) GraftFunctions.load(ident.name)
     else None).getOrElse(throw new org.apache.spark.sql.catalyst
      .analysis.NoSuchFunctionException(ident))
}

object GraftFunctions {
  val names: Seq[String] =
    Seq("bucket", "truncate", "days", "months", "years", "hours")

  // the width-family names the scan reports for SPJ ("truncate4" =
  // prefix-4): Spark's KeyGroupedPartitioning supports only
  // single-reference transforms (physical.KeyGroupedPartitioning.
  // supportsExpressions; only `bucket` gets its literal lifted into
  // numBucketsOpt), so the width must live in the NAME, not an
  // argument — which also makes cross-width co-location impossible
  // by construction (different names never resolve equal functions)
  private val TruncateN = "truncate([0-9]+)".r

  def load(name: String): Option[UnboundFunction] = name match {
    case "bucket" => Some(BucketUnbound)
    case "truncate" => Some(TruncateUnbound)
    // length guard first: a width string that overflows Int (a SQL
    // reference to `truncate99999999999`) must fall through to the
    // normal unresolved-function error, not surface a raw
    // NumberFormatException from the pattern guard (ADVICE r13)
    case TruncateN(w) if w.length <= 9 && w.toInt >= 1 =>
      Some(new TruncateWidthUnbound(w.toInt))
    case "days" | "months" | "years" | "hours" => Some(new TimeUnbound(name))
    case _ => None
  }

  /** The SESSION-ZONE day/month/year/hour keys the write layout's
    * `date_format` dirs encode, as Iceberg-convention ints: days →
    * epoch days (DateType), months → months since 1970-01, years →
    * years since 1970, hours → hours since epoch OF THE LOCAL HOUR.
    * Shared by the bound functions (executor-side, zone captured at
    * bind) and the scan's dir→key parsing (driver-side, plan-time
    * zone) so the two can never diverge. */
  private[sources] def zonedFields(micros: Long, zone: java.time.ZoneId)
      : java.time.ZonedDateTime =
    java.time.ZonedDateTime.ofInstant(
      java.time.Instant.ofEpochSecond(
        Math.floorDiv(micros, 1000000L),
        Math.floorMod(micros, 1000000L) * 1000L), zone)

  private[sources] def timeKey(transform: String,
      zdt: java.time.ZonedDateTime): Int = transform match {
    case "days"   => zdt.toLocalDate.toEpochDay.toInt
    case "months" => (zdt.getYear - 1970) * 12 + zdt.getMonthValue - 1
    case "years"  => zdt.getYear - 1970
    // LABEL math, not epoch-hours: the dir collapses a DST fall-back's
    // two offsets into ONE "yyyy-MM-dd-HH" label, so the key must too —
    // an epoch-hour key would route the repeated hour's second
    // occurrence to a key no split claims (one-side-shuffle rows
    // silently miss their partner). epochDay*24 + localHour is the
    // dir label as an int, zone consulted only to read local fields.
    case "hours"  =>
      zdt.toLocalDate.toEpochDay.toInt * 24 + zdt.getHour
    case t => throw new IllegalArgumentException(s"not a time transform: $t")
  }

  /** The key a DERIVED DIR VALUE encodes (the scan's split keys).
    * All four time dirs are zone-independent LABELS — the zone only
    * enters when the bound function derives the label from an
    * instant ([[timeKey]]). */
  private[sources] def dirTimeKey(transform: String, dir: String): Int =
    transform match {
      case "days"   => java.time.LocalDate.parse(dir).toEpochDay.toInt
      case "months" =>
        val Array(y, m) = dir.split('-')
        (y.toInt - 1970) * 12 + m.toInt - 1
      case "years"  => dir.toInt - 1970
      case "hours"  => // dir shape yyyy-MM-dd-HH
        java.time.LocalDate.parse(dir.take(10)).toEpochDay.toInt * 24 +
          dir.drop(11).toInt
      case t => throw new IllegalArgumentException(s"not a time transform: $t")
    }

  /** days/months/years/hours over a timestamp or date column. The
    * bound form captures the SESSION zone at bind (analysis happens
    * on the driver) — the same zone the write layout's `date_format`
    * derived its dirs in, so a one-side shuffle into this layout
    * co-locates with the dirs. Cross-zone caveat: like every other
    * consumer of the dirs (pruning, NOTES #49), this assumes the
    * table was written under the reading session's zone. */
  final class TimeUnbound(transform: String) extends UnboundFunction {
    override def name(): String = transform
    override def description(): String =
      s"$transform(col) — the write layout's session-zone $transform key"
    override def bind(inputType: StructType): BoundFunction = {
      require(inputType.fields.length == 1,
        s"$transform takes one temporal argument, got ${inputType.catalogString}")
      val kt = inputType.fields(0).dataType
      require(kt == TimestampType || kt == DateType,
        s"$transform takes timestamp or date, got ${kt.catalogString}")
      val zone = scala.util.Try(org.apache.spark.sql.SparkSession.active
        .sessionState.conf.sessionLocalTimeZone).getOrElse("UTC")
      new TimeBound(transform, kt, zone)
    }
  }

  final class TimeBound(transform: String, keyType: DataType,
      zoneId: String) extends ScalarFunction[Integer] {
    override def inputTypes(): Array[DataType] = Array(keyType)
    override def resultType(): DataType =
      if (transform == "days") DateType else IntegerType
    override def name(): String = transform
    override def canonicalName(): String =
      s"graft.$transform(${keyType.catalogString})"
    override def isResultNullable: Boolean = false
    override def produceResult(input: InternalRow): Integer = {
      val zone = java.time.ZoneId.of(zoneId)
      val zdt = keyType match {
        case TimestampType => zonedFields(input.getLong(0), zone)
        case DateType => java.time.LocalDate.ofEpochDay(input.getInt(0).toLong)
          .atStartOfDay(zone)
        case t => throw new IllegalStateException(s"unbindable type $t")
      }
      Integer.valueOf(timeKey(transform, zdt))
    }
  }

  /** truncate(width, col) over a STRING column — the write layout's
    * `substring(col, 1, width)` prefix (IceLite.transformExpr), the
    * key two truncate-partitioned tables co-locate on. String keys
    * only: the write path derives non-string truncate dirs through a
    * string CAST, whose rendering has no typed function twin — a
    * non-string side must not pretend to co-locate (NOTES #55's rule:
    * the function must BE the layout's derivation, exactly). An
    * equi-join on the source column implies equal prefixes, so the
    * prefix IS a co-location key for equality joins — same shape
    * Iceberg's SparkFunctions serves. */
  object TruncateUnbound extends UnboundFunction {
    override def name(): String = "truncate"
    override def description(): String =
      "truncate(width, col) — the write layout's string-prefix key"
    override def bind(inputType: StructType): BoundFunction = {
      require(inputType.fields.length == 2,
        s"truncate takes (width int, value), got ${inputType.catalogString}")
      require(inputType.fields(0).dataType == IntegerType,
        s"truncate's first argument is the int width, got " +
          inputType.fields(0).dataType.catalogString)
      require(inputType.fields(1).dataType == StringType,
        "truncate co-location is served for string keys only (the " +
          "write layout casts non-strings before prefixing; that cast " +
          "has no exact typed twin)")
      TruncateBound
    }
  }

  object TruncateBound
    extends ScalarFunction[org.apache.spark.unsafe.types.UTF8String] {
    override def inputTypes(): Array[DataType] =
      Array(IntegerType, StringType)
    override def resultType(): DataType = StringType
    override def name(): String = "truncate"
    override def canonicalName(): String = "graft.truncate(string)"
    override def produceResult(input: InternalRow)
        : org.apache.spark.unsafe.types.UTF8String = {
      // null on ANY null input — Iceberg's truncate contract; a raw
      // getInt(0) would read a null width as 0 and return "" (ADVICE
      // r13; only the SQL-facing two-arg form can see a null width)
      if (input.isNullAt(0) || input.isNullAt(1)) null
      else {
        // substringSQL = Spark's `substring(col, 1, w)` — code-point
        // positions, the exact write-side expression
        input.getUTF8String(1).substringSQL(1, input.getInt(0))
      }
    }
  }

  /** The SPJ face of truncate: `truncate<w>(col)` with the width in
    * the function NAME (see [[TruncateN]] — Spark's key-grouped
    * partitioning admits single-reference transforms only). Same
    * string-prefix semantics as [[TruncateBound]]. */
  final class TruncateWidthUnbound(width: Int) extends UnboundFunction {
    override def name(): String = s"truncate$width"
    override def description(): String =
      s"truncate$width(col) — the write layout's $width-char string prefix"
    override def bind(inputType: StructType): BoundFunction = {
      require(inputType.fields.length == 1,
        s"truncate$width takes one string argument, got " +
          inputType.catalogString)
      inputType.fields(0).dataType match {
        case StringType => new TruncateWidthBound(width)
        // r14: typed twins for the ZONE-FREE casts — the write layout
        // is substring(CAST(col AS STRING), 1, w), and int/long/
        // decimal renderings are deterministic (Long.toString /
        // Decimal.toString are exactly Spark's Cast), so a numeric
        // truncate layout co-locates for SPJ like a string one.
        // Temporal casts stay refused: they render in the SESSION
        // zone, which an executor-bound function cannot see.
        case t @ (IntegerType | LongType | _: DecimalType) =>
          new TruncateWidthTypedBound(width, t)
        case other => throw new IllegalArgumentException(
          "truncate co-location is served for string, int, long and " +
            s"decimal keys, got ${other.catalogString} (temporal casts " +
            "render in the session zone — no exact zone-free twin)")
      }
    }
  }

  final class TruncateWidthBound(width: Int)
    extends ScalarFunction[org.apache.spark.unsafe.types.UTF8String] {
    override def inputTypes(): Array[DataType] = Array(StringType)
    override def resultType(): DataType = StringType
    override def name(): String = s"truncate$width"
    override def canonicalName(): String = s"graft.truncate($width, string)"
    override def produceResult(input: InternalRow)
        : org.apache.spark.unsafe.types.UTF8String =
      if (input.isNullAt(0)) null
      else input.getUTF8String(0).substringSQL(1, width)
  }

  /** r14: the typed truncate twin — evaluates the write layout's
    * EXACT expression for a non-string source column,
    * `substring(CAST(col AS STRING), 1, w)`. Result type is STRING
    * (the derived dir value), matching the key the scan's splits
    * report; the canonical name is typed so cross-type layouts never
    * pretend to co-locate. */
  final class TruncateWidthTypedBound(width: Int, keyType: DataType)
    extends ScalarFunction[org.apache.spark.unsafe.types.UTF8String] {
    override def inputTypes(): Array[DataType] = Array(keyType)
    override def resultType(): DataType = StringType
    override def name(): String = s"truncate$width"
    override def canonicalName(): String =
      s"graft.truncate($width, ${keyType.catalogString})"
    override def produceResult(input: InternalRow)
        : org.apache.spark.unsafe.types.UTF8String =
      if (input.isNullAt(0)) null
      else {
        // Long.toString / Integer.toString / Decimal.toString are
        // byte-for-byte Spark's Cast-to-string of these types
        val rendered = keyType match {
          case IntegerType => String.valueOf(input.getInt(0))
          case LongType => String.valueOf(input.getLong(0))
          case d: DecimalType =>
            input.getDecimal(0, d.precision, d.scale).toString
          case other => throw new IllegalStateException(
            s"unbindable truncate key type $other") // bind() gates
        }
        org.apache.spark.unsafe.types.UTF8String.fromString(rendered)
          .substringSQL(1, width)
      }
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

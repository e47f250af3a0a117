package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native one-pass MinHash signature over an `array<string>` shingle
  * set (SURVEY §4.3's optional native tier; ROADMAP round-3 item).
  *
  * The HOF formulation — `transform(sequence(0, k-1), h ->
  * array_min(transform(shingles, s -> xxhash64(s, h))))` — walks the
  * shingle array k times and re-hashes every shingle string k times,
  * all in interpreted HigherOrderFunction lambdas. This expression
  * makes ONE pass: each shingle is hashed twice (xxhash64 with two
  * seeds), and the k per-hash values derive from the standard
  * Kirsch–Mitzenmacher construction g_i(s) = h1(s) + i·h2(s), whose
  * minima update a local long[k]. Cost per shingle drops from
  * k string hashes to 2 string hashes + k mult-adds, and the loop is
  * whole-stage-codegen'd.
  *
  * NULL semantics follow the HOF path (NOTES.md rule 15): a null
  * array → NULL; a null element → NULL (xxhash64 of a null child
  * yields the seed, but array_min over any-null in the HOF version is
  * still well-defined — here we propagate NULL, and c02 filters empty
  * docs beforehand so neither path arises on real data); an EMPTY
  * shingle array → NULL (array_min of empty is NULL).
  */
case class MinHashSignature(child: Expression, numHashes: Int)
    extends UnaryExpression {

  require(numHashes > 0, "minhash_sig requires numHashes > 0")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"minhash_sig expects array<string>, got $other")
    }

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    if (n == 0) return null
    val mins = Array.fill(numHashes)(Long.MaxValue)
    var i = 0
    while (i < n) {
      if (arr.isNullAt(i)) return null
      val s = arr.getUTF8String(i)
      val h1 = XXH64.hashUTF8String(s, 42L)
      val h2 = XXH64.hashUTF8String(s, h1)
      var j = 0
      var g = h1
      while (j < numHashes) {
        if (g < mins(j)) mins(j) = g
        g += h2
        j += 1
      }
      i += 1
    }
    UnsafeArrayData.fromPrimitiveArray(mins)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val mins = ctx.freshName("mins")
      val s = ctx.freshName("s")
      val h1 = ctx.freshName("h1")
      val h2 = ctx.freshName("h2")
      val g = ctx.freshName("g")
      val xxh = classOf[XXH64].getName
      val utf8 = classOf[UTF8String].getName
      val uad = classOf[UnsafeArrayData].getName
      s"""
         |int $n = $a.numElements();
         |if ($n == 0) {
         |  ${ev.isNull} = true;
         |} else {
         |  long[] $mins = new long[$numHashes];
         |  java.util.Arrays.fill($mins, Long.MAX_VALUE);
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($a.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    $utf8 $s = $a.getUTF8String($i);
         |    long $h1 = $xxh.hashUTF8String($s, 42L);
         |    long $h2 = $xxh.hashUTF8String($s, $h1);
         |    long $g = $h1;
         |    for (int $j = 0; $j < $numHashes; $j++) {
         |      if ($g < $mins[$j]) $mins[$j] = $g;
         |      $g += $h2;
         |    }
         |  }
         |  if (!${ev.isNull}) {
         |    ${ev.value} = $uad.fromPrimitiveArray($mins);
         |  }
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): MinHashSignature =
    copy(child = newChild)
}

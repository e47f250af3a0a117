package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native character n-gram generator: `char_ngrams(text, n)` returns
  * the array of all length-n character substrings (empty array when
  * the text is shorter than n — callers explode it away, matching the
  * HOF guard `CASE WHEN length < n THEN array() ...`).
  *
  * Replaces the interpreted
  * `transform(sequence(1, length-n+1), i -> substring(text, i, n))`
  * cascade: one pass over the string, no sequence materialization, no
  * per-element lambda dispatch. Operates on UTF-8 code points via
  * UTF8String.substringSQL, so multi-byte text slices correctly.
  */
case class CharNGrams(child: Expression, n: Int) extends UnaryExpression {
  require(n >= 1, "char_ngrams requires n >= 1")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"char_ngrams expects string, got ${child.dataType}")

  override def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String]
    val len = s.numChars()
    if (len < n) return new GenericArrayData(Array.empty[Any])
    val out = new Array[Any](len - n + 1)
    var i = 0
    while (i <= len - n) {
      out(i) = s.substringSQL(i + 1, n)
      i += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val len = ctx.freshName("len")
      val i = ctx.freshName("i")
      val out = ctx.freshName("out")
      val gad = classOf[GenericArrayData].getName
      s"""
         |int $len = $c.numChars();
         |if ($len < $n) {
         |  ${ev.value} = new $gad(new Object[0]);
         |} else {
         |  Object[] $out = new Object[$len - $n + 1];
         |  for (int $i = 0; $i <= $len - $n; $i++) {
         |    $out[$i] = $c.substringSQL($i + 1, $n);
         |  }
         |  ${ev.value} = new $gad($out);
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): CharNGrams =
    copy(child = newChild)
}

/** Native word n-gram (shingle) generator: `word_ngrams(tokens, n)` —
  * space-joined n-token windows over an `array<string>`, the shingling
  * step of minhash/Jaccard dedup. Empty array when there are fewer
  * than n tokens; a null token yields NULL (HOF parity, NOTES rule 15).
  * One pass, no slice() array allocations per window.
  */
case class WordNGrams(child: Expression, n: Int) extends UnaryExpression {
  require(n >= 1, "word_ngrams requires n >= 1")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"word_ngrams expects array<string>, got $other")
    }

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val m = arr.numElements()
    if (m < n) return new GenericArrayData(Array.empty[Any])
    var i = 0
    while (i < m) { if (arr.isNullAt(i)) return null; i += 1 }
    val sep = UTF8String.fromString(" ")
    val out = new Array[Any](m - n + 1)
    i = 0
    while (i <= m - n) {
      val parts = new Array[UTF8String](n)
      var j = 0
      while (j < n) { parts(j) = arr.getUTF8String(i + j); j += 1 }
      out(i) = UTF8String.concatWs(sep, parts: _*)
      i += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val m = ctx.freshName("m")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val out = ctx.freshName("out")
      val parts = ctx.freshName("parts")
      val gad = classOf[GenericArrayData].getName
      val utf8 = classOf[UTF8String].getName
      s"""
         |int $m = $c.numElements();
         |if ($m < $n) {
         |  ${ev.value} = new $gad(new Object[0]);
         |} else {
         |  for (int $i = 0; $i < $m && !${ev.isNull}; $i++) {
         |    if ($c.isNullAt($i)) ${ev.isNull} = true;
         |  }
         |  if (!${ev.isNull}) {
         |    Object[] $out = new Object[$m - $n + 1];
         |    for (int $i = 0; $i <= $m - $n; $i++) {
         |      $utf8[] $parts = new $utf8[$n];
         |      for (int $j = 0; $j < $n; $j++) {
         |        $parts[$j] = $c.getUTF8String($i + $j);
         |      }
         |      $out[$i] = $utf8.concatWs($utf8.fromString(" "), $parts);
         |    }
         |    ${ev.value} = new $gad($out);
         |  }
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): WordNGrams =
    copy(child = newChild)
}

package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** MinHash signature over a shingle array as ONE native expression:
  * sig[i] = min over shingles s of XXH64(s, seed = i).
  *
  * Why: the explode-then-64-min-aggregates formulation shuffles every
  * (doc, shingle) row (2.5M rows at sf0.1) through a 64-column aggregate.
  * This expression computes the whole signature per document in a tight
  * generated loop — a pure map stage, NO shuffle at all — after which only
  * the b band rows per document move. Signature quality is identical (a
  * seeded 64-bit hash family); the near-dup contract is unaffected because
  * candidates are always verified with exact Jaccard.
  *
  * Assumes non-null array elements; null arrays propagate null.
  */
case class MinHashSig(child: Expression, numHashes: Int)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<string>, got ${t.simpleString}")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_minhash"

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val res = Array.fill(numHashes)(Long.MaxValue)
    var j = 0
    while (j < arr.numElements()) {
      val s = arr.getUTF8String(j)
      var i = 0
      while (i < numHashes) {
        val h = XXH64.hashUTF8String(s, i.toLong)
        if (h < res(i)) res(i) = h
        i += 1
      }
      j += 1
    }
    new GenericArrayData(res)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val res = ctx.freshName("res"); val i = ctx.freshName("i")
      val j = ctx.freshName("j"); val h = ctx.freshName("h")
      val s = ctx.freshName("s")
      val xxh = classOf[XXH64].getName
      val utf8 = classOf[UTF8String].getName
      val gad = classOf[GenericArrayData].getName
      s"""
        long[] $res = new long[$numHashes];
        java.util.Arrays.fill($res, Long.MAX_VALUE);
        for (int $j = 0; $j < $a.numElements(); $j++) {
          $utf8 $s = $a.getUTF8String($j);
          for (int $i = 0; $i < $numHashes; $i++) {
            long $h = $xxh.hashUTF8String($s, (long) $i);
            if ($h < $res[$i]) $res[$i] = $h;
          }
        }
        ${ev.value} = new $gad($res);
      """
    })

  override protected def withNewChildInternal(newChild: Expression): MinHashSig =
    copy(child = newChild)
}

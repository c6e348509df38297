package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Winnowing-style document fingerprint: the MINIMUM of Rabin-Karp
  * polynomial rolling hashes over all `window`-byte substrings (SURVEY.md
  * §2.5 "document fingerprinting (rolling hash)" — the MOSS/winnowing
  * construction, public-domain: Schleimer, Wilkerson, Aiken, SIGMOD'03).
  *
  * Properties (asserted in PlansSpec):
  *  - deterministic pure function of the byte content;
  *  - containment-monotone: text ⊆ superText ⇒ fp(super) <= fp(text)
  *    (the min ranges over a superset of windows) — so documents sharing
  *    long substrings tend to share fingerprints, unlike whole-text
  *    hashing which any single-byte edit breaks.
  *
  * One pass over the bytes, O(1) per position (rolling update), codegen'd
  * — a pure map stage at any scale. Texts shorter than `window` hash as a
  * single truncated window.
  */
case class RollingMinHash(child: Expression, window: Int)
    extends UnaryExpression {

  private val Base = 1000003L // polynomial base (prime)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires string, got ${t.simpleString}")
  }
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_rolling_fp"

  override def nullSafeEval(input: Any): Any = {
    val bytes = input.asInstanceOf[UTF8String].getBytes
    val n = bytes.length
    val w = math.min(window, math.max(n, 1))
    if (n == 0) return 0L
    // basePow = Base^(w-1) for removing the outgoing byte
    var basePow = 1L
    var i = 0
    while (i < w - 1) { basePow *= Base; i += 1 }
    var h = 0L
    i = 0
    while (i < w && i < n) { h = h * Base + (bytes(i) & 0xffL); i += 1 }
    var min = h
    while (i < n) {
      h = (h - (bytes(i - w) & 0xffL) * basePow) * Base + (bytes(i) & 0xffL)
      if (h < min) min = h
      i += 1
    }
    min
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s => {
      val bytes = ctx.freshName("bytes"); val n = ctx.freshName("n")
      val w = ctx.freshName("w"); val bp = ctx.freshName("bp")
      val h = ctx.freshName("h"); val min = ctx.freshName("mn")
      val i = ctx.freshName("i")
      s"""
        byte[] $bytes = $s.getBytes();
        int $n = $bytes.length;
        int $w = Math.min($window, Math.max($n, 1));
        if ($n == 0) { ${ev.value} = 0L; } else {
          long $bp = 1L;
          for (int $i = 0; $i < $w - 1; $i++) $bp *= ${Base}L;
          long $h = 0L;
          int $i = 0;
          for (; $i < $w && $i < $n; $i++)
            $h = $h * ${Base}L + ($bytes[$i] & 0xffL);
          long $min = $h;
          for (; $i < $n; $i++) {
            $h = ($h - ($bytes[$i - $w] & 0xffL) * $bp) * ${Base}L
              + ($bytes[$i] & 0xffL);
            if ($h < $min) $min = $h;
          }
          ${ev.value} = $min;
        }
      """
    })

  override protected def withNewChildInternal(newChild: Expression): RollingMinHash =
    copy(child = newChild)
}

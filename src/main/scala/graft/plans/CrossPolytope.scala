package graft.plans

import java.util.concurrent.ConcurrentHashMap

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, LongType}

/** Cross-polytope LSH codes for an array<double> vector as ONE native
  * expression — the sub-ρ angular hash family (Andoni, Indyk, Laarhoven,
  * Razenshteyn, Schmidt, "Practical and Optimal LSH for Angular
  * Distance", NeurIPS 2015): hash = the signed coordinate axis nearest
  * to the vector after a pseudo-random rotation, i.e. the argmax of
  * |y_i| over y = rotate(v), emitted as `2·i + [y_i < 0]` ∈ [0, 2·d₂)
  * where d₂ = dim padded to a power of two.
  *
  * Why this family exists next to [[LshBands]]: a 4-bit sign-hyperplane
  * band partitions into 16 cells, so near-orthogonal BULK pairs collide
  * per band w.p. ~1/16 and the banded self-join's candidate volume
  * scales as n^(1+ρ) with ρ = ln p₁ / ln p₂ ≈ 0.42 at threshold 0.7 —
  * the measured n^1.37-1.40 of the r8 stress rows sits AT that bound,
  * irreducible by tuning. One cross-polytope hash partitions into 2·d₂
  * = 128 cells (dim 64) with the asymptotically OPTIMAL ρ: at 0.7 the
  * measured single-hash probabilities give ρ ≈ 0.30 (the paper's
  * asymptote says 0.18, but at d = 64 the O(ln ln d) correction is
  * material — parameters here derive from the MEASURED probabilities),
  * so the same banded-candidates + exact-verify contract does n^~1.3
  * work instead of n^1.42.
  *
  * Rotation: 3 rounds of (deterministic ±1 diagonal, fast
  * Walsh-Hadamard transform) — the paper's O(d log d) pseudo-rotation;
  * the diagonal signs come from the SplitMix64 finalizer over the
  * (hash, round, coordinate) index (same public construction as
  * [[graft.functions.VecFns.hyperplanes]]), so codes are reproducible
  * across sessions with nothing to broadcast. The FHT is orthogonal up
  * to a scalar and argmax|y_i| is scale-invariant, so no normalization
  * is applied.
  *
  * A band packs `hashesPerBand` consecutive hashes into one long
  * (base-2·d₂ digits); the output is the array of all `bands` codes —
  * identical downstream shape to `graft_lshbands` (posexplode →
  * equi-join on (band, code) → exact verify).
  */
case class CrossPolytopeHashes(child: Expression, hashesPerBand: Int,
    bands: Int, dim: Int) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<double>, got ${other.simpleString}")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_cplsh"

  override def nullSafeEval(v: Any): Any =
    CrossPolytope.codes(v.asInstanceOf[ArrayData], hashesPerBand, bands, dim)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v =>
      s"${ev.value} = graft.plans.CrossPolytope.codes($v, $hashesPerBand, " +
        s"$bands, $dim);")

  override protected def withNewChildInternal(
      newChild: Expression): CrossPolytopeHashes = copy(child = newChild)
}

/** Multi-probe companion to [[CrossPolytopeHashes]] for the TOP-K
  * search side: the `probes` cells nearest the query under hash 0's
  * rotation (see [[CrossPolytope.probeCells]]). Corpus rows keep their
  * single `graft_cplsh(v, 1, 1, dim)` cell; queries explode this list.
  */
case class CrossPolytopeProbes(child: Expression, probes: Int, dim: Int)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<double>, got ${other.simpleString}")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_cplsh_probe"

  override def nullSafeEval(v: Any): Any =
    CrossPolytope.probeCells(v.asInstanceOf[ArrayData], probes, dim)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v =>
      s"${ev.value} = graft.plans.CrossPolytope.probeCells($v, $probes, " +
        s"$dim);")

  override protected def withNewChildInternal(
      newChild: Expression): CrossPolytopeProbes = copy(child = newChild)
}

object CrossPolytope {

  /** Rotation rounds per hash (the paper's recommendation: three
    * sign-flip+Hadamard rounds make the pseudo-rotation's collision
    * behavior indistinguishable from a true random rotation).
    */
  val Rounds = 3

  /** Monte-Carlo sample size shared by [[collisionProb]]'s default and
    * the σ terms in [[pLow]]/[[pBulkHigh]] — ONE constant so the
    * confidence band can never be computed against a different sample
    * size than the estimate.
    */
  val McTrials = 200000

  private def nextPow2(n: Int): Int = {
    var p = 1
    while (p < n) p <<= 1
    p
  }

  /** SplitMix64 finalizer → ±1.0 for the (hash, round, coordinate)
    * diagonal entry. Public-domain construction (Vigna 2015), same mix
    * as [[graft.functions.VecFns.hyperplanes]].
    */
  private def signAt(hash: Int, round: Int, d: Int): Double = {
    var z = (hash.toLong << 40) ^ (round.toLong << 32) ^ d.toLong
    z += 0x9E3779B97F4A7C15L
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z ^= (z >>> 31)
    if ((z & 1L) == 0L) 1.0 else -1.0
  }

  /** Flat per-(totalHashes, d₂) sign cache for the hot path:
    * [hash][round][coord] row-major ±1 doubles. Deterministic content —
    * safe to share and recompute anywhere.
    */
  private val signCache = new ConcurrentHashMap[(Int, Int), Array[Double]]()

  private def signs(totalHashes: Int, dp: Int): Array[Double] =
    signCache.computeIfAbsent((totalHashes, dp), { case (total, dp) =>
      val flat = new Array[Double](total * Rounds * dp)
      var h = 0
      while (h < total) {
        var r = 0
        while (r < Rounds) {
          var d = 0
          while (d < dp) {
            flat((h * Rounds + r) * dp + d) = signAt(h, r, d)
            d += 1
          }
          r += 1
        }
        h += 1
      }
      flat
    })

  /** In-place unnormalized fast Walsh-Hadamard transform (n a power of
    * two). Orthogonal up to the scalar √n — argmax|·| downstream is
    * scale-invariant, so the scalar is never applied.
    */
  private[graft] def fht(a: Array[Double], n: Int): Unit = {
    var len = 1
    while (len < n) {
      var i = 0
      while (i < n) {
        var j = i
        val end = i + len
        while (j < end) {
          val x = a(j); val y = a(j + len)
          a(j) = x + y; a(j + len) = x - y
          j += 1
        }
        i += len << 1
      }
      len <<= 1
    }
  }

  /** One cross-polytope hash of `vec` (length dim ≤ dp, zero-padded)
    * using `signsFlat` rows for global hash index `h`: returns
    * 2·argmax|y| + [y < 0] ∈ [0, 2·dp). `buf` is caller-provided
    * scratch of length dp (allocation-free hot loop).
    */
  private def hashOne(vec: Array[Double], buf: Array[Double],
      signsFlat: Array[Double], h: Int, dp: Int): Int = {
    java.util.Arrays.fill(buf, 0.0)
    System.arraycopy(vec, 0, buf, 0, vec.length)
    var r = 0
    while (r < Rounds) {
      val off = (h * Rounds + r) * dp
      var d = 0
      while (d < dp) { buf(d) *= signsFlat(off + d); d += 1 }
      fht(buf, dp)
      r += 1
    }
    var best = 0
    var bestAbs = math.abs(buf(0))
    var d = 1
    while (d < dp) {
      val a = math.abs(buf(d))
      if (a > bestAbs) { bestAbs = a; best = d }
      d += 1
    }
    (best << 1) | (if (buf(best) < 0) 1 else 0)
  }

  /** Called from both interpreted eval and generated code. `expectDim`
    * is enforced per row — mixed-dimension corpora must fail loud, the
    * [[LshBands.codes]] discipline (a silently different pad length
    * would hash against a different rotation and the recall loss is
    * invisible to verify-on-candidates).
    */
  def codes(v: ArrayData, hashesPerBand: Int, bands: Int,
      expectDim: Int): GenericArrayData = {
    val dim = v.numElements()
    require(dim == expectDim,
      s"graft_cplsh: vector of dimension $dim in a corpus declared " +
        s"$expectDim-dimensional — mixed dimensions cannot share a " +
        "rotation set")
    val dp = nextPow2(dim)
    // a band code packs hashesPerBand base-(2·d₂) digits into one long
    // — past 63 bits the pack silently wraps and unrelated cells merge
    // (candidate volume inflates toward n² with no visible failure),
    // so refuse loudly like probeCells' own bounds check
    val bitsPerHash =
      java.lang.Integer.SIZE - Integer.numberOfLeadingZeros(2 * dp - 1)
    require(hashesPerBand * bitsPerHash <= 63,
      s"graft_cplsh: hashesPerBand = $hashesPerBand at dim $dim packs " +
        s"${hashesPerBand * bitsPerHash} bits into a 64-bit band code — " +
        "the pack would overflow and silently merge cells")
    val vec = new Array[Double](dim)
    var i = 0
    while (i < dim) { vec(i) = v.getDouble(i); i += 1 }
    val total = hashesPerBand * bands
    val flat = signs(total, dp)
    val buf = new Array[Double](dp)
    val radix = (dp << 1).toLong
    val out = new Array[Long](bands)
    var b = 0
    while (b < bands) {
      var code = 0L
      var j = 0
      while (j < hashesPerBand) {
        code = code * radix + hashOne(vec, buf, flat, b * hashesPerBand + j, dp)
        j += 1
      }
      out(b) = code
      b += 1
    }
    new GenericArrayData(out)
  }

  /** Multi-probe cell list for hash index 0 (the rotation [[codes]]
    * assigns corpus cells with at k = bands = 1): the `probes` cells
    * whose axes carry the LARGEST |y_i| — the standard cross-polytope
    * probing order (the nearest polytope vertices are exactly the
    * largest rotated coordinates, the analogue of Lv et al.'s
    * multi-probe for sign-LSH). Ordered by |y| desc, ties by axis
    * index asc (deterministic); probes = 2·d₂ enumerates EVERY cell,
    * which makes the cell partition provably output-invisible — the
    * q25/q35 exhaustive-probe gate discipline.
    */
  def probeCells(v: ArrayData, probes: Int, expectDim: Int)
      : GenericArrayData = {
    val dim = v.numElements()
    require(dim == expectDim,
      s"graft_cplsh_probe: vector of dimension $dim in a corpus " +
        s"declared $expectDim-dimensional — mixed dimensions cannot " +
        "share a rotation set")
    val dp = nextPow2(dim)
    require(probes >= 1 && probes <= 2 * dp,
      s"graft_cplsh_probe: probes = $probes outside [1, ${2 * dp}]")
    val vec = new Array[Double](dim)
    var i = 0
    while (i < dim) { vec(i) = v.getDouble(i); i += 1 }
    val flat = signs(1, dp)
    val buf = new Array[Double](dp)
    java.util.Arrays.fill(buf, 0.0)
    System.arraycopy(vec, 0, buf, 0, dim)
    var r = 0
    while (r < Rounds) {
      val off = r * dp
      var d = 0
      while (d < dp) { buf(d) *= flat(off + d); d += 1 }
      fht(buf, dp)
      r += 1
    }
    // probe order by TRUE vertex distance: ||y ∓ e_i||² = 2 ∓ 2|y_i|
    // for the matching/opposite sign, so the near vertices rank by |y|
    // DESC and — once those are exhausted — the far vertices rank by
    // |y| ASC (the far vertex of the smallest-|y| axis is the nearest
    // far one). probes = 2·d₂ covers every cell.
    val order = (0 until dp).sortBy(d => (-math.abs(buf(d)), d))
    val out = new Array[Long](probes)
    var p = 0
    while (p < probes) {
      val near = p < dp
      val axis = if (near) order(p) else order(2 * dp - 1 - p)
      val nearSign = if (buf(axis) < 0) 1 else 0
      val sign = if (near) nearSign else 1 - nearSign
      out(p) = ((axis << 1) | sign).toLong
      p += 1
    }
    new GenericArrayData(out)
  }

  /** Monte-Carlo single-hash collision probability for a pair at
    * cosine exactly `cos`, estimated by simulating THE hash family
    * itself (fresh pseudo-rotation per trial, uniformly random pair
    * directions — by rotational symmetry this is the collision
    * probability of any fixed hash index over random inputs). Fixed
    * seed ⇒ the estimate, and every band count derived from it, is
    * deterministic across sessions. Cached per (cos·10⁶, dim).
    */
  private val probCache =
    new ConcurrentHashMap[(Long, Int, Int), Double]()

  def collisionProb(cos: Double, dim: Int, trials: Int = McTrials): Double =
    probCache.computeIfAbsent((math.round(cos * 1e6), dim, trials), { _ =>
      val dp = nextPow2(dim)
      val rnd = new java.util.Random(0x5EED5EEDL + dim * 1000003L +
        math.round(cos * 1e6))
      val x = new Array[Double](dim)
      val z = new Array[Double](dim)
      val bx = new Array[Double](dp)
      val by = new Array[Double](dp)
      val sg = new Array[Double](Rounds * dp)
      var hits = 0
      var t = 0
      while (t < trials) {
        // x uniform on the sphere; z ⊥ x unit; y = cos·x + √(1−cos²)·z
        var nx = 0.0
        var i = 0
        while (i < dim) { x(i) = rnd.nextGaussian(); nx += x(i) * x(i); i += 1 }
        nx = math.sqrt(nx)
        i = 0
        while (i < dim) { x(i) /= nx; i += 1 }
        var dotzx = 0.0
        i = 0
        while (i < dim) { z(i) = rnd.nextGaussian(); dotzx += z(i) * x(i); i += 1 }
        var nz = 0.0
        i = 0
        while (i < dim) { z(i) -= dotzx * x(i); nz += z(i) * z(i); i += 1 }
        nz = math.sqrt(nz)
        val s = math.sqrt(math.max(0.0, 1.0 - cos * cos))
        // one fresh pseudo-rotation, applied to both sides
        i = 0
        while (i < Rounds * dp) {
          sg(i) = if (rnd.nextBoolean()) 1.0 else -1.0; i += 1
        }
        java.util.Arrays.fill(bx, 0.0); java.util.Arrays.fill(by, 0.0)
        i = 0
        while (i < dim) {
          bx(i) = x(i); by(i) = cos * x(i) + s * (z(i) / nz); i += 1
        }
        var r = 0
        while (r < Rounds) {
          var d = 0
          while (d < dp) {
            bx(d) *= sg(r * dp + d); by(d) *= sg(r * dp + d); d += 1
          }
          fht(bx, dp); fht(by, dp)
          r += 1
        }
        def arg(a: Array[Double]): Int = {
          var best = 0; var bestAbs = math.abs(a(0)); var d = 1
          while (d < dp) {
            val v = math.abs(a(d))
            if (v > bestAbs) { bestAbs = v; best = d }
            d += 1
          }
          (best << 1) | (if (a(best) < 0) 1 else 0)
        }
        if (arg(bx) == arg(by)) hits += 1
        t += 1
      }
      hits.toDouble / trials
    })

  /** Band count for a target miss probability — the [[
    * graft.operators.Ann.bandsForThreshold]] banding bound with the
    * per-band collision probability p₁ᵏ taken from a CONSERVATIVE
    * (3σ-low) Monte-Carlo estimate of the single-hash probability at
    * the threshold: b = ⌈ln(targetMiss) / ln(1 − p₁ᵏ)⌉.
    */
  def bandsFor(threshold: Double, hashesPerBand: Int, dim: Int,
      targetMiss: Double = 1e-4): Int = {
    require(threshold > 0.0 && threshold < 1.0,
      "cross-polytope banding bound needs 0 < threshold < 1")
    val p = pLow(threshold, dim)
    val pBand = math.pow(p, hashesPerBand)
    math.max(1, math.ceil(math.log(targetMiss) / math.log1p(-pBand)).toInt)
  }

  /** 3σ-LOW single-hash collision probability at the threshold (recall
    * side must under-promise).
    */
  def pLow(threshold: Double, dim: Int): Double = {
    val trials = McTrials
    val p = collisionProb(threshold, dim, trials)
    math.max(1e-6, p - 3.0 * math.sqrt(p * (1.0 - p) / trials))
  }

  /** 3σ-HIGH bulk (cosine 0) collision probability (cost side must
    * over-estimate candidates).
    */
  def pBulkHigh(dim: Int): Double = {
    val trials = McTrials
    val p = collisionProb(0.0, dim, trials)
    math.min(1.0, p + 3.0 * math.sqrt(p * (1.0 - p) / trials))
  }

  /** Hashes-per-band k minimizing the estimated total work
    * n·b(k)·k·C_hash + b(k)·p₂ᵏ·(n²/2)·C_cand over k ∈ [1, 4], where
    * b(k) is the recall-bound band count at the threshold and p₂ the
    * bulk collision probability — the standard LSH parameter trade
    * (more hashes per band = fewer bulk candidates but more bands to
    * keep recall). C_cand/C_hash ≈ 4: a candidate row pays shuffle +
    * join + distinct + exact verify; a hash pays 3 sign-flip+FHT
    * rounds. The argmin is insensitive to the constant within a
    * decade; n = 0 (unknown) degrades to k = 1.
    */
  def chooseHashesPerBand(n: Long, threshold: Double, dim: Int,
      targetMiss: Double = 1e-4): Int = {
    if (n <= 0L) 1
    else {
      val p2 = pBulkHigh(dim)
      val costRatio = 4.0
      (1 to 4).minBy { k =>
        val b = bandsFor(threshold, k, dim, targetMiss).toDouble
        n * b * k + b * math.pow(p2, k) * (n.toDouble * n / 2.0) * costRatio
      }
    }
  }
}

package org.apache.spark.sql.graft

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ImplicitCastInputTypes, TernaryExpression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Custom codegen Catalyst expressions for the vector/fingerprint hot paths.
  *
  * Spark's higher-order functions (`zip_with`, `aggregate`, `transform`) are
  * CodegenFallback: every element op is an interpreted `Expression.eval` with
  * boxing, and `zip_with` materializes an intermediate array per call. For
  * pair-scoring operators that evaluate millions of 64-element dot products
  * or 64-bit sign-counts per task, that interpreter overhead dominated the
  * sf0.1 bench (SURVEY.md §2.8/§4 explicitly reserved a native Expression for
  * exactly this case). These expressions generate tight primitive Java loops
  * over `ArrayData` — no boxing, no intermediate arrays — and keep their
  * operators inside whole-stage codegen.
  */

/** Σ aᵢ·bᵢ over two `array<double>` columns, sequential left-to-right — the
  * same accumulation order as the `aggregate(zip_with(...))` formulation it
  * replaces, so results are bit-identical (oracle hashes must not move).
  * Array elements are assumed non-null (embedding vectors); on length
  * mismatch the shorter length wins.
  */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression with ImplicitCastInputTypes {

  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(DoubleType), ArrayType(DoubleType))
  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_dot"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var s = 0.0
    var i = 0
    while (i < n) { s += x.getDouble(i) * y.getDouble(i); i += 1 }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val s = ctx.freshName("s")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $s += $a.getDouble($i) * $b.getDouble($i);
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Cosine similarity over int8-QUANTIZED vectors (`array<tinyint>`) — the
  * scoring kernel of the quantized ANN index. Cosine is invariant to
  * per-vector positive scaling, so max-abs/127 quantization needs no
  * stored scale to score: cos(q_a, q_b) ≈ cos(a, b) with only the
  * rounding error. Integer multiply-accumulate in the inner loop (exact in
  * Long for any dim < 2³¹·127²), one sqrt at the end; NaN on a zero-norm
  * side (ranks nowhere under the desc sort, same rule as the double
  * kernel).
  */
case class CosineI8(left: Expression, right: Expression)
    extends BinaryExpression with ImplicitCastInputTypes {

  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(ByteType), ArrayType(ByteType))
  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_cosine_i8"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var dot = 0L
    var na = 0L
    var nb = 0L
    var i = 0
    while (i < n) {
      val xa = x.getByte(i).toLong
      val yb = y.getByte(i).toLong
      dot += xa * yb; na += xa * xa; nb += yb * yb
      i += 1
    }
    if (na == 0L || nb == 0L) Double.NaN
    else dot / math.sqrt(na.toDouble * nb.toDouble)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val dot = ctx.freshName("dot")
      val na = ctx.freshName("na")
      val nb = ctx.freshName("nb")
      val xa = ctx.freshName("xa")
      val yb = ctx.freshName("yb")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |long $dot = 0L; long $na = 0L; long $nb = 0L;
         |for (int $i = 0; $i < $n; $i++) {
         |  long $xa = (long) $a.getByte($i);
         |  long $yb = (long) $b.getByte($i);
         |  $dot += $xa * $yb; $na += $xa * $xa; $nb += $yb * $yb;
         |}
         |${ev.value} = ($na == 0L || $nb == 0L) ? Double.NaN
         |  : $dot / java.lang.Math.sqrt((double) $na * (double) $nb);
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** The portable 60-bit md5-prefix hash (`graft.functions.Hashing.h60`)
  * computed directly from digest bytes: top 60 bits of the first 8 digest
  * bytes (big-endian), i.e. exactly `('0x' || substr(md5(x),1,15))::BIGINT`
  * in DuckDB and `conv(substring(md5(x),1,15),16,10)::long` in Spark SQL —
  * without materializing the 32-char hex string or parsing it back
  * (measured ~2× on shingle-hash-bound gate queries). Digest instances are
  * thread-local (MD5 is stateful and cheap to reset, expensive to
  * re-instantiate per row).
  */
object Md5Prefix60 {
  private val md = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }
  /** Public — called from generated code. */
  def hash(bytes: Array[Byte]): Long = {
    val d = md.get()
    d.reset()
    val dig = d.digest(bytes)
    var v = 0L
    var i = 0
    while (i < 8) { v = (v << 8) | (dig(i) & 0xffL); i += 1 }
    v >>> 4
  }
}

case class Md5Prefix60(child: Expression)
    extends UnaryExpression with ImplicitCastInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(BinaryType)
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_md5_prefix60"

  override protected def nullSafeEval(input: Any): Any =
    Md5Prefix60.hash(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = org.apache.spark.sql.graft.Md5Prefix60$$.MODULE$$.hash($c);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Bit interleaving of two bucketed dimensions (Morton / Z-order curve):
  * bit i of `a` lands at position 2i, bit i of `b` at 2i+1 — points close
  * in BOTH dimensions get close z-keys, so range-partitioning + sorting a
  * table by this key gives every file a tight min/max box in both columns
  * and parquet row-group stats prune on either dimension (the multi-dim
  * layout trick single-column sorting can't provide; measured A/B in
  * LayoutSpec). Inputs must already be bucketed to [0, 2^bits); `bits` ≤
  * 31 keeps the key in a positive long.
  */
object Interleave2 {
  /** Public — called from generated code. */
  def zkey(a: Long, b: Long, bits: Int): Long = {
    var out = 0L
    var i = 0
    while (i < bits) {
      out |= ((a >> i) & 1L) << (2 * i)
      out |= ((b >> i) & 1L) << (2 * i + 1)
      i += 1
    }
    out
  }
}

case class Interleave2(left: Expression, right: Expression, bits: Int)
    extends BinaryExpression with ImplicitCastInputTypes {
  require(bits >= 1 && bits <= 31, s"bits must be in [1,31], got $bits")

  override def inputTypes: Seq[AbstractDataType] = Seq(LongType, LongType)
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_zorder_interleave"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    Interleave2.zkey(a.asInstanceOf[Long], b.asInstanceOf[Long], bits)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = org.apache.spark.sql.graft.Interleave2$$.MODULE$$.zkey($a, $b, $bits);")

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Unicode NFC normalization (java.text.Normalizer) as a codegen
  * expression — Spark ships no normalization built-in, and text
  * canonicalization before dedup needs one (visually-identical strings
  * with different combining-character encodings must hash identically).
  * Fast path: `Normalizer.isNormalized` (no allocation) skips the
  * round-trip for already-NFC input — which is ~all real text, including
  * every pure-ASCII string. DuckDB mirror: `NFC_NORMALIZE`.
  */
object NfcNormalize {
  /** Public — called from generated code. */
  def nfc(s: org.apache.spark.unsafe.types.UTF8String): org.apache.spark.unsafe.types.UTF8String = {
    val str = s.toString
    if (java.text.Normalizer.isNormalized(str, java.text.Normalizer.Form.NFC)) s
    else org.apache.spark.unsafe.types.UTF8String.fromString(
      java.text.Normalizer.normalize(str, java.text.Normalizer.Form.NFC))
  }
}

case class NfcNormalize(child: Expression)
    extends UnaryExpression with ImplicitCastInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = StringType
  override def prettyName: String = "graft_nfc_normalize"

  override protected def nullSafeEval(input: Any): Any =
    NfcNormalize.nfc(input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = org.apache.spark.sql.graft.NfcNormalize$$.MODULE$$.nfc($c);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Word k-shingles of a pre-split words array (`array<string>` →
  * `array<string>`): gram i = words[i..i+k) joined by single spaces; arrays
  * shorter than k collapse to ONE whole-join gram (≡ the original text,
  * since `split(text, " ", -1)` preserves empty tokens around repeated
  * separators). Exact semantics of the HOF formulation in
  * [[graft.operators.Dedup.wordShinglesHof]] (equivalence spec), without
  * the per-gram interpreted `concat_ws(element_at…)` lambda — the shingle
  * construction dominated the n-gram Jaccard / winnowing queries.
  */
object WordShingles {
  private val Space = org.apache.spark.unsafe.types.UTF8String.fromString(" ")
  /** Public — called from generated code. */
  def grams(arr: ArrayData, k: Int): ArrayData = {
    val n = arr.numElements()
    val words = new Array[org.apache.spark.unsafe.types.UTF8String](n)
    var i = 0
    while (i < n) { words(i) = arr.getUTF8String(i); i += 1 }
    val out: Array[AnyRef] =
      if (n >= k) {
        val g = new Array[AnyRef](n - k + 1)
        var s = 0
        while (s <= n - k) {
          g(s) = org.apache.spark.unsafe.types.UTF8String.concatWs(
            Space, java.util.Arrays.copyOfRange(words, s, s + k): _*)
          s += 1
        }
        g
      } else Array[AnyRef](
        org.apache.spark.unsafe.types.UTF8String.concatWs(Space, words: _*))
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }
}

case class WordShingles(child: Expression, k: Int)
    extends UnaryExpression with ImplicitCastInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(StringType))
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "graft_word_shingles"

  override protected def nullSafeEval(input: Any): Any =
    WordShingles.grams(input.asInstanceOf[ArrayData], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = org.apache.spark.sql.graft.WordShingles$$.MODULE$$.grams($c, $k);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** 64-bit SimHash of a pre-hashed token array (`array<long>` → `long`).
  * Bit i of the result is set iff Σ over tokens of (±1 by bit i of the token
  * hash) is ≥ 0 — the exact semantics of the HOF formulation in
  * [[graft.operators.Dedup.simhash]] it replaces (`>>` vs `>>>` is
  * indistinguishable under `& 1`).
  */
case class SimHash64(child: Expression)
    extends UnaryExpression with ImplicitCastInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(LongType))
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_simhash64"

  override protected def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val counts = new Array[Int](64)
    var i = 0
    while (i < n) {
      val x = arr.getLong(i)
      var b = 0
      while (b < 64) { counts(b) += ((((x >>> b) & 1L) << 1) - 1L).toInt; b += 1 }
      i += 1
    }
    var fp = 0L
    var b = 0
    while (b < 64) { if (counts(b) >= 0) fp |= 1L << b; b += 1 }
    fp
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val b = ctx.freshName("b")
      val x = ctx.freshName("x")
      val counts = ctx.freshName("counts")
      val fp = ctx.freshName("fp")
      s"""
         |int $n = $c.numElements();
         |int[] $counts = new int[64];
         |for (int $i = 0; $i < $n; $i++) {
         |  long $x = $c.getLong($i);
         |  for (int $b = 0; $b < 64; $b++) {
         |    $counts[$b] += (int)(((($x >>> $b) & 1L) << 1) - 1L);
         |  }
         |}
         |long $fp = 0L;
         |for (int $b = 0; $b < 64; $b++) {
         |  if ($counts[$b] >= 0) $fp |= (1L << $b);
         |}
         |${ev.value} = $fp;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** MinHash signature of a pre-hashed shingle array: for each permutation p,
  * min over shingle hashes x of (aₚ·x + bₚ) mod P, P = 4294967311 (smallest
  * prime > 2³²). Same formula and evaluation order as the HOF
  * `transform(perms, p -> array_min(transform(hashes, …)))` it replaces —
  * [[graft.operators.Dedup.minhashSignatureHof]] pins the equivalence.
  * Inputs: hashes (array<long>, values < 2³²), aPerm/bPerm (array<long>,
  * a < 2³¹) — products stay inside a long. Empty hash arrays are not
  * produced by the shingle pipeline (short docs fall back to a whole-text
  * shingle); an empty input yields an all-Long.MaxValue signature.
  */
/** The MinHash permutation modulus — ONE definition for the kernel
  * package AND the operators (`graft.operators.Dedup.MersennePrime`
  * aliases it; ADVICE r20: the two hardcoded copies could silently
  * diverge if the permutation family's modulus ever changed). */
object GraftHashConstants {
  /** Smallest prime > 2^32. */
  final val MersennePrime = 4294967311L
}

case class MinHashSig(hashes: Expression, aPerm: Expression, bPerm: Expression)
    extends TernaryExpression with ImplicitCastInputTypes {

  private val MersennePrime = GraftHashConstants.MersennePrime

  override def first: Expression = hashes
  override def second: Expression = aPerm
  override def third: Expression = bPerm
  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(LongType), ArrayType(LongType), ArrayType(LongType))
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_minhash_sig"

  override protected def nullSafeEval(h: Any, a: Any, b: Any): Any = {
    val hs = h.asInstanceOf[ArrayData]
    val as = a.asInstanceOf[ArrayData]
    val bs = b.asInstanceOf[ArrayData]
    val np = as.numElements()
    val nh = hs.numElements()
    val out = new Array[Long](np)
    var p = 0
    while (p < np) {
      val ap = as.getLong(p); val bp = bs.getLong(p)
      var best = Long.MaxValue
      var i = 0
      while (i < nh) {
        val v = (ap * hs.getLong(i) + bp) % MersennePrime
        if (v < best) best = v
        i += 1
      }
      out(p) = best
      p += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (h, a, b) => {
      val np = ctx.freshName("np")
      val nh = ctx.freshName("nh")
      val out = ctx.freshName("out")
      val p = ctx.freshName("p")
      val i = ctx.freshName("i")
      val ap = ctx.freshName("ap")
      val bp = ctx.freshName("bp")
      val best = ctx.freshName("best")
      val v = ctx.freshName("v")
      s"""
         |int $np = $a.numElements();
         |int $nh = $h.numElements();
         |long[] $out = new long[$np];
         |for (int $p = 0; $p < $np; $p++) {
         |  long $ap = $a.getLong($p); long $bp = $b.getLong($p);
         |  long $best = Long.MAX_VALUE;
         |  for (int $i = 0; $i < $nh; $i++) {
         |    long $v = ($ap * $h.getLong($i) + $bp) % ${MersennePrime}L;
         |    if ($v < $best) $best = $v;
         |  }
         |  $out[$p] = $best;
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression, newThird: Expression): Expression =
    copy(hashes = newFirst, aPerm = newSecond, bPerm = newThird)
}

/** All random-hyperplane LSH bucket ids of a vector in one pass: table t's
  * bucket packs the sign bits of the projections onto planes
  * [t·bits, (t+1)·bits). The plane matrix rides along as a referenced
  * object (`ctx.addReferenceObj`), NOT as literals — the HOF formulation
  * embedded planes.length × dim literal doubles into the plan, which
  * bloated analysis/codegen time and fell back to interpreted eval.
  * Bit-identical bucket ids to [[graft.functions.VectorFunctions.hyperplaneBucket]]
  * (same sequential dot, same ≥ 0 sign rule — CatalystExpressionSpec).
  */
case class HyperplaneBuckets(child: Expression, planes: Array[Array[Double]],
                             bitsPerTable: Int)
    extends UnaryExpression with ImplicitCastInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(DoubleType))
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_hyperplane_buckets"

  override protected def nullSafeEval(input: Any): Any = {
    val vec = input.asInstanceOf[ArrayData].toDoubleArray()
    val nTables = planes.length / bitsPerTable
    val out = new Array[Long](nTables)
    var t = 0
    while (t < nTables) {
      var bucket = 0L
      var i = 0
      while (i < bitsPerTable) {
        val p = planes(t * bitsPerTable + i)
        val m = math.min(vec.length, p.length)
        var d = 0.0
        var k = 0
        while (k < m) { d += vec(k) * p(k); k += 1 }
        if (d >= 0.0) bucket |= 1L << i
        i += 1
      }
      out(t) = bucket
      t += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val planesRef = ctx.addReferenceObj("planes", planes, "double[][]")
    nullSafeCodeGen(ctx, ev, c => {
      val vec = ctx.freshName("vec")
      val out = ctx.freshName("out")
      val t = ctx.freshName("t")
      val i = ctx.freshName("i")
      val k = ctx.freshName("k")
      val p = ctx.freshName("p")
      val d = ctx.freshName("d")
      val m = ctx.freshName("m")
      val bucket = ctx.freshName("bucket")
      val nTables = planes.length / bitsPerTable
      s"""
         |double[] $vec = $c.toDoubleArray();
         |long[] $out = new long[$nTables];
         |for (int $t = 0; $t < $nTables; $t++) {
         |  long $bucket = 0L;
         |  for (int $i = 0; $i < $bitsPerTable; $i++) {
         |    double[] $p = $planesRef[$t * $bitsPerTable + $i];
         |    int $m = java.lang.Math.min($vec.length, $p.length);
         |    double $d = 0.0;
         |    for (int $k = 0; $k < $m; $k++) { $d += $vec[$k] * $p[$k]; }
         |    if ($d >= 0.0) $bucket |= 1L << $i;
         |  }
         |  $out[$t] = $bucket;
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** IVF coarse-quantizer assignment: the cluster id of the nearest centroid
  * by squared L2, ties to the smaller id — exactly
  * `array_min(array(struct(l2Sq(v, c_i), id_i)...)).cluster` (the
  * lexicographic struct min; equivalence pinned in CatalystExpressionSpec)
  * without that formulation's costs: the HOF l2Sq interprets a lambda per
  * element per centroid and the struct array embeds k·dim literal doubles
  * into the plan, which at 640 clusters × 128 dims measured 60× slower on
  * the 128k-vector index build (STRESS.md "On-disk IVF index"). Here the
  * centroid matrix rides as ONE reference object and assignment is a tight
  * primitive loop — O(k·dim) multiply-adds per row at scalar-code speed,
  * inside whole-stage codegen.
  *
  * Distance over the first min(len) elements per centroid (the zip_with
  * convention for equal-length vectors; mismatched lengths don't occur in
  * the embedding tables but must not throw here either).
  */
case class NearestCentroid(child: Expression, cents: Array[Array[Double]],
                           ids: Array[Int])
    extends UnaryExpression with ImplicitCastInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(DoubleType))
  override def dataType: DataType = IntegerType
  override def prettyName: String = "graft_nearest_centroid"

  override protected def nullSafeEval(input: Any): Any = {
    val vec = input.asInstanceOf[ArrayData].toDoubleArray()
    var bestD = Double.PositiveInfinity
    var bestId = Int.MaxValue
    var i = 0
    while (i < cents.length) {
      val c = cents(i)
      val m = math.min(vec.length, c.length)
      var d = 0.0
      var j = 0
      while (j < m) { val x = vec(j) - c(j); d += x * x; j += 1 }
      if (d < bestD || (d == bestD && ids(i) < bestId)) { bestD = d; bestId = ids(i) }
      i += 1
    }
    bestId
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val centsRef = ctx.addReferenceObj("cents", cents, "double[][]")
    val idsRef = ctx.addReferenceObj("ids", ids, "int[]")
    nullSafeCodeGen(ctx, ev, c => {
      val vec = ctx.freshName("vec")
      val bestD = ctx.freshName("bestD")
      val bestId = ctx.freshName("bestId")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val cc = ctx.freshName("cc")
      val m = ctx.freshName("m")
      val d = ctx.freshName("d")
      val x = ctx.freshName("x")
      s"""
         |double[] $vec = $c.toDoubleArray();
         |double $bestD = Double.POSITIVE_INFINITY;
         |int $bestId = Integer.MAX_VALUE;
         |for (int $i = 0; $i < $centsRef.length; $i++) {
         |  double[] $cc = $centsRef[$i];
         |  int $m = java.lang.Math.min($vec.length, $cc.length);
         |  double $d = 0.0;
         |  for (int $j = 0; $j < $m; $j++) {
         |    double $x = $vec[$j] - $cc[$j];
         |    $d += $x * $x;
         |  }
         |  if ($d < $bestD || ($d == $bestD && $idsRef[$i] < $bestId)) {
         |    $bestD = $d; $bestId = $idsRef[$i];
         |  }
         |}
         |${ev.value} = $bestId;
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** The nprobe nearest centroids by squared L2 (ids ordered nearest-first,
  * distance ties to the smaller id) — exactly
  * `slice(array_sort(array(struct(l2Sq(v,c_i), id_i)...)), 1, nprobe).cluster`
  * (equivalence pinned in CatalystExpressionSpec) without embedding
  * k·dim literal doubles into the plan: with 2560 clusters × 128 dims the
  * literal formulation put ~330k literal nodes through analysis/codegen on
  * EVERY query — measured 62 s of driver-side cost per indexed ANN query at
  * 256× (STRESS.md "On-disk IVF index"). Bounded insertion into an
  * nprobe-slot buffer; the centroid matrix rides as one reference object.
  */
case class NearestClusters(child: Expression, cents: Array[Array[Double]],
                           ids: Array[Int], nprobe: Int)
    extends UnaryExpression with ImplicitCastInputTypes {
  require(nprobe > 0, "nprobe must be positive")

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(DoubleType))
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "graft_nearest_clusters"

  override protected def nullSafeEval(input: Any): Any = {
    val vec = input.asInstanceOf[ArrayData].toDoubleArray()
    val n = math.min(nprobe, cents.length)
    val bd = new Array[Double](n)
    val bi = new Array[Int](n)
    var filled = 0
    var i = 0
    while (i < cents.length) {
      val c = cents(i)
      val m = math.min(vec.length, c.length)
      var d = 0.0
      var j = 0
      while (j < m) { val x = vec(j) - c(j); d += x * x; j += 1 }
      val id = ids(i)
      // insert (d, id) if it beats the current worst (lexicographic order)
      if (filled < n || d < bd(filled - 1) ||
          (d == bd(filled - 1) && id < bi(filled - 1))) {
        var p = if (filled < n) filled else n - 1
        while (p > 0 && (bd(p - 1) > d || (bd(p - 1) == d && bi(p - 1) > id))) {
          bd(p) = bd(p - 1); bi(p) = bi(p - 1); p -= 1
        }
        bd(p) = d; bi(p) = id
        if (filled < n) filled += 1
      }
      i += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(
      java.util.Arrays.copyOf(bi, filled))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val centsRef = ctx.addReferenceObj("cents", cents, "double[][]")
    val idsRef = ctx.addReferenceObj("ids", ids, "int[]")
    nullSafeCodeGen(ctx, ev, c => {
      val vec = ctx.freshName("vec")
      val n = ctx.freshName("n")
      val bd = ctx.freshName("bd")
      val bi = ctx.freshName("bi")
      val filled = ctx.freshName("filled")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val cc = ctx.freshName("cc")
      val m = ctx.freshName("m")
      val d = ctx.freshName("d")
      val x = ctx.freshName("x")
      val id = ctx.freshName("id")
      val p = ctx.freshName("p")
      s"""
         |double[] $vec = $c.toDoubleArray();
         |int $n = java.lang.Math.min($nprobe, $centsRef.length);
         |double[] $bd = new double[$n];
         |int[] $bi = new int[$n];
         |int $filled = 0;
         |for (int $i = 0; $i < $centsRef.length; $i++) {
         |  double[] $cc = $centsRef[$i];
         |  int $m = java.lang.Math.min($vec.length, $cc.length);
         |  double $d = 0.0;
         |  for (int $j = 0; $j < $m; $j++) {
         |    double $x = $vec[$j] - $cc[$j];
         |    $d += $x * $x;
         |  }
         |  int $id = $idsRef[$i];
         |  if ($filled < $n || $d < $bd[$filled - 1] ||
         |      ($d == $bd[$filled - 1] && $id < $bi[$filled - 1])) {
         |    int $p = ($filled < $n) ? $filled : $n - 1;
         |    while ($p > 0 && ($bd[$p - 1] > $d ||
         |           ($bd[$p - 1] == $d && $bi[$p - 1] > $id))) {
         |      $bd[$p] = $bd[$p - 1]; $bi[$p] = $bi[$p - 1]; $p--;
         |    }
         |    $bd[$p] = $d; $bi[$p] = $id;
         |    if ($filled < $n) $filled++;
         |  }
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(
         |  java.util.Arrays.copyOf($bi, $filled));
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Winnowing selection: sliding-window minima over a k-gram hash array
  * (window size `w`), distinct and sorted — the document sketch of
  * Schleimer et al. Same values as the HOF
  * `array_sort(array_distinct(transform(seq, i -> array_min(slice(...)))))`
  * formulation (pinned in CatalystExpressionSpec) without per-window slice
  * allocation: a single monotonic pass.
  */
case class WinnowingMins(child: Expression, w: Int)
    extends UnaryExpression with ImplicitCastInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(LongType))
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_winnowing_mins"

  override protected def nullSafeEval(input: Any): Any = {
    val hs = input.asInstanceOf[ArrayData].toLongArray()
    val n = hs.length
    val nWin = math.max(n - w + 1, 1)
    val sel = new java.util.TreeSet[java.lang.Long]()
    var i = 0
    while (i < nWin) {
      val end = math.min(i + w, n)
      var m = Long.MaxValue
      var j = i
      while (j < end) { if (hs(j) < m) m = hs(j); j += 1 }
      sel.add(m)
      i += 1
    }
    val out = new Array[Long](sel.size())
    val it = sel.iterator()
    var k = 0
    while (it.hasNext) { out(k) = it.next(); k += 1 }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val hs = ctx.freshName("hs")
      val n = ctx.freshName("n")
      val nWin = ctx.freshName("nWin")
      val sel = ctx.freshName("sel")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val end = ctx.freshName("end")
      val m = ctx.freshName("m")
      val out = ctx.freshName("out")
      val k = ctx.freshName("k")
      val it = ctx.freshName("it")
      s"""
         |long[] $hs = $c.toLongArray();
         |int $n = $hs.length;
         |int $nWin = java.lang.Math.max($n - $w + 1, 1);
         |java.util.TreeSet<Long> $sel = new java.util.TreeSet<Long>();
         |for (int $i = 0; $i < $nWin; $i++) {
         |  int $end = java.lang.Math.min($i + $w, $n);
         |  long $m = Long.MAX_VALUE;
         |  for (int $j = $i; $j < $end; $j++) { if ($hs[$j] < $m) $m = $hs[$j]; }
         |  $sel.add($m);
         |}
         |long[] $out = new long[$sel.size()];
         |int $k = 0;
         |java.util.Iterator<Long> $it = $sel.iterator();
         |while ($it.hasNext()) { $out[$k++] = ((Long) $it.next()).longValue(); }
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** All verified Jaccard-similar pairs inside one MinHash/LSH band bucket.
  * Input: the bucket's collected `array<struct<id:long, sset:array<long>>>`
  * (hashed shingle sets); output: `array<struct<id_a, id_b, jaccard>>` for
  * pairs with round(|∩|/|∪|, 4) ≥ threshold, id_a < id_b. Same whole-bucket
  * evaluation model as [[CosinePairs]]: one boxed call per bucket, set
  * intersections via a per-element hash set built once. Rounding is
  * BigDecimal HALF_UP — identical to `round(col, 4)`.
  */
case class JaccardPairs(child: Expression, threshold: Double)
    extends UnaryExpression
    with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("id_a", LongType, nullable = false),
    StructField("id_b", LongType, nullable = false),
    StructField("jaccard", DoubleType, nullable = false))), containsNull = false)
  override def prettyName: String = "graft_jaccard_pairs"

  private def round4(x: Double): Double =
    java.math.BigDecimal.valueOf(x).setScale(4, java.math.RoundingMode.HALF_UP).doubleValue()

  override protected def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val ids = new Array[Long](n)
    val raw = new Array[Array[Long]](n)
    val sets = new Array[java.util.HashSet[Long]](n)
    var i = 0
    while (i < n) {
      val row = arr.getStruct(i, 2)
      ids(i) = row.getLong(0)
      raw(i) = row.getArray(1).toLongArray()
      val hs = new java.util.HashSet[Long](raw(i).length * 2)
      raw(i).foreach(hs.add(_))
      sets(i) = hs
      i += 1
    }
    val out = new java.util.ArrayList[org.apache.spark.sql.catalyst.InternalRow]()
    i = 0
    while (i < n) {
      var j = i + 1
      while (j < n) {
        val (small, bigSet) =
          if (sets(i).size <= sets(j).size) (sets(i), sets(j)) else (sets(j), sets(i))
        var inter = 0
        val it = small.iterator()
        while (it.hasNext) { if (bigSet.contains(it.next())) inter += 1 }
        val union = sets(i).size + sets(j).size - inter
        val jac = if (union == 0) 0.0 else round4(inter.toDouble / union.toDouble)
        if (jac >= threshold) {
          val lo = math.min(ids(i), ids(j)); val hi = math.max(ids(i), ids(j))
          out.add(org.apache.spark.sql.catalyst.InternalRow(lo, hi, jac))
        }
        j += 1
      }
      i += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(
      out.toArray(new Array[org.apache.spark.sql.catalyst.InternalRow](out.size())))
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** [[JaccardPairs]] over a CAPPED sub-bucket (see
  * [[graft.operators.BucketedPairs]]): input structs carry a third `cell`
  * field (the element's triangle-split cell), and `crossOnly` — a per-row
  * boolean — restricts emission to pairs from DIFFERENT cells. A cross
  * sub-task (cells a≠b) sets crossOnly=true so within-cell pairs are neither
  * computed nor emitted there (they belong to their cell's diagonal task);
  * the diagonal task (a==b) sets false and runs the full triangle. Pair
  * values are byte-identical to the uncapped expression — same set logic,
  * same HALF_UP round4.
  */
case class JaccardPairsBounded(child: Expression, crossOnly: Expression,
                               threshold: Double)
    extends BinaryExpression
    with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {

  override def left: Expression = child
  override def right: Expression = crossOnly
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("id_a", LongType, nullable = false),
    StructField("id_b", LongType, nullable = false),
    StructField("jaccard", DoubleType, nullable = false))), containsNull = false)
  override def prettyName: String = "graft_jaccard_pairs_bounded"

  private def round4(x: Double): Double =
    java.math.BigDecimal.valueOf(x).setScale(4, java.math.RoundingMode.HALF_UP).doubleValue()

  override protected def nullSafeEval(input: Any, crossFlag: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val cross = crossFlag.asInstanceOf[Boolean]
    val n = arr.numElements()
    val ids = new Array[Long](n)
    val cells = new Array[Int](n)
    val sets = new Array[java.util.HashSet[Long]](n)
    var i = 0
    while (i < n) {
      val row = arr.getStruct(i, 3)
      ids(i) = row.getLong(0)
      val raw = row.getArray(1).toLongArray()
      val hs = new java.util.HashSet[Long](raw.length * 2)
      raw.foreach(hs.add(_))
      sets(i) = hs
      cells(i) = row.getInt(2)
      i += 1
    }
    val out = new java.util.ArrayList[org.apache.spark.sql.catalyst.InternalRow]()
    i = 0
    while (i < n) {
      var j = i + 1
      while (j < n) {
        if (!(cross && cells(i) == cells(j))) {
          val (small, bigSet) =
            if (sets(i).size <= sets(j).size) (sets(i), sets(j)) else (sets(j), sets(i))
          var inter = 0
          val it = small.iterator()
          while (it.hasNext) { if (bigSet.contains(it.next())) inter += 1 }
          val union = sets(i).size + sets(j).size - inter
          val jac = if (union == 0) 0.0 else round4(inter.toDouble / union.toDouble)
          if (jac >= threshold) {
            val lo = math.min(ids(i), ids(j)); val hi = math.max(ids(i), ids(j))
            out.add(org.apache.spark.sql.catalyst.InternalRow(lo, hi, jac))
          }
        }
        j += 1
      }
      i += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(
      out.toArray(new Array[org.apache.spark.sql.catalyst.InternalRow](out.size())))
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(child = newLeft, crossOnly = newRight)
}

/** [[CosinePairs]] over a CAPPED sub-bucket — the cell/crossOnly mechanics of
  * [[JaccardPairsBounded]] applied to the cosine verify: same norms-once,
  * same pair triangle, same zero-norm guard, same HALF_UP round4, so emitted
  * pairs are byte-identical to the uncapped expression. The cell check runs
  * BEFORE the dot product — a skipped pair costs two int loads.
  */
case class CosinePairsBounded(child: Expression, crossOnly: Expression,
                              threshold: Double)
    extends BinaryExpression
    with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {

  override def left: Expression = child
  override def right: Expression = crossOnly
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("id_a", LongType, nullable = false),
    StructField("id_b", LongType, nullable = false),
    StructField("sim", DoubleType, nullable = false))), containsNull = false)
  override def prettyName: String = "graft_cosine_pairs_bounded"

  private def round4(x: Double): Double =
    java.math.BigDecimal.valueOf(x).setScale(4, java.math.RoundingMode.HALF_UP).doubleValue()

  override protected def nullSafeEval(input: Any, crossFlag: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val cross = crossFlag.asInstanceOf[Boolean]
    val n = arr.numElements()
    val ids = new Array[Long](n)
    val cells = new Array[Int](n)
    val vs = new Array[Array[Double]](n)
    val nrm = new Array[Double](n)
    var i = 0
    while (i < n) {
      val row = arr.getStruct(i, 3)
      ids(i) = row.getLong(0)
      vs(i) = row.getArray(1).toDoubleArray()
      cells(i) = row.getInt(2)
      var s = 0.0; var k = 0; val v = vs(i)
      while (k < v.length) { s += v(k) * v(k); k += 1 }
      nrm(i) = math.sqrt(s)
      i += 1
    }
    val out = new java.util.ArrayList[org.apache.spark.sql.catalyst.InternalRow]()
    i = 0
    while (i < n) {
      var j = i + 1
      val vi = vs(i)
      while (j < n) {
        if (!(cross && cells(i) == cells(j))) {
          val vj = vs(j)
          val m = math.min(vi.length, vj.length)
          var d = 0.0; var k = 0
          while (k < m) { d += vi(k) * vj(k); k += 1 }
          val denom = nrm(i) * nrm(j)
          val sim = if (denom == 0.0 || !java.lang.Double.isFinite(d / denom)) Double.NaN
                    else round4(d / denom)
          if (sim >= threshold) {
            val lo = math.min(ids(i), ids(j)); val hi = math.max(ids(i), ids(j))
            out.add(org.apache.spark.sql.catalyst.InternalRow(lo, hi, sim))
          }
        }
        j += 1
      }
      i += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(
      out.toArray(new Array[org.apache.spark.sql.catalyst.InternalRow](out.size())))
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(child = newLeft, crossOnly = newRight)
}

/** Hamming-verified SimHash pairs inside one (capped) band bucket — the
  * cell/crossOnly mechanics of [[JaccardPairsBounded]] applied to 64-bit
  * fingerprints. Input structs: (id: long, fp: long, cell: int); output:
  * pairs with popcount(fp_a ^ fp_b) ≤ maxDist, id_a < id_b, hamming as
  * long. One boxed call per sub-bucket; the per-pair work is a single xor +
  * popcount, so this exists for the SHUFFLE shape (no candidate-pair
  * materialization, no fingerprint re-attach joins), not per-pair speed.
  */
case class HammingPairsBounded(child: Expression, crossOnly: Expression,
                               maxDist: Int)
    extends BinaryExpression
    with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {

  override def left: Expression = child
  override def right: Expression = crossOnly
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("id_a", LongType, nullable = false),
    StructField("id_b", LongType, nullable = false),
    StructField("hamming", LongType, nullable = false))), containsNull = false)
  override def prettyName: String = "graft_hamming_pairs_bounded"

  override protected def nullSafeEval(input: Any, crossFlag: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val cross = crossFlag.asInstanceOf[Boolean]
    val n = arr.numElements()
    val ids = new Array[Long](n)
    val fps = new Array[Long](n)
    val cells = new Array[Int](n)
    var i = 0
    while (i < n) {
      val row = arr.getStruct(i, 3)
      ids(i) = row.getLong(0)
      fps(i) = row.getLong(1)
      cells(i) = row.getInt(2)
      i += 1
    }
    val out = new java.util.ArrayList[org.apache.spark.sql.catalyst.InternalRow]()
    i = 0
    while (i < n) {
      var j = i + 1
      while (j < n) {
        if (!(cross && cells(i) == cells(j))) {
          val h = java.lang.Long.bitCount(fps(i) ^ fps(j))
          if (h <= maxDist) {
            val lo = math.min(ids(i), ids(j)); val hi = math.max(ids(i), ids(j))
            out.add(org.apache.spark.sql.catalyst.InternalRow(lo, hi, h.toLong))
          }
        }
        j += 1
      }
      i += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(
      out.toArray(new Array[org.apache.spark.sql.catalyst.InternalRow](out.size())))
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(child = newLeft, crossOnly = newRight)
}

/** All verified cosine-similar pairs inside one LSH bucket. Input is the
  * bucket's collected `array<struct<id:long, v:array<double>>>`; output is
  * `array<struct<id_a, id_b, sim>>` for the pairs with
  * round(dot/(‖a‖·‖b‖), 4) ≥ threshold, id_a < id_b.
  *
  * One call processes a whole bucket with hand-written JVM loops (norms
  * computed once per element, then the O(n²/2) pair triangle), so
  * CodegenFallback costs one boxed call per BUCKET, not per pair — the
  * interpreted-HOF formulation it replaces paid per pair. Rounding is
  * `BigDecimal.valueOf(x).setScale(4, HALF_UP)` — bit-identical to Spark's
  * `round(col, 4)`, which the exact brute-force twin uses
  * (SimilaritySpec asserts LSH ⊆ exact at equal threshold).
  */
case class CosinePairs(child: Expression, threshold: Double)
    extends UnaryExpression
    with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("id_a", LongType, nullable = false),
    StructField("id_b", LongType, nullable = false),
    StructField("sim", DoubleType, nullable = false))), containsNull = false)
  override def prettyName: String = "graft_cosine_pairs"

  private def round4(x: Double): Double =
    java.math.BigDecimal.valueOf(x).setScale(4, java.math.RoundingMode.HALF_UP).doubleValue()

  override protected def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val ids = new Array[Long](n)
    val vs = new Array[Array[Double]](n)
    val nrm = new Array[Double](n)
    var i = 0
    while (i < n) {
      val row = arr.getStruct(i, 2)
      ids(i) = row.getLong(0)
      vs(i) = row.getArray(1).toDoubleArray()
      var s = 0.0; var k = 0; val v = vs(i)
      while (k < v.length) { s += v(k) * v(k); k += 1 }
      nrm(i) = math.sqrt(s)
      i += 1
    }
    val out = new java.util.ArrayList[org.apache.spark.sql.catalyst.InternalRow]()
    i = 0
    while (i < n) {
      var j = i + 1
      val vi = vs(i)
      while (j < n) {
        val vj = vs(j)
        val m = math.min(vi.length, vj.length)
        var d = 0.0; var k = 0
        while (k < m) { d += vi(k) * vj(k); k += 1 }
        // zero-norm guard: sim would be NaN/Inf and BigDecimal.valueOf
        // throws — skip the pair (a zero vector is similar to nothing),
        // matching the exact twin where round() passes NaN through and the
        // >= threshold filter drops it
        val denom = nrm(i) * nrm(j)
        val sim = if (denom == 0.0 || !java.lang.Double.isFinite(d / denom)) Double.NaN
                  else round4(d / denom)
        if (sim >= threshold) {
          val lo = math.min(ids(i), ids(j)); val hi = math.max(ids(i), ids(j))
          out.add(org.apache.spark.sql.catalyst.InternalRow(lo, hi, sim))
        }
        j += 1
      }
      i += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(
      out.toArray(new Array[org.apache.spark.sql.catalyst.InternalRow](out.size())))
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Shared Bloom-filter bit arithmetic — ONE definition of the probe sequence
  * used by both the build side ([[graft.operators.BloomJoin.BloomAgg]] sets
  * bits) and the probe side ([[BloomMightContain]] tests them). Double
  * hashing over the 64-bit key hash (Kirsch–Mitzenmacher: probe_i =
  * h1 + i·h2, h2 forced odd), masked non-negative then reduced mod m.
  */
object BloomOps {
  /** The i-th probe's bit index in an m-bit filter. */
  def probeIndex(hash: Long, i: Int, m: Long): Long = {
    val h2 = (hash >>> 33) | 1L
    ((hash + i * h2) & Long.MaxValue) % m
  }

  /** Test all k probe bits against a word-packed filter (array<long>). */
  def mightContain(bits: ArrayData, hash: Long, k: Int): Boolean = {
    val m = bits.numElements().toLong * 64L
    var i = 0
    while (i < k) {
      val idx = probeIndex(hash, i, m)
      if (((bits.getLong((idx >>> 6).toInt) >>> (idx & 63L).toInt) & 1L) == 0L)
        return false
      i += 1
    }
    true
  }
}

/** `might_contain(bits, key_hash)` over a word-packed Bloom filter column —
  * the probe-side test of the bloom-pruned join. Generates a single static
  * call per row (no boxing, stays inside whole-stage codegen); false
  * positives are possible by construction, false negatives are not, so a
  * probe-side pre-filter followed by the exact join preserves exact join
  * semantics while shuffling only the surviving fraction.
  */
case class BloomMightContain(left: Expression, right: Expression, numHashes: Int)
    extends BinaryExpression with ImplicitCastInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(LongType), LongType)
  override def dataType: DataType = BooleanType
  override def prettyName: String = "graft_bloom_might_contain"

  override protected def nullSafeEval(b: Any, h: Any): Any =
    BloomOps.mightContain(b.asInstanceOf[ArrayData], h.asInstanceOf[Long], numHashes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (b, h) =>
      s"org.apache.spark.sql.graft.BloomOps$$.MODULE$$.mightContain($b, $h, $numHashes)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** LUT-ADC cosine for the PQ tier (Jégou 2011 §"asymmetric distance"):
  * score(code, query) via per-query lookup tables instead of
  * decode-then-dot. `lut` is the probe row's flattened table —
  * lut[offsets(s) + j] = ⟨unit(q) subvector s, codeword j of book s⟩,
  * built driver-side per query (m·ks dots over the O(k) model) and carried
  * on the broadcast probe side of the cluster join; `nlut` (same layout)
  * holds each codeword's norm², a query-INDEPENDENT model table that rides
  * as a reference object. Per candidate row the score is m table reads +
  * adds per sum — for dim=64/m=8 that's ~16 flops vs ~192 for
  * decode-then-cosine: the compute-bound alternative when scoring, not
  * I/O, dominates. Numerically it regroups the same products per subspace
  * (IEEE non-associativity in the last ulps), absorbed by the caller's
  * round(_, 4) like every libm difference. A code whose codewords are all
  * zero yields 0/0 = NaN — the same "similar to nothing" contract as a
  * zero-norm decoded candidate.
  */
case class PqAdcCosine(code: Expression, lut: Expression,
                       offsets: Array[Int], nlut: Array[Double])
    extends BinaryExpression with ImplicitCastInputTypes {

  override def left: Expression = code
  override def right: Expression = lut
  override def inputTypes: Seq[AbstractDataType] =
    Seq(LongType, ArrayType(DoubleType))
  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_pq_adc_cosine"

  override protected def nullSafeEval(c0: Any, l0: Any): Any = {
    val c = c0.asInstanceOf[Long]
    val l = l0.asInstanceOf[ArrayData]
    val m = offsets.length
    var num = 0.0
    var nn = 0.0
    var s = 0
    while (s < m) {
      val idx = offsets(s) + ((c >>> (8 * s)) & 255L).toInt
      num += l.getDouble(idx)
      nn += nlut(idx)
      s += 1
    }
    num / math.sqrt(nn)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val offRef = ctx.addReferenceObj("offsets", offsets, "int[]")
    val nlutRef = ctx.addReferenceObj("nlut", nlut, "double[]")
    nullSafeCodeGen(ctx, ev, (c, l) => {
      val num = ctx.freshName("num")
      val nn = ctx.freshName("nn")
      val s = ctx.freshName("s")
      val idx = ctx.freshName("idx")
      s"""
         |double $num = 0.0;
         |double $nn = 0.0;
         |for (int $s = 0; $s < $offRef.length; $s++) {
         |  int $idx = $offRef[$s] + (int) (($c >>> (8 * $s)) & 255L);
         |  $num += $l.getDouble($idx);
         |  $nn += $nlutRef[$idx];
         |}
         |${ev.value} = $num / java.lang.Math.sqrt($nn);
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(code = newLeft, lut = newRight)
}

/** Decode a packed product-quantization code — m sub-codes of 8 bits each
  * in one BIGINT (m ≤ 8) — back to the concatenated codeword vector.
  * `books(s)` holds subspace s's codewords FLATTENED (ks·sub doubles); the
  * codebook rides as a reference object, not literals (the
  * [[HyperplaneBuckets]] lesson: literal matrices bloat the plan and fall
  * out of codegen). Scoring a PQ index is decode-then-dot: the win is the
  * 8-byte index row (32× smaller than float32·64), not FLOPs — the LUT-ADC
  * refinement (per-probe lookup tables) trades this expression for m table
  * reads per row and matters only when scoring, not I/O, dominates.
  */
case class PqDecode(code: Expression, books: Array[Array[Double]], sub: Int)
    extends UnaryExpression with ImplicitCastInputTypes {

  override def child: Expression = code
  override def inputTypes: Seq[AbstractDataType] = Seq(LongType)
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def prettyName: String = "graft_pq_decode"

  override protected def nullSafeEval(input: Any): Any = {
    val c = input.asInstanceOf[Long]
    val m = books.length
    val out = new Array[Double](m * sub)
    var s = 0
    while (s < m) {
      val cs = ((c >>> (8 * s)) & 255L).toInt
      System.arraycopy(books(s), cs * sub, out, s * sub, sub)
      s += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val booksRef = ctx.addReferenceObj("books", books, "double[][]")
    nullSafeCodeGen(ctx, ev, c => {
      val m = ctx.freshName("m")
      val out = ctx.freshName("out")
      val s = ctx.freshName("s")
      val cs = ctx.freshName("cs")
      s"""
         |int $m = $booksRef.length;
         |double[] $out = new double[$m * $sub];
         |for (int $s = 0; $s < $m; $s++) {
         |  int $cs = (int) (($c >>> (8 * $s)) & 255L);
         |  System.arraycopy($booksRef[$s], $cs * $sub, $out, $s * $sub, $sub);
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(code = newChild)
}

/** O(1) token → ratio lookup against a driver-built hash table — the
  * literal-MAP form (`coalesce(element_at(map(lit...), t), lit(floor))`)
  * pays Spark's `GetMapValue` LINEAR key scan per lookup: O(k) UTF8String
  * comparisons per token, which at the capped-vocabulary production size
  * (k = 10 000) dominates DSIR/familiarity scoring. The table rides the
  * expression as parallel arrays (plan-light, serializer-friendly) and is
  * materialized into a per-JVM `java.util.HashMap` lazily; the ratio
  * DOUBLES are exactly the ones the map form carried, and a hit returns
  * the identical value, so scores are bit-identical (gate re-verified).
  * Misses return `default` (the smoothed floor, or NaN where the caller
  * proves totality) — non-null either way.
  *
  * Used inside `transform` lambdas, which Spark evaluates interpreted —
  * the win is the O(1) `nullSafeEval`; `doGenCode` is provided for
  * completeness when the expression lands in a codegen'd projection.
  */
case class TokenRatioLookup(child: Expression, tokens: Array[String],
                            ratios: Array[Double], default: Double)
    extends UnaryExpression with ImplicitCastInputTypes {
  require(tokens.length == ratios.length,
    s"tokens(${tokens.length}) and ratios(${ratios.length}) must align")

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_token_ratio_lookup"

  @transient private lazy val table
      : java.util.HashMap[org.apache.spark.unsafe.types.UTF8String, java.lang.Double] = {
    val m = new java.util.HashMap[org.apache.spark.unsafe.types.UTF8String, java.lang.Double](
      math.max(4, tokens.length * 2))
    var i = 0
    while (i < tokens.length) {
      m.put(org.apache.spark.unsafe.types.UTF8String.fromString(tokens(i)), ratios(i))
      i += 1
    }
    m
  }

  override protected def nullSafeEval(input: Any): Any = {
    val v = table.get(input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String])
    if (v == null) default else v.doubleValue()
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val tableRef = ctx.addReferenceObj("table", table, "java.util.HashMap")
    val defRef = ctx.addReferenceObj("default", java.lang.Double.valueOf(default),
      "java.lang.Double")
    nullSafeCodeGen(ctx, ev, c => {
      val v = ctx.freshName("v")
      s"""
         |java.lang.Double $v = (java.lang.Double) $tableRef.get($c);
         |${ev.value} = ($v == null) ? $defRef.doubleValue() : $v.doubleValue();
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Content-defined-chunking boundary scan: all cut positions (1-based char
  * index of a chunk's last character) where xxhash64(seed 42) of the
  * trailing `win`-char window satisfies pmod(h, divisor) == 0, excluding a
  * cut at the very end — bit-identical to the HOF formulation
  * `filter(transform(sequence(...)), c -> pmod(xxhash64(substr(text,p,win)),
  * divisor) = 0 AND c < len)` (pinned in CatalystExpressionSpec), without
  * allocating a substring + hash expression evaluation per position: one
  * char-offset walk, then one XXH64 call per window over the SAME UTF-8
  * byte slice Spark's `xxhash64(substr(...))` would hash (substring copies
  * bytes; the slice content is identical, so the hashes are too — including
  * multi-byte characters, which is why the walk tracks BYTE offsets per
  * char). Measured 9x the HOF formulation at sf0.1 and 33x at the 64x
  * amplification (0.78 vs 6.9 s / 6.9 vs 227 s — ScaleBench
  * `cdc_chunks_fast` vs `cdc_chunks_xx`): the per-position substring +
  * expression-eval machinery, not the digest, was the cost (md5 vs
  * xxhash64 HOF forms measured within 2% of each other).
  */
case class CdcCuts(child: Expression, win: Int, divisor: Int)
    extends UnaryExpression with ImplicitCastInputTypes {

  require(win >= 1 && divisor >= 1)

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "graft_cdc_cuts"

  override protected def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String]
    val base = s.getBaseObject
    val off = s.getBaseOffset
    val nBytes = s.numBytes()
    val nChars = s.numChars()
    // byte offset of each char start (+ terminal)
    val boff = new Array[Int](nChars + 1)
    var b = 0
    var ci = 0
    while (ci < nChars) {
      boff(ci) = b
      b += org.apache.spark.unsafe.types.UTF8String.numBytesForFirstByte(
        org.apache.spark.unsafe.Platform.getByte(base, off + b))
      ci += 1
    }
    boff(nChars) = nBytes
    // windows start at 0-based p < nChars - win (the cut at p + win must be
    // strictly before the end); cut value is the 1-based last-char index
    val nWin = math.max(nChars - win, 0)
    val cuts = new Array[Int](nWin)
    var k = 0
    var p = 0
    while (p < nWin) {
      val h = org.apache.spark.sql.catalyst.expressions.XXH64.hashUnsafeBytes(
        base, off + boff(p), boff(p + win) - boff(p), 42L)
      if (((h % divisor) + divisor) % divisor == 0) { cuts(k) = p + win; k += 1 }
      p += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(
      java.util.Arrays.copyOf(cuts, k))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val base = ctx.freshName("base")
      val off = ctx.freshName("off")
      val nBytes = ctx.freshName("nBytes")
      val nChars = ctx.freshName("nChars")
      val boff = ctx.freshName("boff")
      val b = ctx.freshName("b")
      val ci = ctx.freshName("ci")
      val nWin = ctx.freshName("nWin")
      val cuts = ctx.freshName("cuts")
      val k = ctx.freshName("k")
      val p = ctx.freshName("p")
      val h = ctx.freshName("h")
      s"""
         |Object $base = $c.getBaseObject();
         |long $off = $c.getBaseOffset();
         |int $nBytes = $c.numBytes();
         |int $nChars = $c.numChars();
         |int[] $boff = new int[$nChars + 1];
         |int $b = 0;
         |for (int $ci = 0; $ci < $nChars; $ci++) {
         |  $boff[$ci] = $b;
         |  $b += org.apache.spark.unsafe.types.UTF8String.numBytesForFirstByte(
         |    org.apache.spark.unsafe.Platform.getByte($base, $off + $b));
         |}
         |$boff[$nChars] = $nBytes;
         |int $nWin = java.lang.Math.max($nChars - $win, 0);
         |int[] $cuts = new int[$nWin];
         |int $k = 0;
         |for (int $p = 0; $p < $nWin; $p++) {
         |  long $h = org.apache.spark.sql.catalyst.expressions.XXH64.hashUnsafeBytes(
         |    $base, $off + $boff[$p], $boff[$p + $win] - $boff[$p], 42L);
         |  if ((($h % $divisor) + $divisor) % $divisor == 0) { $cuts[$k++] = $p + $win; }
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(
         |  java.util.Arrays.copyOf($cuts, $k));
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Cross-row MinHash fold: the per-slice signature aggregate of
  * [[graft.operators.CorpusOverlap.sliceSignatures]] as ONE imperative
  * aggregate over a primitive long buffer instead of `numPerm` declarative
  * `min(pmod(a·h + b, P))` buffers.
  *
  * Why (r20 optimization, guide §"expressions and codegen"): at numPerm =
  * 128 the declarative form's generated aggregate-update method is so
  * large that whole-stage codegen is SLOWER than Spark's interpreted path
  * (measured at 8× corpus: 1.92 s codegen vs 1.29 s wholeStage=off vs
  * 0.65 s at numPerm=32 — the JIT refuses the huge method and the
  * generated bytecode runs deoptimized). This fold is one virtual call per
  * row into a tight primitive loop: 128 multiply/mod/min per input hash,
  * no boxing, ~0.1 µs/row.
  *
  * Bit-identical to the declarative form: inputs are non-negative
  * (`pmod(h60, 2³²)`), aᵢ < 2³¹, so aᵢ·h + bᵢ never overflows a long and
  * `% P` equals `pmod`; min is the same fold. Null hashes are skipped
  * (min's null-skip semantics). Equivalence is spec-pinned
  * (OverlapStreamSpec) and oracle-gated (`source_overlap_sketch{,_serve}`).
  * Groups always contain ≥1 non-null row here (grams are filtered
  * non-null), so the empty-buffer rendering (Long.MaxValue components) is
  * unreachable on gate paths.
  */
case class MinHashFold(
    child: Expression,
    aPerm: Array[Long],
    bPerm: Array[Long],
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate[Array[Long]]
  with org.apache.spark.sql.catalyst.trees.UnaryLike[Expression] {

  private val P = GraftHashConstants.MersennePrime

  override def createAggregationBuffer(): Array[Long] =
    Array.fill(aPerm.length)(Long.MaxValue)

  override def update(buf: Array[Long], input: org.apache.spark.sql.catalyst.InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val h = v.asInstanceOf[Long]
      var i = 0
      while (i < buf.length) {
        val x = (aPerm(i) * h + bPerm(i)) % P
        if (x < buf(i)) buf(i) = x
        i += 1
      }
    }
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < a.length) { if (b(i) < a(i)) a(i) = b(i); i += 1 }
    a
  }

  override def eval(buf: Array[Long]): Any =
    new org.apache.spark.sql.catalyst.util.GenericArrayData(buf)

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(buf.length * 8)
    bb.asLongBuffer().put(buf)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val out = new Array[Long](bytes.length / 8)
    java.nio.ByteBuffer.wrap(bytes).asLongBuffer().get(out)
    out
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): MinHashFold =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MinHashFold =
    copy(inputAggBufferOffset = newOffset)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_minhash_fold"
  override protected def withNewChildInternal(newChild: Expression): MinHashFold =
    copy(child = newChild)
}

/** Hash every element of an `array<string>` in one codegen call —
  * `transform(arr, s => pmod(hashFn(s), mod))` (and the mod-free
  * `transform(arr, hashFn)`) without the interpreted per-element HOF
  * lambda (round 21, guide §"expressions and codegen": HOFs are
  * CodegenFallback, so every shingle of every document paid an
  * interpreted `Expression.eval` + boxing around the hash call — measured
  * across the MinHash/SimHash/winnowing families). Two algorithms, both
  * bit-identical to their Column formulations (equivalence spec-pinned):
  *
  *  - "h60": [[Md5Prefix60]] of the UTF-8 bytes (≡ `h60(s)` —
  *    `Cast(s, binary)` is exactly `UTF8String.getBytes`);
  *  - "xx64": `XXH64.hashUnsafeBytes(..., 42L)` (≡ `xxhash64(s)` — the
  *    same call `XxHash64Function.hash` makes for a string input).
  *
  * `mod > 0` applies `pmod(h, mod)` (sign-safe — xxhash64 can be
  * negative); `mod == 0` returns the raw hash. A null element maps to a
  * null element, exactly like the HOF.
  */
object HashStringArray {
  /** Public — called from generated code. */
  def hash(arr: ArrayData, h60: Boolean, mod: Long): ArrayData = {
    val n = arr.numElements()
    val out = new Array[Any](n)
    var i = 0
    while (i < n) {
      if (arr.isNullAt(i)) out(i) = null
      else {
        val s = arr.getUTF8String(i)
        var h =
          if (h60) Md5Prefix60.hash(s.getBytes)
          else org.apache.spark.sql.catalyst.expressions.XXH64.hashUnsafeBytes(
            s.getBaseObject, s.getBaseOffset, s.numBytes, 42L)
        if (mod > 0) h = ((h % mod) + mod) % mod
        out(i) = h
      }
      i += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }
}

case class HashStringArray(child: Expression, algo: String, mod: Long)
    extends UnaryExpression with ImplicitCastInputTypes {
  require(algo == "h60" || algo == "xx64", s"unknown hash algo: $algo")

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(StringType))
  override def dataType: DataType = ArrayType(LongType, containsNull = true)
  override def prettyName: String = s"graft_hash_array_$algo"

  private def isH60 = algo == "h60"

  override protected def nullSafeEval(input: Any): Any =
    HashStringArray.hash(input.asInstanceOf[ArrayData], isH60, mod)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = org.apache.spark.sql.graft.HashStringArray$$.MODULE$$.hash($c, $isH60, ${mod}L);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Mean naive-Bayes log-odds of a gram array against a dense h60-hashed
  * weight table — the fused form of [[graft.operators.HashedModel
  * .classifierStruct]]'s `aggregate(transform(fs, g => element_at(wm,
  * pmod(h60(g), K) + 1)), 0.0, _+_) / size(fs)` (round 21: the HOF pair is
  * CodegenFallback, so every gram of every scored document paid two
  * interpreted element evals + boxing around the md5). Same left-to-right
  * double summation, same md5-prefix60 % K bucket, same final division —
  * bit-identical scores (equivalence spec-pinned). Gram elements are
  * non-null by construction (split/shingle output); the weight table rides
  * as a referenced object like [[HyperplaneBuckets]]' planes.
  */
case class NbMeanLogOdds(child: Expression, wm: Array[Double], k: Int)
    extends UnaryExpression with ImplicitCastInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(StringType))
  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_nb_mean_logodds"

  override protected def nullSafeEval(input: Any): Any =
    NbMeanLogOdds.mean(input.asInstanceOf[ArrayData], wm, k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val tbl = ctx.addReferenceObj("nbWm", wm, "double[]")
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = org.apache.spark.sql.graft.NbMeanLogOdds$$.MODULE$$.mean($c, $tbl, $k);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object NbMeanLogOdds {
  /** Public — called from generated code. */
  def mean(arr: ArrayData, wm: Array[Double], k: Int): Double = {
    val n = arr.numElements()
    var sum = 0.0
    var i = 0
    while (i < n) {
      val b = (Md5Prefix60.hash(arr.getUTF8String(i).getBytes) % k).toInt
      sum += wm(b)
      i += 1
    }
    sum / n
  }
}

/** Average bigram log-probability of a word array against dense h60-hashed
  * unigram/bigram count tables — the fused form of
  * [[graft.operators.HashedModel.perplexityStruct]]'s interpreted
  * `transform(sequence…, i => log((bgm[b(wᵢ wᵢ₊₁)] + α) / (ugm[b(wᵢ)] +
  * αK))) |> aggregate(_+_) / n` (round 21). Same gram bytes (single-space
  * concat — `UTF8String.concatWs`, exactly `concat_ws(" ", …)`), same
  * md5-prefix60 % K buckets, same `Math.log`, same left-to-right double
  * summation and final division (0-bigram docs yield the same NaN the
  * column form produced; consumers mask on n > 0) — bit-identical
  * (equivalence spec-pinned). `alphaK` is the caller's α·K product so the
  * divisor literal matches the column form bit for bit. Word elements are
  * non-null by construction (split output).
  */
case class BigramAvgLogp(child: Expression, ugm: Array[Double],
                         bgm: Array[Double], k: Int,
                         alpha: Double, alphaK: Double)
    extends UnaryExpression with ImplicitCastInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(StringType))
  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_bigram_avg_logp"

  override protected def nullSafeEval(input: Any): Any =
    BigramAvgLogp.avg(input.asInstanceOf[ArrayData], ugm, bgm, k, alpha, alphaK)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val u = ctx.addReferenceObj("lmUgm", ugm, "double[]")
    val b = ctx.addReferenceObj("lmBgm", bgm, "double[]")
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = org.apache.spark.sql.graft.BigramAvgLogp$$.MODULE$$.avg($c, $u, $b, $k, $alpha, $alphaK);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object BigramAvgLogp {
  private val Space = org.apache.spark.unsafe.types.UTF8String.fromString(" ")
  /** Public — called from generated code. */
  def avg(words: ArrayData, ugm: Array[Double], bgm: Array[Double],
          k: Int, alpha: Double, alphaK: Double): Double = {
    val n = words.numElements()
    var sum = 0.0
    var i = 0
    while (i < n - 1) {
      val w1 = words.getUTF8String(i)
      val w2 = words.getUTF8String(i + 1)
      val bg = org.apache.spark.unsafe.types.UTF8String.concatWs(Space, w1, w2)
      val bb = (Md5Prefix60.hash(bg.getBytes) % k).toInt
      val ub = (Md5Prefix60.hash(w1.getBytes) % k).toInt
      sum += java.lang.Math.log((bgm(bb) + alpha) / (ugm(ub) + alphaK))
      i += 1
    }
    sum / (n - 1)
  }
}

/** The deterministic stub chunk embedding in one codegen call — the fused
  * form of [[graft.operators.Prep.chunkEmbedExpr]]'s `transform(sequence(0,
  * dim−1), i => pmod(h60(concat_ws("-", h, i)), 2000) / 1000.0 − 1.0)`
  * (round 21: `dim` interpreted md5 evals per distinct chunk). Same bytes
  * hashed (decimal hash string + "-" + dimension index), same md5-prefix60
  * % 2000 (non-negative, so `%` ≡ pmod), same double division/subtraction —
  * bit-identical vectors (equivalence spec-pinned).
  */
case class ChunkEmbed(child: Expression, dim: Int)
    extends UnaryExpression with ImplicitCastInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def prettyName: String = "graft_chunk_embed"

  override protected def nullSafeEval(input: Any): Any =
    ChunkEmbed.embed(input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String], dim)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = org.apache.spark.sql.graft.ChunkEmbed$$.MODULE$$.embed($c, $dim);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object ChunkEmbed {
  /** Public — called from generated code. */
  def embed(hash: org.apache.spark.unsafe.types.UTF8String, dim: Int): ArrayData = {
    val prefix = hash.toString + "-"
    val out = new Array[Double](dim)
    var i = 0
    while (i < dim) {
      val h = Md5Prefix60.hash((prefix + i).getBytes("UTF-8"))
      out(i) = (h % 2000L).toDouble / 1000.0 - 1.0
      i += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }
}

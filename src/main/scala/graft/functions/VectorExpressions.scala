package graft.functions

import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}
import org.apache.spark.sql.SparkSessionExtensions

/** Native Catalyst expression for the embedding hot loop.
  *
  * The higher-order-function form (`aggregate(zip_with(a,b,*),0,+)`) is
  * interpreted per element — fine for one pass over the corpus, ruinous in
  * an O(pairs) similarity stage. This expression participates in whole-stage
  * codegen: the generated Java is a tight primitive loop over the two
  * ArrayData buffers, ~50× less per-pair overhead.
  *
  * Summation is the same ascending left fold as the HOF form and the DuckDB
  * oracle's list_reduce, so results are bit-identical.
  */
case class DotProduct(left: Expression, right: Expression)
  extends BinaryExpression {

  // inputs are array<double> by construction (callers cast via vecD);
  // ExpectsInputTypes is private[sql] territory, so no declared coercion
  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_dot"
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(DoubleType, _) => true; case _ => false
    })
    if (ok) org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"graft_dot expects (array<double>, array<double>), got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
  }

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
      // freshName: a bare `i` collides with method-locals in the fused
      // wholestage scope (Java forbids shadowing; Janino rejects the class
      // and the whole stage silently falls back to interpreted eval)
      val i = ctx.freshName("i")
      s"""
         |int ${ev.value}_n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double ${ev.value}_s = 0.0;
         |for (int $i = 0; $i < ${ev.value}_n; $i++) {
         |  ${ev.value}_s += $a.getDouble($i) * $b.getDouble($i);
         |}
         |${ev.value} = ${ev.value}_s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression,
                                                 newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** 16-bit random-hyperplane LSH signature as one native loop. The literal
  * expression-chain form (16 planes × 64 weight literals = 1024 nodes) blows
  * past codegen method limits and falls back to interpreted eval at ~1 ms a
  * row; this is the same arithmetic — identical ascending-d summation, so
  * bit-identical signatures — in a single generated loop over the weight
  * matrix held as a reference object. */
case class LshSignature16(child: Expression)
  extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  override def dataType: DataType = org.apache.spark.sql.types.LongType
  override def prettyName: String = "graft_lsh16"

  // flattened [p*64 + d] view of PipelineFunctions.LshWeights
  @transient private lazy val w: Array[Double] =
    PipelineFunctions.LshWeights.flatten

  override protected def nullSafeEval(v: Any): Any = {
    val arr = v.asInstanceOf[ArrayData]
    val dim = math.min(arr.numElements(), 64)
    var sig = 0L
    var p = 0
    while (p < 16) {
      var s = 0.0
      var d = 0
      while (d < dim) { s += w(p * 64 + d) * arr.getDouble(d); d += 1 }
      if (s >= 0) sig |= 1L << p
      p += 1
    }
    sig
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val wRef = ctx.addReferenceObj("lshWeights", w, "double[]")
    nullSafeCodeGen(ctx, ev, v => {
      // freshName for every local: bare names can shadow method-locals of
      // the fused wholestage scope (Janino rejects -> interpreted fallback)
      val (p, d, s) = (ctx.freshName("p"), ctx.freshName("d"), ctx.freshName("s"))
      s"""
         |int ${ev.value}_dim = java.lang.Math.min($v.numElements(), 64);
         |long ${ev.value}_sig = 0L;
         |for (int $p = 0; $p < 16; $p++) {
         |  double $s = 0.0;
         |  for (int $d = 0; $d < ${ev.value}_dim; $d++) {
         |    $s += $wRef[$p * 64 + $d] * $v.getDouble($d);
         |  }
         |  if ($s >= 0) ${ev.value}_sig |= 1L << $p;
         |}
         |${ev.value} = ${ev.value}_sig;
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** MD5-digest helpers shared by the native hash expression. */
object HashUtil {
  private val digests = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** First 32 bits of md5(bytes) as an unsigned long — bit-identical to
    * `conv(substring(md5(s), 1, 8), 16, 10)` (first 8 hex chars = first 4
    * digest bytes, big-endian). */
  def md5Prefix32(bytes: Array[Byte]): Long = {
    val md = digests.get()
    md.reset()
    val d = md.digest(bytes)
    ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) |
      ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)
  }

  /** First 64 bits of md5(bytes) as a long (unsigned bit pattern) —
    * bit-identical to `('0x' || substr(md5(s), 1, 16))::UBIGINT` in DuckDB
    * (first 16 hex chars = first 8 digest bytes, big-endian). */
  def md5Prefix64(bytes: Array[Byte]): Long = {
    val md = digests.get()
    md.reset()
    val d = md.digest(bytes)
    var h = 0L
    var i = 0
    while (i < 8) { h = (h << 8) | (d(i) & 0xffL); i += 1 }
    h
  }

  /** 16-bit SimHash over bit range [off, off+16) of the 64-bit md5-prefix
    * word hashes; null word poisons to null (boxed). Four of these at
    * offsets 0/16/32/48 form a 64-bit signature as four independently
    * joinable bands (pigeonhole: Hamming ≤ 3 over 64 bits ⇒ at least one
    * 16-bit band matches exactly).
    *
    * Empty word array → 0, matching the DuckDB oracle (list_sum over an
    * empty list is NULL, so no CASE arm fires and every bit stays 0) —
    * unreachable through split() (never yields an empty array) but pinned
    * so a tokenization change can't open a silent Spark/oracle divergence. */
  def simhashBand(words: ArrayData, off: Int): java.lang.Long = {
    val n = words.numElements()
    if (n == 0) return java.lang.Long.valueOf(0L)
    val counts = new Array[Long](16)
    var i = 0
    while (i < n) {
      if (words.isNullAt(i)) return null
      val h = md5Prefix64(words.getUTF8String(i).getBytes)
      var b = 0
      while (b < 16) {
        counts(b) += ((h >>> (b + off)) & 1L) * 2 - 1
        b += 1
      }
      i += 1
    }
    var sig = 0L
    var b = 0
    while (b < 16) { if (counts(b) >= 0) sig |= 1L << b; b += 1 }
    java.lang.Long.valueOf(sig)
  }

  /** All four 16-bit bands of the 64-bit SimHash in ONE pass: each word is
    * md5-digested once and feeds all 64 counters. The per-band expression
    * re-hashes every word per band — 4× the digests in the map-side stage
    * banded dedup exists to make cheap. Identical band values to
    * [[simhashBand]] at offsets 0/16/32/48 (same counters, same >= 0 rule;
    * empty → four zeros, null word → null). */
  def simhashBands(words: ArrayData): ArrayData = {
    val n = words.numElements()
    val counts = new Array[Long](64)
    var i = 0
    while (i < n) {
      if (words.isNullAt(i)) return null
      val h = md5Prefix64(words.getUTF8String(i).getBytes)
      var b = 0
      while (b < 64) {
        counts(b) += ((h >>> b) & 1L) * 2 - 1
        b += 1
      }
      i += 1
    }
    val out = new Array[Long](4)
    var k = 0
    while (k < 4) {
      var sig = 0L
      var b = 0
      while (b < 16) {
        if (n > 0 && counts(k * 16 + b) >= 0) sig |= 1L << b
        b += 1
      }
      out(k) = sig
      k += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  /** Distinct rolling 3-shingle hashes of a word array in ONE pass:
    * wh_i = md5Prefix32(word_i), s_i = ((wh_i·131 + wh_{i+1}) mod P)·131 +
    * wh_{i+2} mod P, first-occurrence order — the exact arithmetic of
    * PipelineFunctions.combineShingles3(wordHashes(·)) (operands are
    * non-negative, so % equals pmod). Fewer than 3 words → empty. */
  def shingles3(words: ArrayData): ArrayData = {
    val P = 1000000007L
    val n = words.numElements()
    if (n < 3) return new org.apache.spark.sql.catalyst.util.GenericArrayData(Array.empty[Long])
    val wh = new Array[Long](n)
    var i = 0
    while (i < n) {
      wh(i) = md5Prefix32(words.getUTF8String(i).getBytes)
      i += 1
    }
    val out = new Array[Long](n - 2)
    val seen = new java.util.HashSet[java.lang.Long](2 * n)
    var k = 0
    i = 0
    while (i < n - 2) {
      val s = ((wh(i) * 131L + wh(i + 1)) % P * 131L + wh(i + 2)) % P
      if (seen.add(s)) { out(k) = s; k += 1 }
      i += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(
      java.util.Arrays.copyOf(out, k))
  }
}

/** `graft_hash32(s)`: the md5-prefix 32-bit hash without the hex-string
  * round trip (md5 → 32-char hex string → substring → base-16 parse). The
  * digest bytes are consumed directly; the thread-local MessageDigest
  * avoids per-row allocation. Identical values to the conv/substr/md5
  * chain, so every oracle comparison is unchanged. */
case class Md5Prefix32(child: Expression)
  extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  override def dataType: DataType = org.apache.spark.sql.types.LongType
  override def prettyName: String = "graft_hash32"

  override protected def nullSafeEval(v: Any): Any =
    HashUtil.md5Prefix32(v.asInstanceOf[org.apache.spark.unsafe.types.UTF8String].getBytes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v =>
      s"${ev.value} = graft.functions.HashUtil.md5Prefix32($v.getBytes());")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** `graft_simhash16(words)`: 16-bit SimHash over a word array as ONE native
  * loop — per word, one direct md5 digest and 16 counter updates. The HOF
  * form builds an intermediate 16-element array per word (transform inside
  * aggregate) and interprets every lambda; this is the same arithmetic
  * (same md5-prefix hashes, same signed bit counters, same >= 0 rule), so
  * signatures are bit-identical and the DuckDB oracle is unchanged.
  * A null word poisons the result to NULL, matching the HOF form's
  * null-propagating fold. */
case class SimHash16(child: Expression)
  extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  override def dataType: DataType = org.apache.spark.sql.types.LongType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_simhash16"

  override protected def nullSafeEval(v: Any): Any = {
    val arr = v.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val counts = new Array[Long](16)
    var i = 0
    while (i < n) {
      if (arr.isNullAt(i)) return null
      val h = HashUtil.md5Prefix32(arr.getUTF8String(i).getBytes)
      var b = 0
      while (b < 16) { counts(b) += ((h >> b) & 1L) * 2 - 1; b += 1 }
      i += 1
    }
    var sig = 0L
    var b = 0
    while (b < 16) { if (counts(b) >= 0) sig |= 1L << b; b += 1 }
    sig
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => {
      val counts = ctx.freshName("counts")
      val i = ctx.freshName("i")
      val b = ctx.freshName("b")
      val h = ctx.freshName("h")
      s"""
         |long[] $counts = new long[16];
         |int ${ev.value}_n = $v.numElements();
         |boolean ${ev.value}_null = false;
         |for (int $i = 0; $i < ${ev.value}_n; $i++) {
         |  if ($v.isNullAt($i)) { ${ev.value}_null = true; break; }
         |  long $h = graft.functions.HashUtil.md5Prefix32($v.getUTF8String($i).getBytes());
         |  for (int $b = 0; $b < 16; $b++) {
         |    $counts[$b] += (($h >> $b) & 1L) * 2 - 1;
         |  }
         |}
         |if (${ev.value}_null) {
         |  ${ev.isNull} = true;
         |  ${ev.value} = -1L;
         |} else {
         |  long ${ev.value}_sig = 0L;
         |  for (int $b = 0; $b < 16; $b++) {
         |    if ($counts[$b] >= 0) ${ev.value}_sig |= 1L << $b;
         |  }
         |  ${ev.value} = ${ev.value}_sig;
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** `graft_shingles3(words)`: tokenize→hash→rolling-combine→distinct as one
  * native O(words) pass. The HOF chain (`combineShingles3(wordHashes(w))`)
  * is correct but a scale trap: when CollapseProject inlines the word-hash
  * array into every `get(wh, i)` reference site, each of the ~3·words
  * element accesses re-evaluates the whole transform — O(words²) md5
  * digests per doc, multiplied again by every plan node (Filter, Project,
  * Generate) that repeats the expression. 25 s vs ~1 s on the sf0.1
  * hot-ngrams scan. Output is bit-identical (HashUtil.shingles3 keeps the
  * same arithmetic and first-occurrence distinct order), so every oracle
  * and downstream MinHash signature is unchanged. */
case class Shingles3(child: Expression)
  extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  override def dataType: DataType =
    ArrayType(org.apache.spark.sql.types.LongType, containsNull = false)
  override def prettyName: String = "graft_shingles3_native"

  override protected def nullSafeEval(v: Any): Any =
    HashUtil.shingles3(v.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v =>
      s"${ev.value} = graft.functions.HashUtil.shingles3($v);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** `graft_simhash_band(words, off)`: one 16-bit band of a 64-bit SimHash —
  * the signature over bits [off, off+16) of the 64-bit md5-prefix word
  * hashes (off ∈ {0,16,32,48}, a foldable literal). Four bands make the
  * 64-bit-signature near-dup join BUCKETED: Hamming ≤ 3 over 64 bits
  * pigeonholes into an exact match on ≥1 band, so banding loses no pair.
  * The 16-bit [[SimHash16]] can't support banding (4-bit bands have 16
  * buckets — the "bucketed" join would still be n²/4). */
case class SimHashBand(words: Expression, offsetExpr: Expression)
  extends BinaryExpression {

  override def left: Expression = words
  override def right: Expression = offsetExpr
  override def dataType: DataType = org.apache.spark.sql.types.LongType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_simhash_band"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    val wordsOk = words.dataType match {
      case ArrayType(org.apache.spark.sql.types.StringType, _) => true
      case _ => false
    }
    val offOk = offsetExpr.foldable && (offsetExpr.eval(null) match {
      case i: Int => Seq(0, 16, 32, 48).contains(i)
      case _ => false
    })
    if (wordsOk && offOk) org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      "graft_simhash_band expects (array<string>, literal offset in {0,16,32,48})")
  }

  @transient private lazy val off: Int =
    offsetExpr.eval(null).asInstanceOf[Int]

  override protected def nullSafeEval(a: Any, b: Any): Any =
    HashUtil.simhashBand(a.asInstanceOf[ArrayData], off)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (v, o) => {
      val tmp = ctx.freshName("bandSig")
      s"""
         |java.lang.Long $tmp = graft.functions.HashUtil.simhashBand($v, (int) $o);
         |if ($tmp == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = $tmp.longValue(); }
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression,
                                                 newRight: Expression): Expression =
    copy(words = newLeft, offsetExpr = newRight)
}

/** `graft_simhash_bands(words)`: all four 16-bit bands of the 64-bit
  * SimHash as array<long> [sh0, sh1, sh2, sh3] — ONE md5 digest per word
  * feeding all 64 counters, where four [[SimHashBand]] calls digest every
  * word four times (and, uncached, once more per plan branch the sig
  * subplan appears in). Values are bit-identical to the per-band
  * expression at offsets 0/16/32/48. */
case class SimHashBands(child: Expression)
  extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  override def dataType: DataType =
    ArrayType(org.apache.spark.sql.types.LongType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "graft_simhash_bands"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(org.apache.spark.sql.types.StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"graft_simhash_bands expects array<string>, got ${other.simpleString}")
    }

  override protected def nullSafeEval(v: Any): Any =
    HashUtil.simhashBands(v.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => {
      val tmp = ctx.freshName("bands")
      s"""
         |org.apache.spark.sql.catalyst.util.ArrayData $tmp =
         |  graft.functions.HashUtil.simhashBands($v);
         |if ($tmp == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = $tmp; }
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Session extension registering the native functions — enable with
  * `.config("spark.sql.extensions", "graft.functions.GraftExtensions")`. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      new FunctionIdentifier("graft_dot"),
      new ExpressionInfo(classOf[DotProduct].getName, "graft_dot"),
      (args: Seq[Expression]) => DotProduct(args.head, args(1))))
    ext.injectFunction((
      new FunctionIdentifier("graft_lsh16"),
      new ExpressionInfo(classOf[LshSignature16].getName, "graft_lsh16"),
      (args: Seq[Expression]) => LshSignature16(args.head)))
    ext.injectFunction((
      new FunctionIdentifier("graft_hash32"),
      new ExpressionInfo(classOf[Md5Prefix32].getName, "graft_hash32"),
      (args: Seq[Expression]) => Md5Prefix32(args.head)))
    ext.injectFunction((
      new FunctionIdentifier("graft_simhash16_native"),
      new ExpressionInfo(classOf[SimHash16].getName, "graft_simhash16_native"),
      (args: Seq[Expression]) => SimHash16(args.head)))
    ext.injectFunction((
      new FunctionIdentifier("graft_shingles3_native"),
      new ExpressionInfo(classOf[Shingles3].getName, "graft_shingles3_native"),
      (args: Seq[Expression]) => Shingles3(args.head)))
    ext.injectFunction((
      new FunctionIdentifier("graft_simhash_band"),
      new ExpressionInfo(classOf[SimHashBand].getName, "graft_simhash_band"),
      (args: Seq[Expression]) => SimHashBand(args.head, args(1))))
    ext.injectFunction((
      new FunctionIdentifier("graft_simhash_bands"),
      new ExpressionInfo(classOf[SimHashBands].getName, "graft_simhash_bands"),
      (args: Seq[Expression]) => SimHashBands(args.head)))
  }
}

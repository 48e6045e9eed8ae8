package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression, ExpressionInfo, Literal, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Shared row kernels for the near-dup text expressions (SURVEY.md
  * §2.9/§2.10 custom-Expression tier: [[NgramSet]],
  * [[JaccardSets]], [[LshBandBuckets]]), operating on Catalyst's
  * internal representations (UTF8String in, ArrayData out).
  *
  * These replace the Scala-UDF formulation of the same kernels
  * (graft.functions.FastText, round 1-3): a ScalaUDF pays
  * CatalystTypeConverters both ways on every call — UTF8String → String
  * → immutable Seq wrappers in, result re-encoded out — which at 100 TB
  * is a SerDe bill charged per row of the widest column in the corpus.
  * The expression form keeps set membership on raw UTF8String bytes
  * (jaccard never decodes at all) and builds output arrays directly.
  *
  * Semantics are pinned byte-for-byte to the UDF originals (and
  * transitively to the declared-query oracle) for NON-NULL input:
  * lowercase via java.lang.String, whitespace split on the same \s+
  * pattern, first-occurrence-order distinct n-grams, FNV-1a over UTF-16
  * code units + splitmix64 remix for the minhash — signatures and
  * bucket ids are bit-identical to round 3's. NULL input is the one
  * deliberate divergence: [[NgramSet]]/[[LshBandBuckets]] are
  * null-propagating (Catalyst's null-safe contract, so they stay
  * codegen-friendly) where the UDFs returned an empty array / a
  * full-null-document signature; every pipeline caller filters
  * `size(grams) > 0` first, and FastTextSpec pins the null behavior of
  * both layers so it can't drift unnoticed. [[JaccardSets]] keeps the
  * UDF's null-as-empty-set semantics (it overrides eval, not
  * nullSafeEval).
  */
object FastTextKernels extends Serializable {

  private val Ws = "\\s+".r.pattern

  private def splitLower(text: String): Array[String] =
    if (text == null) Array.empty[String]
    else Ws.split(text.toLowerCase).filter(_.nonEmpty)

  def ngramSet(text: UTF8String, n: Int): ArrayData = {
    val t = splitLower(text.toString)
    if (t.length < n) new GenericArrayData(Array.empty[Any])
    else {
      val seen = new java.util.LinkedHashSet[UTF8String](t.length * 2)
      val sb = new java.lang.StringBuilder(64)
      var i = 0
      while (i <= t.length - n) {
        sb.setLength(0)
        var j = 0
        while (j < n) { if (j > 0) sb.append(' '); sb.append(t(i + j)); j += 1 }
        seen.add(UTF8String.fromString(sb.toString))
        i += 1
      }
      val out = new Array[Any](seen.size)
      val it = seen.iterator()
      var o = 0
      while (it.hasNext) { out(o) = it.next(); o += 1 }
      new GenericArrayData(out)
    }
  }

  /** Exact Jaccard of two deduplicated string sets; null arrays count
    * as empty, two empties define 0.0. Membership is UTF8String
    * equality — zero decoding.
    */
  def jaccard(a: ArrayData, b: ArrayData): Double = {
    val an = if (a == null) 0 else a.numElements()
    val bn = if (b == null) 0 else b.numElements()
    if (an == 0 && bn == 0) 0.0
    else {
      val sa = new java.util.HashSet[UTF8String](an * 2)
      var i = 0
      while (i < an) { sa.add(a.getUTF8String(i)); i += 1 }
      var inter = 0
      i = 0
      while (i < bn) { if (sa.contains(b.getUTF8String(i))) inter += 1; i += 1 }
      inter.toDouble / (an + bn - inter).toDouble
    }
  }

  /** SORTED distinct xxhash64 gram-hash set of a document in ONE pass —
    * the fused form of `array_sort(transform(ngram_set(text, n),
    * xxhash64))`: tokenization, shingling, hashing, sort, and hash-dedup
    * without ever materializing a gram-string ARRAY (each gram string
    * lives only long enough to hash). Same xxhash64 (seed 42, UTF-8
    * bytes) as the SQL function, so postings built from either form
    * match bit-for-bit. Deduping by HASH (not by gram) is deliberate:
    * the downstream sorted-merge jaccard kernel assumes set semantics,
    * and a 2⁻⁶⁴ cross-gram collision collapsing to one element is
    * strictly safer than a duplicate hash in the array.
    */
  def ngramHashSet(text: UTF8String, n: Int): ArrayData = {
    val t = splitLower(text.toString)
    if (t.length < n) return UnsafeArrayData.fromPrimitiveArray(Array.emptyLongArray)
    val m = t.length - n + 1
    val hs = new Array[Long](m)
    val sb = new java.lang.StringBuilder(64)
    var i = 0
    while (i < m) {
      sb.setLength(0)
      var j = 0
      while (j < n) { if (j > 0) sb.append(' '); sb.append(t(i + j)); j += 1 }
      val g = UTF8String.fromString(sb.toString)
      hs(i) = org.apache.spark.sql.catalyst.expressions.XXH64
        .hashUnsafeBytes(g.getBaseObject, g.getBaseOffset, g.numBytes, 42L)
      i += 1
    }
    java.util.Arrays.sort(hs)
    var w = 0
    var k = 0
    while (k < m) {
      if (w == 0 || hs(k) != hs(w - 1)) { hs(w) = hs(k); w += 1 }
      k += 1
    }
    UnsafeArrayData.fromPrimitiveArray(java.util.Arrays.copyOf(hs, w))
  }

  /** |a ∩ b| of two SORTED long-hash sets (the sorted-merge walk of
    * [[jaccardHash]] without the division) — the per-chunk primitive of
    * the scratch-bounded verify: Σ over hash-range chunks of these
    * counts is exactly the whole-set intersection, so exact Jaccard
    * reassembles from integer partials.
    */
  def intersectCountSorted(a: ArrayData, b: ArrayData): Int = {
    val an = if (a == null) 0 else a.numElements()
    val bn = if (b == null) 0 else b.numElements()
    var i = 0
    var j = 0
    var inter = 0
    while (i < an && j < bn) {
      val x = a.getLong(i)
      val y = b.getLong(j)
      if (x == y) { inter += 1; i += 1; j += 1 }
      else if (x < y) i += 1
      else j += 1
    }
    inter
  }

  /** The contiguous run of a SORTED long array whose top log₂(chunks)
    * bits (unsigned) equal `chunk`. Values with equal top bits are
    * contiguous under SIGNED sort order too (signed order is unsigned
    * order rotated by half: chunks appear as C/2, …, C−1, 0, …, C/2−1),
    * so one linear scan finds the run and one copy materializes it.
    * xxhash64 output is uniform, so chunks are balanced ~|a|/C.
    */
  def sliceHashChunk(a: ArrayData, chunk: Int, chunks: Int): ArrayData = {
    val n = if (a == null) 0 else a.numElements()
    val shift = 64 - Integer.numberOfTrailingZeros(chunks)
    var lo = 0
    while (lo < n && (a.getLong(lo) >>> shift) != chunk.toLong) lo += 1
    var hi = lo
    while (hi < n && (a.getLong(hi) >>> shift) == chunk.toLong) hi += 1
    if (hi == lo) UnsafeArrayData.fromPrimitiveArray(Array.emptyLongArray)
    else {
      val out = new Array[Long](hi - lo)
      var k = lo
      while (k < hi) { out(k - lo) = a.getLong(k); k += 1 }
      UnsafeArrayData.fromPrimitiveArray(out)
    }
  }

  /** Exact Jaccard of two SORTED long-hash sets (sorted-merge
    * intersection — O(|a|+|b|), zero allocation). The near-dup verify
    * stage runs on 64-bit gram hashes instead of gram strings so the
    * per-pair join payload is ~5× smaller (the 64× stress-scale spill
    * was exactly this payload); a cross-gram hash collision inside one
    * pair's union (~2⁻⁵⁰ per pair) is the only way this can differ from
    * string Jaccard. Null arrays count as empty; two empties define 0.0.
    */
  def jaccardHash(a: ArrayData, b: ArrayData): Double = {
    val an = if (a == null) 0 else a.numElements()
    val bn = if (b == null) 0 else b.numElements()
    if (an == 0 && bn == 0) 0.0
    else {
      var i = 0
      var j = 0
      var inter = 0
      while (i < an && j < bn) {
        val x = a.getLong(i)
        val y = b.getLong(j)
        if (x == y) { inter += 1; i += 1; j += 1 }
        else if (x < y) i += 1
        else j += 1
      }
      inter.toDouble / (an + bn - inter).toDouble
    }
  }

  /** FNV-1a 64-bit over UTF-16 code units — kept char-based (not byte-
    * based) so signatures match the round-3 UDF bit-for-bit.
    */
  private def fnv64(s: String): Long = {
    var h = 0xcbf29ce484222325L
    var i = 0
    while (i < s.length) { h ^= s.charAt(i); h *= 0x100000001b3L; i += 1 }
    h
  }

  /** splitmix64 finalizer — the per-permutation remix. */
  private def mix(z0: Long): Long = {
    var z = z0 + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  def lshBandBuckets(grams: ArrayData, bands: Int, r: Int): ArrayData = {
    val k = bands * r
    val sig = Array.fill(k)(Long.MaxValue)
    val n = if (grams == null) 0 else grams.numElements()
    var gi = 0
    while (gi < n) {
      val base = fnv64(grams.getUTF8String(gi).toString)
      var i = 0
      while (i < k) {
        val h = mix(base ^ mix(i.toLong))
        if (h < sig(i)) sig(i) = h
        i += 1
      }
      gi += 1
    }
    val out = new Array[Long](bands)
    var b = 0
    while (b < bands) {
      var acc = 0xcbf29ce484222325L
      var i = b * r
      while (i < (b + 1) * r) { acc = mix(acc ^ sig(i)); i += 1 }
      out(b) = acc
      b += 1
    }
    UnsafeArrayData.fromPrimitiveArray(out)
  }

  /** Per-document character-bigram counts in ONE char pass:
    * (b, k) structs in first-occurrence order, where b ranges over the
    * consecutive CODE-POINT pairs of the input (exactly `substr(t, i,
    * 2)` for i in 1..len−1 — Spark's substr counts code points, so the
    * fast char loop only runs when the string has no surrogate pairs).
    * Replaces an explode + groupBy(doc, b) hash aggregate over the raw
    * bigram stream with a bounded per-row LinkedHashMap — the per-doc
    * reduction happens inside the projection, so no aggregate operator
    * ever sees per-instance bigram rows.
    */
  def bigramCounts(text: UTF8String): ArrayData = {
    val s = text.toString
    val n = s.length
    val counts = new java.util.LinkedHashMap[String, java.lang.Long](64)
    if (n == s.codePointCount(0, n)) {
      var i = 0
      while (i < n - 1) {
        val b = s.substring(i, i + 2)
        val cur = counts.get(b)
        counts.put(b, if (cur == null) 1L else cur + 1L)
        i += 1
      }
    } else {
      var i = 0
      while (i < n) {
        val next = i + Character.charCount(s.codePointAt(i))
        if (next < n) {
          val b = s.substring(i, next + Character.charCount(s.codePointAt(next)))
          val cur = counts.get(b)
          counts.put(b, if (cur == null) 1L else cur + 1L)
        }
        i = next
      }
    }
    val out = new Array[Any](counts.size)
    val it = counts.entrySet().iterator()
    var j = 0
    while (it.hasNext) {
      val e = it.next()
      out(j) = InternalRow(UTF8String.fromString(e.getKey), e.getValue.longValue())
      j += 1
    }
    new GenericArrayData(out)
  }
}

/** Distinct space-joined word n-grams of a document (codegen'd; see
  * [[FastTextKernels]] for semantics and the UDF-replacement rationale).
  */
case class NgramSet(child: Expression, n: Int)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "ngram_set"

  override def nullSafeEval(input: Any): Any =
    FastTextKernels.ngramSet(input.asInstanceOf[UTF8String], n)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val kernels = ctx.addReferenceObj("fastTextKernels", FastTextKernels,
      FastTextKernels.getClass.getName)
    nullSafeCodeGen(ctx, ev, t => s"${ev.value} = $kernels.ngramSet($t, $n);")
  }

  override protected def withNewChildInternal(newChild: Expression): NgramSet =
    copy(child = newChild)
}

object NgramSet {
  def columnFor(text: Column, n: Int): Column =
    ExpressionUtils.column(NgramSet(ExpressionUtils.expression(text), n))

  val registration: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("ngram_set"),
    new ExpressionInfo(classOf[NgramSet].getName, "ngram_set"),
    (exprs: Seq[Expression]) => {
      require(exprs.length == 2 && exprs(1).foldable,
        "ngram_set(text, n) takes a string and a literal int")
      NgramSet(exprs.head, exprs(1).eval().asInstanceOf[Number].intValue())
    })
}

/** Exact Jaccard similarity of two string-set columns (codegen'd; never
  * null — null inputs count as empty sets, matching the UDF original).
  */
case class JaccardSets(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(StringType), ArrayType(StringType))
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = false
  override def prettyName: String = "jaccard_sets"

  override def eval(input: InternalRow): Any =
    FastTextKernels.jaccard(
      left.eval(input).asInstanceOf[ArrayData],
      right.eval(input).asInstanceOf[ArrayData])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val kernels = ctx.addReferenceObj("fastTextKernels", FastTextKernels,
      FastTextKernels.getClass.getName)
    val l = left.genCode(ctx)
    val r = right.genCode(ctx)
    val la = ctx.freshName("lhs")
    val ra = ctx.freshName("rhs")
    ev.copy(
      code = code"""
        |${l.code}
        |${r.code}
        |org.apache.spark.sql.catalyst.util.ArrayData $la = null;
        |if (!${l.isNull}) { $la = ${l.value}; }
        |org.apache.spark.sql.catalyst.util.ArrayData $ra = null;
        |if (!${r.isNull}) { $ra = ${r.value}; }
        |final double ${ev.value} = $kernels.jaccard($la, $ra);
        """.stripMargin,
      isNull = FalseLiteral)
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): JaccardSets =
    copy(left = newLeft, right = newRight)
}

object JaccardSets {
  def columnFor(a: Column, b: Column): Column =
    ExpressionUtils.column(
      JaccardSets(ExpressionUtils.expression(a), ExpressionUtils.expression(b)))

  val registration: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("jaccard_sets"),
    new ExpressionInfo(classOf[JaccardSets].getName, "jaccard_sets"),
    (exprs: Seq[Expression]) => {
      require(exprs.length == 2, "jaccard_sets(a, b) takes exactly 2 arguments")
      JaccardSets(exprs.head, exprs(1))
    })
}

/** Sorted distinct xxhash64 gram-hash set of a document (codegen'd;
  * one kernel pass, no gram-string array — see
  * [[FastTextKernels.ngramHashSet]]).
  */
case class NgramHashSet(child: Expression, n: Int)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "ngram_hash_set"

  override def nullSafeEval(input: Any): Any =
    FastTextKernels.ngramHashSet(input.asInstanceOf[UTF8String], n)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val kernels = ctx.addReferenceObj("fastTextKernels", FastTextKernels,
      FastTextKernels.getClass.getName)
    nullSafeCodeGen(ctx, ev, t => s"${ev.value} = $kernels.ngramHashSet($t, $n);")
  }

  override protected def withNewChildInternal(newChild: Expression): NgramHashSet =
    copy(child = newChild)
}

object NgramHashSet {
  def columnFor(text: Column, n: Int): Column =
    ExpressionUtils.column(NgramHashSet(ExpressionUtils.expression(text), n))

  val registration: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("ngram_hash_set"),
    new ExpressionInfo(classOf[NgramHashSet].getName, "ngram_hash_set"),
    (exprs: Seq[Expression]) => {
      require(exprs.length == 2 && exprs(1).foldable,
        "ngram_hash_set(text, n) takes a string and a literal int")
      NgramHashSet(exprs.head, exprs(1).eval().asInstanceOf[Number].intValue())
    })
}

/** Exact Jaccard similarity of two SORTED long-hash-set columns
  * (codegen'd; never null — null inputs count as empty sets). The
  * scale-path twin of [[JaccardSets]]: same value on hash sets, merge
  * scan instead of a hash probe, and the inputs it joins on are ~5×
  * smaller than gram-string arrays.
  */
case class JaccardHashSets(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(LongType), ArrayType(LongType))
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = false
  override def prettyName: String = "jaccard_hash_sets"

  override def eval(input: InternalRow): Any =
    FastTextKernels.jaccardHash(
      left.eval(input).asInstanceOf[ArrayData],
      right.eval(input).asInstanceOf[ArrayData])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val kernels = ctx.addReferenceObj("fastTextKernels", FastTextKernels,
      FastTextKernels.getClass.getName)
    val l = left.genCode(ctx)
    val r = right.genCode(ctx)
    val la = ctx.freshName("lhs")
    val ra = ctx.freshName("rhs")
    ev.copy(
      code = code"""
        |${l.code}
        |${r.code}
        |org.apache.spark.sql.catalyst.util.ArrayData $la = null;
        |if (!${l.isNull}) { $la = ${l.value}; }
        |org.apache.spark.sql.catalyst.util.ArrayData $ra = null;
        |if (!${r.isNull}) { $ra = ${r.value}; }
        |final double ${ev.value} = $kernels.jaccardHash($la, $ra);
        """.stripMargin,
      isNull = FalseLiteral)
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): JaccardHashSets =
    copy(left = newLeft, right = newRight)
}

object JaccardHashSets {
  def columnFor(a: Column, b: Column): Column =
    ExpressionUtils.column(
      JaccardHashSets(ExpressionUtils.expression(a), ExpressionUtils.expression(b)))

  val registration: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("jaccard_hash_sets"),
    new ExpressionInfo(classOf[JaccardHashSets].getName, "jaccard_hash_sets"),
    (exprs: Seq[Expression]) => {
      require(exprs.length == 2, "jaccard_hash_sets(a, b) takes exactly 2 arguments")
      JaccardHashSets(exprs.head, exprs(1))
    })
}

/** |a ∩ b| of two sorted long-hash sets (codegen'd; the per-chunk
  * primitive of the scratch-bounded verify — see
  * [[FastTextKernels.intersectCountSorted]]).
  */
case class IntersectCountSorted(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(LongType), ArrayType(LongType))
  override def dataType: DataType = IntegerType
  override def nullable: Boolean = false
  override def prettyName: String = "intersect_count_sorted"

  override def eval(input: InternalRow): Any =
    FastTextKernels.intersectCountSorted(
      left.eval(input).asInstanceOf[ArrayData],
      right.eval(input).asInstanceOf[ArrayData])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val kernels = ctx.addReferenceObj("fastTextKernels", FastTextKernels,
      FastTextKernels.getClass.getName)
    val l = left.genCode(ctx)
    val r = right.genCode(ctx)
    val la = ctx.freshName("lhs")
    val ra = ctx.freshName("rhs")
    ev.copy(
      code = code"""
        |${l.code}
        |${r.code}
        |org.apache.spark.sql.catalyst.util.ArrayData $la = null;
        |if (!${l.isNull}) { $la = ${l.value}; }
        |org.apache.spark.sql.catalyst.util.ArrayData $ra = null;
        |if (!${r.isNull}) { $ra = ${r.value}; }
        |final int ${ev.value} = $kernels.intersectCountSorted($la, $ra);
        """.stripMargin,
      isNull = FalseLiteral)
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): IntersectCountSorted =
    copy(left = newLeft, right = newRight)
}

object IntersectCountSorted {
  def columnFor(a: Column, b: Column): Column =
    ExpressionUtils.column(IntersectCountSorted(
      ExpressionUtils.expression(a), ExpressionUtils.expression(b)))
}

/** Hash-range chunk slice of a sorted long-hash set (codegen'd; see
  * [[FastTextKernels.sliceHashChunk]]). `chunks` must be a power of two
  * in [2, 64] so the chunk id is a bit prefix and runs are contiguous.
  */
case class SliceHashChunk(child: Expression, chunk: Int, chunks: Int)
    extends UnaryExpression with ExpectsInputTypes {
  require(chunks >= 2 && chunks <= 64 &&
    Integer.bitCount(chunks) == 1, s"chunks must be a power of two in [2,64], got $chunks")
  require(chunk >= 0 && chunk < chunks, s"chunk $chunk out of [0, $chunks)")

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(LongType))
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "slice_hash_chunk"

  override def eval(input: InternalRow): Any =
    FastTextKernels.sliceHashChunk(
      child.eval(input).asInstanceOf[ArrayData], chunk, chunks)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val kernels = ctx.addReferenceObj("fastTextKernels", FastTextKernels,
      FastTextKernels.getClass.getName)
    val c = child.genCode(ctx)
    val ca = ctx.freshName("arr")
    ev.copy(
      code = code"""
        |${c.code}
        |org.apache.spark.sql.catalyst.util.ArrayData $ca = null;
        |if (!${c.isNull}) { $ca = ${c.value}; }
        |final org.apache.spark.sql.catalyst.util.ArrayData ${ev.value} =
        |  $kernels.sliceHashChunk($ca, $chunk, $chunks);
        """.stripMargin,
      isNull = FalseLiteral)
  }

  override protected def withNewChildInternal(
      newChild: Expression): SliceHashChunk = copy(child = newChild)
}

object SliceHashChunk {
  def columnFor(a: Column, chunk: Int, chunks: Int): Column =
    ExpressionUtils.column(
      SliceHashChunk(ExpressionUtils.expression(a), chunk, chunks))
}

/** LSH band buckets from a minhash signature of bands×rowsPerBand
  * permutations over a gram set (codegen'd): element b = hash of rows
  * [b*r, (b+1)*r) of the signature — one kernel call per document, no
  * per-permutation allocation.
  */
case class LshBandBuckets(child: Expression, bands: Int, rowsPerBand: Int)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(StringType))
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "lsh_band_buckets"

  override def nullSafeEval(input: Any): Any =
    FastTextKernels.lshBandBuckets(input.asInstanceOf[ArrayData], bands, rowsPerBand)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val kernels = ctx.addReferenceObj("fastTextKernels", FastTextKernels,
      FastTextKernels.getClass.getName)
    nullSafeCodeGen(ctx, ev,
      g => s"${ev.value} = $kernels.lshBandBuckets($g, $bands, $rowsPerBand);")
  }

  override protected def withNewChildInternal(newChild: Expression): LshBandBuckets =
    copy(child = newChild)
}

/** Per-document character-bigram count structs (codegen'd; see
  * [[FastTextKernels.bigramCounts]] for semantics and the
  * aggregate-elimination rationale).
  */
case class BigramCounts(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = ArrayType(
    StructType(Seq(StructField("b", StringType, nullable = false),
      StructField("k", LongType, nullable = false))), containsNull = false)
  override def prettyName: String = "bigram_counts"

  override def nullSafeEval(input: Any): Any =
    FastTextKernels.bigramCounts(input.asInstanceOf[UTF8String])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val kernels = ctx.addReferenceObj("fastTextKernels", FastTextKernels,
      FastTextKernels.getClass.getName)
    nullSafeCodeGen(ctx, ev, t => s"${ev.value} = $kernels.bigramCounts($t);")
  }

  override protected def withNewChildInternal(newChild: Expression): BigramCounts =
    copy(child = newChild)
}

object BigramCounts {
  def columnFor(text: Column): Column =
    ExpressionUtils.column(BigramCounts(ExpressionUtils.expression(text)))

  val registration: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("bigram_counts"),
    new ExpressionInfo(classOf[BigramCounts].getName, "bigram_counts"),
    (exprs: Seq[Expression]) => {
      require(exprs.length == 1, "bigram_counts(text) takes one string")
      BigramCounts(exprs.head)
    })
}

object LshBandBuckets {
  def columnFor(grams: Column, bands: Int, rowsPerBand: Int): Column =
    ExpressionUtils.column(
      LshBandBuckets(ExpressionUtils.expression(grams), bands, rowsPerBand))

  val registration: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("lsh_band_buckets"),
    new ExpressionInfo(classOf[LshBandBuckets].getName, "lsh_band_buckets"),
    (exprs: Seq[Expression]) => {
      require(exprs.length == 3 && exprs(1).foldable && exprs(2).foldable,
        "lsh_band_buckets(grams, bands, rowsPerBand) takes literal band sizes")
      LshBandBuckets(exprs.head,
        exprs(1).eval().asInstanceOf[Number].intValue(),
        exprs(2).eval().asInstanceOf[Number].intValue())
    })
}

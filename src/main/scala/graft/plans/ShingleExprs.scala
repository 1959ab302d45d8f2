package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Text-dedup kernels over Spark's internal ArrayData — the corpus-scale
  * hot path of MinHash (SURVEY's training-data operators). Semantics are
  * byte-identical to the ScalaUDF reference implementations in
  * graft.operators.Dedup (golden-parity-tested); these run inside
  * whole-stage codegen and skip the Catalyst→Seq conversion the UDFs pay
  * per row.
  */
object ShingleKernel {

  /** FNV-1a64 over UTF-16 code units — identical to
    * HashFunctions.fnv1a64(w.toString); ASCII fast path reads the UTF-8
    * bytes directly (byte == code unit below 0x80). */
  def wordHash(w: UTF8String): Long = {
    val nb = w.numBytes()
    var ascii = true
    var i = 0
    while (i < nb) {
      if ((w.getByte(i) & 0x80) != 0) { ascii = false; i = nb }
      i += 1
    }
    if (ascii) {
      var h = 0xcbf29ce484222325L
      i = 0
      while (i < nb) {
        h = (h ^ (w.getByte(i) & 0xffL)) * 0x100000001b3L
        i += 1
      }
      h
    } else graft.functions.HashFunctions.fnv1a64(w.toString)
  }

  /** Sorted distinct rolling shingle hashes — mirrors Dedup.shingleHashesUdf:
    * shingle i = fold of the n word hashes starting at i (short tail shingle
    * only when the doc has < n words). */
  def shingleHashes(words: ArrayData, n: Int): ArrayData = {
    val m = words.numElements()
    if (m == 0) return ArrayData.toArrayData(Array.emptyLongArray)
    val wh = new Array[Long](m)
    var i = 0
    // null elements (possible from SQL array literals) hash as empty words
    while (i < m) {
      wh(i) =
        if (words.isNullAt(i)) 0xcbf29ce484222325L
        else wordHash(words.getUTF8String(i))
      i += 1
    }
    val cnt = math.max(1, m - n + 1)
    val out = new Array[Long](cnt)
    i = 0
    while (i < cnt) {
      var h = 0xcbf29ce484222325L
      var j = 0
      val end = math.min(n, m - i)
      while (j < end) { h = (h ^ wh(i + j)) * 0x100000001b3L; j += 1 }
      out(i) = h
      i += 1
    }
    java.util.Arrays.sort(out)
    var w = 0
    var r = 0
    while (r < cnt) {
      if (w == 0 || out(r) != out(w - 1)) { out(w) = out(r); w += 1 }
      r += 1
    }
    ArrayData.toArrayData(java.util.Arrays.copyOf(out, w))
  }

  /** SimHash64 — mirrors HashFunctions.simHash64 (per-bit votes of each
    * token's FNV-1a64 hash; wordHash is the parity-tested UTF-16 hash).
    * Null elements vote as empty words. */
  def simHash64(tokens: ArrayData): Long = {
    val m = tokens.numElements()
    if (m == 0) return 0L
    val votes = new Array[Int](64)
    var i = 0
    while (i < m) {
      val h =
        if (tokens.isNullAt(i)) 0xcbf29ce484222325L
        else wordHash(tokens.getUTF8String(i))
      var b = 0
      while (b < 64) {
        if (((h >>> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
        b += 1
      }
      i += 1
    }
    var out = 0L
    var b = 0
    while (b < 64) { if (votes(b) > 0) out |= (1L << b); b += 1 }
    out
  }

  /** Random-hyperplane sign bucket — mirrors Similarity.signBucketUdf with
    * identical left-to-right fp summation (the sim_topk_lsh oracle depends
    * on bit-exact dot products). Plane component vectors are deterministic
    * pure functions of (planeIdx, dim), cached per plane index. */
  private val planeCache =
    new java.util.concurrent.ConcurrentHashMap[Integer, Array[Double]]()

  private def planeComponents(plane: Int, dims: Int): Array[Double] = {
    val cur = planeCache.get(plane)
    if (cur != null && cur.length >= dims) cur
    else {
      val arr = Array.tabulate(math.max(dims, 64))(d =>
        graft.functions.HashFunctions.fnv1a64(s"$plane:$d").toDouble /
          Long.MaxValue.toDouble)
      planeCache.put(plane, arr)
      arr
    }
  }

  def signBucket(v: ArrayData, nPlanes: Int, planeOffset: Int): Long = {
    val dims = v.numElements()
    var bucket = 0L
    var p = 0
    while (p < nPlanes) {
      val comp = planeComponents(planeOffset + p, dims)
      var s = 0.0
      var d = 0
      while (d < dims) { s += v.getDouble(d) * comp(d); d += 1 }
      if (s > 0) bucket |= (1L << p)
      p += 1
    }
    bucket
  }

  /** Winnowing fingerprint selection (Schleimer/Wilkerson/Aiken, SIGMOD'03
    * §2 — the MOSS algorithm): over the rolling k-gram hashes of the
    * normalized text, every window of `w` consecutive hashes selects its
    * minimum (rightmost on ties); the distinct selected 0-based positions
    * are returned ascending. Guarantee: two documents sharing any substring
    * of length ≥ k+w-1 share at least one selected fingerprint.
    *
    * Hash = the fingerprint64 polynomial (basis·31^k + Σ c·31^t mod 2^64)
    * over each k-char window, computed rolling (O(n), not O(n·k)); min is
    * by UNSIGNED comparison so the SQL oracle's HUGEINT-mod-2^64 order
    * matches. Texts shorter than k chars select position 0 (whole-text
    * gram — the shingleHashes short-doc convention).
    */
  def winnowPositions(s: UTF8String, k: Int, w: Int): ArrayData = {
    require(k >= 1 && w >= 1, s"winnow needs k >= 1 and w >= 1, got (k=$k, w=$w)")
    val str = s.toString
    // positions/lengths count CODEPOINTS, not UTF-16 units: both consumers
    // index codepoints — Column.substr (UTF8String.substringSQL) and the
    // oracle's regexp_extract_all/unicode/length/substr — and the hash folds
    // unicode(ch), so supplementary-plane chars must be one unit here too
    val n = str.codePointCount(0, str.length)
    if (n < k) return ArrayData.toArrayData(Array(0))
    val cps = new Array[Int](n)
    var ci = 0
    var off = 0
    while (off < str.length) {
      val cp = str.codePointAt(off)
      cps(ci) = cp
      ci += 1
      off += Character.charCount(cp)
    }
    val m = n - k + 1
    var pow = 1L // 31^(k-1): weight of the outgoing char
    var t = 0
    while (t < k - 1) { pow *= 31L; t += 1 }
    var b = 1125899906842597L // basis·31^k: constant head of every window hash
    t = 0
    while (t < k) { b *= 31L; t += 1 }
    val hs = new Array[Long](m)
    var g = 0L
    var i = 0
    while (i < k) { g = g * 31L + cps(i); i += 1 }
    hs(0) = b + g
    i = 1
    while (i < m) {
      g = (g - cps(i - 1) * pow) * 31L + cps(i + k - 1)
      hs(i) = b + g
      i += 1
    }
    val wEff = math.min(w, m)
    val selected = new Array[Boolean](m)
    var j = 0
    while (j <= m - wEff) {
      var best = j
      var x = j + 1
      val end = j + wEff
      while (x < end) {
        // <= keeps the RIGHTMOST minimum — the tie rule the oracle pins
        if (java.lang.Long.compareUnsigned(hs(x), hs(best)) <= 0) best = x
        x += 1
      }
      selected(best) = true
      j += 1
    }
    var cnt = 0
    i = 0
    while (i < m) { if (selected(i)) cnt += 1; i += 1 }
    val out = new Array[Int](cnt)
    var o = 0
    i = 0
    while (i < m) { if (selected(i)) { out(o) = i; o += 1 }; i += 1 }
    ArrayData.toArrayData(out)
  }

  /** MinHash signature — mirrors Dedup.minhashSigUdf (single pass over the
    * shingles updating all universal-hash mins). Null elements (possible
    * from SQL array literals) are skipped rather than silently read as 0. */
  def minhashSignature(base: ArrayData, numHashes: Int): ArrayData = {
    val m = base.numElements()
    if (m == 0) return ArrayData.toArrayData(Array.emptyLongArray)
    val as = new Array[Long](numHashes)
    val bs = new Array[Long](numHashes)
    val mins = new Array[Long](numHashes)
    var i = 0
    while (i < numHashes) {
      as(i) = 0x9e3779b97f4a7c15L * (2 * i + 1)
      bs(i) = 0xc2b2ae3d27d4eb4fL * (i + 1)
      mins(i) = Long.MaxValue
      i += 1
    }
    var k = 0
    while (k < m) {
      if (!base.isNullAt(k)) {
        val x = base.getLong(k)
        var j = 0
        while (j < numHashes) {
          val h = as(j) * x + bs(j)
          if (h < mins(j)) mins(j) = h
          j += 1
        }
      }
      k += 1
    }
    ArrayData.toArrayData(mins)
  }

  /** Greedy left-to-right single-merge BPE application — byte-identical to
    * the Column fold in Tokenizer.applyMerge: walk the token list, joining
    * each (l, r) adjacency into m; a just-created m never re-matches l
    * unless it literally equals it. */
  def applyBpeMerge(toks: ArrayData, l: UTF8String, r: UTF8String,
                    m: UTF8String): ArrayData = {
    val n = toks.numElements()
    val out = new Array[UTF8String](n)
    var len = 0
    var i = 0
    while (i < n) {
      val t = toks.getUTF8String(i)
      // null elements DROP (the sibling kernels' convention): a tokenizer
      // never produces them, but a crafted SQL array literal can — and the
      // declared output type is containsNull=false, so storing the null
      // would corrupt the unsafe array downstream
      if (t != null) {
        if (len > 0 && out(len - 1) == l && t == r) out(len - 1) = m
        else { out(len) = t; len += 1 }
      }
      i += 1
    }
    ArrayData.toArrayData(java.util.Arrays.copyOf(out.asInstanceOf[Array[AnyRef]], len))
  }

  /** Popcount of the pairwise AND of two long bitmasks — the PPJoin
    * verification inner loop. Width is min(len(a), len(b)); masks built by
    * the same tokenizer always agree on width within a block. */
  def maskIntersectCount(a: ArrayData, b: ArrayData): Long = {
    val n = math.min(a.numElements(), b.numElements())
    var i = 0
    var s = 0L
    while (i < n) {
      s += java.lang.Long.bitCount(a.getLong(i) & b.getLong(i))
      i += 1
    }
    s
  }

  /** First-occurrence-preserving dedup of fixed-width word chunks — the
    * IN-DOCUMENT repeated-line removal rule (RefinedWeb §"line-wise
    * corrections"; dedup_lines is its cross-corpus sibling). One pass over
    * the words; a hash set of seen chunks; O(n) vs the O(chunks²)
    * interpreted HOF formulation (`array_position` per element). */
  def dedupWordChunks(words: ArrayData, k: Int): ArrayData = {
    val n = words.numElements()
    val kept = scala.collection.mutable.ArrayBuffer.empty[UTF8String]
    val seen = new java.util.HashSet[String]()
    var i = 0
    while (i < n) {
      val sb = new java.lang.StringBuilder()
      var j = i
      val hi = math.min(i + k, n)
      while (j < hi) {
        if (j > i) sb.append(' ')
        if (!words.isNullAt(j)) sb.append(words.getUTF8String(j).toString)
        j += 1
      }
      val chunk = sb.toString
      if (seen.add(chunk)) kept += UTF8String.fromString(chunk)
      i += k
    }
    ArrayData.toArrayData(kept.toArray[AnyRef])
  }

  /** Codepoints claimed by the most frequent word n-gram: occurrences ×
    * codepoint length of the space-joined gram; ties → smallest gram in
    * UTF-8 BYTE order (UTF8String's binary comparator), matching DuckDB's
    * collation — UTF-16 code-unit order would diverge on text mixing
    * U+E000..U+FFFF with supplementary-plane codepoints. One pass + a hash
    * map of grams — O(words·n) time, vocabulary-of-the-doc space. 0 when
    * fewer than n words. */
  def topNgramChars(words: ArrayData, n: Int): Long = {
    val m = words.numElements()
    if (m < n) return 0L
    val counts = new java.util.HashMap[UTF8String, Integer]()
    val sep = UTF8String.fromString(" ")
    val parts = new Array[UTF8String](n)
    var i = 0
    while (i + n <= m) {
      var j = 0
      while (j < n) {
        // EMPTY (not null) for null words: concatWs SKIPS null inputs —
        // separator included — while the gram semantics keep the slot
        parts(j) =
          if (words.isNullAt(i + j)) UTF8String.EMPTY_UTF8
          else words.getUTF8String(i + j)
        j += 1
      }
      // concatWs copies bytes into a fresh UTF8String, so the key does not
      // alias the (reusable) row buffer backing `words`
      counts.merge(UTF8String.concatWs(sep, parts: _*), 1,
        (a, b) => Integer.valueOf(a + b))
      i += 1
    }
    var bestG: UTF8String = null
    var bestC = 0
    val it = counts.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      val c = e.getValue.intValue()
      if (c > bestC || (c == bestC && e.getKey.compareTo(bestG) < 0)) {
        bestC = c
        bestG = e.getKey
      }
    }
    bestC.toLong * bestG.numChars()
  }

  /** Σ count·round(ln(count)·10⁸) over the codepoint histogram of `s`.
    * Math.round(x) (floor(x+0.5)) equals round-half-away for the positive
    * ln values here, matching Spark's and DuckDB's round(double). ASCII
    * fast path: UTF-8 bytes < 0x80 ARE the codepoints, counted in a
    * 128-slot array; any high byte falls back to a codepoint walk. */
  def charLnSumE8(s: UTF8String): Long = {
    val nb = s.numBytes()
    val ascii = new Array[Int](128)
    var i = 0
    var isAscii = true
    while (i < nb && isAscii) {
      val b = s.getByte(i)
      if ((b & 0x80) != 0) isAscii = false
      else { ascii(b) += 1; i += 1 }
    }
    var sum = 0L
    if (isAscii) {
      i = 0
      while (i < 128) {
        val c = ascii(i)
        if (c > 0) sum += c.toLong * Math.round(Math.log(c.toDouble) * 1e8)
        i += 1
      }
    } else {
      val str = s.toString
      val counts = new java.util.HashMap[Integer, Integer]()
      var j = 0
      while (j < str.length) {
        val cp = str.codePointAt(j)
        j += Character.charCount(cp)
        counts.merge(cp, 1, (a, b) => a + b)
      }
      val it = counts.values().iterator()
      while (it.hasNext) {
        val c = it.next().intValue()
        sum += c.toLong * Math.round(Math.log(c.toDouble) * 1e8)
      }
    }
    sum
  }
}

/** `shingleHashes(words, n)` as a native codegen expression. */
case class ShingleHashesExpr(left: Expression, right: Expression)
  extends BinaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(StringType, _), IntegerType) => TypeCheckResult.TypeCheckSuccess
    case (l, r) => TypeCheckResult.TypeCheckFailure(
      s"shingle_hashes expects (array<string>, int), got ($l, $r)")
  }

  override protected def nullSafeEval(words: Any, n: Any): Any =
    ShingleKernel.shingleHashes(words.asInstanceOf[ArrayData], n.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (w, n) =>
      s"graft.plans.ShingleKernel.shingleHashes($w, $n)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object ShingleHashesExpr {
  def apply(words: Column, n: Int): Column =
    ColumnBridge.column(new ShingleHashesExpr(
      ColumnBridge.expression(words),
      ColumnBridge.expression(org.apache.spark.sql.functions.lit(n))))
}

/** `minhashSignature(hashes, numHashes)` as a native codegen expression. */
case class MinHashSignatureExpr(left: Expression, right: Expression)
  extends BinaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(LongType, _), IntegerType) => TypeCheckResult.TypeCheckSuccess
    case (l, r) => TypeCheckResult.TypeCheckFailure(
      s"minhash_signature expects (array<bigint>, int), got ($l, $r)")
  }

  override protected def nullSafeEval(hashes: Any, n: Any): Any =
    ShingleKernel.minhashSignature(hashes.asInstanceOf[ArrayData], n.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (h, n) =>
      s"graft.plans.ShingleKernel.minhashSignature($h, $n)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object MinHashSignatureExpr {
  def apply(hashes: Column, numHashes: Int): Column =
    ColumnBridge.column(new MinHashSignatureExpr(
      ColumnBridge.expression(hashes),
      ColumnBridge.expression(org.apache.spark.sql.functions.lit(numHashes))))
}

/** `simHash64(tokens)` as a native codegen expression. */
case class SimHash64Expr(child: Expression)
  extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"simhash64 expects array<string>, got $t")
  }

  override protected def nullSafeEval(tokens: Any): Any =
    ShingleKernel.simHash64(tokens.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, t => s"graft.plans.ShingleKernel.simHash64($t)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object SimHash64Expr {
  def apply(tokens: Column): Column =
    ColumnBridge.column(new SimHash64Expr(ColumnBridge.expression(tokens)))
}

/** `winnowPositions(text, k, w)` as a native codegen expression. */
case class WinnowPositionsExpr(first: Expression, second: Expression, third: Expression)
  extends org.apache.spark.sql.catalyst.expressions.TernaryExpression {

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult =
    (first.dataType, second.dataType, third.dataType) match {
      case (StringType, IntegerType, IntegerType) => TypeCheckResult.TypeCheckSuccess
      case (a, b, c) => TypeCheckResult.TypeCheckFailure(
        s"winnow_positions expects (string, int, int), got ($a, $b, $c)")
    }

  override protected def nullSafeEval(s: Any, k: Any, w: Any): Any =
    ShingleKernel.winnowPositions(s.asInstanceOf[UTF8String],
      k.asInstanceOf[Int], w.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (s, k, w) =>
      s"graft.plans.ShingleKernel.winnowPositions($s, $k, $w)")

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression, newThird: Expression): Expression =
    copy(first = newFirst, second = newSecond, third = newThird)
}

object WinnowPositionsExpr {
  def apply(text: Column, k: Int, w: Int): Column =
    ColumnBridge.column(new WinnowPositionsExpr(
      ColumnBridge.expression(text),
      ColumnBridge.expression(org.apache.spark.sql.functions.lit(k)),
      ColumnBridge.expression(org.apache.spark.sql.functions.lit(w))))
}

/** `signBucket(vec, nPlanes, planeOffset)` as a native codegen expression. */
case class SignBucketExpr(first: Expression, second: Expression, third: Expression)
  extends org.apache.spark.sql.catalyst.expressions.TernaryExpression {

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult =
    (first.dataType, second.dataType, third.dataType) match {
      case (ArrayType(DoubleType, _), IntegerType, IntegerType) =>
        TypeCheckResult.TypeCheckSuccess
      case (a, b, c) => TypeCheckResult.TypeCheckFailure(
        s"sign_bucket expects (array<double>, int, int), got ($a, $b, $c)")
    }

  override protected def nullSafeEval(v: Any, nPlanes: Any, offset: Any): Any =
    ShingleKernel.signBucket(v.asInstanceOf[ArrayData],
      nPlanes.asInstanceOf[Int], offset.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (v, n, o) =>
      s"graft.plans.ShingleKernel.signBucket($v, $n, $o)")

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression, newThird: Expression): Expression =
    copy(first = newFirst, second = newSecond, third = newThird)
}

object SignBucketExpr {
  def apply(vec: Column, nPlanes: Int, planeOffset: Int): Column =
    ColumnBridge.column(new SignBucketExpr(
      ColumnBridge.expression(vec.cast("array<double>")),
      ColumnBridge.expression(org.apache.spark.sql.functions.lit(nPlanes)),
      ColumnBridge.expression(org.apache.spark.sql.functions.lit(planeOffset))))
}

/** One BPE merge rule applied to a token-list column. The (l, r, m) rule
  * rides as generated-code REFERENCE OBJECTS, not literals — an iterative
  * trainer (bpeFit) changes the rule every round, and literal embedding
  * would make each round's plan text unique, recompiling a fresh Janino
  * class per round (the dominant cost of the 10-round fit). With reference
  * slots the generated source is round-invariant: one compile, reused.
  */
case class ApplyMergeExpr(child: Expression, l: UTF8String, r: UTF8String,
                          m: UTF8String) extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"apply_merge expects array<string>, got $t")
  }

  override protected def nullSafeEval(toks: Any): Any =
    ShingleKernel.applyBpeMerge(toks.asInstanceOf[ArrayData], l, r, m)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val lRef = ctx.addReferenceObj("bpeL", l, "org.apache.spark.unsafe.types.UTF8String")
    val rRef = ctx.addReferenceObj("bpeR", r, "org.apache.spark.unsafe.types.UTF8String")
    val mRef = ctx.addReferenceObj("bpeM", m, "org.apache.spark.unsafe.types.UTF8String")
    defineCodeGen(ctx, ev, t =>
      s"graft.plans.ShingleKernel.applyBpeMerge($t, $lRef, $rRef, $mRef)")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object ApplyMergeExpr {
  def apply(toks: Column, l: String, r: String, m: String): Column =
    ColumnBridge.column(new ApplyMergeExpr(ColumnBridge.expression(toks),
      UTF8String.fromString(l), UTF8String.fromString(r), UTF8String.fromString(m)))
}

/** `maskIntersectCount(a, b)` — popcount(a & b) over array<long> bitmasks,
  * fully codegen'd. Replaces the `aggregate(zip_with(...))` HOF pair in the
  * PPJoin verification step, which breaks whole-stage codegen and allocates
  * an intermediate array per candidate row (the verify step runs once per
  * CANDIDATE, not per survivor — on low-vocabulary corpora that is the
  * single hottest expression in the dedup family).
  */
case class MaskIntersectCountExpr(left: Expression, right: Expression)
  extends BinaryExpression {

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(LongType, _), ArrayType(LongType, _)) => TypeCheckResult.TypeCheckSuccess
    case (l, r) => TypeCheckResult.TypeCheckFailure(
      s"mask_intersect_count expects (array<bigint>, array<bigint>), got ($l, $r)")
  }

  override protected def nullSafeEval(a: Any, b: Any): Any =
    ShingleKernel.maskIntersectCount(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.plans.ShingleKernel.maskIntersectCount($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object MaskIntersectCountExpr {
  def apply(a: Column, b: Column): Column =
    ColumnBridge.column(new MaskIntersectCountExpr(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))
}

/** `charLnSumE8(text)` = Σ over distinct codepoints of
  * count·round(ln(count)·10⁸) — the exact-integer core of the per-doc
  * character-entropy score (entropy = ln(n) − S/(n·10⁸) nats). A native
  * kernel because the HOF formulation (`transform(array_distinct(...),
  * ch -> size(filter(...)))`) is interpreted AND O(distinct·len) per row;
  * this is one codepoint walk + one pass over the (≤ alphabet-sized)
  * count table, inside whole-stage codegen. Counts CODEPOINTS (like
  * DuckDB's `regexp_extract_all(text, '(?s).')` oracle walk), with an
  * ASCII fast path over the UTF-8 bytes.
  */
case class CharLnSumE8Expr(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"char_ln_sum_e8 expects string, got $t")
  }

  override protected def nullSafeEval(s: Any): Any =
    ShingleKernel.charLnSumE8(s.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, t => s"graft.plans.ShingleKernel.charLnSumE8($t)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object CharLnSumE8Expr {
  def apply(text: Column): Column =
    ColumnBridge.column(new CharLnSumE8Expr(ColumnBridge.expression(text)))
}

/** `dedupWordChunks(words, k)` — first-occurrence-preserving dedup of
  * k-word chunks as a native codegen expression (see
  * [[ShingleKernel.dedupWordChunks]]). `k` rides as a generated-code
  * literal (it is a stable config, not per-round like the BPE rule). */
case class DedupWordChunksExpr(child: Expression, k: Int) extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult =
    if (k < 1)
      // guard at PLAN time: the kernel advances by `i += k`, so k <= 0
      // would spin an executor forever inside codegen instead of failing
      TypeCheckResult.TypeCheckFailure(s"dedup_word_chunks chunk width must be >= 1, got $k")
    else child.dataType match {
      case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(s"dedup_word_chunks expects array<string>, got $t")
    }

  override protected def nullSafeEval(words: Any): Any =
    ShingleKernel.dedupWordChunks(words.asInstanceOf[ArrayData], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, t => s"graft.plans.ShingleKernel.dedupWordChunks($t, $k)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object DedupWordChunksExpr {
  def apply(words: Column, k: Int): Column =
    ColumnBridge.column(new DedupWordChunksExpr(ColumnBridge.expression(words), k))
}

/** `topNgramChars(words, n)` — codepoint count claimed by the most frequent
  * word n-gram (occurrences × codepoints of the space-joined gram); ties →
  * the code-unit-lexicographically smallest gram (== byte order for the
  * ASCII corpora both engines compare on). 0 when the doc has < n words.
  * The Gopher repetition screens' numerator (Rae et al. 2021 Table A1),
  * O(words) row-local — the corpus-sized explode+groupBy the naive form
  * needs is exactly what a 100 TB gate must avoid. */
case class TopNgramCharsExpr(child: Expression, n: Int) extends UnaryExpression {

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult =
    if (n < 1)
      TypeCheckResult.TypeCheckFailure(s"top_ngram_chars width must be >= 1, got $n")
    else child.dataType match {
      case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(s"top_ngram_chars expects array<string>, got $t")
    }

  override protected def nullSafeEval(words: Any): Any =
    ShingleKernel.topNgramChars(words.asInstanceOf[ArrayData], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, t => s"graft.plans.ShingleKernel.topNgramChars($t, $n)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object TopNgramCharsExpr {
  def apply(words: Column, n: Int): Column =
    ColumnBridge.column(new TopNgramCharsExpr(ColumnBridge.expression(words), n))
}

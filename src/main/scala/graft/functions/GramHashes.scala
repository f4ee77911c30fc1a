package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, Generator, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, CodegenFallback, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.Platform
import org.apache.spark.unsafe.types.UTF8String

/** Byte-level word k-gram HASH generator — the allocation-free form of
  * the dedup family's gram substrate. Emits, per input row, the
  * `xxhash64` (seed 42) of each word k-gram of `text`, where grams are
  * defined EXACTLY as the expression pipeline the dedup operators
  * shipped through round 10:
  *
  * {{{ xxhash64(array_join(slice(split(trim(text), "\\s+"), i, k), ' ')) }}}
  *
  * i.e. tokens = Java-regex `\s+` split of the space-trimmed text
  * (leading/trailing empty-token semantics included), gram = k
  * consecutive tokens joined by one 0x20.
  *
  * Why this exists (VERDICT r10 #7): at the sf10 (×100) leg the gram
  * family (q_dedup_ngram / q_dedup_containment / q_substr_*) carried
  * 20–30 s of GC per query. The expression form materializes, per
  * document, a token ARRAY of UTF8Strings, then a gram-string array
  * (O(tokens × k) characters), distincts it, explodes it, hashes each
  * string, and drops it — every byte of which is garbage the moment
  * the 8-byte hash exists. This generator computes the hashes straight
  * off the input row's UTF-8 bytes: token boundaries are found by a
  * byte scan (the `\s` class is pure ASCII — [ \t\n\x0B\f\r] — so a
  * byte scan is exact on UTF-8), and each gram is hashed IN PLACE in
  * the source buffer whenever its tokens are separated by single
  * spaces (the overwhelmingly common case), falling back to one
  * reused scratch buffer otherwise. Per-row allocation: the emitted
  * (pos, hash) rows only.
  *
  * Two modes:
  *  - `positional = false`: per-row DISTINCT gram hashes, one LONG
  *    column `h` (sorted order; replaces
  *    `explode(array_distinct(grams))` + `xxhash64` — distinct is
  *    taken on the HASH rather than the string, identical barring
  *    64-bit collisions, the documented posture of every hashed-gram
  *    operator);
  *  - `positional = true`: all gram positions, columns
  *    `(pos BIGINT — 1-based token offset, h LONG)` (replaces the
  *    positional struct transform in the ExactSubstr cover).
  *
  * Scratch state is ThreadLocal: in local mode one expression instance
  * can be visible to several task threads, and generator output is
  * consumed row-by-row (GenerateExec exhausts each input row's
  * iterator before the next eval), so per-thread reuse is safe.
  */
case class GramHashes(child: Expression, n: Expression, positional: Boolean,
                      lower: Boolean = false, dropEmpty: Boolean = false)
    extends Generator with CodegenFallback {

  override def prettyName: String = "gram_hashes"
  override def children: Seq[Expression] = Seq(child, n)

  override def elementSchema: StructType =
    if (positional) StructType(Seq(
      StructField("pos", LongType, nullable = false),
      StructField("h", LongType, nullable = false)))
    else StructType(Seq(StructField("h", LongType, nullable = false)))

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType != StringType)
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName needs a STRING first argument, got ${child.dataType}")
    else if (n.dataType != IntegerType || !n.foldable)
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName needs a constant INT gram size, got $n")
    else TypeCheckResult.TypeCheckSuccess

  // ---- per-thread scratch (grown, never shrunk) ----
  private final class Scratch {
    var starts = new Array[Int](64)   // token start byte offsets
    var ends = new Array[Int](64)     // token end byte offsets
    var contig = new Array[Boolean](64) // gap i..i+1 is one 0x20
    var hashes = new Array[Long](64)  // distinct-mode collector
    var gram = new Array[Byte](256)   // copy-path gram buffer
    def ensureTokens(m: Int): Unit = if (starts.length < m) {
      val c = math.max(m, starts.length * 2)
      starts = java.util.Arrays.copyOf(starts, c)
      ends = java.util.Arrays.copyOf(ends, c)
      contig = java.util.Arrays.copyOf(contig, c)
    }
    def ensureHashes(m: Int): Unit =
      if (hashes.length < m)
        hashes = java.util.Arrays.copyOf(hashes, math.max(m, hashes.length * 2))
    def ensureGram(m: Int): Unit =
      if (gram.length < m) gram = new Array[Byte](math.max(m, gram.length * 2))
  }
  @transient private lazy val scratch =
    ThreadLocal.withInitial[Scratch](() => new Scratch)

  @inline private def isSep(b: Byte): Boolean =
    b == 0x20 || b == 0x09 || b == 0x0a || b == 0x0b || b == 0x0c || b == 0x0d

  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val t = child.eval(input)
    val kv = n.eval(input)
    if (t == null || kv == null) return Nil
    val k = kv.asInstanceOf[Int]
    if (k < 1) return Nil
    // `lower` mode tokenizes the LOWERED bytes (Spark `lower()` =
    // UTF8String.toLowerCase), matching tokensLower's
    // split(lower(trim(text))): 0x20-trim commutes with lowercase, and
    // no case mapping creates or removes the ASCII separators the
    // tokenizer splits on
    val u0 = t.asInstanceOf[UTF8String]
    val u = if (lower) u0.toLowerCase else u0
    val base = u.getBaseObject
    val off = u.getBaseOffset
    val nb = u.numBytes
    // trim = leading/trailing 0x20 only (Spark StringTrim semantics)
    var s = 0
    var e = nb
    while (s < e && Platform.getByte(base, off + s) == 0x20) s += 1
    while (e > s && Platform.getByte(base, off + e - 1) == 0x20) e -= 1
    val sc = scratch.get()
    // tokenize: Java `split("\\s+", -1)` semantics — a leading
    // separator yields a leading empty token, a trailing separator a
    // trailing empty token, and the empty string one empty token.
    // `dropEmpty` = the tokensLower contract (filter(t != '')): only
    // maximal NON-empty runs are tokens.
    var ntok = 0
    var i = s
    if (dropEmpty) {
      while (i < e && isSep(Platform.getByte(base, off + i))) i += 1
      while (i < e) {
        var j = i
        while (j < e && !isSep(Platform.getByte(base, off + j))) j += 1
        sc.ensureTokens(ntok + 1)
        sc.starts(ntok) = i
        sc.ends(ntok) = j
        if (ntok > 0)
          sc.contig(ntok - 1) =
            i - sc.ends(ntok - 1) == 1 &&
              Platform.getByte(base, off + i - 1) == 0x20
        ntok += 1
        i = j
        while (i < e && isSep(Platform.getByte(base, off + i))) i += 1
      }
    } else {
      var done = false
      while (!done) {
        var j = i
        while (j < e && !isSep(Platform.getByte(base, off + j))) j += 1
        sc.ensureTokens(ntok + 1)
        sc.starts(ntok) = i
        sc.ends(ntok) = j
        if (ntok > 0)
          sc.contig(ntok - 1) =
            i - sc.ends(ntok - 1) == 1 &&
              Platform.getByte(base, off + i - 1) == 0x20
        ntok += 1
        if (j >= e) done = true
        else {
          i = j
          while (i < e && isSep(Platform.getByte(base, off + i))) i += 1
        }
      }
    }
    if (ntok < k) return Nil
    val nGrams = ntok - k + 1

    def hashGram(g: Int): Long = {
      var contiguous = true
      var q = g
      while (contiguous && q < g + k - 1) {
        contiguous = sc.contig(q); q += 1
      }
      if (contiguous) {
        // gram bytes are a slice of the source text — hash in place
        val a = sc.starts(g)
        XXH64.hashUnsafeBytes(base, off + a, sc.ends(g + k - 1) - a, 42L)
      } else {
        // rebuild with single-space joints in the reused buffer
        var len = k - 1
        var w = g
        while (w < g + k) { len += sc.ends(w) - sc.starts(w); w += 1 }
        sc.ensureGram(len)
        var p = 0
        w = g
        while (w < g + k) {
          if (w > g) { sc.gram(p) = 0x20; p += 1 }
          val tl = sc.ends(w) - sc.starts(w)
          Platform.copyMemory(base, off + sc.starts(w), sc.gram,
            Platform.BYTE_ARRAY_OFFSET + p, tl)
          p += tl
          w += 1
        }
        XXH64.hashUnsafeBytes(sc.gram, Platform.BYTE_ARRAY_OFFSET, len, 42L)
      }
    }

    if (positional) {
      (0 until nGrams).iterator.map { g =>
        InternalRow((g + 1).toLong, hashGram(g))
      }
    } else {
      sc.ensureHashes(nGrams)
      var g = 0
      while (g < nGrams) { sc.hashes(g) = hashGram(g); g += 1 }
      java.util.Arrays.sort(sc.hashes, 0, nGrams)
      var m = 0
      g = 0
      while (g < nGrams) {
        if (g == 0 || sc.hashes(g) != sc.hashes(g - 1)) {
          sc.hashes(m) = sc.hashes(g); m += 1
        }
        g += 1
      }
      val out = java.util.Arrays.copyOf(sc.hashes, m)
      out.iterator.map(h => InternalRow(h))
    }
  }

  override def terminate(): IterableOnce[InternalRow] = Nil

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): GramHashes =
    copy(child = newChildren(0), n = newChildren(1))
}

object GramHashes {
  import org.apache.spark.sql.graftshim.ColumnBridge.{column => toCol, expression => toExpr}
  import org.apache.spark.sql.catalyst.expressions.Literal

  /** Per-row DISTINCT gram hashes, column `h: LONG` — drop-in for
    * `explode(array_distinct(grams))` + `xxhash64(shingle)`.
    */
  def gramHashesDistinct(text: Column, k: Int): Column =
    toCol(GramHashes(toExpr(text), Literal(k), positional = false))

  /** All gram positions, columns `(pos: BIGINT 1-based, h: LONG)`. */
  def gramHashesPositional(text: Column, k: Int): Column =
    toCol(GramHashes(toExpr(text), Literal(k), positional = true))

  /** All gram hashes (non-distinct, no positions) over the
    * [[graft.text.TextAnalysis.tokensLower]] tokenization — lowered,
    * empty tokens dropped. Column `h: LONG`. The grouping-key form for
    * count-shaped gram aggregates (Gopher repetition legs), where the
    * gram's identity is only ever a key: max/sum/count per (doc, gram)
    * are identical on hashes barring 64-bit collisions.
    */
  def gramHashesLowerAll(text: Column, k: Int): Column =
    toCol(GramHashes(toExpr(text), Literal(k), positional = true,
      lower = true, dropEmpty = true))
}

/** `xxhash64Fold(h, i)` = the value of Spark's MULTI-COLUMN
  * `xxhash64(stringCol, lit(i))` GIVEN `h = xxhash64(stringCol)`:
  * multi-column xxhash64 threads one running hash through the inputs
  * (seed 42 → hashBytes(string) → hashInt(i)), so the per-seed MinHash
  * value factors into one string hash plus one integer fold. The
  * round-10 pipeline recomputed the full string hash 64× per gram row
  * (one independent `xxhash64(shingle, lit(seed))` per permutation);
  * with [[GramHashes]] supplying `h`, the 64 permutations cost 64
  * integer folds (~10 ns each) and the gram string is never built at
  * all. Value-identical to the shipped form — the DuckDB replay
  * (XxHashSql.minhashOracleSql's `sv` CTE) already factors it this
  * way. Codegen'd inline (stays inside whole-stage codegen).
  */
case class XxHash64FoldInt(child: Expression, k: Int)
    extends UnaryExpression {
  override def prettyName: String = "xxhash64_fold_int"
  override def dataType: DataType = LongType
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName needs a LONG input, got ${child.dataType}")
  override protected def nullSafeEval(h: Any): Any =
    XXH64.hashInt(k, h.asInstanceOf[Long])
  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"org.apache.spark.sql.catalyst.expressions.XXH64.hashInt($k, $c)")
  override protected def withNewChildInternal(
      newChild: Expression): XxHash64FoldInt = copy(child = newChild)
}

object XxHash64FoldInt {
  import org.apache.spark.sql.graftshim.ColumnBridge.{column => toCol, expression => toExpr}
  def fold(h: Column, k: Int): Column = toCol(XxHash64FoldInt(toExpr(h), k))
}

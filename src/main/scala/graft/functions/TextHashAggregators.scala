package graft.functions

import java.nio.charset.StandardCharsets
import java.security.MessageDigest

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.catalyst.expressions.Literal
import org.apache.spark.sql.catalyst.expressions.objects.StaticInvoke
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf
import org.apache.spark.sql.types.{ArrayType, LongType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** One-pass typed aggregators for the text-dedup hot paths.
  *
  * Both compute exactly the same md5-derived values as their relational
  * formulations (and therefore the same DuckDB-oracle results) — they
  * exist because the relational shape explodes every (shingle, hash-index)
  * or (token, hex-position) combination into shuffled rows. At sf0.1 that
  * is ~4.6M rows for MinHash and ~3.8M for SimHash; at 100 TB it is the
  * difference between shuffling the corpus ×16 and shuffling one
  * fixed-width aggregate state per document. Spark runs these with
  * map-side partial aggregation: each partition folds its shingles/tokens
  * locally and only the small states (16 hex strings / 64 int counters)
  * cross the wire.
  *
  * md5 here must stay bit-identical to SQL `md5()` (it does: both are
  * RFC 1321 over UTF-8 bytes, lowercase hex).
  */
object TextHashAggregators {

  private val Hex = "0123456789abcdef".toCharArray
  private val digests = ThreadLocal.withInitial[MessageDigest](
    () => MessageDigest.getInstance("MD5"))

  private def md5hex(s: String): String = {
    val md = digests.get()
    md.reset()
    val d = md.digest(s.getBytes(StandardCharsets.UTF_8))
    val out = new Array[Char](32)
    var i = 0
    while (i < 16) {
      out(2 * i) = Hex((d(i) >> 4) & 0xf)
      out(2 * i + 1) = Hex(d(i) & 0xf)
      i += 1
    }
    new String(out)
  }

  /** K element-wise-minimum hashes per shingle array, one scalar pass.
    *
    * Hash family: ONE md5 per shingle, split into two unsigned 64-bit
    * halves (a, b); hash i is `(a + i*b) mod 2^64` (Kirsch–Mitzenmacher
    * double hashing — the same construction Spark ML's MinHashLSH and
    * Bloom filters use for a hash family from one base hash). One digest
    * instead of K makes the pass ~K× cheaper in both CPU and allocation;
    * the latter matters because this UDF runs on every shingle of every
    * document and allocation-heavy inner loops go GC-bound on large
    * driver heaps.
    *
    * Each element is emitted as the unsigned decimal zero-padded to 20
    * chars, so lexicographic string order (Spark MIN(string), band
    * signature equality, DuckDB MIN(varchar)) equals unsigned numeric
    * order — the oracle can mirror the family exactly with HUGEINT
    * arithmetic.
    *
    * Scalar-per-doc beats both the relational K-way explode (shuffles
    * corpus ×K) and an Aggregator (pays a buffer encode/decode per input
    * row): a document's shingles are already colocated in its `toks`
    * array, so the signature needs no data movement at all. Duplicate
    * shingles cannot change an element-wise min, so the caller may pass
    * shingles with repeats. */
  /** Fold one shingle digest into the element-wise-min accumulator:
    * hash i is `(a + i*b) mod 2^64` over the digest halves (wrapping
    * add), compared unsigned. */
  private def foldDigestInto(mins: Array[Long], d: Array[Byte], k: Int): Unit = {
    var a = 0L
    var b = 0L
    var j = 0
    while (j < 8) {
      a = (a << 8) | (d(j) & 0xffL)
      b = (b << 8) | (d(j + 8) & 0xffL)
      j += 1
    }
    var i = 0
    var h = a // h after i steps = (a + i*b) mod 2^64 (wrapping add)
    while (i < k) {
      if (java.lang.Long.compareUnsigned(h, mins(i)) < 0) mins(i) = h
      h += b
      i += 1
    }
  }

  private def pad20(m: Long): String = {
    val s = java.lang.Long.toUnsignedString(m)
    "00000000000000000000".substring(s.length) + s
  }

  def minhashSignature(shingles: Seq[String], k: Int): Seq[String] = {
    val mins = Array.fill[Long](k)(-1L) // unsigned max
    var any = false
    shingles.foreach { sh =>
      // skip null elements — the ArrayData twin does, and these Seq
      // variants are the parity reference it is tested against
      if (sh != null) {
        any = true
        val md = digests.get()
        md.reset()
        foldDigestInto(mins, md.digest(sh.getBytes(StandardCharsets.UTF_8)), k)
      }
    }
    if (!any) Seq.fill[String](k)(null)
    else mins.toSeq.map(pad20)
  }

  /** Catalyst-facing minhash kernel: same signature as
    * [[minhashSignature]] but over Tungsten types — md5 runs on the
    * UTF8String's raw bytes, no per-element java.lang.String is ever
    * materialized, and the result array is built as UTF8Strings
    * directly. Invoked via `StaticInvoke` (see [[minhash]]) so the
    * projection stays a direct call inside whole-stage codegen instead
    * of a ScalaUDF with converter round-trips on every row. */
  def minhashArrayData(shingles: ArrayData, k: Int): ArrayData = {
    val n = shingles.numElements()
    if (n == 0) return new GenericArrayData(new Array[Any](k)) // all-null
    val mins = Array.fill[Long](k)(-1L)
    val md = digests.get()
    var idx = 0
    var any = false // non-null shingle seen — same rule as the fused kernel
    while (idx < n) {
      if (!shingles.isNullAt(idx)) {
        any = true
        md.reset()
        foldDigestInto(mins, md.digest(shingles.getUTF8String(idx).getBytes), k)
      }
      idx += 1
    }
    // a non-empty array of ONLY nulls has no signature: all-nulls out,
    // bit-identical to minhashAndHalvesData — the sentinel max values
    // would otherwise give every such degenerate doc the SAME band
    // signature (one giant false candidate bucket)
    if (!any) return new GenericArrayData(new Array[Any](k))
    val out = new Array[Any](k)
    var i = 0
    while (i < k) { out(i) = UTF8String.fromString(pad20(mins(i))); i += 1 }
    new GenericArrayData(out)
  }

  /** One-pass fusion of [[minhashArrayData]] and the per-shingle
    * [[md5Half64]] keys: a single md5 per shingle feeds BOTH the k-min
    * signature fold and the emitted 64-bit first-half used downstream as
    * the shingle-set key. The LSH pipeline needs both outputs over the
    * same corpus scan (signatures → banding; shingle-hash sets →
    * verification), and computing them separately tokenizes + shingles +
    * digests the whole corpus twice — the CPU hot spot of every dedup
    * query. Values are bit-identical to the separate kernels.
    *
    * Returns struct(mh: array<string> of k padded min hashes,
    * hs: array<long> of per-shingle md5 halves, input order, not
    * distinct — callers dedup after the explode). */
  def minhashAndHalvesData(shingles: ArrayData, k: Int): InternalRow = {
    val n = shingles.numElements()
    val mins = Array.fill[Long](k)(-1L) // unsigned max
    val hs = new Array[Any](n)
    val md = digests.get()
    var idx = 0
    var any = false
    while (idx < n) {
      if (!shingles.isNullAt(idx)) {
        any = true
        md.reset()
        val d = md.digest(shingles.getUTF8String(idx).getBytes)
        var a = 0L
        var j = 0
        while (j < 8) { a = (a << 8) | (d(j) & 0xffL); j += 1 }
        hs(idx) = a // == md5Half64(shingle)
        foldDigestInto(mins, d, k)
      }
      idx += 1
    }
    val mh = new Array[Any](k)
    if (any) {
      var i = 0
      while (i < k) { mh(i) = UTF8String.fromString(pad20(mins(i))); i += 1 }
    } // else: all-null signature, same as minhashArrayData on empty input
    new GenericInternalRow(Array[Any](
      new GenericArrayData(mh), new GenericArrayData(hs)))
  }

  /** Fused winnowing kernel: token array → distinct selected
    * fingerprints, one call per document (narrow, shuffle-free, no
    * intermediate shingle strings — each shingle's md5 is fed token
    * bytes + separator directly, so md5("a b c d") costs no string
    * concat). Window minima compare the raw 16-byte digests unsigned
    * (identical order to comparing the lowercase-hex strings); only the
    * selected minima are hex-encoded. A doc with fewer than `w` shingles
    * emits the min over its whole partial window — dropping it would
    * make short docs invisible to containment. Selection and values are
    * bit-identical to the relational formulation (explode + md5 + MIN
    * OVER a `w`-row frame + distinct). */
  def winnowData(toks: ArrayData, n: Int, w: Int): ArrayData = {
    val nt = toks.numElements()
    val ns = nt - n + 1
    if (ns <= 0) return new GenericArrayData(Array.empty[Any])
    val md = digests.get()
    val ds = new Array[Array[Byte]](ns)
    var i = 0
    while (i < ns) {
      md.reset()
      var j = 0
      while (j < n) {
        if (j > 0) md.update(' '.toByte)
        if (!toks.isNullAt(i + j)) md.update(toks.getUTF8String(i + j).getBytes)
        j += 1
      }
      ds(i) = md.digest()
      i += 1
    }
    def less(a: Array[Byte], b: Array[Byte]): Boolean = {
      var p = 0
      while (p < 16) {
        val c = (a(p) & 0xff) - (b(p) & 0xff)
        if (c != 0) return c < 0
        p += 1
      }
      false
    }
    val seen = new java.util.LinkedHashSet[String]()
    def emit(best: Int): Unit = {
      val d = ds(best)
      val sb = new java.lang.StringBuilder(32)
      var q = 0
      while (q < 16) {
        sb.append(Character.forDigit((d(q) >> 4) & 0xf, 16))
        sb.append(Character.forDigit(d(q) & 0xf, 16))
        q += 1
      }
      seen.add(sb.toString)
    }
    if (ns < w) {
      var best = 0
      var p = 1
      while (p < ns) { if (less(ds(p), ds(best))) best = p; p += 1 }
      emit(best)
    } else {
      // monotonic-deque sliding minimum: O(ns) instead of O(ns·w) —
      // each index enters and leaves the deque once. Tie handling is
      // value-irrelevant here (equal digests hex-encode identically and
      // the output is a SET), so popping on >= is safe.
      val dq = new Array[Int](ns)
      var head = 0
      var tail = 0 // live window indices, digests strictly increasing
      var p = 0
      while (p < ns) {
        while (tail > head && !less(ds(dq(tail - 1)), ds(p))) tail -= 1
        dq(tail) = p; tail += 1
        if (dq(head) <= p - w) head += 1
        if (p >= w - 1) emit(dq(head))
        p += 1
      }
    }
    val out = new Array[Any](seen.size)
    val it = seen.iterator()
    var o = 0
    while (it.hasNext) { out(o) = UTF8String.fromString(it.next()); o += 1 }
    new GenericArrayData(out)
  }

  /** SimHash over md5(token): 64 bit-vote counters (+1 set / −1 clear per
    * hex-digit bit), finished to the 16-hex signature with the same
    * sum>0 rule as the relational formulation.
    *
    * INPUT CONTRACT: one row per DISTINCT token per group (run
    * `.distinct()` on (group, md5) before aggregating). The scalar
    * twins ([[simhashArrayData]], [[simhashSignature]]) dedup tokens
    * internally; this aggregator votes per ROW — deduping inside the
    * buffer would make the partial state variable-width and lose the
    * fixed-width partial aggregation that is this shape's point — so a
    * repeated token fed as repeated rows would vote more than once and
    * diverge from the scalar kernels. */
  final class SimHashAggregator extends Aggregator[String, Array[Int], String] {
    override def zero: Array[Int] = new Array[Int](64)
    override def reduce(acc: Array[Int], tokenMd5: String): Array[Int] = {
      // skip nulls like the relational sum-of-votes formulation would
      // (md5(NULL) = NULL rows simply don't vote) instead of NPE-ing
      // the whole aggregation
      if (tokenMd5 == null) return acc
      var p = 0
      while (p < 16) {
        val digit = Character.digit(tokenMd5.charAt(p), 16)
        var b = 0
        while (b < 4) {
          acc(p * 4 + b) += (if (((digit >> b) & 1) == 1) 1 else -1)
          b += 1
        }
        p += 1
      }
      acc
    }
    override def merge(a: Array[Int], b: Array[Int]): Array[Int] = {
      var i = 0
      while (i < 64) { a(i) += b(i); i += 1 }
      a
    }
    override def finish(acc: Array[Int]): String = {
      val sb = new java.lang.StringBuilder(16)
      var p = 0
      while (p < 16) {
        var digit = 0
        var b = 0
        while (b < 4) {
          if (acc(p * 4 + b) > 0) digit |= (1 << b)
          b += 1
        }
        sb.append("0123456789abcdef".charAt(digit))
        p += 1
      }
      sb.toString
    }
    override def bufferEncoder: Encoder[Array[Int]] = ExpressionEncoder[Array[Int]]()
    override def outputEncoder: Encoder[String] = Encoders.STRING
  }

  /** SimHash of a whole token array in one scalar pass — identical
    * result to feeding distinct-token md5s through
    * [[SimHashAggregator]] (dedup to set semantics, vote per hex-digit
    * bit, sum>0 rule), but narrow and shuffle-free for the common case
    * where a document's tokens are already colocated in one array. */
  def simhashSignature(tokens: Seq[String]): String = {
    val acc = new Array[Int](64)
    val seen = new java.util.HashSet[String]()
    tokens.foreach { tok =>
      // null elements skipped, matching simhashArrayData
      if (tok != null && seen.add(tok)) {
        val h = md5hex(tok)
        var p = 0
        while (p < 16) {
          val digit = Character.digit(h.charAt(p), 16)
          var b = 0
          while (b < 4) {
            acc(p * 4 + b) += (if (((digit >> b) & 1) == 1) 1 else -1)
            b += 1
          }
          p += 1
        }
      }
    }
    val sb = new java.lang.StringBuilder(16)
    var p = 0
    while (p < 16) {
      var digit = 0
      var b = 0
      while (b < 4) {
        if (acc(p * 4 + b) > 0) digit |= (1 << b)
        b += 1
      }
      sb.append("0123456789abcdef".charAt(digit))
      p += 1
    }
    sb.toString
  }

  /** Catalyst-facing simhash kernel over a Tungsten token array — same
    * result as [[simhashSignature]] (distinct-token md5 nibble votes,
    * sum>0 rule), UTF8String-native like [[minhashArrayData]]. */
  def simhashArrayData(tokens: ArrayData): UTF8String = {
    val acc = new Array[Int](64)
    val seen = new java.util.HashSet[UTF8String]()
    val md = digests.get()
    val n = tokens.numElements()
    var idx = 0
    while (idx < n) {
      if (!tokens.isNullAt(idx)) {
        val tok = tokens.getUTF8String(idx)
        if (seen.add(tok)) {
          md.reset()
          val d = md.digest(tok.getBytes)
          // hex digit p of md5hex(tok) = nibble p of the digest bytes
          var p = 0
          while (p < 16) {
            val digit =
              if ((p & 1) == 0) (d(p / 2) >> 4) & 0xf else d(p / 2) & 0xf
            var b = 0
            while (b < 4) {
              acc(p * 4 + b) += (if (((digit >> b) & 1) == 1) 1 else -1)
              b += 1
            }
            p += 1
          }
        }
      }
      idx += 1
    }
    val sb = new java.lang.StringBuilder(16)
    var p = 0
    while (p < 16) {
      var digit = 0
      var b = 0
      while (b < 4) {
        if (acc(p * 4 + b) > 0) digit |= (1 << b)
        b += 1
      }
      sb.append("0123456789abcdef".charAt(digit))
      p += 1
    }
    UTF8String.fromString(sb.toString)
  }

  /** First md5 half of a UTF8String as a signed 64-bit — the fixed-width
    * join/shuffle key standing in for raw shingle text (a 35-char
    * shingle row becomes 8 bytes on the wire; collisions are 2^-64 per
    * pair and any would fail the oracle hash-compare loudly). */
  def md5Half64(s: UTF8String): Long = {
    val md = digests.get()
    md.reset()
    val d = md.digest(s.getBytes)
    var a = 0L
    var j = 0
    while (j < 8) { a = (a << 8) | (d(j) & 0xffL); j += 1 }
    a
  }

  /** md5Half64 as a codegen'd column (StaticInvoke, Tungsten-native). */
  def md5Half(c: Column): Column =
    org.apache.spark.sql.GraftBridge.column(StaticInvoke(
      TextHashAggregators.getClass,
      org.apache.spark.sql.types.LongType,
      "md5Half64",
      Seq(org.apache.spark.sql.GraftBridge.expression(c)),
      returnNullable = false))

  /** minhash(shingleArrayCol) → array<string> of K element-wise min
    * hashes, computed per row (narrow, shuffle-free). StaticInvoke keeps
    * the call a direct codegen'd invocation on Tungsten types — no
    * ScalaUDF converter round-trip. */
  def minhash(shingleArray: Column, k: Int = 16): Column =
    org.apache.spark.sql.GraftBridge.column(StaticInvoke(
      TextHashAggregators.getClass,
      ArrayType(StringType),
      "minhashArrayData",
      Seq(org.apache.spark.sql.GraftBridge.expression(shingleArray), Literal(k)),
      returnNullable = false))

  /** Fused minhash + shingle-half column: struct(mh array<string>,
    * hs array<long>) per row — one md5 per shingle for both outputs
    * (see [[minhashAndHalvesData]]). */
  def minhashWithHalves(shingleArray: Column, k: Int = 16): Column =
    org.apache.spark.sql.GraftBridge.column(StaticInvoke(
      TextHashAggregators.getClass,
      StructType(Seq(
        StructField("mh", ArrayType(StringType)),
        StructField("hs", ArrayType(LongType)))),
      "minhashAndHalvesData",
      Seq(org.apache.spark.sql.GraftBridge.expression(shingleArray), Literal(k)),
      returnNullable = false))

  /** winnowing fingerprints of a token array column per row (narrow,
    * shuffle-free; see [[winnowData]]). */
  def winnow(tokens: Column, n: Int, w: Int): Column =
    org.apache.spark.sql.GraftBridge.column(StaticInvoke(
      TextHashAggregators.getClass,
      ArrayType(StringType),
      "winnowData",
      Seq(org.apache.spark.sql.GraftBridge.expression(tokens), Literal(n), Literal(w)),
      returnNullable = false))

  /** simhash of a token array column per row (narrow, shuffle-free). */
  def simhashOfTokens(tokens: Column): Column =
    org.apache.spark.sql.GraftBridge.column(StaticInvoke(
      TextHashAggregators.getClass,
      StringType,
      "simhashArrayData",
      Seq(org.apache.spark.sql.GraftBridge.expression(tokens)),
      returnNullable = false))

  /** simhash(md5TokenCol) → 16-hex-char signature string. */
  def simhash(tokenMd5: Column): Column =
    udaf(new SimHashAggregator, Encoders.STRING).apply(tokenMd5)
}

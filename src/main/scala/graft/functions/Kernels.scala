package graft.functions

import org.apache.spark.sql.catalyst.expressions.XXH64
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.unsafe.types.UTF8String

/** Compiled single-pass kernels behind graft's native Catalyst
  * expressions (see [[NativeExprs]]). Each is a tight JVM loop over
  * Spark's unsafe array format — no per-element lambda dispatch, no
  * intermediate array materialization, O(n) instead of the O(n·w)
  * slice-per-window shapes HOF pipelines degrade into when Catalyst's
  * CollapseProject re-inlines upstream array expressions.
  */
object Kernels {

  private val Seed = 42L

  @inline private def hashUtf8(s: UTF8String, seed: Long): Long =
    XXH64.hashUnsafeBytes(s.getBaseObject, s.getBaseOffset, s.numBytes(), seed)

  // ---------------------------------------------------------------------
  // Portable hashing: the signature kernels below (minhash / simhash /
  // winnow) EXPOSE hash values in query output, so their hash function
  // is part of the query contract and must be restatable in any engine
  // the oracle runs on. The portable base is the value of the first 15
  // hex chars of md5 — 60 bits, non-negative:
  //   Spark SQL : conv(substring(md5(s), 1, 15), 16, 10)
  //   DuckDB    : ('0x' || substr(md5(s), 1, 15))::BIGINT
  // Set-similarity kernels whose hashes never surface (gramHashes)
  // keep the faster xxh64 path.
  // ---------------------------------------------------------------------

  private val md5Local = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** Portable 60-bit hash: int(hex(md5(bytes))[0:15], 16). */
  @inline private def pmd5(bytes: Array[Byte]): Long = {
    val d = md5Local.get(); d.reset()
    val h = d.digest(bytes)
    // hex chars 0..14 = bytes 0..6 + the high nibble of byte 7
    var v = 0L
    var i = 0
    while (i < 7) { v = (v << 8) | (h(i) & 0xffL); i += 1 }
    (v << 4) | ((h(7) & 0xf0L) >>> 4)
  }

  /** UTF-8 bytes of tokens j..min(j+n,len)-1 joined with ' ' — the gram
    * STRING both engines hash (byte-identical to md5 over the SQL-side
    * `array_to_string(tk[i:i+n-1], ' ')`).
    */
  @inline private def gramBytes(toks: ArrayData, j: Int, n: Int): Array[Byte] = {
    val end = math.min(j + n, toks.numElements())
    val sb = new java.lang.StringBuilder
    var t = j
    while (t < end) {
      if (t > j) sb.append(' ')
      sb.append(toks.getUTF8String(t).toString)
      t += 1
    }
    sb.toString.getBytes(java.nio.charset.StandardCharsets.UTF_8)
  }

  /** Cosine similarity of two float32 vectors in double precision,
    * left-to-right accumulation (bit-compatible with the HOF
    * zip_with/aggregate formulation and with engines that fold
    * sequentially — see SURVEY §8).
    */
  def cosineF32(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      val x = a.getFloat(i).toDouble
      val y = b.getFloat(i).toDouble
      dot += x * y; na += x * x; nb += y * y
      i += 1
    }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }

  /** Bit-identical to `cosineF32(a, a)` at half the array reads: with
    * x == y the three accumulators of [[cosineF32]] run the identical
    * fp-add sequence, so dot == na == nb and the result is
    * `na / (sqrt(na) * sqrt(na))` — including NaN for zero-norm or
    * empty vectors (0/0) and the same last-ulp rounding for the rest.
    * This is what makes [[graft.core.SimplifySelfCosine]] a
    * semantics-preserving rewrite rather than a value-changing fold.
    */
  def selfCosineF32(a: ArrayData): Double = {
    val n = a.numElements()
    var na = 0.0
    var i = 0
    while (i < n) {
      val x = a.getFloat(i).toDouble
      na += x * x
      i += 1
    }
    na / (math.sqrt(na) * math.sqrt(na))
  }

  /** Hash of the n-gram starting at token `j` under permutation seed
    * `seed`: token hashes chained (h = xxh64(tok, prev)) — no gram
    * string is ever materialized.
    */
  @inline private def gramHash(toks: ArrayData, j: Int, n: Int, seed: Long): Long = {
    var h = seed
    var t = j
    val end = math.min(j + n, toks.numElements())
    while (t < end) { h = hashUtf8(toks.getUTF8String(t), h); t += 1 }
    h
  }

  /** Prime modulus of the portable minhash permutation family: every
    * sig value lives in [0, 2^31-1), so a_i·base + b_i stays < 2^62 —
    * no silent wrap in Spark, no overflow trap in engines that error
    * (DuckDB). */
  private val MhP = 2147483647L // 2^31 - 1

  @inline private def mhA(i: Int): Long = (1103515245L * (i + 1) + 12345L) % MhP
  @inline private def mhB(i: Int): Long = (1234567891L * (i + 1) + 987654321L) % MhP

  /** k-permutation MinHash signature over token n-grams: sig[i] = min
    * over gram positions of h_i(g) = (a_i · (pmd5(g) mod P) + b_i) mod P
    * — the affine family over the PORTABLE base hash, so an external
    * oracle can recompute the exact signature from the gram strings
    * (constants a_i/b_i are the closed-form LCG expressions above,
    * restated verbatim in SQL). Multiset vs set of grams is immaterial
    * under min. Single pass, one md5 + k affine steps per gram.
    */
  def minhash(tokens: ArrayData, n: Int, k: Int): ArrayData = {
    val len = tokens.numElements()
    val grams = math.max(len - n + 1, 1)
    val sig = new Array[Long](k)
    java.util.Arrays.fill(sig, Long.MaxValue)
    var j = 0
    while (j < grams) {
      val base = pmd5(gramBytes(tokens, j, n)) % MhP
      var i = 0
      while (i < k) {
        val h = (mhA(i) * base + mhB(i)) % MhP
        if (h < sig(i)) sig(i) = h
        i += 1
      }
      j += 1
    }
    new GenericArrayData(sig)
  }

  /** 60-bit SimHash over a token array (Charikar'02): per-bit ±1 votes
    * from each token's PORTABLE 60-bit hash; sign of the tally sets
    * the bit. 60 bits (not 64) because that is the width the portable
    * md5-prefix base provides — the 4×16-bit-band pigeonhole for
    * hamming ≤ 3 is unchanged (band 3 carries 12 live bits).
    */
  def simhash64(tokens: ArrayData): Long = {
    val votes = new Array[Int](60)
    val n = tokens.numElements()
    var j = 0
    while (j < n) {
      val h = pmd5(tokens.getUTF8String(j).getBytes)
      var b = 0
      while (b < 60) {
        if (((h >>> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
        b += 1
      }
      j += 1
    }
    var sig = 0L
    var b = 0
    while (b < 60) {
      if (votes(b) > 0) sig |= (1L << b)
      b += 1
    }
    sig
  }

  @inline private def dotF32D(emb: ArrayData, w: Array[Double]): Double = {
    val n = math.min(emb.numElements(), w.length)
    var s = 0.0
    var i = 0
    while (i < n) { s += emb.getFloat(i).toDouble * w(i); i += 1 }
    s
  }

  /** FIXED-POINT dot for IVF cell assignment: Σ_i ⌊xᵢ·cᵢ·10¹⁰ + ½⌋ as
    * an exact integer. Each term rounds the double product ONCE at 10
    * decimals (floor(x+0.5) — identical in every engine, unlike native
    * round()); the sum is integer addition, so the result is
    * independent of accumulation order and restatable verbatim in
    * oracle SQL (`SUM(CAST(floor(xi * c * 1e10 + 0.5) AS BIGINT))`).
    * That order-independence is what converts the IVF faces (C7b/C7c)
    * from rows-only to hash-verified: a raw double dot ranks cells by
    * a value no portable SQL can reproduce bit-for-bit. Magnitudes:
    * |xᵢ·cᵢ|·10¹⁰ ≲ 10¹² per term, ≤ 64 terms — far inside Long.
    */
  @inline private def dotFixedF32(emb: ArrayData, w: Array[Double]): Long = {
    val n = math.min(emb.numElements(), w.length)
    var s = 0L
    var i = 0
    while (i < n) {
      s += math.floor(emb.getFloat(i).toDouble * w(i) * 1e10 + 0.5).toLong
      i += 1
    }
    s
  }

  /** Indices of the k cells whose centroid has the highest fixed-point
    * dot product with the embedding (ties → lower index), for IVF
    * assignment and probing. See [[dotFixedF32]] for why fixed-point.
    */
  def topCellsByDot(emb: ArrayData, centroids: Array[Array[Double]], k: Int): ArrayData = {
    val scores = centroids.map(c => dotFixedF32(emb, c))
    val idx = scores.indices.sortBy(i => (-scores(i), i)).take(k).toArray
    new GenericArrayData(idx)
  }

  /** Sign-bit bucket under fixed hyperplanes (random-hyperplane LSH). */
  def hyperplaneBucket(emb: ArrayData, planes: Array[Array[Double]]): Int = {
    var bucket = 0
    var p = 0
    while (p < planes.length) {
      if (dotF32D(emb, planes(p)) > 0) bucket |= (1 << p)
      p += 1
    }
    bucket
  }

  /** Distinct chained n-gram hashes of a token array, first-seen order.
    * The 64-bit hash stands in for the gram string (set semantics are
    * preserved up to hash collisions, ~2^-64 per pair): downstream
    * set-similarity joins/intersections then move 8-byte longs instead
    * of gram strings — the at-scale shuffle-width win.
    */
  def gramHashes(tokens: ArrayData, n: Int): ArrayData = {
    val len = tokens.numElements()
    val grams = math.max(len - n + 1, if (len == 0) 0 else 1)
    val out = new java.util.LinkedHashSet[java.lang.Long]()
    var j = 0
    while (j < grams) { out.add(gramHash(tokens, j, n, Seed)); j += 1 }
    val arr = new Array[Long](out.size)
    val it = out.iterator()
    var i = 0
    while (it.hasNext) { arr(i) = it.next(); i += 1 }
    new GenericArrayData(arr)
  }

  /** Winnowing fingerprints (Schleimer et al., SIGMOD'03) over token
    * n-grams: hash each gram with the PORTABLE 60-bit hash (fingerprints
    * are query output, so the hash is part of the contract), take the
    * min of every sliding window of `w`, emit the distinct minima in
    * first-seen order. O(len) via a monotonic deque.
    */
  def winnow(tokens: ArrayData, ngram: Int, w: Int): ArrayData = {
    val len = tokens.numElements()
    val n = math.max(len - ngram + 1, if (len == 0) 0 else 1)
    if (n == 0) return new GenericArrayData(Array.emptyLongArray)
    val hs = new Array[Long](n)
    var i = 0
    while (i < n) { hs(i) = pmd5(gramBytes(tokens, i, ngram)); i += 1 }
    val win = math.min(w, n)
    val deque = new Array[Int](n)
    var head = 0; var tail = 0 // indices into deque; deque holds positions
    val out = new java.util.LinkedHashSet[java.lang.Long]()
    i = 0
    while (i < n) {
      while (tail > head && hs(deque(tail - 1)) >= hs(i)) tail -= 1
      deque(tail) = i; tail += 1
      if (deque(head) <= i - win) head += 1
      if (i >= win - 1) out.add(hs(deque(head)))
      i += 1
    }
    val arr = new Array[Long](out.size)
    val it = out.iterator()
    i = 0
    while (it.hasNext) { arr(i) = it.next(); i += 1 }
    new GenericArrayData(arr)
  }

  /** Upper-triangle pairwise products of the 7dp-decimal-fixed
    * elements of a float32 vector, row-major (i ≤ j), as EXACT unscaled
    * longs (value×10¹⁴): the map-side inner loop of the covariance
    * matrix (Mining C59). The fix step replicates Spark's
    * `round(cast(v as double), 7)` bit-for-bit — `BigDecimal.valueOf`
    * (shortest-string repr, what Round/Cast parse) then HALF_UP — so
    * the kernel longs equal the DataFrame-path longs; the products are
    * exact while |v| < 300 (`longValueExact` throws loudly past the
    * fix-step bound rather than wrapping).
    */
  def covPairs(vec: ArrayData): ArrayData = {
    val d = vec.numElements()
    val fixed = new Array[Long](d)
    var i = 0
    while (i < d) {
      fixed(i) = java.math.BigDecimal.valueOf(vec.getFloat(i).toDouble)
        .setScale(7, java.math.RoundingMode.HALF_UP)
        .unscaledValue().longValueExact()
      i += 1
    }
    val out = new Array[Long](d * (d + 1) / 2)
    var p = 0
    i = 0
    while (i < d) {
      val fi = fixed(i)
      var j = i
      while (j < d) { out(p) = fi * fixed(j); p += 1; j += 1 }
      i += 1
    }
    new GenericArrayData(out)
  }

  /** All ordered pairs (a(i), a(j)), i < j, a(i) != a(j), of a SORTED
    * long array — the basket→co-occurrence-pair expansion in one tight
    * loop. Replaces a nested `transform(sequence(...))` + `flatten` +
    * struct-building HOF tree that dominated every co-purchase-graph
    * operator's profile: the HOF tree allocates a struct array per
    * outer index per basket and runs largely interpreted; this is one
    * static call emitting the final struct rows. Input sortedness
    * makes p1 < p2 by construction (the caller sorts once in the
    * basket aggregate); equal adjacent elements (repeated partkey in
    * an order) are skipped — the pair filter the callers previously
    * applied post-hoc.
    */
  def pairArray(parts: ArrayData): ArrayData = {
    val n = parts.numElements()
    var cnt = 0
    var i = 0
    while (i < n) {
      var j = i + 1
      while (j < n) {
        if (parts.getLong(i) != parts.getLong(j)) cnt += 1
        j += 1
      }
      i += 1
    }
    val out = new Array[Any](cnt)
    var k = 0
    i = 0
    while (i < n) {
      val a = parts.getLong(i)
      var j = i + 1
      while (j < n) {
        val b = parts.getLong(j)
        if (a != b) {
          out(k) = org.apache.spark.sql.catalyst.InternalRow(a, b)
          k += 1
        }
        j += 1
      }
      i += 1
    }
    new GenericArrayData(out)
  }
}

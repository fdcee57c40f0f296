package graft

import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.unsafe.types.UTF8String
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.Kernels

/** Pure-JVM unit tests for the native-expression kernels (no Spark). */
class KernelsSpec extends AnyFunSuite {

  private def arr(ss: String*) =
    new GenericArrayData(ss.map(UTF8String.fromString).toArray[Any])

  private def farr(fs: Float*) = new GenericArrayData(fs.toArray[Any])

  test("cosineF32: identical vectors → 1.0") {
    assert(math.abs(Kernels.cosineF32(farr(1f, 2f, 3f), farr(1f, 2f, 3f)) - 1.0) < 1e-12)
  }

  test("cosineF32: orthogonal vectors → 0.0") {
    assert(Kernels.cosineF32(farr(1f, 0f), farr(0f, 1f)) == 0.0)
  }

  test("cosineF32 matches naive double computation") {
    val a = Array(0.3f, -1.2f, 4.5f, 0.01f)
    val b = Array(2.2f, 0.7f, -0.5f, 3.3f)
    val dot = a.zip(b).map { case (x, y) => x.toDouble * y.toDouble }.sum
    val na = math.sqrt(a.map(x => x.toDouble * x.toDouble).sum)
    val nb = math.sqrt(b.map(x => x.toDouble * x.toDouble).sum)
    val got = Kernels.cosineF32(new GenericArrayData(a.toArray[Any]),
      new GenericArrayData(b.toArray[Any]))
    assert(math.abs(got - dot / (na * nb)) < 1e-12)
  }

  test("minhash: deterministic, k-wide, equal docs → equal sigs") {
    val s1 = Kernels.minhash(arr("a", "b", "c", "d", "e"), 3, 32)
    val s2 = Kernels.minhash(arr("a", "b", "c", "d", "e"), 3, 32)
    assert(s1.numElements() == 32)
    assert((0 until 32).forall(i => s1.getLong(i) == s2.getLong(i)))
  }

  test("minhash: near-identical docs share most signature slots") {
    val base = Seq("a", "b", "c", "d", "e", "f", "g", "h", "i", "j")
    val s1 = Kernels.minhash(arr(base: _*), 3, 32)
    val s2 = Kernels.minhash(arr((base :+ "k"): _*), 3, 32)
    val same = (0 until 32).count(i => s1.getLong(i) == s2.getLong(i))
    assert(same >= 20, s"expected most slots equal, got $same/32")
  }

  test("minhash: disjoint docs share almost no slots") {
    val s1 = Kernels.minhash(arr("a", "b", "c", "d", "e"), 3, 32)
    val s2 = Kernels.minhash(arr("v", "w", "x", "y", "z"), 3, 32)
    val same = (0 until 32).count(i => s1.getLong(i) == s2.getLong(i))
    assert(same <= 4, s"expected few equal slots, got $same/32")
  }

  test("simhash64: equal token sets → equal; near sets → small hamming") {
    val t1 = arr("spark", "scala", "data", "query", "join", "scan", "sort", "agg")
    val t1b = arr("spark", "scala", "data", "query", "join", "scan", "sort", "agg")
    val t2 = arr("spark", "scala", "data", "query", "join", "scan", "sort", "merge")
    val far = arr("completely", "different", "words", "entirely")
    val h1 = Kernels.simhash64(t1); val h1b = Kernels.simhash64(t1b)
    val h2 = Kernels.simhash64(t2); val hf = Kernels.simhash64(far)
    assert(h1 == h1b)
    assert(java.lang.Long.bitCount(h1 ^ h2) < java.lang.Long.bitCount(h1 ^ hf))
  }

  test("gramHashes: distinct count and determinism") {
    val g = Kernels.gramHashes(arr("a", "b", "a", "b", "a"), 2)
    // grams: ab ba ab ba -> distinct {ab, ba}
    assert(g.numElements() == 2)
    val short = Kernels.gramHashes(arr("a"), 3) // shorter than n -> 1 gram
    assert(short.numElements() == 1)
    assert(Kernels.gramHashes(arr(), 3).numElements() == 0)
  }

  test("topCellsByDot: picks the max-dot cells in order") {
    val centroids = Array(Array(1.0, 0.0), Array(0.0, 1.0), Array(-1.0, 0.0))
    val cells = Kernels.topCellsByDot(farr(0.9f, 0.4f), centroids, 2)
    assert(cells.getInt(0) == 0 && cells.getInt(1) == 1)
  }

  test("hyperplaneBucket: sign bits set per plane") {
    val planes = Array(Array(1.0, 0.0), Array(0.0, 1.0))
    assert(Kernels.hyperplaneBucket(farr(1f, 1f), planes) == 3)
    assert(Kernels.hyperplaneBucket(farr(1f, -1f), planes) == 1)
    assert(Kernels.hyperplaneBucket(farr(-1f, -1f), planes) == 0)
  }

  test("FreqAgg.Sketch: MG eviction and mergeable cut preserve the bound") {
    import graft.functions.FreqAgg
    // update path: capacity 2, stream a,a,b,c — c finds no slot and
    // pays one from everyone (a:2→1, b:1→0 evicted, c not inserted)
    val s = new FreqAgg.Sketch(2)
    Seq("a", "a", "b", "c").foreach(s.offer)
    assert(s.entries.toMap == Map("a" -> 1L))
    // freed slot admits the next newcomer
    s.offer("c")
    assert(s.entries.toMap == Map("a" -> 1L, "c" -> 1L))

    // merge path: cut = (capacity+1)-th largest subtracted from all
    val x = new FreqAgg.Sketch(3)
    x.put("a", 5L); x.put("b", 3L)
    val y = new FreqAgg.Sketch(3)
    y.put("c", 4L); y.put("d", 2L)
    x.mergeIn(y) // {a5,b3,c4,d2} over capacity → cut 2 → {a3,b1,c2}
    assert(x.entries.toMap == Map("a" -> 3L, "b" -> 1L, "c" -> 2L))
  }

  /** The portable 60-bit hash the signature kernels expose: value of
    * the first 15 hex chars of md5 — restated here independently so the
    * spec pins the exact cross-engine contract, not the kernel's own
    * implementation. */
  private def pmd5Ref(s: String): Long = {
    val hex = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    java.lang.Long.parseLong(hex.substring(0, 15), 16)
  }

  test("winnow: window minima are a subset of the portable gram hashes; deterministic") {
    val toks = Seq("q", "w", "e", "r", "t", "y", "u", "i", "o", "p", "a", "s")
    val fps = Kernels.winnow(arr(toks: _*), 3, 8)
    // expected gram hashes via the independent portable-hash restatement
    val allSet = toks.sliding(3).map(g => pmd5Ref(g.mkString(" "))).toSet
    assert(fps.numElements() > 0)
    assert((0 until fps.numElements()).forall(i => allSet.contains(fps.getLong(i))))
    // window of 8 over 10 grams -> at most 3 distinct minima
    assert(fps.numElements() <= 3)
  }

  test("portable hash contract: minhash/simhash derive from the md5-prefix base") {
    // minhash sig slot i of a single-gram doc is exactly
    // (a_i * (pmd5(gram) mod P) + b_i) mod P — pin slot 0 end-to-end
    val P = 2147483647L
    val base = pmd5Ref("x y z") % P
    val a0 = (1103515245L * 1 + 12345L) % P
    val b0 = (1234567891L * 1 + 987654321L) % P
    val sig = Kernels.minhash(arr("x", "y", "z"), 3, 32)
    assert(sig.getLong(0) == (a0 * base + b0) % P)
    // simhash of ONE token is that token's pmd5 restricted to 60 bits
    val h = Kernels.simhash64(arr("hello"))
    assert(h == (pmd5Ref("hello") & ((1L << 60) - 1)))
  }
}

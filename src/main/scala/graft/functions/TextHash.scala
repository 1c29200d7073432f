package graft.functions

/** Pure text-hashing kernels for the dedup/fingerprint operator family
  * (builder-prompt mandate: training-data pipeline ops). No Spark deps —
  * unit-testable, and wrapped as UDFs by the query layer.
  *
  * All hashes are deterministic across JVMs (no Object.hashCode, no
  * seeds from time): required so re-runs and the driver's verify agree.
  */
object TextHash {

  /** 64-bit splitmix64 finalizer — cheap, well-mixed, stable. */
  @inline def mix64(z0: Long): Long = {
    var z = z0 + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  /** FNV-1a 64 over UTF-8 bytes, then splitmix-finalized. */
  def hashString(s: String): Long = {
    var h = 0xcbf29ce484222325L
    val bytes = s.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    var i = 0
    while (i < bytes.length) {
      h ^= (bytes(i) & 0xffL)
      h *= 0x100000001b3L
      i += 1
    }
    mix64(h)
  }

  /** FNV-1a 64 over a byte window, splitmix-finalized — equals
    * hashString(new String(bytes, from, len)) for ASCII input.
    */
  @inline private def hashWindow(bytes: Array[Byte], from: Int,
      len: Int): Long = {
    var h = 0xcbf29ce484222325L
    var i = from
    val end = from + len
    while (i < end) {
      h ^= (bytes(i) & 0xffL)
      h *= 0x100000001b3L
      i += 1
    }
    mix64(h)
  }

  /** Character k-shingle hashes (distinct, sorted). Operates on the
    * UTF-8 byte array directly — no per-window substring allocation —
    * then sorts + dedups in place. Hot path of MinHash at corpus scale.
    */
  def shingleHashes(text: String, k: Int): Array[Long] = {
    val bytes = text.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    if (bytes.length < k) return Array(hashWindow(bytes, 0, bytes.length))
    val n = bytes.length - k + 1
    val all = new Array[Long](n)
    var i = 0
    while (i < n) { all(i) = hashWindow(bytes, i, k); i += 1 }
    java.util.Arrays.sort(all)
    // in-place dedup
    var w = 0
    i = 0
    while (i < n) {
      if (w == 0 || all(i) != all(w - 1)) { all(w) = all(i); w += 1 }
      i += 1
    }
    if (w == n) all else java.util.Arrays.copyOf(all, w)
  }

  /** MinHash signature of `n` permutations over the shingle-hash set.
    * Permutation i is the affine map h -> mix64(h ^ seed_i); signature
    * element i is the minimum over shingles. Estimates Jaccard:
    * P[sig_a(i) == sig_b(i)] = J(A,B).
    */
  def minHashSignature(shingles: Array[Long], n: Int): Array[Long] = {
    val sig = Array.fill(n)(Long.MaxValue)
    var p = 0
    while (p < n) {
      val seed = mix64(p.toLong + 0x5851f42d4c957f2dL)
      var m = Long.MaxValue
      var i = 0
      while (i < shingles.length) {
        val v = mix64(shingles(i) ^ seed)
        if (v < m) m = v
        i += 1
      }
      sig(p) = m
      p += 1
    }
    sig
  }

  /** Exact Jaccard over the DISTINCT character k-gram STRING sets of two
    * texts — the verify kernel of the SQL-portable MinHash path: must
    * equal the relational form (distinct `substr(text, i, k)` sets
    * joined on gram) exactly, which it does because both count the same
    * integer intersection/sizes. Character-based like SQL `substr`
    * (astral-plane code points differ between UTF-16 and code-point
    * indexing; the corpus contract is BMP text).
    */
  def stringGramJaccard(a: String, b: String, k: Int): Double = {
    def grams(s: String): java.util.HashSet[String] = {
      val set = new java.util.HashSet[String]()
      var i = 0
      while (i + k <= s.length) { set.add(s.substring(i, i + k)); i += 1 }
      set
    }
    val ga = grams(a); val gb = grams(b)
    var inter = 0
    val it = ga.iterator()
    while (it.hasNext) if (gb.contains(it.next())) inter += 1
    val union = ga.size + gb.size - inter
    if (union == 0) 1.0 else inter.toDouble / union
  }

  /** Exact Jaccard over two sorted distinct hash arrays. */
  def jaccard(a: Array[Long], b: Array[Long]): Double = {
    var i = 0; var j = 0; var inter = 0
    while (i < a.length && j < b.length) {
      if (a(i) == b(j)) { inter += 1; i += 1; j += 1 }
      else if (a(i) < b(j)) i += 1
      else j += 1
    }
    val union = a.length + b.length - inter
    if (union == 0) 1.0 else inter.toDouble / union
  }

  /** 64-bit SimHash over whitespace tokens (near-dup via Hamming
    * distance; Charikar 2002 / Manku et al. WWW'07 style).
    */
  def simHash(text: String): Long = {
    val counts = new Array[Int](64)
    for (tok <- text.split("\\s+") if tok.nonEmpty) {
      val h = hashString(tok)
      var b = 0
      while (b < 64) {
        if (((h >>> b) & 1L) == 1L) counts(b) += 1 else counts(b) -= 1
        b += 1
      }
    }
    var out = 0L
    var b = 0
    while (b < 64) {
      if (counts(b) > 0) out |= (1L << b)
      b += 1
    }
    out
  }

  @inline def hamming(a: Long, b: Long): Int =
    java.lang.Long.bitCount(a ^ b)

  /** Winnowing document fingerprint (Schleimer/Wilkerson/Aiken SIGMOD'03):
    * k-gram hashes, sliding window of w, keep each window's minimum
    * (rightmost on ties — enforced by `<=` when extending the deque).
    * O(n) via a monotonic deque instead of O(n·w) rescans. Returns the
    * distinct selected hashes, sorted.
    */
  def winnow(text: String, k: Int, w: Int): Array[Long] = {
    val bytes = text.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    if (bytes.length < k) return Array(hashWindow(bytes, 0, bytes.length))
    val n = bytes.length - k + 1
    val grams = new Array[Long](n)
    var i = 0
    while (i < n) { grams(i) = hashWindow(bytes, i, k); i += 1 }
    if (n <= w) {
      java.util.Arrays.sort(grams)
      var ww = 0
      i = 0
      while (i < n) {
        if (ww == 0 || grams(i) != grams(ww - 1)) {
          grams(ww) = grams(i); ww += 1
        }
        i += 1
      }
      return java.util.Arrays.copyOf(grams, ww)
    }
    val picked = new java.util.TreeSet[java.lang.Long]()
    // monotonic deque of indices; front = window min, ties keep rightmost
    val deque = new Array[Int](n)
    var head = 0; var tail = 0 // [head, tail)
    i = 0
    while (i < n) {
      while (tail > head && grams(deque(tail - 1)) >= grams(i)) tail -= 1
      deque(tail) = i; tail += 1
      val start = i - w + 1
      if (start >= 0) {
        while (deque(head) < start) head += 1
        picked.add(grams(deque(head)))
      }
      i += 1
    }
    val arr = new Array[Long](picked.size)
    val it = picked.iterator()
    var z = 0
    while (it.hasNext) { arr(z) = it.next(); z += 1 }
    arr
  }
}

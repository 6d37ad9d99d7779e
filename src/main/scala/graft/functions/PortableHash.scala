package graft.functions

/**
 * Portable hashing primitives shared by the dedup/ANN operator family and
 * their DuckDB oracles. The base hash of a string is the first 15 hex
 * chars of its MD5 digest read as a 60-bit integer — i.e. exactly
 * `('0x' || substr(md5(s), 1, 15))::BIGINT` in DuckDB and
 * `conv(substring(md5(s), 1, 15), 16, 10)` in Spark SQL — so every
 * derived signature (MinHash, SimHash, LSH bands) is reproducible
 * bit-for-bit by an independent SQL engine. This trades a little raw
 * speed vs a native 64-bit hash (MD5 is ~10x slower per call) for a hard
 * end-to-end correctness signal; the hash is a single seam to swap.
 *
 * MinHash uses the classic universal-hash family over the Mersenne prime
 * P = 2^31 - 1:  h_i(x) = (a_i * x + b_i) mod P  with x = base % P —
 * products stay < 2^62, so the same arithmetic is exact in any engine
 * with 64-bit integers (Broder '97 min-wise permutations; Carter-Wegman
 * universal hashing).
 */
object PortableHash {

  /** Mersenne prime 2^31 - 1: the MinHash permutation modulus. */
  val P: Long = 2147483647L

  val NumHashes = 64
  val SimHashBits = 60 // the base hash width: 15 hex chars

  /** splitmix64 finalizer (public domain, Steele et al. 2014). */
  @inline private def mix(z0: Long): Long = {
    var z = z0 + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  /** MinHash permutation coefficients, deterministic; a_i in [1, P),
    * b_i in [0, P). Embedded verbatim into the DuckDB oracle SQL. */
  val SeedA: Array[Long] =
    Array.tabulate(NumHashes)(i => (mix(1000003L * (i + 1)) & 0x7fffffffL) % (P - 1) + 1)
  val SeedB: Array[Long] =
    Array.tabulate(NumHashes)(i => (mix(2000003L * (i + 1)) & 0x7fffffffL) % P)

  private val md5Local = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** 60-bit base hash: first 15 hex chars of md5 as an integer. The first
    * 8 digest bytes big-endian are the first 16 hex chars; >>> 4 drops the
    * 16th. Always non-negative. */
  def hex60(utf8: Array[Byte]): Long = {
    val md = md5Local.get()
    md.reset()
    val d = md.digest(utf8)
    var v = 0L
    var i = 0
    while (i < 8) { v = (v << 8) | (d(i) & 0xffL); i += 1 }
    v >>> 4
  }

  def hex60(s: String): Long = hex60(s.getBytes("UTF-8"))

  /** SQL fragments for oracle generation. */
  def duckHex60(expr: String): String =
    s"('0x' || substr(md5($expr), 1, 15))::BIGINT"

  def duckMinHashSlot(i: Int, keysExpr: String): String =
    s"list_min(list_transform($keysExpr, k -> (${SeedA(i)} * k + ${SeedB(i)}) % $P))"
}

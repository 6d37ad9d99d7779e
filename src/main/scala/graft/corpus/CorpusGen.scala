package graft.corpus

import org.apache.spark.sql.{Dataset, SparkSession}

/** The engine's input row shape (BASELINE.json input_hint): an
  * Iceberg-style table of source-code files. */
final case class CorpusDoc(repo: String, path: String, commit: String,
                           lang: String, content: String)

/**
 * Deterministic synthetic source-code corpus (FIXTURES.md §1). Pure
 * function of (seed, i): `dataset(n)` yields identical rows regardless of
 * partitioning, cluster size, or run — required for resumability tests and
 * the N-vs-4N scaling benchmark to run on the same input.
 *
 * Content is pseudo source code: camelCase + snake_case identifiers from a
 * fixed vocabulary plus keyword-dense lines (`def`, `return`, `val`, ...)
 * so hot terms (the code analogue of stopword-dense tokens) arise
 * naturally and exercise the skew path.
 */
object CorpusGen extends Serializable {

  // splitmix64 — public-domain PRNG (Steele et al.), fully deterministic.
  @inline private def mix(z0: Long): Long = {
    var z = z0 + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  final class Rng(seed: Long) {
    private var state = seed
    def nextLong(): Long = { state = mix(state); state }
    def nextInt(bound: Int): Int = {
      val r = nextLong() >>> 1
      (r % bound).toInt
    }
    def nextDouble(): Double = (nextLong() >>> 11).toDouble / (1L << 53).toDouble
  }

  private val CamelIdents = Array(
    "computeHashValue", "maxRetryCount", "inputBuffer", "parseJsonRecord",
    "HTTPServerConfig", "readBlockOffset", "mergeSortedRuns", "openFileChannel",
    "flushWriteAheadLog", "scanTokenStream", "buildPostingList", "queryTopDocs",
    "shardRouterTable", "checkpointManager", "deltaEncodeBlock", "varintDecoder",
    "skipPointerIndex", "termDictionary", "docFreqCounter", "avgFieldLength")

  private val SnakeIdents = Array(
    "block_max_score", "posting_reader", "segment_writer", "doc_id_base",
    "term_hash_bucket", "merge_policy_tier", "commit_snapshot_id",
    "partition_offset", "bm25_k1_param", "field_norm_cache",
    "token_filter_chain", "stop_word_set", "shuffle_salt_key", "lineage_record")

  private val Keywords = Array(
    "def", "return", "val", "var", "class", "object", "import", "private",
    "public", "static", "final", "void", "int", "string", "match", "case",
    "for", "while", "else", "try", "catch", "new", "extends", "override")

  private val Langs = Array("scala", "java", "py", "go", "md")
  private val LangExt = Map("scala" -> "scala", "java" -> "java",
    "py" -> "py", "go" -> "go", "md" -> "md")
  private val Dirs = Array("src", "core", "index", "query", "util", "io",
    "net", "store", "codec", "test")
  private val NumRepos = 512

  private val Hex = "0123456789abcdef".toCharArray

  /** Pure generator: doc for global row number i.
    *
    * r8 hot-path form: direct java.lang.StringBuilder appends replace the
    * per-line `s"..."`/`f"..."` interpolations (each a Formatter or
    * StringBuilder+copy of its own) and the per-doc Seq/Map allocations.
    * OUTPUT IS BYTE-IDENTICAL to the original formulation — the generated
    * corpus is frozen (FIXTURES.md; CorpusGenSpec pins new-vs-reference
    * equality), only the generation cost changed (~2.5x; the generator
    * runs inside the timed build region of the bench). RNG call order is
    * exactly the original's. */
  def doc(seed: Long, i: Long): CorpusDoc = {
    val rng = new Rng(mix(seed ^ (i * 0x9e3779b97f4a7c15L)))
    // zipf-ish repo skew: square the uniform so low repo ids get more files
    val u = rng.nextDouble()
    val repoIdx = (u * u * NumRepos).toInt.min(NumRepos - 1)
    // "repo-%04d" by hand: repoIdx < 10000 always (NumRepos = 512)
    val repoChars = new Array[Char](9)
    repoChars(0) = 'r'; repoChars(1) = 'e'; repoChars(2) = 'p'
    repoChars(3) = 'o'; repoChars(4) = '-'
    repoChars(5) = ('0' + repoIdx / 1000).toChar
    repoChars(6) = ('0' + repoIdx / 100 % 10).toChar
    repoChars(7) = ('0' + repoIdx / 10 % 10).toChar
    repoChars(8) = ('0' + repoIdx % 10).toChar
    val repo = new String(repoChars)
    val lang = {
      val r = rng.nextInt(100)
      if (r < 40) "scala" else if (r < 60) "java" else if (r < 80) "py"
      else if (r < 92) "go" else "md"
    }
    val depth = 1 + rng.nextInt(3)
    val pb = new java.lang.StringBuilder(48)
    var d = 0
    while (d < depth) {
      pb.append(Dirs(rng.nextInt(Dirs.length))).append('/')
      d += 1
    }
    // LangExt is the identity map on every lang — ext == lang
    pb.append("file_").append(i).append('.').append(lang)
    val path = pb.toString
    val commitChars = new Array[Char](40)
    var h = mix(seed ^ i ^ 0x5bf03635L)
    var ci = 0
    while (ci < 40) {
      if (ci % 16 == 0) h = mix(h)
      commitChars(ci) = Hex(((h >>> ((ci % 16) * 4)) & 0xf).toInt)
      ci += 1
    }
    val nLines = 10 + rng.nextInt(391) // 10..400
    val sb = new java.lang.StringBuilder(nLines * 40)
    var ln = 0
    while (ln < nLines) {
      val kw = Keywords(rng.nextInt(Keywords.length))
      val id1 = if (rng.nextInt(2) == 0) CamelIdents(rng.nextInt(CamelIdents.length))
                else SnakeIdents(rng.nextInt(SnakeIdents.length))
      val id2 = if (rng.nextInt(2) == 0) CamelIdents(rng.nextInt(CamelIdents.length))
                else SnakeIdents(rng.nextInt(SnakeIdents.length))
      rng.nextInt(4) match {
        case 0 => sb.append(kw).append(' ').append(id1).append('(').append(id2)
          .append(", ").append(rng.nextInt(100)).append("):\n")
        case 1 => sb.append("  ").append(kw).append(' ').append(id1).append(" = ")
          .append(id2).append(" + ").append(rng.nextInt(1000)).append('\n')
        case 2 => sb.append("  if (").append(id1).append(" > ").append(id2)
          .append(") { return ").append(id1).append("; }\n")
        case _ => sb.append("// ").append(kw).append(" the ").append(id1)
          .append(" for ").append(id2).append('\n')
      }
      ln += 1
    }
    CorpusDoc(repo, path, commit = new String(commitChars), lang, sb.toString)
  }

  /** Distributed deterministic corpus of n docs. */
  def dataset(spark: SparkSession, n: Long, seed: Long = 42L,
              numPartitions: Int = 32): Dataset[CorpusDoc] = {
    import spark.implicits._
    spark.range(0, n, 1, numPartitions).map(i => doc(seed, i))
  }
}

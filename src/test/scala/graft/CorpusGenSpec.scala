package graft

import graft.corpus.{CorpusDoc, CorpusGen}
import org.scalatest.funsuite.AnyFunSuite

/** r8 pin: the corpus generator was rewritten for speed (direct appends
  * replacing per-line interpolations) but its OUTPUT IS FROZEN — the
  * corpus feeds every index-build benchmark and fixture (FIXTURES.md §1),
  * so the rewrite must be byte-identical to the original formulation.
  * The reference below is a verbatim copy of the pre-r8 doc(). */
class CorpusGenSpec extends AnyFunSuite {

  // --- verbatim pre-r8 reference implementation ---
  @inline private def mix(z0: Long): Long = {
    var z = z0 + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }
  private final class Rng(seed: Long) {
    private var state = seed
    def nextLong(): Long = { state = mix(state); state }
    def nextInt(bound: Int): Int = { val r = nextLong() >>> 1; (r % bound).toInt }
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
  private val LangExt = Map("scala" -> "scala", "java" -> "java",
    "py" -> "py", "go" -> "go", "md" -> "md")
  private val Dirs = Array("src", "core", "index", "query", "util", "io",
    "net", "store", "codec", "test")
  private val NumRepos = 512
  private val Hex = "0123456789abcdef".toCharArray

  private def referenceDoc(seed: Long, i: Long): CorpusDoc = {
    val rng = new Rng(mix(seed ^ (i * 0x9e3779b97f4a7c15L)))
    val u = rng.nextDouble()
    val repoIdx = (u * u * NumRepos).toInt.min(NumRepos - 1)
    val repo = f"repo-$repoIdx%04d"
    val lang = {
      val r = rng.nextInt(100)
      if (r < 40) "scala" else if (r < 60) "java" else if (r < 80) "py"
      else if (r < 92) "go" else "md"
    }
    val depth = 1 + rng.nextInt(3)
    val dirs = (0 until depth).map(_ => Dirs(rng.nextInt(Dirs.length)))
    val path = dirs.mkString("", "/", "/") + s"file_$i.${LangExt(lang)}"
    val commitChars = new Array[Char](40)
    var h = mix(seed ^ i ^ 0x5bf03635L)
    var ci = 0
    while (ci < 40) {
      if (ci % 16 == 0) h = mix(h)
      commitChars(ci) = Hex(((h >>> ((ci % 16) * 4)) & 0xf).toInt)
      ci += 1
    }
    val nLines = 10 + rng.nextInt(391)
    val sb = new StringBuilder(nLines * 40)
    var ln = 0
    while (ln < nLines) {
      val kw = Keywords(rng.nextInt(Keywords.length))
      val id1 = if (rng.nextInt(2) == 0) CamelIdents(rng.nextInt(CamelIdents.length))
                else SnakeIdents(rng.nextInt(SnakeIdents.length))
      val id2 = if (rng.nextInt(2) == 0) CamelIdents(rng.nextInt(CamelIdents.length))
                else SnakeIdents(rng.nextInt(SnakeIdents.length))
      rng.nextInt(4) match {
        case 0 => sb.append(s"$kw $id1($id2, ${rng.nextInt(100)}):\n")
        case 1 => sb.append(s"  $kw $id1 = $id2 + ${rng.nextInt(1000)}\n")
        case 2 => sb.append(s"  if ($id1 > $id2) { return $id1; }\n")
        case _ => sb.append(s"// $kw the $id1 for $id2\n")
      }
      ln += 1
    }
    CorpusDoc(repo, path, commit = new String(commitChars), lang, sb.toString)
  }
  // --- end reference ---

  test("rewritten doc() is byte-identical to the pre-r8 reference") {
    Seq(42L, 0L, 7L, -123456789L).foreach { seed =>
      (0L until 1500L).foreach { i =>
        val got = CorpusGen.doc(seed, i)
        val want = referenceDoc(seed, i)
        assert(got == want, s"diverges at seed=$seed i=$i")
      }
      // sparse high row numbers (file_$i digits vary)
      Seq(1L << 20, (1L << 33) + 17L, Long.MaxValue / 3).foreach { i =>
        assert(CorpusGen.doc(seed, i) == referenceDoc(seed, i),
          s"diverges at seed=$seed i=$i")
      }
    }
  }
}

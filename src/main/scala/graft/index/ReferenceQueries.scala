package graft.index

/** The frozen reference query set (FIXTURES.md §1 `queries.tsv`): scored
  * by both the Spark engine and the in-memory oracle; parity =
  * rank-identical docIDs + scores. Mix of hot code keywords (skew path),
  * camelCase/snake identifiers (analyzer path), multi-term and boolean
  * ("spaces are ANDs commas are ORs", /root/reference/sentiment.py:638-641)
  * shapes. */
object ReferenceQueries {
  val all: Seq[String] = Seq(
    "def return",                       // hot keywords, huge postings
    "computeHashValue",                 // camelCase identifier
    "block_max_score",                  // snake_case identifier
    "mergeSortedRuns buildPostingList", // multi identifier
    "val match case",                   // keyword mix
    "posting reader segment",           // split sub-tokens
    "varintDecoder skipPointerIndex",
    "hash bucket partition offset",
    "import static final",
    "term dictionary doc freq counter",
    "checkpoint manager commit snapshot",
    "bm25 k1 param field norm cache",
    "scan token stream",
    "query top docs shard router",
    "avg field length stop word set")

  val boolQueries: Seq[String] = Seq(
    "def return, val match",
    "computeHashValue, block_max_score",
    "merge sorted runs, posting list",
    "token filter chain, shuffle salt key, lineage record",
    "hash, scan, stream")

  val topK = 10
}

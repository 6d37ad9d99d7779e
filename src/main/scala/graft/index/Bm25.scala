package graft.index

/**
 * Lucene/ES-5.x BM25 (the similarity the reference's analyzed `message`
 * fields are scored with — provisioned at /root/reference/sentiment.py:782-793;
 * k1/b fixed by the north rule):
 *
 *   idf(df)      = ln(1 + (N - df + 0.5) / (df + 0.5))
 *   score(tf,dl) = idf * tf*(k1+1) / (tf + k1*(1 - b + b*dl/avgdl))
 *
 * All arithmetic in doubles; per-document totals are summed in QUERY TERM
 * ORDER (frozen — the oracle and every engine scorer do the same, so
 * scores are bit-identical, not merely rank-identical).
 */
final case class Bm25(numDocs: Long, avgdl: Double, k1: Double = 1.2, b: Double = 0.75)
    extends Serializable {

  def idf(df: Long): Double =
    math.log(1.0 + (numDocs - df + 0.5) / (df + 0.5))

  @inline def score(idf: Double, tf: Int, dl: Int): Double =
    idf * (tf * (k1 + 1.0)) / (tf + k1 * (1.0 - b + b * dl / avgdl))

  /** Safe upper bound for any posting with tf <= maxTf and dl >= minDl:
    * score is increasing in tf and decreasing in dl. */
  @inline def upperBound(idf: Double, maxTf: Int, minDl: Int): Double =
    score(idf, maxTf, minDl)
}

/** A scored hit. Global ordering everywhere: score desc, then docId asc
  * (frozen tie-break, matches the oracle). */
final case class ScoredDoc(docId: Long, score: Double)

/** One term's contribution to a document's BM25 score (the ES
  * `/_explain` shape: QueryEngine.explainScore). */
final case class ScoreExplain(term: String, df: Long, idf: Double,
                              tf: Int, dl: Int, contribution: Double)

/** One query term's match positions in a document (the ES highlighter
  * shape: QueryEngine.highlight). Positions are post-filter token
  * emission indices — the same space phrase matching and the SQL
  * oracles' sliding-window checks use. */
final case class HighlightTerm(term: String, positions: Seq[Int])

object ScoredDoc {
  /** Heap/merge ordering: "better" = higher score, then lower docId. */
  val betterOrdering: Ordering[ScoredDoc] = new Ordering[ScoredDoc] {
    def compare(x: ScoredDoc, y: ScoredDoc): Int = {
      val c = java.lang.Double.compare(y.score, x.score)
      if (c != 0) c else java.lang.Long.compare(x.docId, y.docId)
    }
  }

  /** Bounded top-k accumulator (score desc, docId asc). */
  final class TopK(k: Int) {
    // max-heap on "worst first" so the root is the eviction candidate
    private val heap = new java.util.PriorityQueue[ScoredDoc](
      math.max(1, k), betterOrdering.reverse)
    def offer(d: ScoredDoc): Unit = {
      if (k <= 0) return
      if (heap.size < k) heap.add(d)
      else if (betterOrdering.compare(d, heap.peek) < 0) { heap.poll(); heap.add(d) }
    }
    /** Current kth-best score threshold (theta); -inf while not full,
      * +inf for k<=0 (nothing can enter). */
    def threshold: Double =
      if (k <= 0) Double.PositiveInfinity
      else if (heap.size < k) Double.NegativeInfinity
      else heap.peek.score
    def isFull: Boolean = heap.size >= k
    def result(): Seq[ScoredDoc] = {
      val arr = heap.toArray(new Array[ScoredDoc](heap.size))
      arr.sorted(betterOrdering).toSeq
    }
  }
}

package graft.tools
import graft.index._
import org.apache.spark.sql.SparkSession
/** Scratch probe: warm disjunctive latency against whatever index
  * ScaleSanity last left at target/graftwork/scale-index — used to A/B
  * scorer changes at the 1M/2M scale without rebuilding. */
object DisjProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "64")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val eng = new QueryEngine(spark, "/root/repo/target/graftwork/scale-index")
    println(s"[probe] docs=${eng.manifest.numDocs}")
    ReferenceQueries.all.take(6).foreach(q => eng.topK(q, 10)) // warm
    val lats = (1 to 2).flatMap(_ => ReferenceQueries.all.map { q =>
      val t0 = System.nanoTime(); eng.topK(q, 10); (System.nanoTime()-t0)/1e9 })
    println(f"[probe] disj p50=${lats.sorted.apply(lats.size/2)}%.3f p95=${lats.sorted.apply(lats.size*95/100 min (lats.size-1))}%.3f")
    ReferenceQueries.all.take(6).foreach { q =>
      val t0 = System.nanoTime(); eng.topK(q, 10)
      println(f"[probe] '${q.take(38)}%-38s' ${(System.nanoTime()-t0)/1e9}%.3f s")
    }
    // warm re-probes of the r6/r7 surfaces (2 reps, min): mm, near,
    // filtered, field gates — attribution for in-run cold numbers
    def best(n: String)(f: => Unit): Unit = {
      val ts = (1 to 2).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime()-t0)/1e9 }
      println(f"[probe] $n%-28s ${ts.min}%.3f s (reps ${ts.map(t => f"$t%.2f").mkString("/")})")
    }
    Seq(1, 2, 3).foreach(m => best(s"min_match m=$m")(
      eng.topKMin("posting reader segment", 10, m)))
    if (eng.hasPositions) Seq(0, 2, 5).foreach(s => best(s"near slop=$s")(
      eng.booleanTopK(s""""posting reader"~$s""", 10)))
    best("filtered 25%")(eng.topKFiltered("posting reader", 10, "docId % 4 = 0"))
    best("field topKQS")(eng.topKQS("posting reader lang:scala dlen:[20 TO 200]", 10))
    best("page1+page2") {
      val p1 = eng.topK("posting reader", 10)
      eng.topKAfter("posting reader", 10, p1.last.score, p1.last.docId)
    }
    spark.stop()
  }
}

package graft.tools
import graft.index._
import org.apache.spark.sql.SparkSession
object PathCompare {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions","64")
      .config("spark.ui.enabled","false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val root = "/root/repo/target/graftwork/scale-index"
    def bench(name: String, eng: QueryEngine): Unit = {
      ReferenceQueries.all.foreach(q => eng.topK(q, 10)) // warm
      val lats = (1 to 2).flatMap(_ => ReferenceQueries.all.map { q =>
        val t0=System.nanoTime(); eng.topK(q,10); (System.nanoTime()-t0)/1e9 })
      val s = lats.sorted
      println(f"[pc] $name p50=${s(s.size/2)}%.3f p95=${s((s.size*95)/100 min (s.size-1))}%.3f max=${s.last}%.3f")
    }
    bench("driver-path(<=8M)", new QueryEngine(spark, root))
    bench("distributed(all)", new QueryEngine(spark, root, driverPathMaxPostings = 0))
    // agreement check
    val a = new QueryEngine(spark, root)
    val b = new QueryEngine(spark, root, driverPathMaxPostings = 0)
    val ok = ReferenceQueries.all.forall(q => a.topK(q,10) == b.topK(q,10))
    println(s"[pc] paths agree: $ok")
    spark.stop()
  }
}

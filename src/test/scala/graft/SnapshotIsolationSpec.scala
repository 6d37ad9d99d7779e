package graft

import graft.corpus.CorpusGen
import graft.index.{IndexBuilder, QueryEngine, ReferenceQueries, SegmentMerge}
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.{Files, Paths}

/** Iceberg-lite snapshot isolation: an engine opened on an older snapshot
  * keeps answering identically while builds and merges commit new
  * snapshots underneath (immutable segments + atomic pointer swap). */
class SnapshotIsolationSpec extends AnyFunSuite with SparkSessionFixture {

  test("reader on an old snapshot survives a concurrent ingest + merge") {
    import spark.implicits._
    val work = Files.createTempDirectory(
      Paths.get("/root/repo/target"), "snapiso").toString
    val root = s"$work/index"
    IndexBuilder.build(spark, CorpusGen.dataset(spark, 300, 42L, 4), root, 4)
    val reader = new QueryEngine(spark, root) // pins manifest version 1
    val before = ReferenceQueries.all.take(5).map(q => q -> reader.topK(q, 10))

    // new ingest batch + compaction commit snapshots v2 and v3 underneath
    IndexBuilder.build(spark,
      spark.range(300, 500).map(i => CorpusGen.doc(42L, i)), root, 4, batch = 1)
    SegmentMerge.merge(spark, root)

    // the pinned reader still sees exactly its snapshot
    before.foreach { case (q, expected) =>
      assert(reader.topK(q, 10) === expected, s"query '$q' changed under reader")
    }
    assert(reader.manifest.numDocs === 300L)

    // a fresh open sees the merged world
    val fresh = new QueryEngine(spark, root)
    assert(fresh.manifest.numDocs === 500L)
    assert(fresh.manifest.segments.size === 1)
  }
}

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

  test("format gate: build/merge stamp FormatVersion; unstamped roots fail loudly at open") {
    import spark.implicits._
    val work = Files.createTempDirectory(
      Paths.get("/root/repo/target"), "fmtgate").toString
    val root = s"$work/index"
    IndexBuilder.build(spark, CorpusGen.dataset(spark, 120, 7L, 2), root, 2)
    val tbl = new graft.table.IcebergLite(root)
    // every writer stamps the current format
    assert(tbl.currentManifest().get.format.contains(IndexBuilder.FormatVersion))
    IndexBuilder.build(spark,
      spark.range(120, 200).map(i => CorpusGen.doc(7L, i)), root, 2, batch = 1)
    SegmentMerge.merge(spark, root)
    assert(tbl.currentManifest().get.format.contains(IndexBuilder.FormatVersion))

    // simulate a durable UNSTAMPED root: strip the stamp from the
    // manifest (the first v4-layout engine revision never wrote one).
    // Since r7 the gate SNIFFS the parquet layout first (ADVICE r6): a
    // root whose physical schema carries the v4 columns opens fine —
    // only an incompatible layout, or a manifest stamped with a
    // DIFFERENT version, still rejects with the rebuild message.
    val snap = com.fasterxml.jackson.databind.json.JsonMapper.builder().build()
      .readTree(Files.readString(Paths.get(root, "snapshot.json")))
    val mfName = snap.get("manifest").asText()
    val mfPath = Paths.get(root, mfName)
    val mf = Files.readString(mfPath)
    Files.writeString(mfPath,
      mf.replaceAll(""""format"\s*:\s*"[^"]*",?""", "")
        .replaceAll(""",\s*}""", "}")) // tolerate trailing-comma cleanup
    // unstamped + v4 parquet layout => opens (the compatible-root rescue;
    // the lacks-v4-columns rejection is covered in FieldQuerySpec)
    assert(new QueryEngine(spark, root).topK("def", 3) != null)
    // a manifest stamped with a WRONG version always rejects, everywhere
    Files.writeString(mfPath,
      mf.replaceAll(""""format"\s*:\s*"[^"]*"""", """"format":"3""""))
    val eOpen = intercept[IllegalStateException](new QueryEngine(spark, root))
    assert(eOpen.getMessage.contains("rebuild"), eOpen.getMessage)
    val eBuild = intercept[IllegalStateException] {
      IndexBuilder.build(spark,
        spark.range(200, 220).map(i => CorpusGen.doc(7L, i)), root, 2, batch = 2)
    }
    assert(eBuild.getMessage.contains("rebuild"), eBuild.getMessage)
    val eRebase = intercept[IllegalStateException](SegmentMerge.rebase(spark, root))
    assert(eRebase.getMessage.contains("rebuild"), eRebase.getMessage)
  }
}

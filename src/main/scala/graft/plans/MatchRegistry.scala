package graft.plans

import org.apache.spark.sql.types.{DataType, LongType, StringType}

/**
 * Registry of tables the `WHERE match(col, query)` predicate can serve
 * through a committed inverted index instead of row-level re-analysis —
 * the engine-side analogue of Elasticsearch's "any indexed field is
 * queryable" property (/root/reference/sentiment.py:782-793: every
 * analyzed field the reference provisions becomes searchable; here a
 * table opts in by registering the index that covers it).
 *
 * An entry binds ONE parquet root path to ONE committed index and
 * declares how match-set rows key back to table rows: each
 * (tableCol -> docmetaCol) pair of `keyMap` becomes an equi-join key of
 * the LEFT SEMI join MatchFilterRewrite plants. Tables with a unique
 * numeric id register `Seq("doc_id" -> "tableId")` (and build their
 * index with IndexBuilder's `tableIdOf` so docmeta carries the id);
 * corpus-shaped tables (repo/path/commit/lang/content) key on their
 * natural identity `Seq("repo" -> "repo", "path" -> "path",
 * "commit" -> "commit")` with no id column needed.
 *
 * The driver-testdata documents.parquet convention needs no explicit
 * registration: `lookup` synthesizes its entry (text column, doc_id ->
 * tableId, ensure-built index) when no explicit entry claims the path.
 *
 * Registrations are per-JVM (like `spark.experimental` itself); a
 * long-lived deployment would persist them as table properties in the
 * catalog — the lookup seam below is where that read would go.
 */
object MatchRegistry {

  sealed trait IndexRef extends Serializable
  /** The documents-table convention: `dir` holds documents.parquet and
    * the index is ensure-built/reopened by SearchOps.docEngine. */
  final case class DocsTable(dir: String) extends IndexRef
  /** A committed index root the caller built themselves (IndexBuilder
    * over their own corpus mapping). Never built on first use — an
    * unbuilt root fails loudly at execution. */
  final case class IndexRoot(root: String) extends IndexRef

  final case class Entry(tablePath: String, contentCol: String,
                         keyMap: Seq[(String, String)], index: IndexRef)

  /** docmeta columns a keyMap may target, with their types — the table
    * side of each pair must match exactly or the rewrite declines. */
  val MetaColTypes: Map[String, DataType] = Map(
    "tableId" -> LongType, "repo" -> StringType, "path" -> StringType,
    "commit" -> StringType, "lang" -> StringType)

  private val entries =
    scala.collection.concurrent.TrieMap.empty[String, Entry]

  def normalize(p: String): String =
    p.stripPrefix("file:").stripSuffix("/")

  /** Register `tablePath` (a parquet root) as index-served. Validates
    * the keyMap targets driver-side; the index itself is only opened at
    * query execution (registration must stay metadata-only). */
  def register(tablePath: String, contentCol: String,
               keyMap: Seq[(String, String)], index: IndexRef): Unit = {
    require(keyMap.nonEmpty, "match registration needs at least one join key")
    keyMap.foreach { case (_, m) =>
      require(MetaColTypes.contains(m),
        s"'$m' is not a joinable docmeta column " +
          s"(one of ${MetaColTypes.keys.mkString(", ")})")
    }
    entries.put(normalize(tablePath),
      Entry(normalize(tablePath), contentCol, keyMap, index))
  }

  def unregister(tablePath: String): Unit =
    entries.remove(normalize(tablePath))

  /** Resolve a relation root path: explicit registrations win; the
    * documents.parquet convention is the fallback. Schema validation
    * (does the relation actually carry the declared columns with the
    * declared types) happens in the rewrite, which can see the plan. */
  def lookup(fsPath: String): Option[Entry] = {
    val p = normalize(fsPath)
    entries.get(p).orElse {
      if (p.endsWith("/documents.parquet"))
        Some(Entry(p, "text", Seq("doc_id" -> "tableId"),
          DocsTable(p.stripSuffix("/documents.parquet"))))
      else None
    }
  }
}

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
 * Registrations are per-JVM by default (like `spark.experimental`
 * itself). For durability across JVMs — the catalog-table-properties
 * analogue this sandbox has no real catalog for — set
 * `-Dgraft.match.registry=FILE`: `registerPersistent` then writes the
 * full registration set to FILE (atomic temp+move, TSV — one line per
 * table, dependency-free), and the first `lookup` of a JVM merges the
 * file in (live `register` calls made before the merge win). A
 * malformed file line fails parsing loudly; the optimizer rule's
 * never-fail invariant turns that into a logged row-level fallback per
 * query, so results stay correct and the breakage stays visible.
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

  private def validated(tablePath: String, contentCol: String,
                        keyMap: Seq[(String, String)], index: IndexRef): Entry = {
    require(keyMap.nonEmpty, "match registration needs at least one join key")
    keyMap.foreach { case (_, m) =>
      require(MetaColTypes.contains(m),
        s"'$m' is not a joinable docmeta column " +
          s"(one of ${MetaColTypes.keys.mkString(", ")})")
    }
    Entry(normalize(tablePath), contentCol, keyMap, index)
  }

  /** Register `tablePath` (a parquet root) as index-served. Validates
    * the keyMap targets driver-side; the index itself is only opened at
    * query execution (registration must stay metadata-only). */
  def register(tablePath: String, contentCol: String,
               keyMap: Seq[(String, String)], index: IndexRef): Unit = {
    val e = validated(tablePath, contentCol, keyMap, index)
    entries.put(e.tablePath, e)
  }

  def unregister(tablePath: String): Unit =
    entries.remove(normalize(tablePath))

  // ---- optional file durability (-Dgraft.match.registry=FILE) ----

  val RegistryProp = "graft.match.registry"

  /** Which prop value the file merge last ran for; `None` = never. */
  @volatile private var loadedFor: Option[Option[String]] = None

  /** `register` + rewrite FILE with the full current registration set
    * (atomic temp+move). Requires `-Dgraft.match.registry=FILE`. */
  def registerPersistent(tablePath: String, contentCol: String,
                         keyMap: Seq[(String, String)], index: IndexRef): Unit =
    synchronized {
      ensureLoaded()
      register(tablePath, contentCol, keyMap, index)
      persist()
    }

  /** `unregister` + rewrite FILE without the entry. */
  def unregisterPersistent(tablePath: String): Unit = synchronized {
    ensureLoaded()
    unregister(tablePath)
    persist()
  }

  /** Test hook: forget in-memory registrations AND the loaded-file
    * memo, so the next lookup re-merges whatever the prop names. */
  private[graft] def resetForTest(): Unit = synchronized {
    entries.clear()
    loadedFor = None
  }

  private def registryFile(): java.nio.file.Path = {
    val f = sys.props.getOrElse(RegistryProp, throw new IllegalStateException(
      s"persistent match registration needs -D$RegistryProp=FILE"))
    java.nio.file.Paths.get(f)
  }

  private def persist(): Unit = {
    import java.nio.file.{Files, StandardCopyOption}
    val path = registryFile()
    Option(path.getParent).foreach(Files.createDirectories(_))
    val body = entries.values.toSeq.sortBy(_.tablePath)
      .map(serialize).mkString("", "\n", "\n")
    val tmp = path.resolveSibling(path.getFileName.toString + ".tmp")
    Files.write(tmp, body.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    Files.move(tmp, path, StandardCopyOption.REPLACE_EXISTING,
      StandardCopyOption.ATOMIC_MOVE)
  }

  private def serialize(e: Entry): String = {
    val (kind, ref) = e.index match {
      case DocsTable(dir) => ("docs", dir)
      case IndexRoot(root) => ("root", root)
    }
    val fields = Seq(e.tablePath, e.contentCol,
      e.keyMap.map { case (t, m) => s"$t=$m" }.mkString(","), kind, ref)
    fields.foreach(f => require(!f.exists(c => c == '\t' || c == '\n'),
      s"match-registry field may not contain tab/newline: '$f'"))
    fields.mkString("\t")
  }

  private def parseLine(ln: String): Entry = {
    val f = ln.split("\t", -1)
    require(f.length == 5,
      s"malformed match-registry line (${f.length} fields, expected 5): $ln")
    val keyMap = f(2).split(",", -1).toSeq.map { kv =>
      val i = kv.indexOf('=')
      require(i > 0, s"malformed match-registry keyMap entry '$kv' in: $ln")
      kv.substring(0, i) -> kv.substring(i + 1)
    }
    val idx = f(3) match {
      case "docs" => DocsTable(f(4))
      case "root" => IndexRoot(f(4))
      case other => throw new IllegalArgumentException(
        s"unknown match-registry index kind '$other' in: $ln")
    }
    validated(f(0), f(1), keyMap, idx)
  }

  /** Merge FILE into the live map, once per (JVM, prop value). Live
    * registrations made before the merge win over file entries. */
  private def ensureLoaded(): Unit = {
    val p = sys.props.get(RegistryProp)
    if (!loadedFor.contains(p)) synchronized {
      if (!loadedFor.contains(p)) {
        p.foreach { f =>
          val path = java.nio.file.Paths.get(f)
          if (java.nio.file.Files.exists(path)) {
            java.nio.file.Files.readAllLines(path).forEach { ln =>
              if (ln.nonEmpty) {
                val e = parseLine(ln)
                entries.putIfAbsent(e.tablePath, e)
              }
            }
          }
        }
        loadedFor = Some(p)
      }
    }
  }

  /** Resolve a relation root path: explicit registrations win; the
    * documents.parquet convention is the fallback. Schema validation
    * (does the relation actually carry the declared columns with the
    * declared types) happens in the rewrite, which can see the plan. */
  def lookup(fsPath: String): Option[Entry] = {
    ensureLoaded()
    val p = normalize(fsPath)
    entries.get(p).orElse {
      if (p.endsWith("/documents.parquet"))
        Some(Entry(p, "text", Seq("doc_id" -> "tableId"),
          DocsTable(p.stripSuffix("/documents.parquet"))))
      else None
    }
  }

  /** Resolve a relation's FULL root-path set — the shape a real lake
    * table takes: a Hive-partitioned corpus read as
    * `root/lang=scala, root/lang=python, ...` (or any subdirectory read)
    * surfaces several rootPaths, none equal to the registered table
    * path. An explicit registration of the COMMON ROOT covers them: the
    * entry whose tablePath is a path-prefix of EVERY root wins (longest
    * prefix on ties — nested registrations resolve to the nearest
    * table). Correctness under a partial read (some partitions only) is
    * free: the semi-join only FILTERS scanned rows, and the keyMap
    * uniqueness contract makes per-row membership independent of which
    * sibling partitions are scanned. The documents.parquet convention
    * stays exact-single-path (its shape guard needs the one file). */
  def lookupCovering(fsPaths: Seq[String]): Option[Entry] = {
    ensureLoaded()
    val ps = fsPaths.map(normalize)
    if (ps.isEmpty) return None
    val exact = if (ps.sizeIs == 1) lookup(ps.head) else None
    exact.orElse {
      entries.values.toSeq
        .filter(e => ps.forall(p =>
          p == e.tablePath || p.startsWith(e.tablePath + "/")))
        .sortBy(-_.tablePath.length).headOption
    }
  }
}

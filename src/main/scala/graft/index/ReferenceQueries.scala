package graft.index

/** The frozen reference query set (FIXTURES.md §1 `queries.tsv`): scored
  * by both the Spark engine and the in-memory oracle; parity =
  * rank-identical docIDs + scores. Mix of hot code keywords (skew path),
  * camelCase/snake identifiers (analyzer path), multi-term and boolean
  * ("spaces are ANDs commas are ORs", /root/reference/sentiment.py:638-641)
  * shapes. */
object ReferenceQueries {
  /** (qid, query, k, kind: ""|"bool"|"phrase") from the frozen TSV. */
  lazy val entries: Seq[(Int, String, Int, String)] = {
    val in = getClass.getResourceAsStream("/graft/queries.tsv")
    val src = scala.io.Source.fromInputStream(in, "UTF-8")
    try src.getLines().filter(_.nonEmpty).map { line =>
      val f = line.split('\t')
      (f(0).toInt, f(1), f(2).toInt,
        if (f.length > 3) f(3) else "")
    }.toList
    finally src.close()
  }

  val all: Seq[String] = entries.filter(_._4 == "").map(_._2)
  val boolQueries: Seq[String] = entries.filter(_._4 == "bool").map(_._2)
  /** Quoted-span queries (ES match_phrase analogue) — run through the
    * boolean path; positional constraints filter the AND groups. */
  val phraseQueries: Seq[String] = entries.filter(_._4 == "phrase").map(_._2)
  /** Trailing-wildcard queries (the Kibana query_string analogue,
    * /root/reference/export.json:9): `prefix` kind runs the SCORED
    * disjunctive path (capped top-terms expansion), `boolprefix` the
    * boolean path (uncapped filter-context expansion). New kinds so the
    * pre-existing latency populations stay frozen across rounds. */
  val prefixQueries: Seq[String] = entries.filter(_._4 == "prefix").map(_._2)
  val boolPrefixQueries: Seq[String] =
    entries.filter(_._4 == "boolprefix").map(_._2)
  /** Negation queries (the ES query_string `-` / must_not operator) —
    * boolean path; prohibited terms/prefixes/phrases EXCLUDE docs,
    * never score. Own kind, same reason as above. */
  val negQueries: Seq[String] = entries.filter(_._4 == "boolneg").map(_._2)
  /** Fuzzy queries (`term~n`, the ES query_string fuzzy operator):
    * `fuzzy` kind runs the SCORED path (capped ranked expansion),
    * `boolfuzzy` the boolean path (uncapped filter-context expansion,
    * incl. negated fuzzies). Own kinds, same reason as above. */
  val fuzzyQueries: Seq[String] = entries.filter(_._4 == "fuzzy").map(_._2)
  val boolFuzzyQueries: Seq[String] =
    entries.filter(_._4 == "boolfuzzy").map(_._2)
  val topK = 10
}

package graft

import graft.ops.Lexicon
import org.scalatest.funsuite.AnyFunSuite

/** The vendored-lexicon seam: the published vader_lexicon.txt file
  * format parses, and a file pointed at by -Dgraft.vader.lexicon
  * actually replaces the built-in subset in a fresh JVM (forked here,
  * since `Lexicon.Entries` freezes at class load by design — the SQL
  * oracle maps and the native scorer must agree on one lexicon for the
  * whole session). */
class LexiconSeamSpec extends AnyFunSuite {

  test("parses the published vader_lexicon.txt TSV format") {
    // real rows carry token \t mean \t stddev \t ratings-list; comments
    // and blanks are skipped; a quote-bearing emoticon token survives
    val lines = Seq(
      "# comment",
      "",
      "good\t1.9\t0.82462\t[2, 1, 3, 1, 2, 2, 2, 1, 2, 3]",
      ":'(\t-2.2\t0.4\t[-2, -2, -3]",
      "terrible\t-2.1",
      "#happy\t1.5\t0.6\t[1, 2]",
      // comment/header lines that HAPPEN to parse as token\tdouble must
      // still be skipped ('#' + whitespace marks them) — '# revised'
      // -> 2014.0 would otherwise silently join the lexicon
      "# revised\t2014",
      "#\t2.0",
      "notanumber\tNaNopE\tx").iterator
    val es = Lexicon.parseVendoredTsv(lines)
    // hashtag TOKENS are entries (extended VADER lexicons carry them);
    // comment lines ('#' + whitespace) and non-parsing lines are skipped
    assert(es == Seq("good" -> 1.9, ":'(" -> -2.2, "terrible" -> -2.1,
      "#happy" -> 1.5))
    // the quote-escaped SQL literal helper round-trips such tokens
    assert(Lexicon.duckMapSql.nonEmpty) // built without throwing
  }

  test("a vendored file replaces the built-in lexicon in a fresh JVM (end-to-end)") {
    val tsv = java.nio.file.Files.createTempFile("vaderlex", ".txt")
    // a token the built-in subset cannot know (repeated — dict
    // semantics: LAST wins), a DomainFixture collision (fixture wins,
    // applied after the vendored file), and a published-format row
    java.nio.file.Files.writeString(tsv,
      "# vendored\nzorgtastic\t1.0\nzorgtastic\t3.4\t0.5\t[3, 4]\n" +
        "fast\t9.9\nawful\t-2.0\n")
    val javaBin = s"${sys.props("java.home")}/bin/java"
    val cp = sys.props("java.class.path")
    def probe(args: Seq[String], withLex: Boolean): Seq[String] = {
      val cmd = Seq(javaBin, "-cp", cp) ++
        (if (withLex) Seq(s"-Dgraft.vader.lexicon=$tsv") else Nil) ++
        Seq("graft.tools.LexiconProbe") ++ args
      val out = new StringBuilder
      val p = new ProcessBuilder(cmd: _*).redirectErrorStream(true).start()
      val src = scala.io.Source.fromInputStream(p.getInputStream)
      try src.getLines().foreach(l => out.append(l).append('\n'))
      finally src.close()
      assert(p.waitFor() == 0, s"probe exit != 0:\n$out")
      out.toString.linesIterator.toSeq
    }
    // with the vendored file: 3 unique vendored tokens + the fixture
    // minus the 'fast' collision (keys UNIQUE — a duplicate would break
    // the DuckDB map literal); the unknown-to-builtin token scores its
    // LAST vendored valence (dict semantics)
    val swapped = probe(Seq("zorgtastic"), withLex = true)
    assert(swapped.exists(_ ==
      s"LEXICON_ENTRIES=${3 + Lexicon.DomainFixture.size - 1}"), swapped)
    assert(swapped.contains("LEXICON_X=3.4"), swapped)
    // the DomainFixture override (applied after the vendored file) wins
    assert(probe(Seq("fast"), withLex = true).contains("LEXICON_X=1.8"))
    // without it: the built-in subset; the token is unknown (x = 0)
    val builtin = probe(Seq("zorgtastic"), withLex = false)
    assert(builtin.exists(_ ==
      s"LEXICON_ENTRIES=${Lexicon.Published.size + Lexicon.DomainFixture.size}"),
      builtin)
    assert(builtin.contains("LEXICON_X=0.0"), builtin)
    // a zero-entry vendored file fails LOUDLY, never silently empty
    val empty = java.nio.file.Files.createTempFile("vaderlex-empty", ".txt")
    java.nio.file.Files.writeString(empty, "# nothing here\n")
    val cmd = Seq(javaBin, "-cp", cp, s"-Dgraft.vader.lexicon=$empty",
      "graft.tools.LexiconProbe")
    val p = new ProcessBuilder(cmd: _*).redirectErrorStream(true).start()
    assert(p.waitFor() != 0, "empty vendored lexicon must abort")
  }
}

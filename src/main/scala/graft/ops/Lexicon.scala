package graft.ops

/**
 * Sentiment lexicon for the U1/U2 scorers (SURVEY.md §2.4).
 *
 * `Published` carries a subset of the VADER lexicon (Hutto & Gilbert,
 * ICWSM 2014 — public domain/MIT) with valences on its [-4, 4] scale, to
 * the precision recalled here; the full ~7.5k-entry file is not vendored
 * in this zero-egress sandbox, so this is an explicitly partial subset
 * behind a single seam (swap `entries` for the full file in production).
 * `DomainFixture` extends it with this corpus's synthetic vocabulary
 * (the driver testdata is 31 database words — a real-word-only lexicon
 * would be degenerate on it), clearly separated and documented.
 *
 * `Negators` and the damping constants are the published VADER rules we
 * implement: a valenced token preceded within 3 tokens by a negator is
 * scaled by N_SCALAR = -0.74 (VADER) / -0.5 (TextBlob-style mean path).
 * Boosters, ALL-CAPS and punctuation amplification are NOT implemented
 * (documented subset).
 */
object Lexicon {

  val Published: Seq[(String, Double)] = Seq(
    "good" -> 1.9, "great" -> 3.1, "excellent" -> 2.7, "amazing" -> 2.8,
    "awesome" -> 3.1, "love" -> 3.2, "like" -> 1.5, "happy" -> 2.7,
    "best" -> 3.2, "nice" -> 1.8, "win" -> 2.8, "wow" -> 2.8,
    "better" -> 1.9, "improved" -> 2.0, "perfect" -> 2.7, "clean" -> 1.7,
    "bad" -> -2.5, "terrible" -> -2.1, "awful" -> -2.0, "horrible" -> -2.5,
    "hate" -> -2.7, "worst" -> -3.1, "sad" -> -2.1, "fail" -> -2.5,
    "failed" -> -2.3, "problem" -> -1.7, "broken" -> -2.0, "badly" -> -2.5,
    "worse" -> -2.1, "bug" -> -1.9, "crash" -> -2.2, "wrong" -> -2.1)

  /** Synthetic-corpus extension (testdata vocabulary; fixture values). */
  val DomainFixture: Seq[(String, Double)] = Seq(
    "fast" -> 1.8, "small" -> 1.2, "slow" -> -1.8, "big" -> -1.2,
    "dup" -> -1.5)

  val Entries: Seq[(String, Double)] = Published ++ DomainFixture
  val Words: Seq[String] = Entries.map(_._1)
  val Valences: Seq[Double] = Entries.map(_._2)

  /** VADER NEGATE subset (published list, lowercased). */
  val Negators: Seq[String] = Seq(
    "not", "no", "never", "neither", "nor", "cannot", "cant", "dont",
    "doesnt", "didnt", "isnt", "wasnt", "wont", "without")

  /** Published VADER negation damping. */
  val VaderNegScalar = -0.74
  /** TextBlob/pattern-style negation factor for the mean-polarity path. */
  val TbNegScalar = -0.5
  /** How many preceding tokens a negator can reach (VADER window). */
  val NegWindow = 3

  /** DuckDB literal map of the lexicon (same order as Entries). */
  def duckMapSql: String =
    s"map([${Words.map(w => s"'$w'").mkString(", ")}], " +
      s"[${Valences.mkString(", ")}]::DOUBLE[])"

  def duckNegatorsSql: String = Negators.map(w => s"'$w'").mkString("(", ", ", ")")
}

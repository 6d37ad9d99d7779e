package graft.tools

import graft.functions.SentimentHelper
import graft.ops.Lexicon
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.unsafe.types.UTF8String

/** Seam probe for the vendored-lexicon swap (LexiconSeamSpec forks this
  * in a fresh JVM with -Dgraft.vader.lexicon=<tsv>): prints the loaded
  * entry count and the raw VADER x for a single-token text, proving the
  * swapped file reaches the native scorer — no Spark session needed. */
object LexiconProbe {
  def main(args: Array[String]): Unit = {
    println(s"LEXICON_ENTRIES=${Lexicon.Entries.size}")
    val word = args.headOption.getOrElse("good")
    val row = SentimentHelper.score(
      ArrayData.toArrayData(Array(UTF8String.fromString(word))))
    println(s"LEXICON_X=${row.getDouble(1)}")
  }
}

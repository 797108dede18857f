package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-stage operators: tokenize / clean / stopword-filter / vocab-join.
  *
  * Re-expresses the reference's mapper-side token pipeline
  * (`sources/1.1/source/task1_1.java:50-59,75-86`) as pure Catalyst column
  * expressions — whitespace `StringTokenizer` → `split`, char-strip regex →
  * `regexp_replace`, stopword set membership → broadcast left-anti join,
  * vocabulary `HashMap` lookup → broadcast inner join. Everything stays
  * inside whole-stage codegen; no UDFs.
  */
object TextOps {

  /** Charset stripped by the reference (`task1_1.java:75-81`):
    * `~!@#$%^&*()\-+[]"':.,<>` — note the literal backslash: the reference
    * `Pattern.quote`s a string whose escape backslashes thereby become
    * *member characters* of the class. Then lowercased.
    */
  val CleanRegex = "[~!@#$%^&*()\\\\\\-+\\[\\]\"':.,<>]"

  def clean(c: Column): Column = lower(regexp_replace(c, CleanRegex, ""))

  /** Whitespace tokenization (P1). Empty tokens dropped — `StringTokenizer`
    * never yields empties, so neither do we. `array_remove` is the codegen
    * form of `filter(_, t => t =!= "")` (split yields no nulls, so the two
    * are identical — and higher-order functions evaluate interpreted, on
    * the hottest path in the engine).
    */
  def tokens(text: Column): Column =
    array_remove(split(text, "\\s+"), "")

  /** text column → one row per (original row, token). */
  def explodeTokens(df: DataFrame, textCol: String, tokenCol: String = "token"): DataFrame =
    df.withColumn(tokenCol, explode(tokens(col(textCol)))).drop(textCol)

  /** Tokenize + clean + drop empties. The reference order is tokenize the
    * raw line first, then strip chars per token (`task1_1.java:50-59`) —
    * but the stripped charset contains no whitespace, so cleaning cannot
    * create, destroy, or merge token boundaries, and clean-then-tokenize
    * produces the IDENTICAL token sequence (a token cleaning to "" is
    * dropped either way, mirroring `HandleWord` returning 0; the 1.1
    * byte-golden spec pins the equivalence). Cleaning the whole text
    * first keeps the pipeline in codegen — the per-token form needs
    * `transform`+`filter` lambdas, which evaluate interpreted.
    */
  def cleanTokens(text: Column): Column =
    tokens(clean(text))

  /** Stopword filter (P3/J2) as a broadcast anti-join. `stop` must be a
    * 1-column DataFrame of stopwords; small by construction → broadcast.
    */
  def removeStopwords(tokens: DataFrame, tokenCol: String, stop: DataFrame): DataFrame = {
    val stopCol = stop.columns.head
    tokens.join(broadcast(stop.withColumnRenamed(stopCol, tokenCol)), Seq(tokenCol), "left_anti")
  }

  /** Vocabulary lookup (P4/J1) as a broadcast inner join: unknown tokens are
    * dropped, known tokens gain the dictionary's id column.
    */
  def vocabJoin(tokens: DataFrame, tokenCol: String, vocab: DataFrame, termCol: String): DataFrame =
    tokens.join(broadcast(vocab.withColumnRenamed(termCol, tokenCol)), Seq(tokenCol), "inner")
}

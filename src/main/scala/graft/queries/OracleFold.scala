package graft.queries

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Cross-engine SQL for the house rolling hash, folding UTF-8 BYTES —
  * the exact arithmetic of [[graft.functions.RollingHash]]
  * (`h ← (h·31 + byte) mod 1e9+7` over the string's UTF-8 bytes) —
  * plus the multilingual fixture that certifies it off-ASCII.
  *
  * DuckDB has no direct blob→byte-list primitive, so the oracle
  * expands each character's code point (`ascii(c)` is the code point
  * in DuckDB, not just 0–127) into its 1–4 UTF-8 bytes arithmetically
  * and folds the flattened byte list. This replaced the previous
  * `ascii(c)` code-point fold, which agreed with the engine only on
  * pure-ASCII corpora: the byte expansion agrees on EVERY string, so
  * the manifest / shuffle / split / sampling family is hash-certified
  * on multilingual data (composed and decomposed forms, 2-, 3- and
  * 4-byte sequences — see [[mlDocsSql]]/[[augmentDocs]]).
  */
object OracleFold {

  /** DuckDB list of the UTF-8 byte values (BIGINT, 0–255) of a VARCHAR
    * expression: per character, the standard code-point→byte layout
    * (1 byte < 0x80, 2 < 0x800, 3 < 0x10000, else 4), flattened in
    * order. An empty string folds to the same `0` on both engines
    * (DuckDB splits '' into [''] and `ascii('') = 0` emits a single
    * zero byte — and `(0·31 + 0) mod M = 0` matches the engine's
    * empty fold).
    */
  def utf8BytesSql(expr: String): String =
    s"""flatten(list_transform(regexp_split_to_array($expr, ''), c -> (
       |  CASE WHEN ascii(c) < 128 THEN [CAST(ascii(c) AS BIGINT)]
       |    WHEN ascii(c) < 2048 THEN [CAST(192 + ascii(c) // 64 AS BIGINT),
       |      CAST(128 + ascii(c) % 64 AS BIGINT)]
       |    WHEN ascii(c) < 65536 THEN [CAST(224 + ascii(c) // 4096 AS BIGINT),
       |      CAST(128 + (ascii(c) // 64) % 64 AS BIGINT),
       |      CAST(128 + ascii(c) % 64 AS BIGINT)]
       |    ELSE [CAST(240 + ascii(c) // 262144 AS BIGINT),
       |      CAST(128 + (ascii(c) // 4096) % 64 AS BIGINT),
       |      CAST(128 + (ascii(c) // 64) % 64 AS BIGINT),
       |      CAST(128 + ascii(c) % 64 AS BIGINT)] END)))""".stripMargin

  /** DuckDB replay of `rolling_hash(expr)` — byte-exact vs the engine
    * on ANY string, ASCII or not.
    */
  def rollingHashSql(expr: String): String =
    s"""list_reduce(list_prepend(CAST(0 AS BIGINT),
       |  ${utf8BytesSql(expr)}),
       |  (acc, x) -> (acc * 31 + x) % 1000000007)""".stripMargin

  /** The multilingual fixture suffixes, cycled by `doc_id % 4`: a
    * composed é (2-byte), the DECOMPOSED e + U+0301 form of the same
    * word (so byte-identity vs code-point-identity is distinguishable),
    * €中文 (3-byte), and an emoji (4-byte, above the BMP). Appending
    * them to the ASCII testdata text makes every hash-keyed contract
    * (manifest fingerprint, deterministic split/shuffle/sample) run on
    * genuinely multilingual bytes on both engines.
    */
  val mlSuffixes: Seq[String] = Seq(
    " caf\u00e9",          // composed e-acute (2-byte UTF-8)
    " cafe\u0301",         // DECOMPOSED e + COMBINING ACUTE (NFC-distinct bytes)
    " \u20ac\u4e2d\u6587",  // euro sign + CJK (3-byte sequences)
    " \ud83d\ude00")        // U+1F600 emoji (4-byte, above the BMP)

  /** DuckDB derived table: `documents` with the multilingual suffix
    * appended — use as `FROM ($mlDocsSql) documents`. chr() codepoints
    * keep the oracle SQL pure-ASCII source text.
    */
  val mlDocsSql: String =
    """SELECT doc_id, lang, source, n_chars,
      |  text || CASE CAST(doc_id % 4 AS INT)
      |    WHEN 0 THEN ' caf' || chr(233)
      |    WHEN 1 THEN ' cafe' || chr(769)
      |    WHEN 2 THEN ' ' || chr(8364) || chr(20013) || chr(25991)
      |    ELSE ' ' || chr(128512) END AS text
      |FROM documents""".stripMargin

  /** Spark side of [[mlDocsSql]] — the identical augmentation of a
    * documents frame.
    */
  def augmentDocs(docs: DataFrame): DataFrame =
    docs.withColumn("text", concat(col("text"),
      element_at(array(mlSuffixes.map(lit): _*),
        (pmod(col("doc_id"), lit(4)) + 1).cast("int"))))
}

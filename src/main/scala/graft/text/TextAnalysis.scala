package graft.text

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Text-analysis operators for training-data pipelines: language
  * identification (marker-word voting), quality scoring (length / punct /
  * stopword ratios), token counting (whitespace + BPE-ish regex), and
  * document fingerprinting (position-weighted rolling-style hash).
  *
  * All pure Catalyst expressions; each operator is a single narrow pass
  * over the text column (no shuffle except the lang-ID vote aggregation).
  */
object TextAnalysis {

  /** The marker stopword list the declared quality queries AND the SQL
    * `quality_filter` TVF share — ONE definition (round-19 review: two
    * identical private literals could drift and silently break the
    * TVF's oracle parity). A full stop list belongs in a broadcast join
    * (`TextOps.removeStopwords`), not a literal.
    */
  val MarkerStopwords: Seq[String] = Seq("the", "a", "of", "and", "to", "in")

  /** Tiny embedded marker lexicon: (lang, marker word). A real deployment
    * would broadcast a proper lexicon table; the operator shape (explode →
    * broadcast join → vote → arg_max) is the same.
    */
  val markerLexicon: Seq[(String, String)] = Seq(
    "en" -> "the", "en" -> "a", "en" -> "of", "en" -> "and",
    "es" -> "el", "es" -> "la", "es" -> "de", "es" -> "y",
    "fr" -> "le", "fr" -> "la", "fr" -> "de", "fr" -> "et",
    "de" -> "der", "de" -> "die", "de" -> "und", "de" -> "das",
    "zh" -> "de", "zh" -> "shi", "zh" -> "le", "zh" -> "bu")

  /** Language ID by marker-word voting: explode tokens, broadcast-join the
    * lexicon, count votes per (doc, lang), arg_max with deterministic
    * tiebreak. Docs with zero marker hits get lang 'und'.
    */
  def languageId(spark: SparkSession, docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    import spark.implicits._
    val lexicon = markerLexicon.toDF("cand_lang", "marker")
    val votes = docs
      .select(col(idCol), explode(TextOps.tokens(col(textCol))).as("marker"))
      .join(broadcast(lexicon), "marker")
      .groupBy(idCol, "cand_lang")
      .agg(count(lit(1)).as("votes"))
      .groupBy(idCol)
      // deterministic argmax: most votes, ties broken by last lang in
      // lexicographic order (struct max is total and engine-portable)
      .agg(max(struct(col("votes"), col("cand_lang"))).as("top"))
      .select(col(idCol), col("top.cand_lang").as("pred_lang"), col("top.votes").as("votes"))
    docs.select(col(idCol))
      .join(votes, Seq(idCol), "left")
      .select(col(idCol), coalesce(col("pred_lang"), lit("und")).as("pred_lang"),
        coalesce(col("votes"), lit(0L)).as("votes"))
  }

  /** Whitespace token count (empty-safe). */
  def tokenCount(text: Column): Column = size(TextOps.tokens(text))

  /** BPE-ish subword count: letter-runs, digit-runs, and single punctuation
    * marks — the usual pre-tokenizer regex family. Uses regexp_extract_all
    * (RE2-compatible pattern, no lookaround) so the oracle can mirror it.
    * This is the cheap one-pass ESTIMATE; true learned-subword counts come
    * from [[Bpe]] (merge-table induction + apply, `tp_bpe_*`).
    */
  def subwordCount(text: Column): Column =
    size(regexp_extract_all(text, lit("[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\\s]"), lit(0)))

  /** Quality-score feature bundle. `stopwords` small list → array literal.
    * The token array and its size are materialized as their own
    * projections first: the six feature expressions read them repeatedly,
    * and inline computed columns would re-tokenize the text per read.
    */
  def qualityFeatures(docs: DataFrame, idCol: String, textCol: String,
                      stopwords: Seq[String]): DataFrame = {
    val text = col(textCol)
    val toks = col("__toks")
    val nToks = col("__n")
    // stopword token count (WITH duplicates) via the native codegen
    // `count_in_set` kernel: one pass over the tokens, |list| compares
    // per token, no allocation. The `filter(toks, array_contains)` HOF
    // computes the same but interpreted + a filtered-array allocation
    // per row, and a Σ-of-array_remove expansion re-evaluates under
    // predicate inlining (measured 5x on the composed cleaning query).
    // Marker lists are a handful of words; a full 300-word stop list
    // belongs in a broadcast join (TextOps.removeStopwords).
    val stopCount: Column =
      graft.functions.TextExprs.countInSet(toks, array(stopwords.map(lit): _*))
        .cast("double")
    docs
      .select(col(idCol), text, TextOps.tokens(text).as("__toks"))
      .select(col(idCol), text, toks, size(toks).as("__n"))
      .select(
        col(idCol),
        length(text).as("n_chars"),
        nToks.as("n_tokens"),
        (length(text).cast("double") / nToks).as("chars_per_token"),
        (stopCount / nToks).as("stopword_ratio"),
        (length(regexp_replace(text, "[a-zA-Z0-9\\s]", "")).cast("double") / length(text))
          .as("punct_ratio"),
        (size(array_distinct(toks)).cast("double") / nToks).as("distinct_token_ratio"))
  }

  /** Position-weighted document fingerprint: Σ (pos+1) · charsum(token)
    * mod 2^31-1, where charsum = Σ ascii codes. Order-sensitive (swapping
    * two tokens changes it) yet expressible as a plain SUM, so it
    * distributes and is oracle-checkable. The stronger rolling Rabin-Karp
    * variant is [[graft.functions.RollingHash]] (native expression, also a
    * registered SQL function `rolling_hash`).
    */
  def fingerprint(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val toks = docs.select(col(idCol),
      posexplode(TextOps.tokens(col(textCol))).as(Seq("pos", "tok")))
    toks
      // native code-point sum: the aggregate(split(tok,''), acc+ascii)
      // form computes the same value but interpreted, allocating a
      // one-char-string array per token
      .withColumn("charsum", graft.functions.TextExprs.charCodeSum(col("tok")))
      .groupBy(idCol)
      .agg(pmod(sum((col("pos") + 1) * col("charsum")), lit(2147483647L)).as("fingerprint"),
        count(lit(1)).as("n_tokens"))
  }

  /** Repetition quality signal: the most frequent bigram's share of all
    * bigrams per document (boilerplate / degenerate generations repeat
    * n-grams; a high share flags them). Bigrams are built with
    * posexplode + a lead window — the same codegen shape as
    * [[graft.dedup.Dedup.shingles]] with n=2: a `zip_with` over two
    * shifted slices reads tidier but higher-order functions evaluate
    * INTERPRETED over the full token stream (~6x on this hot path).
    * Documents with <2 tokens get `n_bigrams = 0` and a null ratio.
    */
  def repetitionRatio(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val toksPos = docs.select(col(idCol),
      posexplode(TextOps.tokens(col(textCol))).as(Seq("pos", "tok")))
    val w = Window.partitionBy(idCol).orderBy("pos")
    val counts = toksPos
      .withColumn("__next", lead("tok", 1).over(w))
      .filter(col("__next").isNotNull) // last token starts no bigram
      .select(col(idCol), concat_ws(" ", col("tok"), col("__next")).as("bigram"))
      .groupBy(idCol, "bigram").agg(count(lit(1)).as("c"))
      .groupBy(idCol)
      .agg(max("c").as("top_bigram_freq"), sum("c").as("n_bigrams"))
    docs.select(col(idCol)).join(counts, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("n_bigrams"), lit(0L)).as("n_bigrams"),
        coalesce(col("top_bigram_freq"), lit(0L)).as("top_bigram_freq"),
        (col("top_bigram_freq") / col("n_bigrams")).as("repetition_ratio"))
  }

  /** Sentence statistics — the Gopher/C4-family quality signals built on
    * sentence segmentation: per document, the sentence count and the
    * mean/max sentence length in tokens (too-few or degenerate-length
    * sentences flag boilerplate, lists, and OCR noise). Segmentation is
    * a terminal-punctuation split (`[.!?]+`) — codegen `split` +
    * `explode`, one shuffle on the doc id; a doc with no terminal
    * punctuation is one sentence. Docs with no tokens at all get
    * `n_sentences = 0` and a null mean.
    */
  def sentenceStats(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val sents = docs
      .select(col(idCol), explode(split(col(textCol), "[.!?]+")).as("__sent"))
      .withColumn("__n_toks", size(TextOps.tokens(col("__sent"))))
      .filter(col("__n_toks") > 0) // whitespace-only fragments segment nothing
    docs.select(col(idCol))
      .join(sents.groupBy(idCol).agg(
          count(lit(1)).as("n_sentences"),
          avg("__n_toks").as("avg_sentence_tokens"),
          max("__n_toks").as("max_sentence_tokens")),
        Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("n_sentences"), lit(0L)).as("n_sentences"),
        col("avg_sentence_tokens"),
        coalesce(col("max_sentence_tokens"), lit(0)).as("max_sentence_tokens"))
  }

  /** Sentence-boundary chunking — the context-window prep that respects
    * sentence structure: sentences (terminal-punctuation split, token-
    * normalized) are binned into ~`budgetTokens` chunks by their token
    * prefix sum — a sentence opens chunk `floor(tokens_before / budget)`,
    * so chunks never split a sentence (a single over-budget sentence
    * owns its chunk and may exceed the budget; the deterministic
    * prefix-binning rule replays identically in any engine, unlike
    * greedy next-fit, which needs sequential state). Returns one row per
    * (doc, chunk): sentence count, token count, and the rebuilt chunk
    * text. Plan: codegen split/posexplode, one prefix-sum window + one
    * aggregation on the doc id.
    */
  def chunkBySentences(docs: DataFrame, idCol: String, textCol: String,
                       budgetTokens: Int = 60): DataFrame = {
    val sents = docs
      .select(col(idCol), posexplode(split(col(textCol), "[.!?]+")).as(Seq("pos", "sent")))
      .withColumn("__toks", TextOps.tokens(col("sent")))
      .withColumn("__n_toks", size(col("__toks")))
      .filter(col("__n_toks") > 0)
      .withColumn("__sent_norm", concat_ws(" ", col("__toks")))
    val w = Window.partitionBy(idCol).orderBy("pos")
    sents
      .withColumn("__cum", sum("__n_toks").over(w))
      .withColumn("chunk_idx",
        floor((col("__cum") - col("__n_toks")) / lit(budgetTokens.toDouble)).cast("int"))
      .groupBy(col(idCol), col("chunk_idx"))
      .agg(count(lit(1)).as("n_sentences"),
        sum("__n_toks").as("n_tokens"),
        concat_ws(" ",
          array_sort(collect_list(struct(col("pos"), col("__sent_norm"))))
            .getField("__sent_norm")).as("chunk_text"))
  }

  /** Corpus-frequency unigram log-probability score — the "perplexity-ish"
    * quality filter: per document, the mean over its tokens of
    * `ln(corpus_freq(token) / corpus_total)`. Documents of rare/garbled
    * tokens score far below fluent text. Self-scored (the model IS the
    * corpus), so every token has freq >= 1 and no smoothing is needed.
    *
    * Scale shape: one token aggregation, one equi-join on token (shuffle
    * join — the vocabulary scales with the corpus, so no broadcast
    * assumption), one per-doc aggregation; the corpus total rides as a
    * broadcast single-row cross join. Tokenless docs get `n_tokens = 0`
    * and a null score.
    */
  def unigramLogProb(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val toks = docs.select(col(idCol), explode(TextOps.tokens(col(textCol))).as("tok"))
    val freqs = toks.groupBy("tok").agg(count(lit(1)).as("__freq"))
    val total = freqs.agg(sum("__freq").as("__total"))
    val scored = toks.join(freqs, "tok")
      .crossJoin(broadcast(total))
      .groupBy(idCol)
      .agg(count(lit(1)).as("n_tokens"),
        avg(log(col("__freq") / col("__total"))).as("avg_logprob"))
    docs.select(col(idCol)).join(scored, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("n_tokens"), lit(0L)).as("n_tokens"),
        col("avg_logprob"))
  }

  /** Bigram-LM average log-probability — the next quality signal up from
    * [[unigramLogProb]] (the CCNet-style fluency filter): per document,
    * the mean over its bigrams of `ln P(w | v)` under a corpus-trained
    * bigram model with Laplace smoothing over the corpus vocabulary,
    * `P(w | v) = (c(v,w) + 1) / (c(v) + |V|)`. Word-salad text that
    * passes a unigram filter (common words, nonsense order) scores far
    * below fluent text here.
    *
    * Scale shape: bigrams are built MAP-SIDE by zipping each token
    * array against its own tail — `arrays_zip` over two slices, a plain
    * codegen expression (NOT a zip_with lambda, which evaluates
    * interpreted per row and is banned from hot paths by PlanSpec's
    * fleet-wide net; and NOT the posexplode+lead window shape, whose
    * per-token doc-id sort shuffle dominated the 100x soak at 55 s vs
    * 22 s for the map form). The bigram count table is one
    * partial-aggregated shuffle on the pair key; the context count
    * `c(v)` is a second rollup over the already-contracted counts, never
    * another corpus pass; `|V|` rides as a broadcast single-row cross
    * join. Scoring equi-joins the doc bigram stream to the counts on the
    * pair key (shuffle join — the bigram table scales with the corpus,
    * no broadcast assumption) and contracts back to one row per doc.
    * Docs with fewer than two tokens get `n_bigrams = 0` and a null
    * score.
    */
  def bigramLogProb(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val withToks = docs.select(col(idCol), TextOps.tokens(col(textCol)).as("__toks"))
    val n1 = greatest(size(col("__toks")) - 1, lit(0))
    val bigrams = withToks
      .select(col(idCol),
        explode(arrays_zip(
          slice(col("__toks"), lit(1), n1),
          slice(col("__toks"), lit(2), n1))).as("__bg"))
      .select(col(idCol),
        col("__bg").getField("0").as("prev"),
        col("__bg").getField("1").as("cur"))
    val cnt = bigrams.groupBy("prev", "cur").agg(count(lit(1)).as("__c"))
    val ctx = cnt.groupBy("prev").agg(sum("__c").as("__cv"))
    val vocab = withToks.select(explode(col("__toks")).as("tok"))
      .agg(count_distinct(col("tok")).as("__vsz"))
    val scored = bigrams
      .join(cnt, Seq("prev", "cur"))
      .join(ctx, Seq("prev"))
      .crossJoin(broadcast(vocab))
      .groupBy(idCol)
      .agg(count(lit(1)).as("n_bigrams"),
        avg(log((col("__c") + lit(1.0)) / (col("__cv") + col("__vsz"))))
          .as("avg_logprob"))
    docs.select(col(idCol)).join(scored, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("n_bigrams"), lit(0L)).as("n_bigrams"),
        col("avg_logprob"))
  }

  /** PMI collocation mining (Church & Hanks 1990): top-k adjacent token
    * pairs by pointwise mutual information, with a minimum pair-count
    * floor (PMI without a floor surfaces hapax noise). pmi(a,b) =
    * ln( P(ab) / (P(a)·P(b)) ) with P(ab) over bigram positions and
    * P(·) over token positions — the phrase-mining signal a curation
    * pipeline uses to decide what to treat as a unit.
    *
    * Scale shape: bigrams build map-side (arrays_zip of two slices — no
    * posexplode/window, same as [[bigramLogProb]]); pair and unigram
    * counts contract BY CONTENT into vocab-bounded tables; the scoring
    * joins key on tokens; the two corpus totals ride as a broadcast
    * 1-row cross join; top-k is a TakeOrdered on the ROUNDED score
    * (engine-portable cut, ties broken on the pair itself).
    */
  def pmiBigrams(docs: DataFrame, textCol: String,
                 minCount: Long = 5L, topK: Int = 20): DataFrame = {
    val withToks = docs.select(TextOps.tokens(col(textCol)).as("__toks"))
    val n1 = greatest(size(col("__toks")) - 1, lit(0))
    val bigrams = withToks
      .select(explode(arrays_zip(
        slice(col("__toks"), lit(1), n1),
        slice(col("__toks"), lit(2), n1))).as("__bg"))
      .select(col("__bg").getField("0").as("w1"),
        col("__bg").getField("1").as("w2"))
    val pairCnt = bigrams.groupBy("w1", "w2").agg(count(lit(1)).as("pair_count"))
    val uni = withToks.select(explode(col("__toks")).as("tok"))
      .groupBy("tok").agg(count(lit(1)).as("tok_count"))
    val tot = withToks.agg(
      sum(size(col("__toks"))).cast("double").as("n_tokens"),
      sum(greatest(size(col("__toks")) - 1, lit(0))).cast("double").as("n_bigrams"))
    pairCnt.filter(col("pair_count") >= minCount)
      .join(uni.select(col("tok").as("w1"), col("tok_count").as("c1")), "w1")
      .join(uni.select(col("tok").as("w2"), col("tok_count").as("c2")), "w2")
      .crossJoin(broadcast(tot))
      .select(col("w1"), col("w2"), col("pair_count"),
        round(log((col("pair_count") / col("n_bigrams")) /
          ((col("c1") / col("n_tokens")) * (col("c2") / col("n_tokens")))), 6)
          .as("pmi"))
      .orderBy(desc("pmi"), asc("w1"), asc("w2"))
      .limit(topK)
  }

  /** PII patterns for [[redactPii]] — dialect-portable regexes (no word
    * boundaries, no lookaround; character classes and bounded repeats
    * only), so a SQL engine's RE2-style matcher reproduces the exact
    * same matches. Applied in declaration order (emails first: an email
    * body can contain digit runs a later pattern would tear apart).
    */
  val piiPatterns: Seq[(String, String)] = Seq(
    "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}" -> "<EMAIL>",
    "\\+[0-9]{1,3}[ -][0-9]{3}[ -]?[0-9]{4}" -> "<PHONE>",
    "[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}" -> "<IP>")

  /** PII redaction (training-data scrubbing): replace emails, phone
    * numbers, and IPv4 literals with typed placeholder tags. A single
    * narrow pass — chained codegen `regexp_replace`, no UDF, no shuffle;
    * at 100 TB this runs entirely map-side next to the scan.
    */
  def redactPii(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.withColumn("redacted",
      piiPatterns.foldLeft(col(textCol)) { case (c, (pat, tag)) =>
        regexp_replace(c, pat, tag)
      })

  /** The markup-stripping chain, applied IN ORDER (order is semantic):
    * container blocks whose CONTENT must go first (script/style — their
    * body is code, not prose; comments), then the CDATA wrapper (its
    * content stays), then every remaining tag, then entity decodes —
    * tags BEFORE entities, so a decoded `<` can never form a fake tag;
    * `&amp;` after the other named decodes — then a catch-all that
    * DROPS anything still entity-shaped (unknown names, numeric refs,
    * and double-encoded leftovers like `&amp;lt;`: strip, don't
    * preserve), then whitespace collapse. Dialect-portable regex (RE2
    * subset: no lookaround, no backreferences; inline `(?is)` flags and
    * non-greedy `.*?` are common to Java and RE2), so a SQL engine
    * replays the chain verbatim — the oracle is BUILT from this very
    * sequence ([[SqlSurface]]), not hand-copied.
    */
  val markupPatterns: Seq[(String, String)] = Seq(
    "(?is)<script[^>]*>.*?</script>" -> " ",
    "(?is)<style[^>]*>.*?</style>" -> " ",
    "(?s)<!--.*?-->" -> " ",
    "<!\\[CDATA\\[" -> " ",
    "\\]\\]>" -> " ",
    "<[^>]*>" -> " ",
    "&nbsp;" -> " ",
    "&lt;" -> "<",
    "&gt;" -> ">",
    "&quot;" -> "\"",
    "&#39;" -> "'",
    "&amp;" -> "&",
    "&[A-Za-z]{1,10};" -> " ",
    "&#[0-9]{1,7};" -> " ",
    "\\s+" -> " ")

  /** HTML/markup boilerplate stripping — stage 0 of a web-corpus
    * pipeline (C4/CCNet-style): drop script/style/comment blocks with
    * their contents, unwrap CDATA, strip tags, decode the common
    * entities, collapse whitespace. Same execution shape as
    * [[redactPii]]: chained codegen `regexp_replace`, one narrow pass,
    * no UDF, no shuffle — map-side next to the scan at any scale.
    * Unclosed script/style blocks degrade gracefully: the opening tag
    * is stripped by the generic tag pass and the body survives as text
    * (identically in Spark and the oracle engine).
    */
  def stripMarkup(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.withColumn("clean_text",
      trim(markupPatterns.foldLeft(col(textCol)) { case (c, (pat, repl)) =>
        regexp_replace(c, pat, repl)
      }))

  /** Canonical text normalization — stage 0 of a multilingual pipeline,
    * BEFORE hashing/dedup/tokenization so visually identical text
    * compares identically: Unicode NFC (the codegen `nfc_normalize`
    * expression — composes decomposed accents), lowercase, control
    * characters → space, whitespace collapsed, trimmed. One narrow
    * codegen pass, no UDF, no shuffle; the same chain replays in any
    * engine with an NFC function (DuckDB: `nfc_normalize`).
    */
  def normalizeText(text: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    trim(regexp_replace(
      regexp_replace(lower(graft.functions.TextExprs.nfcNormalize(text)),
        "\\p{Cntrl}", " "),
      "\\s+", " "))
}

package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.text.{TextAnalysis, TextOps}

class TextOpsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("clean strips the reference charset and lowercases") {
    val got = Seq("He!!o, W[or]ld: 'x+y-z'").toDF("t")
      .select(TextOps.clean(col("t")).as("c")).head.getString(0)
    assert(got == "heo world xyz")
  }

  test("tokens drops empties from multi-whitespace") {
    val got = Seq("  a  b\tc ").toDF("t")
      .select(TextOps.tokens(col("t")).as("c")).head.getSeq[String](0)
    assert(got == Seq("a", "b", "c"))
  }

  test("cleanTokens drops tokens that clean to nothing") {
    val got = Seq("foo !!! bar").toDF("t")
      .select(TextOps.cleanTokens(col("t")).as("c")).head.getSeq[String](0)
    assert(got == Seq("foo", "bar"))
  }

  test("stopword removal is an anti-join; vocab lookup an inner join") {
    val toks = Seq((1, "the"), (1, "cat"), (2, "sat")).toDF("id", "token")
    val stop = Seq("the").toDF("word")
    val vocab = Seq(("cat", 7), ("sat", 9)).toDF("term", "term_id")
    val noStop = TextOps.removeStopwords(toks, "token", stop)
    assert(noStop.select("token").as[String].collect().sorted.toSeq == Seq("cat", "sat"))
    val joined = TextOps.vocabJoin(noStop, "token", vocab, "term")
    assert(joined.select("term_id").as[Int].collect().sorted.toSeq == Seq(7, 9))
  }

  test("token and subword counts") {
    val df = Seq("ab cd-12 ef!").toDF("text")
    assert(df.select(TextAnalysis.tokenCount(col("text"))).head.getInt(0) == 3)
    // ab | cd | - | 12 | ef | !  -> 6 subword pieces
    assert(df.select(TextAnalysis.subwordCount(col("text"))).head.getInt(0) == 6)
  }

  test("language id votes deterministically") {
    val docs = Seq((1L, "the cat and the dog"), (2L, "el perro y la casa de"), (3L, "qqq zzz")).toDF("doc_id", "text")
    val got = TextAnalysis.languageId(spark, docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got(1L) == "en")
    assert(got(2L) == "es")
    assert(got(3L) == "und")
  }

  test("fingerprint is order-sensitive and deterministic") {
    val fp = (s: String) => TextAnalysis.fingerprint(
      Seq((1L, s)).toDF("doc_id", "text"), "doc_id", "text")
      .head.getLong(1)
    assert(fp("a b c") == fp("a b c"))
    assert(fp("a b c") != fp("b a c"))
  }

  test("repetition ratio: degenerate repeats score 1.0; short docs null out") {
    val docs = Seq(
      (1L, ""),            // no tokens -> 0 bigrams, null ratio
      (2L, "hello"),       // one token -> 0 bigrams, null ratio
      (3L, "a a a a"),     // only bigram "a a" x3 -> ratio 1.0
      (4L, "w x y z w x")  // "w x" twice of 5 -> ratio 0.4
    ).toDF("doc_id", "text")
    val got = TextAnalysis.repetitionRatio(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), Option(r.get(3)).map(_.asInstanceOf[Double])))).toMap
    assert(got(1L) == ((0L, 0L, None)))
    assert(got(2L) == ((0L, 0L, None)))
    assert(got(3L) == ((3L, 3L, Some(1.0))))
    assert(got(4L) == ((5L, 2L, Some(0.4))))
  }

  test("PII redaction: emails, phones, and IPs replaced by typed tags; clean text unchanged") {
    val docs = Seq(
      (1L, "write to alice.smith+spam@sub.example.co.uk or call +44 123-4567 now"),
      (2L, "server at 192.168.0.1 responded"),
      (3L, "no pii here at all")
    ).toDF("doc_id", "text")
    val got = TextAnalysis.redactPii(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getAs[String]("redacted")).toMap
    assert(got(1L) == "write to <EMAIL> or call <PHONE> now", got(1L))
    assert(got(2L) == "server at <IP> responded", got(2L))
    assert(got(3L) == "no pii here at all")
  }

  test("markup strip: tags, nesting, script/style/comment contents, CDATA, entities") {
    def strip(s: String): String =
      TextAnalysis.stripMarkup(Seq((1L, s)).toDF("id", "text"), "id", "text")
        .head.getAs[String]("clean_text")
    // nested + attribute-laden tags strip; text survives with spacing
    assert(strip("<div class=\"a\"><p>one <b>two</b> three</p></div>") ==
      "one two three")
    // script/style lose their CONTENTS (code is not prose), comments too
    assert(strip("a<script>var x = 1 < 2 && \"y\";</script>b") == "a b")
    assert(strip("a<style type=\"text/css\">p { color: red }</style>b") == "a b")
    assert(strip("a<!-- hidden\nnote -->b") == "a b")
    // case-insensitive block matching
    assert(strip("a<SCRIPT>x</SCRIPT>b") == "a b")
    // unclosed script degrades: tag goes, body survives as text
    assert(strip("a<script>tail") == "a tail")
    // CDATA unwraps, content kept
    assert(strip("a<![CDATA[kept < raw & text]]>b") == "a kept < raw & text b")
    // named + numeric entities: common ones decode, unknown/numeric drop,
    // double-encoded leftovers drop (strip-don't-preserve)
    assert(strip("x &lt;tag&gt; &amp; &quot;q&quot; &#39;s&#39;") ==
      "x <tag> & \"q\" 's'")
    assert(strip("a &copy; &#169; &amp;lt; b") == "a b")
    // decoded '<' can never form a fake tag (tags strip before decode)
    assert(strip("&lt;script&gt;alert(1)&lt;/script&gt;") ==
      "<script>alert(1)</script>")
    // whitespace collapses, ends trim
    assert(strip("  <p>a</p>\n\n<p>b</p>  ") == "a b")
    // plain text passes through
    assert(strip("no markup here") == "no markup here")
  }

  test("unigram log-prob: fluent (common-token) docs outscore garbled ones; empty docs null") {
    val docs = Seq(
      (1L, "the cat sat on the mat"),
      (2L, "the dog sat on the rug"),
      (3L, "zxqv qqzz vvxx"), // tokens that appear nowhere else
      (4L, "")
    ).toDF("doc_id", "text")
    val got = TextAnalysis.unigramLogProb(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), Option(r.get(2)).map(_.asInstanceOf[Double])))).toMap
    assert(got(4L) == ((0L, None)))
    assert(got(1L)._1 == 6L && got(3L)._1 == 3L)
    assert(got(1L)._2.get > got(3L)._2.get,
      s"common-token doc must outscore rare-token doc: $got")
    assert(got.values.flatMap(_._2).forall(_ < 0.0), "log-probs are negative")
  }

  test("bigram log-prob: exact Laplace model on a hand corpus; sub-bigram docs null") {
    val docs = Seq(
      (1L, "a b a b"), // bigrams (a,b) (b,a) (a,b)
      (2L, "a b c"),   // bigrams (a,b) (b,c)
      (3L, "x"),       // 1 token: no bigrams
      (4L, "")         // no tokens
    ).toDF("doc_id", "text")
    val got = TextAnalysis.bigramLogProb(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), Option(r.get(2)).map(_.asInstanceOf[Double])))).toMap
    assert(got(3L) == ((0L, None)) && got(4L) == ((0L, None)))
    // c(a,b)=3 c(b,a)=1 c(b,c)=1; c(a)=3 c(b)=2; V={a,b,c,x} -> 4
    val pAb = math.log(4.0 / 7) // (3+1)/(3+4)
    val pBa = math.log(2.0 / 6) // (1+1)/(2+4)
    val pBc = math.log(2.0 / 6)
    assert(got(1L)._1 == 3L &&
      math.abs(got(1L)._2.get - (pAb + pBa + pAb) / 3) < 1e-12, s"got ${got(1L)}")
    assert(got(2L)._1 == 2L &&
      math.abs(got(2L)._2.get - (pAb + pBc) / 2) < 1e-12, s"got ${got(2L)}")
  }

  test("sentence stats: segmentation, no-punctuation fallback, empty-doc zeros") {
    val docs = Seq(
      (1L, "one two three. four five! six?"),   // 3 sentences: 3/2/1 tokens
      (2L, "no terminal punctuation at all"),   // 1 sentence of 5 tokens
      (3L, ""),                                 // no sentences
      (4L, "...!?")                             // punctuation only: no sentences
    ).toDF("doc_id", "text")
    val got = TextAnalysis.sentenceStats(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), Option(r.get(2)).map(_.asInstanceOf[Double]), r.getInt(3)))).toMap
    assert(got(1L) == ((3L, Some(2.0), 3)), s"got ${got(1L)}")
    assert(got(2L) == ((1L, Some(5.0), 5)), s"got ${got(2L)}")
    assert(got(3L) == ((0L, None, 0)))
    assert(got(4L) == ((0L, None, 0)))
  }

  test("sentence chunking: budget binning never splits a sentence; over-budget sentence owns its chunk") {
    val docs = Seq(
      // 3 sentences of 4/4/4 tokens, budget 8: prefix sums 0/4/8 ->
      // chunks 0,0,1 (the third sentence STARTS at the budget boundary)
      (1L, "a b c d. e f g h. i j k l."),
      // a single 10-token sentence with budget 8: one over-budget chunk
      (2L, "one two three four five six seven eight nine ten.")
    ).toDF("doc_id", "text")
    val got = TextAnalysis.chunkBySentences(docs, "doc_id", "text", budgetTokens = 8)
      .collect()
      .map(r => (r.getLong(0), r.getInt(1)) -> ((r.getLong(2), r.getLong(3), r.getString(4))))
      .toMap
    assert(got((1L, 0)) == ((2L, 8L, "a b c d e f g h")), s"got ${got.get((1L, 0))}")
    assert(got((1L, 1)) == ((1L, 4L, "i j k l")), s"got ${got.get((1L, 1))}")
    assert(got((2L, 0)) ==
      ((1L, 10L, "one two three four five six seven eight nine ten")))
    assert(got.size == 3)
  }

  test("PMI collocations: exclusive pairs rank above promiscuous ones; the count floor holds") {
    // "hong kong" always co-occurs exclusively (6x); "the cat" pairs a
    // promiscuous token (the) so its PMI is lower; "rare gem" occurs
    // 4x — below the floor of 5 — and must not appear.
    val docs = Seq(
      (1L, ("hong kong " * 6) + ("the cat " * 6) + ("the dog " * 6)),
      (2L, "rare gem rare gem rare gem rare gem filler")
    ).toDF("doc_id", "text")
    val got = TextAnalysis.pmiBigrams(docs, "text", minCount = 5L, topK = 20)
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getDouble(3)))).toMap
    assert(got.contains(("hong", "kong")))
    assert(!got.keySet.exists(p => p == ("rare", "gem")),
      s"sub-floor pair leaked: ${got.keySet}")
    val pmiHk = got(("hong", "kong"))._2
    val pmiCat = got(("the", "cat"))._2
    assert(pmiHk > pmiCat,
      s"exclusive pair must outrank the promiscuous one: $pmiHk <= $pmiCat")
  }

  test("PMI: a pair spanning every bigram position scores ~0 (independence)") {
    // corpus of alternating "a b a b ..." — bigrams are (a,b) and (b,a)
    // only; P(ab) ~ P(a)P(b) in the alternation, so PMI is near ln(2)
    // scale rather than large — just pin that the computation is finite
    // and deterministic here
    val docs = Seq((1L, ("x y " * 20).trim)).toDF("doc_id", "text")
    val got = TextAnalysis.pmiBigrams(docs, "text", minCount = 5L, topK = 5)
      .collect()
    assert(got.nonEmpty && got.forall(r => !r.getDouble(3).isNaN))
  }
}

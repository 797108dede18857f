package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.{Gen, Prop, Test => SCTest}

/** ScalaCheck properties for the engine's algebraic building blocks
  * (SURVEY §5.3): driver-side laws of the same logic the distributed
  * operators run, plus the TopKBy buffer vs a sort-based reference.
  */
class PropertySpec extends AnyFunSuite {

  private def check(p: Prop): Unit = {
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(200), p)
    assert(res.passed, res.status.toString)
  }

  private val vec = Gen.listOfN(8, Gen.chooseNum(-100.0, 100.0)).map(_.toArray)

  private def dot(a: Array[Double], b: Array[Double]): Double =
    a.zip(b).map { case (x, y) => x * y }.sum
  private def norm(a: Array[Double]): Double = math.sqrt(dot(a, a))

  test("cosine is bounded, symmetric, and 1 on self") {
    check(Prop.forAll(vec, vec) { (a, b) =>
      norm(a) < 1e-9 || norm(b) < 1e-9 || {
        val c = dot(a, b) / (norm(a) * norm(b))
        val c2 = dot(b, a) / (norm(b) * norm(a))
        val self = dot(a, a) / (norm(a) * norm(a))
        c >= -1.0 - 1e-9 && c <= 1.0 + 1e-9 &&
          math.abs(c - c2) < 1e-9 && math.abs(self - 1.0) < 1e-9
      }
    })
  }

  test("TopKBy buffer equals sort-take-k for any input and any merge split") {
    val entry = for {
      o <- Gen.chooseNum(-50.0, 50.0)
      t <- Gen.chooseNum(0L, 20L)
    } yield (o, t)
    // the aggregate passes the interpreted ordering for the tie's type;
    // here the ties are Longs, so supply the equivalent directly
    val tieOrd: Ordering[Any] = Ordering.by[Any, Long](_.asInstanceOf[Long])
    check(Prop.forAll(Gen.listOf(entry), Gen.chooseNum(1, 6)) { (xs, k) =>
      val expect = xs.sortBy { case (o, t) => (-o, t) }.take(k)

      val direct = new graft.functions.TopKBy.Buffer(k, tieOrd)
      xs.foreach { case (o, t) => direct.offer(o, t, s"$o/$t") }

      val (l, r) = xs.splitAt(xs.length / 2)
      val b1 = new graft.functions.TopKBy.Buffer(k, tieOrd)
      val b2 = new graft.functions.TopKBy.Buffer(k, tieOrd)
      l.foreach { case (o, t) => b1.offer(o, t, s"$o/$t") }
      r.foreach { case (o, t) => b2.offer(o, t, s"$o/$t") }
      b2.entries.foreach { case (o, t, p) => b1.offer(o, t, p) }

      direct.sortedBestFirst.map { case (o, t, _) => (o, t) } == expect &&
        b1.sortedBestFirst.map { case (o, t, _) => (o, t) } == expect
    })
  }

  test("SQ8 pack/dot: scale/2 reconstruction bound and exact integer dot, any vector") {
    check(Prop.forAll(vec, vec) { (v, q) =>
      val maxAbs = math.max(v.map(math.abs).max, 1e-12)
      val scale = maxAbs / 127.0
      val code = new Array[Byte](v.length)
      var i = 0
      while (i < v.length) {
        val r = math.round(v(i) / scale)
        code(i) = (if (r > 127L) 127L else if (r < -127L) -127L else r).toByte
        i += 1
      }
      // the Catalyst expressions evaluated directly (interpreted path —
      // the same nullSafeEval codegen delegates to)
      import org.apache.spark.sql.catalyst.expressions.Literal
      import org.apache.spark.sql.types._
      val exprCode = graft.functions.Sq8Pack.pack(
        org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(v), scale, isFloat = false)
      val reconstructionOk = v.indices.forall { j =>
        math.abs(v(j) - scale * code(j)) <= scale / 2 + 1e-9
      }
      val exprDot = graft.functions.DotI8(
        Literal.create(v, ArrayType(DoubleType, containsNull = false)),
        Literal.create(code, BinaryType)).eval(null).asInstanceOf[Double]
      val refDot = v.zip(code).map { case (x, b) => x * b.toDouble }.sum
      code.sameElements(exprCode) && reconstructionOk &&
        math.abs(exprDot - refDot) < 1e-9
    })
  }

  test("rolling hash: deterministic, order-sensitive, in [0, 1e9+7)") {
    import org.apache.spark.unsafe.types.UTF8String
    def h(s: String): Long =
      graft.functions.RollingHash.hashUtf8(UTF8String.fromString(s))
    check(Prop.forAll(Gen.alphaNumStr) { s =>
      val v = h(s)
      v >= 0L && v < 1000000007L && v == h(s)
    })
    // swapping two distinct leading chars always changes the hash:
    // h1 - h2 = 30·(a-b)·31^(n-2) mod p, never 0 for prime p > 30·127·31^k
    check(Prop.forAll(Gen.alphaNumStr, Gen.alphaChar, Gen.alphaChar) { (s, a, b) =>
      a == b || h(s"$a$b$s") != h(s"$b$a$s")
    })
  }

  test("hamming is a metric: identity, symmetry, triangle inequality") {
    import org.apache.spark.unsafe.types.UTF8String
    def hm(a: String, b: String): Int =
      graft.functions.HammingDistance.hammingUtf8(
        UTF8String.fromString(a), UTF8String.fromString(b))
    val bits = Gen.listOfN(16, Gen.oneOf('0', '1')).map(_.mkString)
    check(Prop.forAll(bits) { a => hm(a, a) == 0 })
    check(Prop.forAll(bits, bits) { (a, b) => hm(a, b) == hm(b, a) })
    check(Prop.forAll(bits, bits, bits) { (a, b, c) =>
      hm(a, c) <= hm(a, b) + hm(b, c)
    })
    // a truncated suffix counts fully (common prefix stays aligned)
    check(Prop.forAll(bits, Gen.chooseNum(0, 8)) { (a, cut) =>
      val c = math.min(cut, a.length)
      hm(a, a.dropRight(c)) == c
    })
  }

  test("winsorize clamp: result within bounds, identity inside bounds, monotone") {
    def w(v: Double, lo: Double, hi: Double) = math.min(math.max(v, lo), hi)
    val d = Gen.chooseNum(-1000.0, 1000.0)
    check(Prop.forAll(d, d, d) { (v, x, y) =>
      val (lo, hi) = (math.min(x, y), math.max(x, y))
      val r = w(v, lo, hi)
      r >= lo && r <= hi && (v < lo || v > hi || r == v)
    })
    check(Prop.forAll(d, d, d, d) { (v1, v2, x, y) =>
      val (lo, hi) = (math.min(x, y), math.max(x, y))
      v1 > v2 || w(v1, lo, hi) <= w(v2, lo, hi)
    })
  }

  test("next-fit packing: every bin except possibly the last-opened stays under budget+max(doc)") {
    // the law of the window form: bin = floor(cum_before / B). A doc can
    // overflow its bin by at most its own length (next-fit semantics).
    val docs = Gen.listOf(Gen.chooseNum(1L, 300L))
    check(Prop.forAll(docs, Gen.chooseNum(100L, 1000L)) { (lens, budget) =>
      var cum = 0L
      val bins = lens.map { n => val b = cum / budget; cum += n; b }
      val byBin = lens.zip(bins).groupBy(_._2).view.mapValues(_.map(_._1).sum)
      byBin.forall { case (_, tot) => tot <= budget + lens.max }
    })
  }

  test("wordpiece greedy split: lossless-or-UNK, vocab-closed, longest-first, deterministic") {
    import org.apache.spark.unsafe.types.UTF8String
    val word = Gen.chooseNum(0, 12).flatMap(n =>
      Gen.listOfN(n, Gen.oneOf('a', 'b', 'c')).map(_.mkString))
    val vocabGen = Gen.chooseNum(0, 10).flatMap(n =>
      Gen.listOfN(n, Gen.chooseNum(1, 4).flatMap(l =>
        Gen.listOfN(l, Gen.oneOf('a', 'b', 'c')).map(_.mkString))))
    check(Prop.forAll(word, vocabGen) { (w, pieces) =>
      val vocab = new graft.functions.WordPieceKernels.Vocab(pieces.distinct)
      def run() = {
        val arr = graft.functions.WordPieceKernels
          .split(UTF8String.fromString(w), vocab, mark = false)
        (0 until arr.numElements()).map(i => arr.getUTF8String(i).toString)
      }
      val out = run()
      val pset = pieces.toSet
      val lossless = out == Seq("[UNK]") || out.mkString("") == w ||
        (w.isEmpty && out.isEmpty)
      val closed = out == Seq("[UNK]") || out.forall(pset.contains)
      // greedy longest-first: the first piece is the LONGEST vocab
      // piece prefixing the word
      val greedyHead = out.isEmpty || out == Seq("[UNK]") || {
        val best = (math.min(4, w.length) to 1 by -1)
          .find(l => pset.contains(w.take(l)))
        best.contains(out.head.length)
      }
      lossless && closed && greedyHead && out == run()
    })
  }

  test("merge-batch kernel equals the sequential per-rank greedy reference on any input") {
    import org.apache.spark.unsafe.types.UTF8String
    import org.apache.spark.sql.catalyst.util.GenericArrayData
    val symsGen = Gen.chooseNum(0, 14).flatMap(n =>
      Gen.listOfN(n, Gen.oneOf("a", "b", "c")))
    val pairGen = for {
      l <- Gen.chooseNum(1, 2).flatMap(k =>
        Gen.listOfN(k, Gen.oneOf('a', 'b', 'c')).map(_.mkString))
      r <- Gen.chooseNum(1, 2).flatMap(k =>
        Gen.listOfN(k, Gen.oneOf('a', 'b', 'c')).map(_.mkString))
    } yield (l, r)
    val batchGen = Gen.chooseNum(0, 5).flatMap(n =>
      Gen.listOfN(n, pairGen)).map(_.distinct)
    // reference semantics: in rank order, greedy-leftmost merge all
    // occurrences of the pair in the CURRENT list (one sweep per rank —
    // a later-created occurrence of an EARLIER rank stays unmerged)
    def reference(syms: List[String], batch: List[(String, String)]): List[String] =
      batch.foldLeft(syms) { case (cur, (a, b)) =>
        val out = scala.collection.mutable.ListBuffer.empty[String]
        var i = 0
        while (i < cur.length) {
          if (i + 1 < cur.length && cur(i) == a && cur(i + 1) == b) {
            out += (a + b); i += 2
          } else { out += cur(i); i += 1 }
        }
        out.toList
      }
    check(Prop.forAll(symsGen, batchGen) { (syms, batch) =>
      val kernel = new graft.functions.MergeKernels.Batch(batch.toArray)
      val arr = new GenericArrayData(
        syms.map(s => UTF8String.fromString(s): Any).toArray)
      val got = {
        val r = graft.functions.MergeKernels.applyBatch(arr, kernel)
        (0 until r.numElements()).map(i => r.getUTF8String(i).toString).toList
      }
      got == reference(syms, batch)
    })
  }
}

package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.functions.Corpus

/** Subword BPE train/encode (Sennrich et al. 2016 — the round-10 verdict's
  * item #2): merge-list determinism, the classic hand-computable corpus,
  * round-trip (concat of subtokens == the word), and OOV encoding. The
  * chained-replace Spark expression is checked against an independent
  * in-spec greedy merge application so the delimiter-guarded `replace`
  * parity (resume-after-replacement, no cross-boundary matches) is proven
  * on the JVM side too (the DuckDB side is the driver's oracle gate).
  */
class BpeSpec extends AnyFunSuite {
  import SparkTestSession.spark
  import spark.implicits._

  // the classic BPE teaching corpus: low×3 lower×2 newest×4 widest×1
  private lazy val tiny = Seq(
    (0L, "low low low lower lower"),
    (1L, "newest newest newest newest widest")
  ).toDF("doc_id", "text")

  // independent greedy merge application (mirrors the BPE definition, not
  // the implementation): apply each merge once, left-to-right non-overlap
  private def applyMerges(w: String, ms: Seq[(String, String)]): Seq[String] = {
    var s: Vector[String] = w.split("").filter(_.nonEmpty).toVector
    ms.foreach { case (l, r) =>
      val out = Vector.newBuilder[String]
      var i = 0
      while (i < s.length) {
        if (i < s.length - 1 && s(i) == l && s(i + 1) == r) { out += l + r; i += 2 }
        else { out += s(i); i += 1 }
      }
      s = out.result()
    }
    s
  }

  test("bpeTrain learns the hand-computed merges on the classic corpus") {
    val m = Corpus.bpeTrain(tiny, "text", numMerges = 4)
      .orderBy("rank").collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getString(3), r.getLong(4)))
    // pair counts: we=6 (lower×2 + newest×4) wins round 1; round 2 ties
    // lo=5 st=5 → left ASC picks (l,o)
    assert(m(0) === ((1, "w", "e", "we", 6L)))
    assert(m(1) === ((2, "l", "o", "lo", 5L)))
    // ranks are dense 1..N and merged = left||right throughout
    assert(m.map(_._1).toSeq === (1 to 4))
    assert(m.forall { case (_, l, r, merged, _) => merged == l + r })
  }

  test("bpeTrain is deterministic and stops when pairs are exhausted") {
    val a = Corpus.bpeTrain(tiny, "text", numMerges = 6).collect().toSeq
    val b = Corpus.bpeTrain(tiny, "text", numMerges = 6).collect().toSeq
    assert(a === b)
    // single-letter corpus: no adjacent pairs at all -> zero merges
    val lone = Seq((0L, "a b a b")).toDF("doc_id", "text")
    assert(Corpus.bpeTrain(lone, "text", numMerges = 3).count() === 0)
    // one repeated bigram-word: "aa" merges once, then the single symbol
    // "aa" has no pairs left -> exactly one merge despite numMerges=5
    val aa = Seq((0L, "aa aa aa")).toDF("doc_id", "text")
    val mm = Corpus.bpeTrain(aa, "text", numMerges = 5).collect()
    assert(mm.length === 1 && mm(0).getString(3) === "aa")
  }

  test("bpeEncode matches independent greedy application and round-trips") {
    val merges = Corpus.bpeTrain(tiny, "text", numMerges = 5)
    val ms = merges.orderBy("rank").collect()
      .map(r => (r.getString(1), r.getString(2))).toSeq
    val enc = Corpus.bpeEncode(tiny, "doc_id", "text", merges)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getSeq[String](2))).toSeq
    val expected = tiny.collect().map { r =>
      val subs = r.getString(1).split(" ").filter(_.nonEmpty).toSeq
        .flatMap(w => applyMerges(w, ms))
      (r.getLong(0), subs.length.toLong, subs)
    }.toSeq
    assert(enc.sortBy(_._1) === expected.sortBy(_._1))
    // round-trip: concatenating a doc's subtokens reproduces its words
    enc.foreach { case (id, _, subs) =>
      val doc = tiny.where(col("doc_id") === id).head().getString(1)
      assert(subs.mkString === doc.split(" ").filter(_.nonEmpty).mkString)
    }
  }

  test("bpeEncode handles OOV words, greedy overlap, and empty tokens") {
    val merges = Corpus.bpeTrain(tiny, "text", numMerges = 5)
    val ms = merges.orderBy("rank").collect()
      .map(r => (r.getString(1), r.getString(2))).toSeq
    // "lowest" never trained; "wewewe" exercises left-to-right greedy
    // non-overlap on the we-merge; double space yields an empty token
    val oov = Seq((9L, "lowest  wewewe")).toDF("doc_id", "text")
    val out = Corpus.bpeEncode(oov, "doc_id", "text", merges).head()
    val subs = out.getSeq[String](2)
    assert(subs === "lowest".split(" ").filter(_.nonEmpty).toSeq
      .flatMap(w => applyMerges(w, ms)) ++
      Seq("wewewe").flatMap(w => applyMerges(w, ms)))
    assert(subs.mkString === "lowestwewewe")
    assert(out.getLong(1) === subs.length.toLong)
  }

  test("property: encode == independent greedy application on random corpora") {
    import org.scalacheck.{Gen, Prop, Test => SCTest}
    // tiny alphabet maximizes repeated pairs (the regime where greedy
    // order and overlap handling can diverge); each case runs Spark jobs,
    // so few-but-dense cases (the DslPropertySpec discipline)
    val word = Gen.chooseNum(1, 8).flatMap(n =>
      Gen.listOfN(n, Gen.oneOf('a', 'b', 'c')).map(_.mkString))
    val corpus = Gen.chooseNum(1, 6).flatMap(n =>
      Gen.listOfN(n, Gen.chooseNum(1, 8).flatMap(w =>
        Gen.listOfN(w, word).map(_.mkString(" ")))))
    val prop = Prop.forAll(corpus) { texts =>
      val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("doc_id", "text")
      val merges = Corpus.bpeTrain(df, "text", numMerges = 6)
      val ms = merges.orderBy("rank").collect()
        .map(r => (r.getString(1), r.getString(2))).toSeq
      val enc = Corpus.bpeEncode(df, "doc_id", "text", merges)
        .collect().map(r => r.getLong(0) -> r.getSeq[String](2)).toMap
      texts.zipWithIndex.forall { case (t, i) =>
        val words = t.split(" ").filter(_.nonEmpty).toSeq
        val expected = words.flatMap(w => applyMerges(w, ms))
        if (words.isEmpty) !enc.contains(i.toLong)
        else enc(i.toLong) == expected && expected.mkString == words.mkString
      }
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(12), prop)
    assert(res.passed, s"bpe property failed: ${res.status}")
  }

  test("past the chained-replace budget bpeEncode switches to the sequential matcher") {
    // r11 encode hard-failed here; now the >2048 path dispatches to the
    // mapPartitions matcher. None of these synthetic merges is applicable,
    // so the output must be the plain character split.
    val fake = (1 to 2049).map(i => (i, s"x$i", "y", s"x${i}y", 1L))
      .toDF("rank", "left", "right", "merged", "pair_cnt")
    val enc = Corpus.bpeEncode(tiny, "doc_id", "text", fake)
      .collect().map(r => r.getLong(0) -> r.getSeq[String](2)).toMap
    val want = tiny.collect().map { r =>
      r.getLong(0) ->
        r.getString(1).split(" ").filter(_.nonEmpty).toSeq
          .flatMap(_.split("").filter(_.nonEmpty))
    }.toMap
    assert(enc === want)
  }

  test("sequential matcher == chained-replace encode on the documents corpus") {
    val docs = SparkTestSession.table("documents").limit(200)
    val merges = Corpus.bpeTrain(docs, "text", numMerges = 20)
    val ms = merges.orderBy("rank").collect()
      .map(r => (r.getString(1), r.getString(2)))
    val chained = Corpus.bpeEncode(docs, "doc_id", "text", merges)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getSeq[String](2))).toSet
    val seq = Corpus.bpeEncodeSeq(docs, "doc_id", "text", ms, byteLevel = false)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getSeq[String](2))).toSet
    assert(seq === chained,
      "the two physical encode paths must agree symbol-for-symbol")
  }

  test("32k-merge synthetic encode: matcher equals direct sequential replay") {
    // a production-size merge list without a production-size training run:
    // all 676 char pairs (level 1), then pairings of the level-1 symbols,
    // 33000 rules total — far past any chained-replace budget
    val alpha = ('a' to 'z').map(_.toString)
    val lvl1 = for (x <- alpha; y <- alpha) yield (x, y)
    val l1syms = lvl1.map { case (x, y) => x + y }
    val lvl2 = for (x <- l1syms; y <- l1syms) yield (x, y)
    val rules = (lvl1 ++ lvl2).take(33000)
    val merges = rules.zipWithIndex
      .map { case ((l, r), i) => (i + 1, l, r, l + r, 1L) }
      .toDF("rank", "left", "right", "merged", "pair_cnt")
    assert(merges.count() === 33000L)
    val rnd = new scala.util.Random(42)
    val texts = (0 until 40).map { i =>
      (i.toLong, (0 until 5).map(_ =>
        (0 until (4 + rnd.nextInt(9)))
          .map(_ => ('a' + rnd.nextInt(26)).toChar).mkString).mkString(" "))
    }
    val df = texts.toDF("doc_id", "text")
    val enc = Corpus.bpeEncode(df, "doc_id", "text", merges) // auto: seq path
      .collect().map(r => r.getLong(0) -> r.getSeq[String](2)).toMap
    // ground truth: the definitionally-correct O(N·len) replay of ALL
    // 33000 merges in rank order (applyMerges), word by word
    texts.foreach { case (id, t) =>
      val words = t.split(" ").filter(_.nonEmpty).toSeq
      val expected = words.flatMap(w => applyMerges(w, rules))
      assert(enc(id) === expected, s"doc $id drifted under 33k merges")
      assert(expected.mkString === words.mkString, "round-trip")
    }
  }

  test("byte-level bpe round-trips arbitrary UTF-8 (emoji/CJK) via the EOW sentinel") {
    val texts = Seq(
      (0L, "héllo wörld héllo naïve"),
      (1L, "日本語 テスト 日本語 漢字"),
      (2L, "mixed ascii und 中文 🎉🎉 emoji 🎉"),
      (3L, "héllo 日本語 🎉 ascii"))
    val df = texts.toDF("doc_id", "text")
    val merges = Corpus.bpeTrain(df, "text", numMerges = 40, byteLevel = true)
    assert(merges.count() > 0)
    val enc = Corpus.bpeEncode(df, "doc_id", "text", merges, byteLevel = true)
      .collect().map(r => r.getLong(0) -> r.getSeq[String](2)).toMap
    texts.foreach { case (id, t) =>
      val sub = enc(id)
      // the sentinel is always word-FINAL: merges never cross words, so it
      // can only be the last char of a symbol — split the subtoken stream
      // into words at sentinel-ending symbols and decode each
      val wordGroups = sub.foldLeft(Vector(Vector.empty[String])) { (acc, s) =>
        val cur = acc.init :+ (acc.last :+ s)
        if (s.endsWith(Corpus.BpeEow)) cur :+ Vector.empty else cur
      }.filter(_.nonEmpty)
      val decoded = wordGroups.map(Corpus.bpeByteDecode)
      assert(decoded === t.split(" ").filter(_.nonEmpty).toSeq,
        s"doc $id must round-trip byte-exactly")
      // every sentinel is word-final inside its symbol
      sub.foreach(s => assert(!s.dropRight(1).contains(Corpus.BpeEow.head),
        s"sentinel must never be symbol-internal: ${s.toList}"))
    }
    // on pure printable ASCII the byte alphabet is the identity, so the
    // byte-level encode differs from char-level ONLY by the sentinel
    val ascii = Seq((0L, "low low low lower lower newest newest"))
      .toDF("doc_id", "text")
    val bm = Corpus.bpeTrain(ascii, "text", numMerges = 5, byteLevel = true)
    val be = Corpus.bpeEncode(ascii, "doc_id", "text", bm, byteLevel = true)
      .collect().head.getSeq[String](2)
    assert(be.mkString.filterNot(_ == Corpus.BpeEow.head) ===
      "low low low lower lower newest newest".replace(" ", ""))
  }

  test("bpe on the documents table: merges exist and encode is total") {
    val docs = SparkTestSession.table("documents").limit(50)
    val merges = Corpus.bpeTrain(docs, "text", numMerges = 10)
    assert(merges.count() === 10)
    val enc = Corpus.bpeEncode(docs, "doc_id", "text", merges)
    assert(enc.count() === 50)
    // n_subtokens strictly less than n_chars (merges fired) but >= n_words
    val chk = enc.join(docs, Seq("doc_id"))
      .select(col("n_subtokens"),
        length(regexp_replace(col("text"), " ", "")).as("n_chars"),
        size(split(col("text"), " ")).as("n_words"))
      .where(col("n_subtokens") >= col("n_chars") ||
        col("n_subtokens") < col("n_words"))
    assert(chk.count() === 0)
  }
}

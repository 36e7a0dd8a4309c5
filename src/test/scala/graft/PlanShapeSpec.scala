package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.{Corpus, TextAnalysis}
import graft.operators.Joins

/** Plan-SHAPE regression guards: the 100 TB postures PLANS.md narrates,
  * enforced as plan asserts so a refactor cannot silently reintroduce a
  * cartesian product, a needless exchange, or a global single-reducer
  * sort. These check the INITIAL physical plan (before AQE re-planning),
  * where Exchange nodes are stable strings. */
class PlanShapeSpec extends AnyFunSuite {
  import SparkTestSession.{spark, table}

  private def plan(df: DataFrame): String =
    df.queryExecution.executedPlan.toString

  private def countOf(df: DataFrame, needle: String): Int =
    needle.r.findAllIn(plan(df)).length

  lazy val docs = table("documents")

  test("map-only operators plan with ZERO exchanges") {
    val merges = Corpus.bpeTrain(docs.limit(50), "text", numMerges = 5)
    val mapOnly = Seq(
      "bpeEncode" -> Corpus.bpeEncode(docs, "doc_id", "text", merges),
      "chunkTokens" -> Corpus.chunkTokens(docs, "doc_id", "text", 64, 16),
      "sampleHashMod" -> Corpus.sampleHashMod(docs, "doc_id", 3, 10),
      "signals" -> docs.select(TextAnalysis.signals(col("text")).as("sig")))
    mapOnly.foreach { case (name, df) =>
      assert(!plan(df).contains("Exchange"),
        s"$name must be map-only (no exchange):\n${plan(df).take(800)}")
    }
  }

  test("range/interval/as-of joins never plan a nested-loop or cartesian") {
    import SparkTestSession.spark.implicits._
    val points = (0L until 100L).map(i => i * 10L).toDF("pt")
    val ivs = (0L until 20L).map(i => (i * 50L, i * 50L + 30L)).toDF("s", "e")
    val rj = Joins.rangeJoin(points, ivs, "pt", "s", "e", binWidth = 50L)
    val l = (0L until 20L).map(i => (i * 50L, i * 50L + 40L)).toDF("ls", "le")
    val r = (0L until 20L).map(i => (i * 45L, i * 45L + 25L)).toDF("rs", "re")
    val ij = Joins.intervalJoin(l, r, "ls", "le", "rs", "re", binWidth = 50L)
    val ev = table("events").select(col("event_id"), col("user_id"),
      graft.sources.Tables.tsFromNanos(col("ts")).as("ts2"))
    val ao = Joins.asOf(
      ev.where(col("event_type").isNull || lit(true)).select(col("event_id"), col("user_id"), col("ts2")),
      col("user_id"), col("ts2"),
      ev.select(col("event_id").as("r_id"), col("user_id").as("r_user"), col("ts2").as("r_ts")),
      col("r_user"), col("r_ts"), Seq(col("r_id")))
    Seq("rangeJoin" -> rj, "intervalJoin" -> ij, "asOf" -> ao).foreach {
      case (name, df) =>
        val p = plan(df)
        assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
          s"$name must never plan a nested loop:\n${p.take(800)}")
    }
  }

  test("as-of join pays exactly one hash exchange (the key shuffle)") {
    val ev = table("events").select(col("event_id"), col("user_id"),
      graft.sources.Tables.tsFromNanos(col("ts")).as("ts2"))
    val ao = Joins.asOf(
      ev.select(col("event_id"), col("user_id"), col("ts2")),
      col("user_id"), col("ts2"),
      ev.select(col("event_id").as("r_id"), col("user_id").as("r_user"), col("ts2").as("r_ts")),
      col("r_user"), col("r_ts"), Seq(col("r_id")))
    val n = countOf(ao, "Exchange hashpartitioning")
    assert(n == 1, s"asOf should shuffle ONCE on the key, saw $n:\n${plan(ao).take(1200)}")
  }

  test("tokenizeToIds broadcasts the vocab and shuffles the corpus once") {
    val vocab = Corpus.buildVocab(docs, "text", minCount = 2L)
    // pre-materialize the vocab so the budget below measures tokenize, not
    // the vocab build (callers hold a built vocab in real pipelines)
    val vSmall = vocab.limit(1000).cache(); vSmall.count()
    val tok = Corpus.tokenizeToIds(docs, "doc_id", "text", vSmall)
    val p = plan(tok)
    assert(p.contains("BroadcastExchange") || p.contains("BroadcastHashJoin"),
      s"vocab side must broadcast:\n${p.take(1000)}")
    val n = countOf(tok, "Exchange hashpartitioning")
    assert(n <= 1, s"tokenize should shuffle the corpus once (doc_id agg), saw $n")
    vSmall.unpersist()
  }

  test("unigramEncode is map-only; unigramPieces ranks via TakeOrdered, no window") {
    val pieces = Corpus.unigramPieceTable(docs, "text", maxLen = 4, topK = 60)
    val enc = Corpus.unigramEncode(docs, "doc_id", "text", pieces, maxLen = 4)
    assert(!plan(enc).contains("Exchange"),
      s"unigramEncode must be map-only:\n${plan(enc).take(800)}")
    val pv = plan(Corpus.unigramPieces(docs, "text", maxLen = 4, topK = 60))
    assert(pv.contains("TakeOrderedAndProject"),
      s"piece ranking must use per-partition heaps:\n${pv.take(800)}")
    assert(!pv.contains("Exchange rangepartitioning") && !pv.contains("Window"),
      s"no global sort / window in the piece table:\n${pv.take(800)}")
  }

  test("lambda-let bindings survive optimization (interpreted-HOF hoist guard)") {
    // ADVICE r19 #1: Dedup.simhash and TextAnalysis.fingerprints bind an
    // expensive token/shingle-hash array as the single element of a
    // 1-element array — `element_at(transform(array(x), xs => body), 1)`
    // — so references inside the interpreted HOF lambda are cheap
    // variable reads instead of O(len) re-tokenizations per element.
    // That relies on the optimizer NEVER inlining the binding (HOF
    // lambdas get no CSE). If a Spark upgrade adds lambda inlining, the
    // O(bits·tokens) / O(len²) recomputation comes back with no
    // correctness signal — this guard makes the plan shape loud instead.
    val sim = docs.select(graft.functions.Dedup.simhash(col("text")).as("fp"))
    val fpr = docs.select(
      TextAnalysis.fingerprints(col("text")).as("fps"))
    Seq("simhash" -> sim, "fingerprints" -> fpr).foreach { case (name, df) =>
      val opt = df.queryExecution.optimizedPlan.toString
      assert(opt.contains("transform(array("),
        s"$name lost its lambda-let binding (transform(array(...)) " +
          s"inlined by the optimizer) — re-measure the HOF hot path:\n" +
          opt.take(1200))
    }
  }

  test("weightedSample plans as TakeOrderedAndProject, never a global sort") {
    val ws = Corpus.weightedSample(
      docs.select(col("doc_id"), col("n_chars")), "doc_id", col("n_chars"), k = 10)
    val p = plan(ws)
    assert(p.contains("TakeOrderedAndProject"),
      s"top-k sample must use per-partition heaps:\n${p.take(800)}")
    assert(!p.contains("Exchange rangepartitioning"),
      s"no global sort exchange allowed:\n${p.take(800)}")
  }
}

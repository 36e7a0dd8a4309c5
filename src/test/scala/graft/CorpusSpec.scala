package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.functions.{Corpus, TextAnalysis}

class CorpusSpec extends AnyFunSuite {
  import SparkTestSession.{spark, table}

  lazy val docs = table("documents")

  test("hash-mod sampling is deterministic, content-keyed, and ~k/n sized") {
    val a = Corpus.sampleHashMod(docs, "doc_id", 3, 10).select("doc_id")
    val b = Corpus.sampleHashMod(docs, "doc_id", 3, 10).select("doc_id")
    assert(a.exceptAll(b).count() === 0 && b.exceptAll(a).count() === 0)
    val total = docs.count().toDouble
    val frac = a.count() / total
    assert(frac > 0.15 && frac < 0.45, s"expected ~0.3, got $frac")
    // buckets partition the corpus: k=n keeps everything
    assert(Corpus.sampleHashMod(docs, "doc_id", 10, 10).count() === total.toLong)
    assert(Corpus.sampleHashMod(docs, "doc_id", 0, 10).count() === 0)
  }

  test("token packing: greedy floor-assignment invariants hold per shard") {
    val withToks = docs.select(col("doc_id"),
      TextAnalysis.signals(col("text")).getField("n_words").as("toks"))
    val packed = Corpus.packTokenBudget(withToks, "doc_id", "toks",
      budget = 256L, nShards = 4).cache()
    // every document placed exactly once
    assert(packed.count() === docs.count())
    // mini-oracle: recompute the greedy assignment per shard in plain Scala
    val rows = packed.select("doc_id", "shard", "n_tokens", "bin", "bin_offset")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getLong(3), r.getLong(4)))
    rows.groupBy(_._2).foreach { case (_, shardRows) =>
      var before = 0L
      shardRows.sortBy(_._1).foreach { case (id, _, toks, bin, off) =>
        assert(bin === before / 256L, s"doc $id bin")
        assert(off === before % 256L, s"doc $id offset")
        before += toks
      }
    }
    // shards are balanced enough to parallelize (no empty shard on 500 docs)
    assert(packed.select("shard").distinct().count() === 4)
  }
}

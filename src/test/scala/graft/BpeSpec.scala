package graft

import org.apache.spark.sql.functions._
import graft.operators.Bpe
import graft.functions.{Text => T}

/** Learned BPE: pinned merge order (including the deterministic
  * tie-break), end-state vocab, arbitrary-word encoding, and the
  * broadcast-join corpus application with OOV fallback + roundtrip.
  */
class BpeSpec extends SparkSpec {
  import spark.implicits._

  test("merge loop pins the classic order: most frequent pair first") {
    val t = Bpe.trainFromWordCounts(Seq(("aa", 3L), ("ab", 1L)), 8)
    assert(t.merges.map(m => (m.left, m.right)) == Seq(("a", "a"), ("a", "b")))
    assert(t.vocab == Map("aa" -> Seq("aa"), "ab" -> Seq("ab")))
  }

  test("pair ties break lexicographically — merges are corpus-pure") {
    val t = Bpe.trainFromWordCounts(Seq(("cd", 2L), ("ab", 2L)), 2)
    assert(t.merges.map(m => (m.left, m.right)) == Seq(("a", "b"), ("c", "d")))
  }

  test("encodeWord applies merges in rank order to unseen words") {
    val t = Bpe.trainFromWordCounts(Seq(("aa", 3L), ("ab", 1L)), 8)
    // "aab": (a,a) fuses first → [aa, b]; the (a,b) rule no longer
    // matches because its left symbol was consumed by the earlier rank
    assert(Bpe.encodeWord("aab", t.merges) == Seq("aa", "b"))
    assert(Bpe.encodeWord("ba", t.merges) == Seq("b", "a"))
  }

  test("corpus training is deterministic and vocab pieces reassemble") {
    val docs = Seq("the cat sat on the mat", "the cat ran", "a cat sat")
      .toDF("text")
    val t1 = Bpe.train(docs, "text", numMerges = 16, maxWords = 100)
    val t2 = Bpe.train(docs, "text", numMerges = 16, maxWords = 100)
    assert(t1.merges == t2.merges)
    assert(t1.merges.nonEmpty)
    // "the" appears 4× — its bigrams dominate, so the word fuses fully
    assert(t1.vocab("the") == Seq("the"))
    t1.vocab.foreach { case (w, pieces) =>
      assert(pieces.mkString == w, s"vocab pieces must reassemble $w")
    }
  }

  test("encode: broadcast-join application, OOV fallback, empty docs") {
    val t = Bpe.trainFromWordCounts(Seq(("hello", 5L), ("world", 4L)), 8)
    val vocab = Bpe.vocabDf(spark, t)
    val docs = Seq((1L, "hello world"), (2L, "hello zx9!"), (3L, " "))
      .toDF("doc_id", "text")
    val out = Bpe.encode(docs, "doc_id", "text", vocab)
      .select("doc_id", "bpe_pieces").collect()
      .map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    // in-vocab words use trained pieces; OOV "zx9!" falls back to the
    // regex pre-tokenizer: letter run, digit run, punct mark
    assert(out(1L) == t.vocab("hello") ++ t.vocab("world"))
    assert(out(2L) == t.vocab("hello") ++ Seq("zx", "9", "!"))
    assert(out(3L) == Seq.empty)
    // roundtrip: pieces concatenation reassembles the normalized tokens
    out.foreach { case (_, pieces) => assert(pieces.forall(_.nonEmpty)) }
  }

  test("documents corpus: lossless roundtrip, learned compression") {
    val docs = Tables(spark, "/root/testdata/sf0.001", "documents")
    val trained = Bpe.train(docs, "text", numMerges = 32, maxWords = 2000)
    assert(trained.merges.size == 32)
    val enc = Bpe.encode(docs, "doc_id", "text", Bpe.vocabDf(spark, trained))
    val stats = enc.select(
      sum(when(concat_ws("", col("bpe_pieces")) ===
        concat_ws("", T.tokens(T.normalizeText(col("text")))), 0).otherwise(1))
        .as("bad_roundtrip"),
      sum(size(col("bpe_pieces")).cast("long")).as("n_pieces"),
      sum(T.tokenCount(col("text")).cast("long")).as("n_tokens"),
      sum(length(regexp_replace(T.normalizeText(col("text")), " ", ""))
        .cast("long")).as("n_chars")).head()
    assert(stats.getLong(0) == 0, "every document must roundtrip")
    // learned merges compress below character count, never below the
    // token count (each token is at least one piece)
    assert(stats.getLong(1) < stats.getLong(3))
    assert(stats.getLong(1) >= stats.getLong(2))
  }
}

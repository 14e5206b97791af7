package graft

import graft.functions.{BpeTokenCountExpr, TextExpressions}
import graft.ops.Bpe
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class BpeSpec extends AnyFunSuite {
  lazy val spark = GraftSession.local("4")

  test("trainer learns the hand-computed merge sequence on a toy corpus") {
    // words: aaab x2, aab x1. Pair counts: (a,a)=5, (a,b)=3 -> merge (a,a).
    // Then (aa,a)=2 ties (a,b)=2 -> lexicographic min is (a,b). Then
    // (aa,ab)=2 -> merged; remaining (aa,b)=1 < 2 -> stop.
    val merges = Bpe.train("aaab aaab aab", 120)
    assert(merges == Seq(("a", "a"), ("a", "b"), ("aa", "ab")))
    // aaab -> [aaab] (1), aab -> [aa, b] (2)
    assert(Bpe.tokenCount("aaab aab aaab", merges.toIndexedSeq) == 1 + 2 + 1)
  }

  test("distributed corpus training ≡ sequential reference train; tokenCountUnder ≡ tokenCount") {
    import spark.implicits._
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    // the same word multiset sequentially: concatenate the corpus text
    val all = docs.select(col("text")).collect().map(_.getString(0)).mkString(" ")
    val seqTable = Bpe.train(all, 6)
    val distTable = Bpe.trainCorpus(docs, "text", 6)
    assert(distTable == seqTable,
      s"distributed merges $distTable diverged from sequential $seqTable")
    // partitioning cannot move a merge (exact counts, total-order argmax)
    assert(Bpe.trainCorpus(docs.repartition(7), "text", 6) == seqTable)
    // application parity: the Column fold equals the driver tokenCount
    val got = docs.select(col("doc_id"),
        Bpe.tokenCountUnder(col("text"), distTable).as("n"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    docs.select(col("doc_id"), col("text")).collect().foreach { r =>
      val expect = Bpe.tokenCount(r.getString(1), distTable.toIndexedSeq)
      assert(got(r.getLong(0)) == expect,
        s"doc ${r.getLong(0)}: column fold ${got(r.getLong(0))} vs reference $expect")
    }
    // toy-corpus law: same hand-computed sequence as the sequential test
    val toy = Seq((1L, "aaab aaab aab")).toDF("doc_id", "text")
    assert(Bpe.trainCorpus(toy, "text", 3) == Seq(("a", "a"), ("a", "b"), ("aa", "ab")))
  }

  test("fixed merge table is deterministic, non-trivial, and learns real subwords") {
    assert(Bpe.merges == Bpe.train(Bpe.seedText, 120))
    assert(Bpe.merges.length >= 50, s"only ${Bpe.merges.length} merges learned")
    // the seed's repeated stems must produce multi-char subword symbols
    val symbols = Bpe.merges.map { case (a, b) => a + b }
    assert(symbols.exists(_.length >= 4), symbols.mkString(","))
    // rank order: a merged symbol only ever appears in later-rank pairs
    // (the property that makes rank-order application correct)
    Bpe.merges.zipWithIndex.foreach { case ((a, b), r) =>
      val born = symbols.indexOf(a).max(symbols.indexOf(b))
      if (born >= 0) assert(born < r, s"pair ($a,$b) at rank $r uses symbol born at $born")
    }
  }

  test("token counts: bounded by chars and words, merge-order exhaustive") {
    val merges = Bpe.merges
    for (text <- Seq("the streaming engine keeps streaming", "a", "", "zz qq xx")) {
      val n = Bpe.tokenCount(text, merges)
      val ws = Bpe.words(text)
      assert(n >= ws.length, s"'$text': $n tokens < ${ws.length} words")
      assert(n <= ws.map(_.length).sum, s"'$text': $n tokens > char count")
    }
    assert(Bpe.tokenCount("", merges) == 0)
  }

  test("native expression matches the reference implementation on real docs, both execution paths") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    val got = docs
      .select(col("doc_id"), col("text"),
        TextExpressions.bpeTokenCountNative(col("text")).as("n"))
      .collect()
    assert(got.nonEmpty)
    got.foreach { r =>
      assert(r.getInt(2) == Bpe.tokenCount(r.getString(1)),
        s"doc ${r.getLong(0)}: codegen path diverges from reference")
    }
    // interpreted path
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    spark.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
    try {
      val interp = docs
        .select(col("doc_id"), TextExpressions.bpeTokenCountNative(col("text")).as("n"))
        .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
      got.foreach { r =>
        assert(interp(r.getLong(0)) == r.getInt(2), s"doc ${r.getLong(0)}: interpreted path diverges")
      }
    } finally {
      spark.conf.unset("spark.sql.codegen.wholeStage")
      spark.conf.unset("spark.sql.codegen.factoryMode")
    }
  }

  test("null text yields null count; real BPE compresses below the x29 regex proxy's word-split") {
    import spark.implicits._
    val df = Seq(Some("the streaming engine"), None).toDF("text")
    val rows = df.select(TextExpressions.bpeTokenCountNative(col("text"))).collect()
    assert(!rows(0).isNullAt(0) && rows(1).isNullAt(0))
    // seed-stem words should merge into few symbols: 'the' is one token
    assert(Bpe.tokenCount("the the the") == 3)
  }

  test("vocab: deterministic base ids 0-35, distinct ids, first-wins on duplicate mints") {
    // base alphabet pinned: '0'->0 .. '9'->9, 'a'->10 .. 'z'->35
    val base = Bpe.vocab.toMap
    assert(base("0") == 0 && base("9") == 9 && base("a") == 10 && base("z") == 35)
    // ids unique, symbols unique (first-wins collapses duplicate mints)
    assert(Bpe.vocab.map(_._1).distinct.length == Bpe.vocab.length)
    assert(Bpe.vocab.map(_._2).distinct.length == Bpe.vocab.length)
    // a constructed duplicate mint: (a,a)->aa, then (a,aa)->aaa and a
    // hypothetical (aa,a)->aaa would collide; first occurrence keeps its id
    val dup = Bpe.vocabOf(Seq(("a", "a"), ("a", "aa"), ("aa", "a"))).toMap
    assert(dup("aaa") == 37, s"first mint of 'aaa' must win: ${dup("aaa")}")
  }

  test("encodeIds: Spark column ≡ local reference; segmentation round-trips; length = token count") {
    import spark.implicits._
    val docs = Tables.documents(spark, "/root/testdata/sf0.001").limit(40)
    val got = docs.select(col("doc_id"), Bpe.encodeIds(col("text")).as("ids"))
      .as[(Long, Seq[Int])].collect().toMap
    docs.select(col("doc_id"), col("text")).collect().foreach { r =>
      val (id, text) = (r.getLong(0), r.getString(1))
      val expect = Bpe.encodeIdsLocal(text)
      assert(got(id) == expect, s"doc $id: ids diverged")
      // ids count IS the bpe token count (same fold)
      assert(expect.length == Bpe.tokenCount(text))
      // decode round-trip: vocab symbols of the ids re-concatenate to the
      // letters of the words — BPE segments, it never rewrites content
      val sym = Bpe.vocab.map(_.swap).toMap
      assert(expect.map(sym).mkString == Bpe.words(text).mkString)
    }
    // empty/no-alphanumeric text encodes to the empty sequence
    val empty = Seq((1L, ""), (2L, "!!! ---")).toDF("doc_id", "text")
      .select(Bpe.encodeIds(col("text")).as("ids")).as[Seq[Int]].collect()
    assert(empty.forall(_.isEmpty))
  }
}

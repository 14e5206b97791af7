package graft

import graft.functions.TextExpressions
import graft.ops.Bpe
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class BpeSpec extends AnyFunSuite {
  lazy val spark = GraftSession.local("4")

  /** Adversarial fixtures for the byte-complete convention: mixed case,
    * punctuation, digits, multi-byte UTF-8, tabs/newlines as separators. */
  val byteFixtures: Seq[String] = Seq(
    "the streaming engine keeps streaming",
    "The Engine, version 2.0 (build 2024), reads CSV!",
    "Don't re-tokenize; don't\tre-shuffle -- $3.50, 100%.",
    "café naïve über-prefix äöü",
    "mixed\nlines\r\nand\ftabs\there",
    "a", "", "   \t \n ", "zz qq xx", "!!! ---")

  test("char trainer learns the hand-computed merge sequence on a toy corpus") {
    // words: aaab x2, aab x1. Pair counts: (a,a)=5, (a,b)=3 -> merge (a,a).
    // Then (aa,a)=2 ties (a,b)=2 -> lexicographic min is (a,b). Then
    // (aa,ab)=2 -> merged; remaining (aa,b)=1 < 2 -> stop.
    val merges = Bpe.train("aaab aaab aab", 120)
    assert(merges == Seq(("a", "a"), ("a", "b"), ("aa", "ab")))
    // aaab -> [aaab] (1), aab -> [aa, b] (2)
    assert(Bpe.tokenCountChars("aaab aab aaab", merges.toIndexedSeq) == 1 + 2 + 1)
  }

  test("distributed corpus training ≡ sequential reference train; tokenCountUnder ≡ tokenCountChars") {
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
    // application parity: the Column fold equals the driver reference
    val got = docs.select(col("doc_id"),
        Bpe.tokenCountUnder(col("text"), distTable).as("n"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    docs.select(col("doc_id"), col("text")).collect().foreach { r =>
      val expect = Bpe.tokenCountChars(r.getString(1), distTable.toIndexedSeq)
      assert(got(r.getLong(0)) == expect,
        s"doc ${r.getLong(0)}: column fold ${got(r.getLong(0))} vs reference $expect")
    }
    // toy-corpus law: same hand-computed sequence as the sequential test
    val toy = Seq((1L, "aaab aaab aab")).toDF("doc_id", "text")
    assert(Bpe.trainCorpus(toy, "text", 3) == Seq(("a", "a"), ("a", "b"), ("aa", "ab")))
  }

  test("byte corpus training: distributed ≡ sequential trainBytes; application parity; byte-complete") {
    import spark.implicits._
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    // the same word multiset sequentially: concatenate the corpus text
    val all = docs.select(col("text")).collect().map(_.getString(0)).mkString(" ")
    val seqTable = Bpe.trainBytes(all, 6)
    val distTable = Bpe.trainCorpusBytes(docs, "text", 6)
    assert(distTable == seqTable,
      s"distributed byte merges $distTable diverged from sequential $seqTable")
    // partitioning cannot move a merge (exact counts, total-order argmax)
    assert(Bpe.trainCorpusBytes(docs.repartition(7), "text", 6) == seqTable)
    // application parity: the Column fold equals the rank-ordered local
    // reference under the same trained table
    val got = docs.select(col("doc_id"),
        Bpe.tokenCountUnderBytes(col("text"), distTable).as("n"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    docs.select(col("doc_id"), col("text")).collect().foreach { r =>
      val expect = Bpe.encodeSymbols(r.getString(1), distTable.toIndexedSeq).length
      assert(got(r.getLong(0)) == expect,
        s"doc ${r.getLong(0)}: column fold ${got(r.getLong(0))} vs reference $expect")
    }
    // byte-completeness: case, punctuation, digits and non-ASCII all
    // train and tokenize — nothing is dropped, no UNK
    val toy = Seq((1L, "Héllo, Wörld! 42 Héllo, 42")).toDF("doc_id", "text")
    val toyTable = Bpe.trainCorpusBytes(toy, "text", 2)
    assert(toyTable == Bpe.trainBytes("Héllo, Wörld! 42 Héllo, 42", 2))
    val toyGot = toy.select(Bpe.tokenCountUnderBytes(col("text"), toyTable))
      .head().getInt(0)
    assert(toyGot ==
      Bpe.encodeSymbols("Héllo, Wörld! 42 Héllo, 42", toyTable.toIndexedSeq).length)
  }

  test("trained-table encode-to-ids (the x161 lane): chain ≡ local reference, ids in the minted vocab") {
    // the production-lane composition: TRAIN on the corpus, freeze,
    // encode under the trained table — the id sequences must equal the
    // rank-ordered sequential reference under the same vocabOf mint
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    val table = Bpe.trainCorpusBytes(docs, "text", 6).toIndexedSeq
    val got = docs.select(col("doc_id"),
        Bpe.encodeIdsChain(col("text"), table).as("ids"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Int](1).toList).toMap
    val vocabIds = Bpe.vocabOf(table).map(_._2).toSet
    docs.select(col("doc_id"), col("text")).collect().foreach { r =>
      val expect = Bpe.encodeIdsLocal(r.getString(1), table).toList
      assert(got(r.getLong(0)) == expect,
        s"doc ${r.getLong(0)}: trained-table chain ids diverged from reference")
      assert(expect.forall(vocabIds.contains),
        s"doc ${r.getLong(0)}: id outside the minted vocab")
    }
  }

  test("fixed byte merge table is deterministic, non-trivial, and learns real subwords") {
    assert(Bpe.merges == Bpe.trainBytes(Bpe.seedTextBytes, 160))
    assert(Bpe.merges.length >= 120, s"only ${Bpe.merges.length} merges learned")
    val symbols = Bpe.merges.map { case (a, b) => a + b }
    // the seed's repeated stems must produce multi-BYTE subword symbols
    // (a 4-byte subword is 8 hex chars)
    assert(symbols.exists(_.length >= 8), symbols.mkString(","))
    // every symbol is an even-length lowercase hex string (byte sequence)
    symbols.foreach { s =>
      assert(s.length % 2 == 0 && s.forall(c => (c >= '0' && c <= '9') || (c >= 'a' && c <= 'f')), s)
    }
    // the extended seed must have taught at least one merge outside the
    // old [a-z0-9] alphabet: a pair whose merged bytes include a
    // capital letter, punctuation or a non-ASCII byte
    def hasNonAlnumByte(hexStr: String): Boolean =
      hexStr.grouped(2).map(h => Integer.parseInt(h, 16)).exists { b =>
        !((b >= 'a' && b <= 'z') || (b >= '0' && b <= '9'))
      }
    assert(symbols.exists(hasNonAlnumByte),
      "byte-complete training must learn case/punctuation/UTF-8 merges")
    // rank order: a merged symbol only ever appears in later-rank pairs
    // (the property that makes rank-order application correct)
    Bpe.merges.zipWithIndex.foreach { case ((a, b), r) =>
      val born = symbols.indexOf(a).max(symbols.indexOf(b))
      if (born >= 0) assert(born < r, s"pair ($a,$b) at rank $r uses symbol born at $born")
    }
  }

  test("token counts: bounded by bytes and words, total over arbitrary text") {
    for (text <- byteFixtures) {
      val n = Bpe.tokenCount(text)
      val ws = Bpe.wordsBytes(text)
      val nBytes = ws.map(_.getBytes(java.nio.charset.StandardCharsets.UTF_8).length).sum
      assert(n >= ws.length, s"'$text': $n tokens < ${ws.length} words")
      assert(n <= nBytes, s"'$text': $n tokens > byte count $nBytes")
      if (ws.nonEmpty) assert(n > 0, s"'$text': non-empty text must tokenize")
    }
    assert(Bpe.tokenCount("") == 0)
    assert(Bpe.tokenCount("  \t\n ") == 0)
    // byte completeness: punctuation-only text is NOT dropped (the
    // [a-z0-9]-only convention used to emit zero tokens here)
    assert(Bpe.tokenCount("!!! ---") > 0)
  }

  test("native count matches the reference implementation on real docs, both execution paths") {
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

  test("null text yields null count; seed stems merge to single tokens") {
    import spark.implicits._
    val df = Seq(Some("the streaming engine"), None).toDF("text")
    val rows = df.select(TextExpressions.bpeTokenCountNative(col("text"))).collect()
    assert(!rows(0).isNullAt(0) && rows(1).isNullAt(0))
    // seed-stem words should merge into few symbols: 'the' is one token
    assert(Bpe.tokenCount("the the the") == 3)
  }

  test("vocab: byte base ids 0-255, merge mints from 256, first-wins on duplicates") {
    val base = Bpe.vocab.toMap
    // base alphabet pinned: byte 0x00 -> 0 .. 0xff -> 255
    assert(base("00") == 0 && base("0a") == 10 && base("61") == 0x61 && base("ff") == 255)
    // first merge mints id 256
    val (a0, b0) = Bpe.merges.head
    assert(base(a0 + b0) == 256)
    // ids unique, symbols unique (first-wins collapses duplicate mints)
    assert(Bpe.vocab.map(_._1).distinct.length == Bpe.vocab.length)
    assert(Bpe.vocab.map(_._2).distinct.length == Bpe.vocab.length)
    // merged symbols (length >= 4) can never collide with a 2-char base
    // symbol; a constructed duplicate mint between merge chains:
    // (61,61)->6161, then (61,6161)->616161 and a hypothetical
    // (6161,61)->616161 collide; the first occurrence keeps its id
    val dup = Bpe.vocabOf(Seq(("61", "61"), ("61", "6161"), ("6161", "61"))).toMap
    assert(dup("616161") == 257, s"first mint of '616161' must win: ${dup("616161")}")
  }

  test("encode ids: native expr ≡ replace-chain ≡ local reference; byte round-trip; length = count") {
    import spark.implicits._
    val sample = Tables.documents(spark, "/root/testdata/sf0.001").limit(40)
      .select(col("doc_id"), col("text")).as[(Long, String)].collect().toSeq
    // fixture ids start past the sampled id range — a colliding key in
    // the textOf map below would silently shadow one text and
    // misattribute its expected value (masking or faking a divergence)
    val fixtureBase = sample.map(_._1).max + 1L
    val fixtures = byteFixtures.zipWithIndex.map {
      case (t, i) => (fixtureBase + i.toLong, t)
    }
    assert(sample.map(_._1).toSet.intersect(fixtures.map(_._1).toSet).isEmpty)
    val all = (sample ++ fixtures).toDF("doc_id", "text")
    val got = all.select(col("doc_id"),
        TextExpressions.bpeEncodeIdsNative(col("text")).as("native"),
        Bpe.encodeIdsChain(col("text")).as("chain"))
      .as[(Long, Seq[Int], Seq[Int])].collect()
    val textOf = (sample ++ fixtures).toMap
    got.foreach { case (id, native, chain) =>
      val text = textOf(id)
      val expect = Bpe.encodeIdsLocal(text)
      assert(native == expect, s"doc $id: native ids diverged from reference")
      assert(chain == expect, s"doc $id: replace-chain ids diverged from reference")
      // ids count IS the bpe token count (same fold)
      assert(expect.length == Bpe.tokenCount(text))
      // decode round-trip: vocab symbols of the ids re-concatenate to the
      // hex of each word's UTF-8 bytes — BPE segments, it never rewrites,
      // and NOTHING is dropped (case, punctuation, non-ASCII included)
      val sym = Bpe.vocab.map(_.swap).toMap
      assert(expect.map(sym).mkString ==
        Bpe.wordsBytes(text).map(w => Bpe.byteSyms(w).mkString).mkString,
        s"doc $id: byte round-trip failed")
    }
    // empty/whitespace-only text encodes to the empty sequence
    val empty = Seq((1L, ""), (2L, "   \t \n ")).toDF("doc_id", "text")
      .select(TextExpressions.bpeEncodeIdsNative(col("text")).as("ids"))
      .as[Seq[Int]].collect()
    assert(empty.forall(_.isEmpty))
    // punctuation-only text does NOT vanish under the byte alphabet
    val punct = Seq((1L, "!!! ---")).toDF("doc_id", "text")
      .select(TextExpressions.bpeEncodeIdsNative(col("text")).as("ids"))
      .as[Seq[Int]].head()
    assert(punct.nonEmpty)
  }
}

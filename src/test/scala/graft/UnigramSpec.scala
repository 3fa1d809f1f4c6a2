package graft

import org.apache.spark.sql.functions._

import graft.functions.{Bpe, Unigram, UnigramVocab}

/** Unigram-LM tokenizer: Viterbi semantics against hand-computed
  * likelihoods, byte-parity with a naive reference segmenter, trainer
  * determinism and coverage, vocab-file round-trip, expression/codegen
  * behavior, and the committed default vocabulary. */
class UnigramSpec extends SparkSpec {
  import spark.implicits._

  // log probs chosen so "ab|c" beats "a|b|c" and "abc" (absent) is moot
  private val tiny = UnigramVocab(Vector(
    ("a", -2.0), ("b", -2.5), ("c", -1.5), ("ab", -2.2), ("bc", -5.0)))

  /** Naive Viterbi over PREFIXES — an independent implementation of the
    * same spec (recursive + memoized, immutable lists, NO maxPieceLen
    * pruning — so it also checks the production DP's length-window
    * bound): maximize Σ log p; ties prefer fewer pieces, then the
    * longer final piece (smaller last split point); unknown codepoints
    * only when no vocabulary piece ends at a position. */
  private def naiveViterbi(word: String, v: UnigramVocab): Option[(Double, Int, List[String])] = {
    val memo = scala.collection.mutable.Map.empty[Int, Option[(Double, Int, List[String])]]
    def best(i: Int): Option[(Double, Int, List[String])] =
      if (i == 0) Some((0.0, 0, Nil))
      else memo.getOrElseUpdate(i, {
        var cur: Option[(Double, Int, List[String])] = None
        var j = 0
        while (j < i) {
          val piece = word.substring(j, i)
          val lp = v.logProb.get(piece)
          if (lp != null) best(j).foreach { case (ll, nt, toks) =>
            val cand = (ll + lp.doubleValue(), nt + 1, (piece :: toks.reverse).reverse)
            val better = cur match {
              case None => true
              case Some((cll, cnt, _)) =>
                cand._1 > cll || (cand._1 == cll && cand._2 < cnt)
              // j ascends, so an equal (ll, nt) at larger j never
              // replaces — the production DP's smaller-j preference
            }
            if (better) cur = Some(cand)
          }
          j += 1
        }
        if (cur.isEmpty) {
          // unk fallback over the single codepoint ending at i
          val lo = if (i >= 2 && Character.isSurrogatePair(word.charAt(i - 2),
            word.charAt(i - 1))) i - 2 else i - 1
          best(lo).foreach { case (ll, nt, toks) =>
            cur = Some((ll + v.unkLogProb, nt + 1,
              ((word.substring(lo, i)) :: toks.reverse).reverse))
          }
        }
        cur
      })
    best(word.length)
  }

  test("encodeWord: hand-computed likelihood argmax with tie rules") {
    // "abc": a|b|c = -6.0, ab|c = -3.7, a|bc = -7.0 → ab|c
    assert(tiny.encodeWord("abc").toSeq === Seq("ab", "c"))
    // tie on ll: "ab" as piece (-2.2) vs a|b (-4.5) → fewer pieces wins
    assert(tiny.encodeWord("ab").toSeq === Seq("ab"))
    assert(tiny.encodeWord("").toSeq === Seq())
    // unknown codepoint: unk penalty keeps the rest optimal
    assert(tiny.encodeWord("axc").toSeq === Seq("a", "x", "c"))
  }

  test("prop: production Viterbi == naive reference on random words (byte parity)") {
    val rnd = new scala.util.Random(20260816)
    // alphabet includes a char NOT in the random vocab pieces ('z') so
    // the unk path is exercised; piece sets vary per round
    (1 to 6).foreach { round =>
      val chars = Seq("a", "b", "c", "d")
      val singles = chars.map(c => (c, -1.0 - rnd.nextDouble() * 4))
      val multis = (1 to 8).map { _ =>
        val len = 2 + rnd.nextInt(3)
        ((0 until len).map(_ => chars(rnd.nextInt(chars.length))).mkString,
          -0.5 - rnd.nextDouble() * 6)
      }.distinct.filterNot(p => chars.contains(p._1))
      val v = UnigramVocab((singles ++ multis).distinct.toVector)
      (1 to 50).foreach { _ =>
        val n = rnd.nextInt(12)
        val w = (0 until n).map(_ =>
          if (rnd.nextInt(10) == 0) "z" else chars(rnd.nextInt(chars.length)))
          .mkString
        val got = v.encodeWord(w).toList
        val want = naiveViterbi(w, v).map(_._3).getOrElse(Nil)
        assert(got === want, s"round=$round word='$w' vocab=${v.pieces}")
        assert(got.mkString("") === w, "pieces must reassemble the word")
      }
    }
  }

  test("trainer: deterministic, single-codepoint coverage, piece-length cap") {
    val counts = Seq(("table", 50L), ("tablet", 20L), ("tab", 30L),
      ("let", 40L), ("able", 10L))
    val v1 = Unigram.trainFromWordCounts(counts, vocabSize = 12, maxPieceLen = 3)
    val v2 = Unigram.trainFromWordCounts(counts, vocabSize = 12, maxPieceLen = 3)
    assert(v1 === v2, "training must be deterministic")
    val pieces = v1.pieces.map(_._1).toSet
    // every codepoint survives pruning (coverage guarantee)
    assert(Set("t", "a", "b", "l", "e").subsetOf(pieces))
    assert(v1.pieces.forall(_._1.length <= 3), "maxPieceLen cap violated")
    // probabilities are a (log) distribution over genuinely-used pieces
    val used = v1.pieces.filter(_._2 > -1e8)
    assert(math.abs(used.map(p => math.exp(p._2)).sum - 1.0) < 1e-6)
    // the trained model segments its own training words economically:
    // frequent trigrams become pieces, so "table" is at most 2 pieces
    assert(v1.encodeWord("table").length <= 2, v1.encodeWord("table").toSeq)
  }

  test("vocab text round-trip is byte-identical (logprob shortest-repr)") {
    val v = Unigram.trainFromWordCounts(
      Seq(("abc", 5L), ("abd", 3L), ("cd", 7L)), vocabSize = 8, maxPieceLen = 2)
    val txt = v.toVocabText
    val back = UnigramVocab.fromVocabText(txt)
    assert(back === v)
    assert(back.toVocabText === txt)
  }

  test("expression: tokens/count agree and stay inside whole-stage codegen") {
    val v = UnigramVocab.default
    val df = Tables.load(spark, sf001, "documents")
      .select(Bpe.sanitizeAscii($"text").as("t"))
    val both = df.select(
      size(Unigram.unigramTokens($"t", v)).cast("long").as("n_arr"),
      Unigram.unigramTokenCount($"t", v).as("n_cnt"))
    assert(both.filter($"n_arr" =!= $"n_cnt").count() === 0)
    // the Project carrying the kernels must sit under a codegen star —
    // a fallback/udf would break the fused scan stage (BpeSpec's check)
    val plan = both.queryExecution.executedPlan.toString
    assert(plan.contains("*(1)"), s"no codegen stage:\n$plan")
    assert(!plan.contains("BatchEvalPython") && !plan.contains("ScalaUDF"))
    // the committed default is non-trivial: multi-char pieces exist and
    // counts sit strictly between piece count and char count
    assert(v.pieces.exists(_._1.length > 1))
    val row = df.limit(50)
      .select(sum(size(Bpe.pieces($"t"))).cast("long"),
        sum(Unigram.unigramTokenCount($"t", v)),
        sum(length(regexp_replace($"t", " ", "")))).head()
    val (nPieces, nUni, nChars) = (row.getLong(0), row.getLong(1), row.getLong(2))
    assert(nUni >= nPieces && nUni < nChars,
      s"pieces=$nPieces uni=$nUni chars=$nChars")
  }
}

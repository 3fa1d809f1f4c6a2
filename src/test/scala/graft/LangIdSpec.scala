package graft

import org.apache.spark.sql.functions._
import graft.functions.LangId

/** The trainable language identifier (q134): learning on a separable
  * fixture, deterministic retrains, argmax/tie pinning, one-scan plan.
  * (The q134 oracle pins the arithmetic on the synthetic corpus, whose
  * lang labels are weakly text-correlated — THIS spec is where actual
  * class separation is asserted.) */
class LangIdSpec extends SparkSpec {
  import spark.implicits._

  // three "languages" with genuinely different character statistics
  private def fixture = Seq(
    (1L, "aa", "the quick brown fox jumps over the lazy dog again"),
    (2L, "aa", "a brown dog and a quick fox play over the green grass"),
    (3L, "aa", "the lazy fox naps while the brown dog watches the yard"),
    (4L, "bb", "zzyzx qzv xq zyx vzq zzq xvz qqz zxv yzz qzz vxq"),
    (5L, "bb", "xq zzv qzy vxz zqz yxz qvv zxz qyz vzz xqz zyv"),
    (6L, "bb", "zyq vqz xzz qvy zxq yvz qzx zvy xyz qzq vyx zqv"),
    (7L, "cc", "mimi momo mumu meme mama momi mimo mumo memi mamo"),
    (8L, "cc", "momo mimi mame mumi momu mima memo mumu mami mome"),
    (9L, "cc", "mumu meme momi mima mome mimu mamo memu mimo momа")
  ).toDF("doc_id", "lang", "text")

  test("learns separable classes, retrains bit-identically, predicts in one scan") {
    val m1 = LangId.train(fixture, "text", "lang", buckets = 512)
    val m2 = LangId.train(fixture, "text", "lang", buckets = 512)
    assert(m1.langs === Seq("aa", "bb", "cc"))
    m1.langs.foreach { l =>
      assert(m1.weights(l).sameElements(m2.weights(l)), s"weights $l")
      assert(m1.priors(l) === m2.priors(l), s"prior $l")
    }
    // uniform doc counts -> identical priors; separation must come
    // from the char-gram likelihoods
    assert(m1.priors("aa") === m1.priors("bb"))
    val pred = LangId.predict(fixture, "doc_id", "text", m1)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val truth = fixture.collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert((1L to 9L).forall(i => pred(i) == truth(i)),
      s"misclassified: ${pred.filter(p => p._2 != truth(p._1))}")
    // held-out sentences in each style classify correctly
    val held = Seq((10L, "the quick dog and the lazy fox"),
      (11L, "qzv zyx zzq xvq zqy"), (12L, "mumu mami momo mimu"))
      .toDF("doc_id", "text")
    val heldPred = LangId.predict(held, "doc_id", "text", m1)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(heldPred === Map(10L -> "aa", 11L -> "bb", 12L -> "cc"))
    // prediction is one codegen'd scan: zero exchanges
    val plan = LangId.predict(Tables.load(spark, sf001, "documents"),
        "doc_id", "text", m1)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan)
  }

  test("argmax ties break to the lexicographically smaller language") {
    // two classes trained on IDENTICAL text: every doc scores equal
    // under both (same likelihoods, same priors) -> the tie must go to
    // the smaller language name, deterministically
    val tied = Seq((1L, "xx", "same words here"), (2L, "yy", "same words here"))
      .toDF("doc_id", "lang", "text")
    val m = LangId.train(tied, "text", "lang", buckets = 128)
    val p = LangId.predict(tied, "doc_id", "text", m)
      .collect().map(r => (r.getLong(0), r.getString(1)))
    assert(p.forall(_._2 == "xx"), p.mkString(","))
  }

  test("shorter-than-n documents contribute NO grams to training") {
    // review finding, pinned: sequence(1, 0) counts DOWN in Spark, so
    // an unguarded gram window would inject two bogus partial grams
    // per short doc — the class likelihoods must be byte-identical
    // with and without a 2-char document (only the doc-count prior moves)
    val base = LangId.train(fixture, "text", "lang", buckets = 128)
    val withShort = LangId.train(
      fixture.union(Seq((99L, "aa", "ab")).toDF("doc_id", "lang", "text")),
      "text", "lang", buckets = 128)
    assert(withShort.weights("aa").sameElements(base.weights("aa")),
      "a 2-char doc must not contribute char trigrams")
    assert(withShort.weights("bb").sameElements(base.weights("bb")))
    assert(withShort.priors("aa") > base.priors("aa"),
      "the doc-count prior still moves")
  }

  test("empty text predicts from priors alone, never throws") {
    val m = LangId.train(fixture, "text", "lang", buckets = 128)
    val p = LangId.predict(Seq((1L, "")).toDF("doc_id", "text"),
        "doc_id", "text", m)
      .collect()
    assert(p.length === 1)
    // equal priors -> tie -> smallest lang
    assert(p(0).getString(1) === "aa")
  }
}

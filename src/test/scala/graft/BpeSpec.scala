package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.Bpe

class BpeSpec extends AnyFunSuite with SparkSuite {
  import spark.implicits._

  test("trainMerges: hand-checked weighted-vocab example") {
    // vocab {aaab:2, aab:1}. Pair counts: (a,a) = 2·2 + 1 = 5, (a,b) = 3.
    // Merge 1 = (a,a). Vocab → {[aa,a,b]:2, [aa,b]:1}.
    // Pair counts: (aa,a)=2, (a,b)=2, (aa,b)=1 — tie broken lexicographically
    // → (a,b) < (aa,a). Merge 2 = (a,b).
    val merges = Bpe.trainMerges(Seq("aaab" -> 2L, "aab" -> 1L), 2)
    assert(merges == Seq(("a", "a"), ("a", "b")))
    assert(Bpe.tokenizeWord("aaab", merges) == List("aa", "ab"))
    assert(Bpe.tokenizeWord("aab", merges) == List("aa", "b"))
    // OOV word under the same merges: merges still apply
    assert(Bpe.tokenizeWord("aaaa", merges) == List("aa", "aa"))
  }

  test("trainMerges stops early when no pairs remain; single-char words survive") {
    val merges = Bpe.trainMerges(Seq("ab" -> 3L, "x" -> 5L), 10)
    assert(merges == Seq(("a", "b"))) // only one mergeable pair ever exists
    assert(Bpe.tokenizeWord("x", merges) == List("x"))
    assert(Bpe.tokenizeWord("", merges) == Nil)
  }

  test("single merge pass is exact: merging cannot re-create its own pair") {
    // "aaa" with (a,a): leftmost merge wins, no re-scan needed
    assert(Bpe.applyMerge(List("a", "a", "a"), "a", "a") == List("aa", "a"))
    assert(Bpe.applyMerge(List("a", "a", "a", "a"), "a", "a") == List("aa", "aa"))
    assert(Bpe.applyMerge(List("a", "b", "b"), "a", "b") == List("ab", "b"))
  }

  test("tokenize totality: tokens concatenate back to the word, count <= length") {
    val docs = Tables.documents(spark, Sf0001)
    val tk = Bpe.train(docs, k = 512, nMerges = 24)
    assert(tk.words.length <= 512 && tk.merges.nonEmpty)
    tk.words.foreach { w =>
      val toks = Bpe.tokenizeWord(w, tk.merges)
      assert(toks.mkString == w)
      assert(toks.length <= w.length && toks.nonEmpty)
    }
    // learned compression on the training vocab: merges actually fire
    assert(tk.words.zip(tk.tokenCounts).exists { case (w, c) => c < w.length })
  }

  test("canonical applier: diverges from single-pass on out-of-order external lists (VERDICT r14 item 7)") {
    // external-convention list: the HIGH-priority merge ("a","bc") consumes
    // a symbol only the LOWER-priority merge ("b","c") produces — the
    // single in-order pass has already walked past it and under-merges
    val ext = Seq(("a", "bc"), ("b", "c"))
    assert(Bpe.tokenizeWord("abc", ext) == List("a", "bc"))          // under-merged
    assert(Bpe.tokenizeWordCanonical("abc", ext) == List("abc"))     // canonical
    // priority order matters: reversed ranks re-merge differently on ties
    val tie = Seq(("b", "c"), ("a", "b"))
    // canonical fires ("b","c") first (rank 0) — "ab"+"c" never forms
    assert(Bpe.tokenizeWordCanonical("abc", tie) == List("a", "bc"))
    // duplicate pair listings: FIRST listing's priority wins
    val dup = Seq(("a", "bc"), ("b", "c"), ("a", "bc"))
    assert(Bpe.tokenizeWordCanonical("abc", dup) == List("abc"))
    // totality on the degenerate inputs
    assert(Bpe.tokenizeWordCanonical("", ext) == Nil)
    assert(Bpe.tokenizeWordCanonical("x", ext) == List("x"))
  }

  test("canonical ≡ single-pass for SELF-TRAINED merge lists (creation order)") {
    val docs = Tables.documents(spark, Sf0001)
    val tk = Bpe.train(docs, k = 256, nMerges = 24)
    tk.words.foreach { w =>
      assert(Bpe.tokenizeWordCanonical(w, tk.merges) == Bpe.tokenizeWord(w, tk.merges),
        s"divergence on self-trained list at word '$w'")
    }
    // importMerges over the SAME corpus + self-trained list therefore
    // reproduces the trained scoring table exactly
    val imported = Bpe.importMerges(docs, tk.merges, k = 256)
    assert(imported.words.toSeq == tk.words.toSeq)
    assert(imported.tokenCounts.toSeq == tk.tokenCounts.toSeq)
  }

  test("importMerges: external list scores through the canonical applier") {
    val docs = Seq((1L, "abc abc xyz")).toDF("doc_id", "text")
    val ext = Seq(("a", "bc"), ("b", "c"))
    val tk = Bpe.importMerges(docs, ext, k = 16)
    val counts = tk.words.zip(tk.tokenCounts).toMap
    assert(counts("abc") == 1.0) // canonical: b+c → bc, then a+bc → abc
    assert(counts("xyz") == 3.0) // untouched by the merge list
    // the distributed accounting consumes the imported table end-to-end
    val row = Bpe.tokenCountsOf(docs, tk).collect().head
    assert(row.getLong(2) == 1L + 1L + 3L) // n_tokens = abc + abc + xyz
  }

  test("imported gate fixture: out-of-order chain list diverges and differs from trained") {
    val docs = Tables.documents(spark, Sf0001)
    val trained = Bpe.train(docs, k = 512, nMerges = 24)
    val wc = Bpe.wordCounts(docs, 512)
    val ext = Bpe.gateImportList(wc)
    val w = wc.collectFirst { case (s, _) if s.length >= 3 => s }.get
    // the chain is genuinely out-of-creation-order: single-pass under-merges
    // the anchor word, the canonical applier reaches the 3-char fusion
    assert(Bpe.tokenizeWord(w, ext).length
      == Bpe.tokenizeWordCanonical(w, ext).length + 1,
      s"chain fixture did not diverge on '$w'")
    val imported = Bpe.importMerges(docs, ext, k = 512)
    assert(imported.words.toSeq == trained.words.toSeq) // same vocab, same order
    // the imported table must differ from the trained one, otherwise the
    // bpe_token_counts_imported gate would duplicate bpe_token_counts
    assert(imported.tokenCounts.toSeq != trained.tokenCounts.toSeq)
    // totality under the canonical applier
    imported.words.take(50).foreach { s =>
      assert(Bpe.tokenizeWordCanonical(s, ext).mkString == s)
    }
  }

  test("training is partitioning-independent (total orders everywhere)") {
    val docs = Tables.documents(spark, Sf0001)
    val a = Bpe.train(docs.repartition(13), k = 256, nMerges = 12)
    val b = Bpe.train(docs.coalesce(1), k = 256, nMerges = 12)
    assert(a.merges == b.merges)
    assert(a.words.toSeq == b.words.toSeq)
    assert(a.tokenCounts.toSeq == b.tokenCounts.toSeq)
  }

  test("distributed token accounting equals a driver-side recompute") {
    val docs = Tables.documents(spark, Sf0001)
    val tk = Bpe.train(docs, k = 512, nMerges = 24)
    val got = Bpe.tokenCountsOf(docs, tk).orderBy("doc_id").collect()
    val raw = docs.select("doc_id", "text").orderBy("doc_id")
      .as[(Long, String)].collect()
    val table = tk.words.zip(tk.tokenCounts).toMap
    got.zip(raw).foreach { case (r, (id, text)) =>
      val ws = text.split(" ", -1)
      assert(r.getLong(0) == id)
      assert(r.getLong(1) == ws.length)
      val toks = ws.map(w => table.getOrElse(w, w.length.toDouble)).sum.toLong
      assert(r.getLong(2) == toks)
      assert(r.getLong(3) == ws.map(_.length).sum.toLong)
    }
  }

  test("binding cap: out-of-table words fall back to character count") {
    val docs = Seq((0L, "zz zz qqqq"), (1L, "zz")).toDF("doc_id", "text")
    val tk = Bpe.train(docs, k = 1, nMerges = 4) // table = {zz} only
    assert(tk.words.toSeq == Seq("zz"))
    val out = Bpe.tokenCountsOf(docs, tk).orderBy("doc_id").collect()
    // doc 0: zz → 1 learned token ((z,z) merged), qqqq → 4 chars fallback
    assert(out(0).getLong(2) == 1 + 1 + 4)
    assert(out(1).getLong(2) == 1)
  }

  test("scoring pass is narrow: no exchange in the executed plan") {
    val docs = Tables.documents(spark, Sf0001)
    val tk = Bpe.train(docs, k = 128, nMerges = 8)
    val plan = Bpe.tokenCountsOf(docs, tk).queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"unexpected exchange:\n$plan")
  }
}

package graft.llm

import org.apache.spark.sql.DataFrame

import graft.SparkSuite

/** Golden tests for the near-dup operators on a hand-written corpus with
  * KNOWN duplicate structure — the driver's oracle proves engine parity on
  * the synthetic tables; these prove the operators find what they should. */
class DedupSpec extends SparkSuite {
  import spark.implicits._

  // doc 0/1: near-identical (one token changed) → high Jaccard, tiny hamming
  // doc 2:   exact copy of doc 0 → Jaccard 1, hamming 0
  // doc 3:   unrelated vocabulary
  private def corpus: DataFrame = Seq(
    (0L, "the quick brown fox jumps over the lazy dog near the river bank today", "en"),
    (1L, "the quick brown fox jumps over the lazy cat near the river bank today", "en"),
    (2L, "the quick brown fox jumps over the lazy dog near the river bank today", "en"),
    (3L, "completely different words about spark shuffles partitions and codegen stages", "en")
  ).toDF("doc_id", "text", "lang")

  private def withCorpus[T](f: String => T): T = {
    val tmp = java.nio.file.Files.createTempDirectory("dedup_spec_").toString
    corpus.write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    f(tmp)
  }

  test("minhash LSH: exact copies and one-token edits are found; unrelated docs are not") {
    withCorpus { dir =>
      val pairs = Dedup.queries("q_dedup_minhash")(spark, dir)
        .select("doc_a", "doc_b", "jaccard")
        .as[(Long, Long, Double)].collect().toSeq
      val byPair = pairs.map { case (a, b, j) => (a, b) -> j }.toMap
      assert(byPair((0L, 2L)) === 1.0)            // exact copy
      assert(byPair((0L, 1L)) > 0.7)              // one-token edit
      assert(!byPair.keySet.exists { case (a, b) => a == 3L || b == 3L }) // unrelated
    }
  }

  test("incremental dedup: new batch flagged only against the existing corpus") {
    withCorpus { dir =>
      // new batch = odd ids {1, 3}; existing corpus = even ids {0, 2}
      val rows = Dedup.queries("q_dedup_incremental")(spark, dir).collect()
      val byId = rows.map(r => r.getLong(0) ->
        ((if (r.isNullAt(1)) None else Some(r.getLong(1))), r.getBoolean(2))).toMap
      assert(byId.keySet == Set(1L, 3L), "output is not exactly the new batch")
      assert(byId(1L) == ((Some(0L), true)), "near-identical new doc not matched to corpus")
      assert(byId(3L) == ((None, false)), "unrelated new doc wrongly flagged")
    }
  }

  test("simhash: identical docs share a signature; near-identical docs are close; unrelated far") {
    withCorpus { dir =>
      val sig = Dedup.queries("q_dedup_simhash")(spark, dir)
        .as[(Long, Long)].collect().toMap
      assert(sig(0L) === sig(2L))
      def hamming(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
      assert(hamming(sig(0L), sig(1L)) <= 6)
      assert(hamming(sig(0L), sig(3L)) > 6)
      // the pairs query reports the hamming-0 cluster
      val pairs = Dedup.queries("q_dedup_simhash_pairs")(spark, dir)
        .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
      assert(pairs.contains((0L, 2L)))
    }
  }

  test("ngram jaccard: minhash-banded candidates found with exact 3-gram similarity") {
    withCorpus { dir =>
      val pairs = Dedup.queries("q_dedup_ngram")(spark, dir)
        .select("doc_a", "doc_b", "jaccard")
        .as[(Long, Long, Double)].collect().toSeq
      val byPair = pairs.map { case (a, b, j) => (a, b) -> j }.toMap
      assert(byPair((0L, 2L)) === 1.0)
      assert(byPair((0L, 1L)) > 0.5) // one-token edit kills 3 of 12 trigrams
      assert(!byPair.keySet.exists { case (a, b) => a == 3L || b == 3L })
    }
  }

  test("ngram jaccard: near-dups straddling a length-bucket boundary are found") {
    // A 51-token doc vs its 49-token truncation: the round-4 blocking keyed
    // candidates on floor(n_tokens/10), so this pair landed in buckets 5 vs 4
    // and was silently missed. MinHash band candidates have no length
    // boundary to straddle — the pair must surface with near-1 Jaccard.
    val vocab = (0 until 60).map(i => f"tok$i%02d")
    val rows = Seq(
      (10L, (0 until 51).map(vocab).mkString(" "), "en"),
      (11L, (0 until 49).map(vocab).mkString(" "), "en"),
      (12L, "unrelated words entirely disjoint vocabulary right here today", "en"))
    val tmp = java.nio.file.Files.createTempDirectory("dedup_spec_").toString
    rows.toDF("doc_id", "text", "lang").write.mode("overwrite")
      .parquet(s"$tmp/documents.parquet")
    val pairs = Dedup.queries("q_dedup_ngram")(spark, tmp)
      .select("doc_a", "doc_b", "jaccard")
      .as[(Long, Long, Double)].collect().toSeq
    val byPair = pairs.map { case (a, b, j) => (a, b) -> j }.toMap
    assert(byPair.contains((10L, 11L)), s"cross-bucket near-dup missed: $byPair")
    assert(byPair((10L, 11L)) > 0.9)
    assert(!byPair.keySet.exists { case (a, b) => a == 12L || b == 12L })
  }

  test("simhash hamming<=k: banded pairs equal brute force on a wide-vocab corpus") {
    // 40 synthetic docs of 30 tokens from a 200-word vocabulary, plus a
    // planted one-token mutation of doc 0 and an exact copy of doc 1. The
    // wide vocabulary keeps bigram signatures spread out (selective radius).
    val vocab = (0 until 200).map(i => f"w$i%03d")
    def doc(seed: Int): String =
      (0 until 30).map(j => vocab((seed * 17 + j * 13) % 200)).mkString(" ")
    val mutated = doc(0).split(" ").toVector.updated(15, "zzz").mkString(" ")
    val rows = (0 until 40).map(i => (i.toLong, doc(i))) ++
      Seq((40L, mutated), (41L, doc(1)))
    val df = rows.toDF("doc_id", "text")

    val k = 6
    val sigs = Dedup.simhashBigrams(df)
    val banded = Dedup.simhashPairsWithinK(sigs, k)
      .select("doc_a", "doc_b", "hamming").as[(Long, Long, Int)].collect().toSet
    val sigArr = sigs.as[(Long, Long)].collect()
    val brute = (for {
      (a, sa) <- sigArr; (b, sb) <- sigArr if a < b
      h = java.lang.Long.bitCount(sa ^ sb) if h <= k
    } yield (a, b, h)).toSet

    assert(banded === brute)                 // exact recall AND precision
    assert(brute.contains((1L, 41L, 0)))     // exact copy at hamming 0
    val allPairs = sigArr.length * (sigArr.length - 1) / 2
    assert(brute.size < allPairs / 4, s"radius $k not selective: ${brute.size}/$allPairs")
  }

  test("embedding LSH geometry scales with corpus size") {
    // sf0.01 reproduces the historical 2-band × 4-bit layout exactly
    assert(Dedup.embeddingLshParams(500L) === ((2, 4)))
    // growth: buckets per band (2^bits) track n/32 until the 16-bit cap;
    // band count widens as bands get longer
    assert(Dedup.embeddingLshParams(1000L) === ((2, 5)))
    assert(Dedup.embeddingLshParams(100000L) === ((3, 12)))
    assert(Dedup.embeddingLshParams(1000000L) === ((3, 15)))
    assert(Dedup.embeddingLshParams(1000000000L) === ((4, 16)))
    // monotone, never shrinking on a growing corpus
    val params = Seq(1L, 100L, 10000L, 1000000L, 100000000L, 10000000000L)
      .map(Dedup.embeddingLshParams)
    assert(params.map(_._1) === params.map(_._1).sorted)
    assert(params.map(_._2) === params.map(_._2).sorted)
  }

  test("embedding LSH recall audit: sane bounds, and near-identical pairs are found") {
    val Seq((nTrue, nFound, recall)) =
      Dedup.queries("q_dedup_embedding_recall")(spark, sfDir)
        .as[(Long, Long, Double)].collect().toSeq
    assert(nFound <= nTrue)
    assert(recall >= 0.0 && recall <= 1.0)
    assert(nTrue > 0, "probe panel found no ground-truth pairs — audit is vacuous")
    // high-similarity pairs (the ones dedup must not miss) are found: every
    // ground-truth pair at cosine >= 0.9 appears in the LSH output
    val lsh = Dedup.queries("q_dedup_embedding")(spark, sfDir)
      .select("vec_a", "vec_b").as[(Long, Long)].collect().toSet
    val emb = graft.Tables(spark, sfDir, "embeddings")
      .select($"vec_id", $"embedding").as[(Long, Seq[Float])].collect()
    val mod = Dedup.probePanelModulus(emb.length.toLong)
    val probes = emb.filter(_._1 % mod == 0)
    def dot(a: Seq[Float], b: Seq[Float]): Double =
      a.zip(b).map { case (x, y) =>
        math.floor(x.toDouble * y.toDouble * 1e12).toLong }.sum / 1e12
    for ((p, pe) <- probes; (v, ve) <- emb if v != p && dot(pe, ve) >= 0.9) {
      val pair = (math.min(p, v), math.max(p, v))
      assert(lsh.contains(pair), s"high-sim pair $pair missed by LSH")
    }
  }

  test("recall-audit probe panel stays bounded as the corpus grows") {
    // panel size n/mod must hold ~ProbePanelTarget at ANY corpus size —
    // the round-5 verdict's finding was a fixed modulus whose panel grew
    // linearly (2 % of the corpus). Sweep 8 decades of n: never above the
    // target, and (once the corpus exceeds the target) never below half
    // of it — the panel is flat, not shrinking or growing.
    val target = Dedup.ProbePanelTarget
    for (n <- Seq(10L, 500L, 25000L, 1000000L, 100000000L, 10000000000L,
                  1000000000000L, 100000000000000L)) {
      val m = Dedup.probePanelModulus(n)
      val panel = n / m   // probes at vec_id ≡ 0 (mod m), ids dense from 0
      assert(panel <= target, s"n=$n: panel $panel exceeds target $target")
      if (n > target)
        assert(panel > target / 2, s"n=$n: panel $panel collapsed below ${target / 2}")
    }
    // 10× growth changes the panel by at most 2× (power-of-two modulus)
    val sizes = Seq(1000L, 10000L, 100000L, 1000000L, 10000000L)
      .map(n => n / Dedup.probePanelModulus(n))
    for (Seq(a, b) <- sizes.sliding(2))
      assert(math.max(a, b) <= 2 * math.min(a, b),
        s"panel whipsawed across a 10x step: $sizes")
  }

  test("exact dedup is idempotent and keeps the latest row per key") {
    val out1 = Dedup.queries("q_dedup_exact")(spark, sfDir)
    // keeps exactly one row per (user_id, event_type)
    assert(out1.groupBy("user_id", "event_type").count()
      .filter($"count" > 1).count() === 0)
    // applying the same keep-latest logic again changes nothing
    val n1 = out1.count()
    val again = {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("user_id", "event_type")
        .orderBy(org.apache.spark.sql.functions.desc("ts"),
          org.apache.spark.sql.functions.desc("event_id"))
      out1.withColumn("rn", org.apache.spark.sql.functions.row_number().over(w))
        .filter($"rn" === 1).drop("rn")
    }
    assert(again.count() === n1)
    // kept ts is the max ts of its group in the source
    val src = graft.Tables(spark, sfDir, "events")
      .groupBy("user_id", "event_type")
      .agg(org.apache.spark.sql.functions.max("ts").as("max_ts"))
    val joined = out1.join(src, Seq("user_id", "event_type"))
    assert(joined.filter($"ts" =!= $"max_ts").count() === 0)
  }

  test("embedding near-dup LSH finds the planted near-identical pair") {
    // 8 anchor-ish unit vectors (one-hot dims 0..7) + a planted near-dup
    // pair at vec_id 8/9 (cosine ~= 0.9992) + an orthogonal vector at 10
    val dim = 16
    def unit(v: Array[Float]): Array[Float] = {
      val n = math.sqrt(v.map(x => x.toDouble * x).sum).toFloat
      v.map(_ / n)
    }
    def oneHot(i: Int) = { val a = new Array[Float](dim); a(i) = 1f; a }
    val base = unit(Array.tabulate(dim)(i => (i % 5 + 1).toFloat))
    val nearDup = unit(Array.tabulate(dim)(i => base(i) + (if (i == 0) 0.05f else 0f)))
    val rows = (0 until 8).map(i => (i.toLong, oneHot(i), 0)) ++
      Seq((8L, base, 1), (9L, nearDup, 1), (10L, oneHot(15), 2))
    val tmp = java.nio.file.Files.createTempDirectory("emb_spec_").toString
    rows.toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$tmp/embeddings.parquet")
    val pairs = Dedup.queries("q_dedup_embedding")(spark, tmp)
      .select("vec_a", "vec_b", "cosine")
      .as[(Long, Long, Double)].collect().toSeq
    val byPair = pairs.map { case (a, b, c) => (a, b) -> c }.toMap
    assert(byPair.contains((8L, 9L)), s"planted pair not found: $pairs")
    assert(byPair((8L, 9L)) > 0.99)
    assert(!byPair.keySet.exists { case (a, b) => a == 10L || b == 10L })
  }

  test("approx_percentile tracks the exact percentile") {
    val li = graft.Tables(spark, sfDir, "lineitem")
    import org.apache.spark.sql.functions._
    val row = li.agg(
      percentile($"l_extendedprice", lit(0.5)).as("exact"),
      approx_percentile($"l_extendedprice", lit(0.5), lit(1000)).as("approx")).head()
    val exact = row.getDouble(0); val approx = row.getDouble(1)
    assert(math.abs(approx - exact) / exact < 0.02)
  }

  test("approx_count_distinct stays within the configured relative error") {
    val exact = graft.Tables(spark, sfDir, "lineitem")
      .select(org.apache.spark.sql.functions.countDistinct($"l_partkey")).head().getLong(0)
    val approx = graft.Tables(spark, sfDir, "lineitem")
      .select(org.apache.spark.sql.functions.approx_count_distinct($"l_partkey", 0.02))
      .head().getLong(0)
    assert(math.abs(approx - exact).toDouble / exact < 0.1)
  }

  test("connected components: label propagation equals driver-side BFS on a chain graph") {
    // chain 1-2-3-4 (non-transitive closeness), pair (10,11), singleton 20:
    // components {1,2,3,4} -> 1, {10,11} -> 10, {20} -> 20
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (10L, 11L)).toDF("doc_a", "doc_b")
    val nodes = Seq(1L, 2L, 3L, 4L, 10L, 11L, 20L).toDF("doc_id")
    val got = Dedup.connectedComponents(edges, nodes)
      .orderBy("doc_id").as[(Long, Long)].collect().toSeq
    assert(got === Seq(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      10L -> 10L, 11L -> 10L, 20L -> 20L))
  }

  test("connected components: O(log n) rounds — a 300-node chain converges within 20 iters") {
    // diameter 299: pure neighbor-min propagation needs 299 rounds and
    // would blow an explicit 20-round budget; the pointer-jumping shortcut
    // (path halving) must close it in ~log2(300) ≈ 9 rounds.
    val n = 300L
    val edges = (0L until n - 1).map(i => (i, i + 1)).toDF("doc_a", "doc_b")
    val nodes = (0L until n).toDF("doc_id")
    val labels = Dedup.connectedComponents(edges, nodes, maxIters = 20) // throws if > 20
      .as[(Long, Long)].collect()
    assert(labels.length == n)
    assert(labels.forall(_._2 == 0L), "every chain node must label to the minimum")
  }

  test("connected components: adversarial 10k-node path converges within the derived O(log n) budget") {
    // The worst case for min-label propagation: one path of diameter
    // n − 1 = 9 999. The derived budget is 2·⌈log₂ n⌉ + 4 = 32 rounds —
    // a graceful, size-aware ceiling instead of the old fixed require(20).
    val n = 10000L
    val edges = (0L until n - 1).map(i => (i, i + 1)).toDF("doc_a", "doc_b")
    val nodes = (0L until n).toDF("doc_id")
    val (labelsDf, rounds) = Dedup.connectedComponentsWithStats(edges, nodes)
    val labels = labelsDf.as[(Long, Long)].collect()
    assert(labels.length == n)
    assert(labels.forall(_._2 == 0L), "every path node must label to the minimum")
    assert(rounds <= 32, s"path-halving needed $rounds rounds on a ${n}-node path")
    // an explicitly too-small budget fails diagnostically, not with a bare abort
    val e = intercept[IllegalStateException] {
      Dedup.connectedComponentsWithStats(edges, nodes, maxIters = 3)
    }
    assert(e.getMessage.contains("budget"))
  }

  test("connected components: every near-dup pair ends in one cluster, ids are component minima") {
    val docs = graft.Tables(spark, sfDir, "documents")
    val pairs = Dedup.simhashPairsWithinK(Dedup.simhashBigrams(docs), 3)
      .select("doc_a", "doc_b")
    val labels = Dedup.connectedComponents(pairs, docs.select("doc_id"))
    val byDoc = labels.as[(Long, Long)].collect().toMap
    pairs.as[(Long, Long)].collect().foreach { case (a, b) =>
      assert(byDoc(a) === byDoc(b), s"pair ($a,$b) split across clusters")
    }
    // each cluster's id is its own minimum member
    byDoc.groupBy(_._2).foreach { case (cid, members) =>
      assert(members.keys.min === cid, s"cluster $cid min is ${members.keys.min}")
    }
  }

  test("q_dedup_spans: planted shared 8-token span is detected, unique docs report zero") {
    import org.apache.spark.sql.functions._
    val span = (1 to 8).map(i => s"shared$i").mkString(" ")
    def uniq(tag: String, n: Int) = (1 to n).map(i => s"$tag$i").mkString(" ")
    // doc 0 and doc 1 share exactly the 8-token span (at different offsets);
    // doc 2 is entirely unique
    val df = Seq(
      (0L, uniq("a", 4) + " " + span + " " + uniq("b", 3)),
      (1L, span + " " + uniq("c", 10)),
      (2L, uniq("d", 20))
    ).toDF("doc_id", "text")
    val dir = java.nio.file.Files.createTempDirectory("spans_").toString
    df.write.parquet(s"$dir/documents.parquet")
    val out = Dedup.queries("q_dedup_spans")(spark, dir).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("n_tok"), r.getAs[Long]("dup_tokens")))).toMap
    assert(out(0L) === ((15L, 8L)))  // exactly the planted span is covered
    assert(out(1L) === ((18L, 8L)))
    assert(out(2L) === ((20L, 0L)))
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
  }
}

package graft.functions

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, IntegerLiteral}

/** Registers graft's custom Catalyst expressions as SQL functions via
  * `SparkSessionExtensions`, so `spark.sql("... fixed_point_dot(a, b) ...")`
  * works the same as the Column API — the (c)-tier registration mechanism
  * from the build rules. Enable with
  * `spark.sql.extensions=graft.functions.GraftExtensions` (done in
  * `Sessions.local`).
  *
  * Integer parameters (shingle width, signature length) must be integer
  * literals — they parameterize generated code, not per-row values.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def info(name: String, usage: String) =
    new ExpressionInfo(classOf[GraftExtensions].getName, null, name, usage, "")

  override def apply(e: SparkSessionExtensions): Unit = {
    // Optimizer rule: year(ts) = Y → sargable timestamp range (pushdown).
    e.injectOptimizerRule(_ => graft.plans.YearPredicateRewrite)
    // transparent MV rewriting (opt-in per view via MvRewrite.register);
    // post-hoc resolution: both sides compare as plain ANALYZED trees,
    // before scan pushdown manufactures never-equal per-query scans
    e.injectPostHocResolutionRule(_ => graft.plans.MvRewrite)
    // transparent token-index pruning: array_contains(split(col,' '), t)
    // filters over manifest tables pin the posting list's files
    e.injectPostHocResolutionRule(_ => graft.plans.IndexedFilterRewrite)
    // output resolution for writes into generated/identity-column manifest
    // tables (they declare ACCEPT_ANY_SCHEMA, so Spark's own output
    // resolution stands down and this rule computes the omitted columns)
    e.injectResolutionRule(_ => graft.plans.ResolveGeneratedWrites)

    // Planner strategy: native two-phase bounded-heap top-k per group.
    e.injectPlannerStrategy(_ => graft.plans.TopKPerGroupStrategy)

    // Parser: VACUUM MANIFEST '<dir>' maintenance statement for the
    // manifest-committed sink; everything else delegates to Spark's parser.
    e.injectParser((_, delegate) => new graft.plans.GraftSqlParser(delegate))

    e.injectFunction((FunctionIdentifier("fixed_point_dot"),
      info("fixed_point_dot", "fixed_point_dot(a, b) - exact fixed-point dot product of two float arrays"),
      (args: Seq[Expression]) => FixedPointDotProduct(args(0), args(1))))

    e.injectFunction((FunctionIdentifier("shingle_poly_hashes"),
      info("shingle_poly_hashes", "shingle_poly_hashes(tokens, k) - polynomial hashes of k-token shingles"),
      (args: Seq[Expression]) => args(1) match {
        case IntegerLiteral(k) => ShinglePolyHashes(args(0), k)
        case other => throw new IllegalArgumentException(
          s"shingle_poly_hashes: k must be an integer literal, got $other")
      }))

    e.injectFunction((FunctionIdentifier("minhash_signature"),
      info("minhash_signature", "minhash_signature(hashes, n) - n-permutation MinHash signature"),
      (args: Seq[Expression]) => args(1) match {
        case IntegerLiteral(n) => MinHashSignature(args(0), n)
        case other => throw new IllegalArgumentException(
          s"minhash_signature: n must be an integer literal, got $other")
      }))

    e.injectFunction((FunctionIdentifier("simhash_pack"),
      info("simhash_pack", "simhash_pack(hashes) - 31-bit SimHash from token hashes"),
      (args: Seq[Expression]) => SimHashPack(args(0))))

    e.injectFunction((FunctionIdentifier("zorder64"),
      info("zorder64", "zorder64(a, b) - Morton interleave of two int keys for Z-order clustering"),
      (args: Seq[Expression]) => ZOrder64(args(0), args(1))))

    e.injectFunction((FunctionIdentifier("zorder3"),
      info("zorder3", "zorder3(a, b, c) - 3-D Morton interleave (21 bits/dim) for Z-order clustering"),
      (args: Seq[Expression]) => ZOrder3(args(0), args(1), args(2))))

    e.injectFunction((FunctionIdentifier("nfc_normalize"),
      info("nfc_normalize", "nfc_normalize(s) - Unicode canonical composition (NFC)"),
      (args: Seq[Expression]) => NfcNormalize(args(0))))

    e.injectFunction((FunctionIdentifier("random_project_signs"),
      info("random_project_signs",
        "random_project_signs(x, n) - n fixed-point JL projections with hash-derived ±1 signs"),
      (args: Seq[Expression]) => args(1) match {
        case IntegerLiteral(n) => RandomProjectSigns(args(0), n)
        case other => throw new IllegalArgumentException(
          s"random_project_signs: n must be an integer literal, got $other")
      }))

    e.injectFunction((FunctionIdentifier("char_gram_hashes"),
      info("char_gram_hashes",
        "char_gram_hashes(s, k) - polynomial hashes of all k-character grams"),
      (args: Seq[Expression]) => args(1) match {
        case IntegerLiteral(k) => CharGramHashes(args(0), k)
        case other => throw new IllegalArgumentException(
          s"char_gram_hashes: k must be an integer literal, got $other")
      }))

    e.injectFunction((FunctionIdentifier("window_mins"),
      info("window_mins",
        "window_mins(arr, w) - sliding-window minima of a bigint array"),
      (args: Seq[Expression]) => args(1) match {
        case IntegerLiteral(w) => WindowMins(args(0), w)
        case other => throw new IllegalArgumentException(
          s"window_mins: w must be an integer literal, got $other")
      }))

    e.injectFunction((FunctionIdentifier("sorted_array_intersect_count"),
      info("sorted_array_intersect_count",
        "sorted_array_intersect_count(a, b) - |A∩B| of sorted distinct bigint arrays"),
      (args: Seq[Expression]) => SortedArrayIntersectCount(args(0), args(1))))
  }
}

package graft.llm

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, LongType}

/** Deterministic, engine-portable hashing and fixed-point arithmetic used by
  * the dedup / similarity / fingerprint operators.
  *
  * Why not `xxhash64`: the DuckDB oracle has no XXH64, so any operator that
  * wants a cell-exact oracle needs a hash both engines can compute from the
  * same SQL semantics. We use a classic polynomial rolling hash over the
  * UTF-8/ASCII code points, `h_{i+1} = (31·h_i + code_i) mod P` with
  * P = 2^31 − 1 — pure 64-bit integer arithmetic, overflow-free
  * (31·(P−1)+255 < 2^36), identical in Spark and DuckDB. For each Spark
  * `Column` builder there is a DuckDB SQL-fragment twin; keeping them in one
  * object keeps the two dialects in lockstep.
  *
  * At cluster scale the same operators can swap in `xxhash64` (codegen'd,
  * faster, better avalanche) via the `hashFn` parameters the operator
  * builders expose — the LSH structure is hash-agnostic.
  */
object PortableHash {
  /** 2^31 − 1 (Mersenne prime) — keeps every intermediate in Long range. */
  val P = 2147483647L

  /** Fixed-point scale for cross-engine float reductions: products are
    * floored to 1e-12 resolution and summed exactly as Longs (order-free),
    * so Spark and DuckDB agree bit-for-bit on the final double. */
  val FixedScale = 1e12

  // ---------------------------------------------------------------- Spark

  /** Polynomial hash of a string column → Long in [0, P). */
  def polyChar(s: Column): Column =
    when(length(s) === 0, lit(0L)).otherwise(
      aggregate(
        transform(sequence(lit(1), length(s)), i => ascii(s.substr(i, lit(1))).cast(LongType)),
        lit(0L),
        (h, c) => (h * 31L + c) % P))

  /** One member of the universal-hash family over [0, P): j-th permutation
    * of a base hash (for MinHash signatures). */
  def permute(h: Column, j: Int): Column =
    (h * (2L * j + 1L) + (7L * j + 13L)) % P

  /** Exact fixed-point dot product of two float-array columns: per-element
    * double product (bit-identical on any IEEE engine), floored to 1e-12
    * units, summed as Long (exact, order-independent), returned as double.
    * Engine-portable without decimal-precision promotion subtleties.
    *
    * Backed by the codegen'd [[graft.functions.FixedPointDotProduct]]
    * expression — the equivalent `zip_with`+`aggregate` formulation runs
    * interpreted and was the bench hot spot in the LSH candidate joins. */
  def dotFixed(a: Column, b: Column): Column =
    graft.functions.FixedPointDotProduct.dot(a, b)

  // --------------------------------------------------------------- DuckDB

  /** DuckDB twin of [[polyChar]]: `s` is a SQL expression yielding VARCHAR.
    * The comprehension variable is namespaced (`ph_i`) so callers can embed
    * this fragment inside their own `for i in …` comprehensions without
    * shadowing. */
  def sqlPolyChar(s: String): String =
    s"list_reduce(list_prepend(CAST(0 AS BIGINT), " +
      s"[CAST(ascii(substr($s, ph_i, 1)) AS BIGINT) for ph_i in range(1, length($s) + 1)]), " +
      s"(h, c) -> (h * 31 + c) % $P)"

  /** DuckDB twin of [[permute]]: `h` is a SQL expression yielding BIGINT. */
  def sqlPermute(h: String, j: Int): String =
    s"(($h) * ${2L * j + 1L} + ${7L * j + 13L}) % $P"

  /** DuckDB twin of [[dotFixed]]: `a`, `b` are SQL float-list expressions. */
  def sqlDotFixed(a: String, b: String): String =
    s"(CAST(CAST(list_sum([CAST(floor(CAST(z[1] AS DOUBLE) * CAST(z[2] AS DOUBLE) * ${FixedScale.toLong}) AS BIGINT) " +
      s"for z in list_zip($a, $b)]) AS BIGINT) AS DOUBLE) / ${FixedScale.toLong})"

  /** Force every CTE in a generated oracle to `AS MATERIALIZED`: DuckDB
    * (1.0) INLINES each CTE reference, so a deep chain whose blocks are
    * referenced 2-3× (the two-level kmeans replay: a→gl→cg→anc→cc→…)
    * re-evaluates exponentially — q_embed_kmeans at sf0.01 went from
    * 11+ min inlined to 0.3 s materialized. Semantics are identical; only
    * the evaluation strategy changes. Safe textually because generated
    * CTE headers are the only place ` AS (` appears (column/array aliases
    * are `AS name`, casts are `AS TYPE)`). */
  def sqlMat(sql: String): String = sql.replace(" AS (", " AS MATERIALIZED (")
}

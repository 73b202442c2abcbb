package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.FunctionRegistry
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}
import org.apache.spark.sql.types.IntegerType

/** SQL registration for the custom codegen expressions, so `spark.sql` users
  * get the same hot-path kernels the DataFrame API uses:
  *
  * {{{
  *   SELECT dot_product(a, b)                  -- ARRAY<DOUBLE> × ARRAY<DOUBLE>
  *   SELECT ngram_shingles(split(text,' '), 3) -- distinct n-gram windows
  *   SELECT minhash_sig(shingles, 64)          -- MinHash signature
  *   SELECT simhash32(split(text,' '))         -- 32-bit SimHash
  *   SELECT winnow_sketch(text, 5, 4)          -- winnowing fingerprint
  * }}}
  *
  * Two entry points, same table: [[GraftFunctions.register]] installs into an
  * existing session's registry (tests, notebooks); [[GraftExtensions]] is the
  * `spark.sql.extensions=graft.functions.GraftExtensions` hook that installs
  * at session build, the deployment path. Width/geometry arguments must be
  * integer LITERALS — the expressions compile them into the generated code,
  * which is exactly why they outrun per-row-parameter formulations. */
object GraftFunctions {

  private def intLit(e: Expression, fn: String, pos: Int): Int = e match {
    case Literal(v: Int, IntegerType) => v
    case other => throw new IllegalArgumentException(
      s"$fn: argument ${pos + 1} must be an INTEGER literal, got ${other.sql}")
  }

  /** (name, usage, builder) for every SQL-exposed expression. */
  private[graft] val functions: Seq[(String, String, Seq[Expression] => Expression)] = Seq(
    ("dot_product", "dot_product(a, b) - dot product of two ARRAY<DOUBLE>",
      { case Seq(a, b) => DotProduct(a, b)
        case args => throw new IllegalArgumentException(
          s"dot_product expects 2 arguments, got ${args.size}") }),
    ("ngram_shingles", "ngram_shingles(tokens, n) - distinct n-token windows",
      { case Seq(t, n) => NGramShingles(t, intLit(n, "ngram_shingles", 1))
        case args => throw new IllegalArgumentException(
          s"ngram_shingles expects 2 arguments, got ${args.size}") }),
    ("minhash_sig", "minhash_sig(shingles, numHashes) - MinHash signature",
      { case Seq(s, k) => MinHashSig(s, intLit(k, "minhash_sig", 1))
        case args => throw new IllegalArgumentException(
          s"minhash_sig expects 2 arguments, got ${args.size}") }),
    ("simhash32", "simhash32(tokens) - 32-bit SimHash fingerprint",
      { case Seq(t) => Simhash32(t)
        case args => throw new IllegalArgumentException(
          s"simhash32 expects 1 argument, got ${args.size}") }),
    ("winnow_sketch", "winnow_sketch(text, k, w) - winnowing fingerprint sketch",
      { case Seq(t, k, w) =>
          WinnowSketch(t, intLit(k, "winnow_sketch", 1), intLit(w, "winnow_sketch", 2))
        case args => throw new IllegalArgumentException(
          s"winnow_sketch expects 3 arguments, got ${args.size}") }),
    ("topk_pairs",
      "topk_pairs(score, id, k) - bounded top-k (score, id) pairs per group",
      { case Seq(s, id, k) => TopKPairs(s, id, intLit(k, "topk_pairs", 2))
        case args => throw new IllegalArgumentException(
          s"topk_pairs expects 3 arguments, got ${args.size}") }))

  private[functions] def install(register: (FunctionIdentifier, ExpressionInfo,
      Seq[Expression] => Expression) => Unit): Unit =
    functions.foreach { case (name, usage, builder) =>
      register(FunctionIdentifier(name),
        new ExpressionInfo("graft.functions", name, usage), builder)
    }

  /** Install into a live session (idempotent — re-registration overwrites). */
  def register(spark: SparkSession): Unit =
    install((id, info, builder) =>
      spark.sessionState.functionRegistry.registerFunction(id, info, builder))
}

/** `spark.sql.extensions` hook: injects every [[GraftFunctions]] function at
  * session build time — the deployment path for SQL-first users. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    // same install loop as the live-session path — one place builds the
    // (identifier, info, builder) triple, so the two registration routes
    // cannot drift
    GraftFunctions.install((id, info, builder) =>
      ext.injectFunction((id, info, builder)))
}

package graft

import org.apache.spark.sql.SparkSession

/** SQL-surface registration for graft's custom Catalyst expressions, so
  * `spark.sql("SELECT simhash64(text) ...")` works the same as the
  * Column API — completing preference order (c) from the build brief:
  * custom expressions registered through `SparkSessionExtensions`.
  *
  * Two entry points:
  *   - config: `spark.sql.extensions=graft.GraftExtensions` (applied at
  *     session build time),
  *   - programmatic: `GraftExtensions.register(spark)` on a live session
  *     (same registry, useful when the session already exists).
  */
class GraftExtensions extends (org.apache.spark.sql.SparkSessionExtensions => Unit) {
  override def apply(ext: org.apache.spark.sql.SparkSessionExtensions): Unit =
    GraftExtensions.injections.foreach { case (name, (info, builder)) =>
      ext.injectFunction((org.apache.spark.sql.catalyst.FunctionIdentifier(name), info, builder))
    }
}

object GraftExtensions {
  import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

  private type Builder = Seq[Expression] => Expression

  private def info(name: String, usage: String) =
    new ExpressionInfo("graft", null, name, usage, "")

  private[graft] val injections: Map[String, (ExpressionInfo, Builder)] = Map(
    "simhash64" -> (info("simhash64",
      "simhash64(text) - 64-bit SimHash of whitespace-tokenized text"),
      (args: Seq[Expression]) => {
        require(args.length == 1, "simhash64 takes one argument")
        graft.functions.SimHash64(args.head)
      }),
    "dot_product" -> (info("dot_product",
      "dot_product(a, b) - sequential-fold dot product of two numeric arrays"),
      (args: Seq[Expression]) => {
        require(args.length == 2, "dot_product takes two arguments")
        graft.functions.DotProduct(args(0), args(1))
      }),
    "l2_sq" -> (info("l2_sq",
      "l2_sq(a, b) - sequential-fold squared L2 distance of two numeric arrays"),
      (args: Seq[Expression]) => {
        require(args.length == 2, "l2_sq takes two arguments")
        graft.functions.L2Sq(args(0), args(1))
      }),
    "shingle_hashes" -> (info("shingle_hashes",
      "shingle_hashes(text, n) - distinct xxhash64'd word n-grams"),
      (args: Seq[Expression]) => {
        require(args.length == 2, "shingle_hashes takes (text, n)")
        val n = args(1) match {
          case org.apache.spark.sql.catalyst.expressions.Literal(v, _) =>
            v.toString.toInt
          case other => throw new IllegalArgumentException(
            s"shingle_hashes n must be a literal, got $other")
        }
        graft.functions.ShingleHashes(args(0), n)
      }),
    "min_gram_hash64" -> (info("min_gram_hash64",
      "min_gram_hash64(text, k) - minimum polynomial hash over k-char windows (winnowing fingerprint)"),
      (args: Seq[Expression]) => {
        require(args.length == 2, "min_gram_hash64 takes (text, k)")
        val k = args(1) match {
          case org.apache.spark.sql.catalyst.expressions.Literal(v, _) =>
            v.toString.toInt
          case other => throw new IllegalArgumentException(
            s"min_gram_hash64 k must be a literal, got $other")
        }
        graft.functions.MinGramHash64(args(0), k)
      }),
    "hyperplane_buckets" -> (info("hyperplane_buckets",
      "hyperplane_buckets(vec, tables, planes, dims) - all random-hyperplane LSH bucket ids (element t = table t's bucket)"),
      (args: Seq[Expression]) => {
        require(args.length == 4, "hyperplane_buckets takes (vec, tables, planes, dims)")
        def lit(e: Expression, what: String): Int = e match {
          case org.apache.spark.sql.catalyst.expressions.Literal(v, _) =>
            v.toString.toInt
          case other => throw new IllegalArgumentException(
            s"hyperplane_buckets $what must be a literal, got $other")
        }
        graft.functions.HyperplaneBuckets(args(0),
          lit(args(1), "tables"), lit(args(2), "planes"), lit(args(3), "dims"))
      }),
    "sortable_double_bits" -> (info("sortable_double_bits",
      "sortable_double_bits(d) - order-preserving IEEE-754 double -> signed long mapping"),
      (args: Seq[Expression]) => {
        require(args.length == 1, "sortable_double_bits takes one argument")
        graft.functions.SortableDoubleBits(args.head)
      }),
    "string_ord_longs" -> (info("string_ord_longs",
      "string_ord_longs(s, nLongs, invert) - order-preserving fixed-width long encoding of a string (loud failure past nLongs*8 bytes)"),
      (args: Seq[Expression]) => {
        require(args.length == 3, "string_ord_longs takes (s, nLongs, invert)")
        def lit(e: Expression, what: String): String = e match {
          case org.apache.spark.sql.catalyst.expressions.Literal(v, _) =>
            v.toString
          case other => throw new IllegalArgumentException(
            s"string_ord_longs $what must be a literal, got $other")
        }
        graft.functions.StringOrdLongs(args.head,
          lit(args(1), "nLongs").toInt, lit(args(2), "invert").toBoolean)
      }),
    "bpe_tokens" -> (info("bpe_tokens",
      "bpe_tokens(text) - merge-table BPE subword tokens (default fixture merges) as array<string>"),
      (args: Seq[Expression]) => {
        require(args.length == 1, "bpe_tokens takes one argument")
        graft.functions.BpeTokens(args.head,
          graft.functions.Bpe.DefaultMerges)
      }),
    "sum128" -> (info("sum128",
      "sum128(v) - exact 128-bit integer sum of a BIGINT column as DECIMAL(38,0) (aggregate)"),
      (args: Seq[Expression]) => {
        require(args.length == 1, "sum128 takes one argument")
        graft.functions.Sum128(args.head).toAggregateExpression()
      }),
    "argmax_long" -> (info("argmax_long",
      "argmax_long(ord, value) - value at the lexicographic max of (ord, value), both BIGINT; hash-aggregable replacement for max(struct(ord, value)).value (aggregate)"),
      (args: Seq[Expression]) => {
        require(args.length == 2, "argmax_long takes (ord, value)")
        graft.functions.ArgMaxLong(args(0), args(1)).toAggregateExpression()
      }))

  /** Register the functions on an existing session's catalog. */
  def register(spark: SparkSession): Unit =
    injections.foreach { case (name, (i, builder)) =>
      spark.sessionState.functionRegistry.registerFunction(
        org.apache.spark.sql.catalyst.FunctionIdentifier(name), i, builder)
    }
}

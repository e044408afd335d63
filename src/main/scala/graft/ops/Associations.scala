package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Session-basket association analysis — "users who did X in a session
  * also did Y": per-session item co-occurrence with support and lift,
  * the basket-mining report next to [[Transitions]]' ORDERED pair
  * matrix (transitions count consecutive steps; this counts unordered
  * within-session presence, which is what cross-sell / feature-affinity
  * questions actually ask).
  *
  * Sessionization is the gap-island form (lag + running flag-sum over
  * per-key histories — bit-identical to `session_window` boundaries and
  * directly SQL-replayable); windows run over BOUNDED per-key event
  * histories, never the global stream ([[Transitions]] contract). The
  * basket self-join runs on the per-session DISTINCT item set, so its
  * output is Σ_sessions |basket|² with |basket| ≤ |item vocabulary| —
  * the aggregated pair frame is ≤ |items|² rows regardless of event
  * volume, and lift arithmetic runs there, never on the stream.
  *
  * Determinism: supports are exact longs; support/lift are SINGLE IEEE
  * divisions of exact integer products (`n_ab·N` and `n_a·n_b` both fit
  * LONG while sessions ≤ 3·10⁹ — stated bound), so results hash-match
  * across engines.
  */
object Associations {

  /** Tag each event with its gap-session ordinal per key: (key, sid). */
  private def withSessionIds(events: DataFrame, keyCol: String, tsCol: String,
                             orderCol: String, gapSeconds: Long): DataFrame = {
    val w = Window.partitionBy(col(keyCol)).orderBy(col(tsCol), col(orderCol))
    // NTZ fixtures cast to TIMESTAMP value-preserving under the UTC
    // session timezone every graft entry point pins (EventStreams
    // readStream precedent); unix_micros rejects NTZ directly
    val micros = (c: Column) => unix_micros(c.cast("timestamp"))
    events
      .withColumn("__prev", lag(col(tsCol), 1).over(w))
      .withColumn("__new",
        when(col("__prev").isNull ||
          micros(col(tsCol)) - micros(col("__prev")) >
            gapSeconds * 1000000L, 1L).otherwise(0L))
      .withColumn("__sid", sum("__new").over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
  }

  /** Unordered within-session co-occurrence: one row per item pair
    * (item_a < item_b) that ever shares a session — (item_a, item_b,
    * n_ab, n_a, n_b, n_sessions, support, lift), with n_x = sessions
    * containing x, support = n_ab/N, lift = n_ab·N / (n_a·n_b).
    * `minPairSessions` prunes the long tail before the stats join.
    *
    * `maxBasket` GUARDS THE QUADRATIC FANOUT: pair volume is
    * Σ_sessions |basket|², so one pathological session whose itemCol is
    * high-cardinality (a user id, a timestamp) would silently explode
    * the job. A session whose DISTINCT item set exceeds the cap raises
    * with an explicit message instead — raise the cap deliberately for
    * genuinely huge vocabularies. The cap also bounds the per-session
    * collect_set buffer (items × cap), which lets pair generation run
    * as per-row array surgery on the basket arrays: ONE shuffle (the
    * session groupBy), no basket self-join exchange pair. */
  def sessionCooccurrence(events: DataFrame, keyCol: String, tsCol: String,
                          orderCol: String, itemCol: String,
                          gapSeconds: Long = 1800L,
                          minPairSessions: Long = 1L,
                          maxBasket: Int = 4096): DataFrame = {
    require(maxBasket >= 1, s"maxBasket must be >= 1, got $maxBasket")
    // one row per session with its sorted distinct item set (collect_set
    // drops NULL items — same as the old pair join, where NULL compares
    // UNKNOWN and never paired; a session of only-null items still
    // counts in n_sessions via its empty array row)
    val baskets = withSessionIds(events, keyCol, tsCol, orderCol, gapSeconds)
      .groupBy(col(keyCol).as("__k"), col("__sid"))
      .agg(array_sort(collect_set(col(itemCol))).as("items"))
      .select(when(size(col("items")) <= maxBasket, col("items"))
        .otherwise(raise_error(lit("sessionCooccurrence: a session " +
          s"basket exceeds maxBasket=$maxBasket distinct items - the " +
          "|basket|^2 pair fanout would go quadratic; pass a larger " +
          "maxBasket explicitly if the item vocabulary is genuinely " +
          "that large"))).as("items"))

    val nSessions = baskets.agg(count(lit(1)).as("n_sessions"))
    val itemN = baskets.select(explode(col("items")).as("item"))
      .groupBy("item").agg(count(lit(1)).as("n_item"))

    // pairs by per-row array surgery over the sorted set: each item_a
    // pairs with the strictly-greater tail of its own basket
    val pairs = baskets
      .select(explode(col("items")).as("item_a"), col("items"))
      .select(col("item_a"),
        explode(filter(col("items"), x => x > col("item_a"))).as("item_b"))
      .groupBy("item_a", "item_b")
      .agg(count(lit(1)).as("n_ab"))
      .filter(col("n_ab") >= minPairSessions)

    pairs
      .join(itemN.select(col("item").as("item_a"), col("n_item").as("n_a")), "item_a")
      .join(itemN.select(col("item").as("item_b"), col("n_item").as("n_b")), "item_b")
      .crossJoin(broadcast(nSessions))
      .select(col("item_a"), col("item_b"), col("n_ab"),
        col("n_a"), col("n_b"), col("n_sessions"),
        (col("n_ab").cast("double") / col("n_sessions")).as("support"),
        // directional rule confidences P(b|a) / P(a|b) — with lift, the
        // full association-rule report
        (col("n_ab").cast("double") / col("n_a")).as("conf_ab"),
        (col("n_ab").cast("double") / col("n_b")).as("conf_ba"),
        ((col("n_ab") * col("n_sessions")).cast("double") /
          (col("n_a") * col("n_b"))).as("lift"))
  }
}

package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Token-budget sequence packing — grouping documents into fixed token
  * bins ("sequences") before training, so short documents don't waste
  * context-window padding. This is inherently sequential state (a bin's
  * fill depends on every previous document), which no window function
  * expresses — the legitimate `mapPartitions` case from the build rules:
  * imperative per-partition logic at a genuine dataflow boundary.
  *
  * Scale posture: documents are hash-distributed into `groups`
  * independent packing streams (`doc_id % groups`), each stream packed
  * by one sequential scan. Parallelism = `groups` (set it to the
  * cluster's total cores at 100 TB); within a partition the scan is
  * streaming — constant memory, no in-memory sort (the sort is Spark's
  * `sortWithinPartitions`, a spillable external sort). Bin ids depend
  * only on (group, in-group doc order), never on physical placement, so
  * the output is deterministic and a SQL oracle can replay it with a
  * recursive next-fit fold.
  */
object Packing {

  final case class PackIn(pack_group: Int, doc_id: Long, n_tokens: Int)
  final case class PackOut(doc_id: Long, pack_group: Int, n_tokens: Int,
                           bin_id: Int)

  /** Next-fit packing: walk each group's docs in `doc_id` order, keep
    * appending to the current bin while the budget holds, else open a new
    * bin (a doc larger than the budget gets its own bin). Returns one row
    * per doc with its (pack_group, bin_id) assignment. */
  def nextFitPack(docs: DataFrame, idCol: String, tokenCount: org.apache.spark.sql.Column,
                  budget: Int, groups: Int): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val base: Dataset[PackIn] = docs.select(
      (col(idCol).cast("long") % groups).cast("int").as("pack_group"),
      col(idCol).cast("long").as("doc_id"),
      tokenCount.cast("int").as("n_tokens")).as[PackIn]
    base
      .repartition(groups, col("pack_group"))
      .sortWithinPartitions("pack_group", "doc_id")
      .mapPartitions { it =>
        // a partition holds whole groups (hash on pack_group); state
        // resets on each group boundary — streaming, O(1) memory
        var group = Int.MinValue
        var bin = 0
        var fill = 0
        it.map { d =>
          if (d.pack_group != group) { group = d.pack_group; bin = 0; fill = d.n_tokens }
          else if (fill + d.n_tokens <= budget) { fill += d.n_tokens }
          else { bin += 1; fill = d.n_tokens }
          PackOut(d.doc_id, d.pack_group, d.n_tokens, bin)
        }
      }
      .toDF()
  }

  /** Bin-level view of a packing: docs per bin, token fill, waste vs the
    * budget — the packing-efficiency audit. */
  def binStats(packed: DataFrame, budget: Int): DataFrame =
    packed.groupBy("pack_group", "bin_id")
      .agg(count(lit(1)).as("n_docs"), sum("n_tokens").as("fill"))
      .withColumn("waste", greatest(lit(budget) - col("fill"), lit(0)))

  /** Materialize each bin as one training sequence: the bin's documents
    * concatenated in doc_id order with a single-space separator. The
    * in-bin order is made deterministic with `sort_array` over
    * (doc_id, text) structs — `collect_list` alone has no order
    * guarantee under parallel aggregation. Two shuffles: the doc_id
    * equi-join to fetch texts, then the (pack_group, bin_id)
    * aggregation — the join exchange moves the corpus text once, which
    * is the unavoidable floor for materialization. */
  def materializeBins(packed: DataFrame, docs: DataFrame, idCol: String,
                      textCol: String): DataFrame =
    packed
      .join(docs.select(col(idCol).cast("long").as("doc_id"),
        col(textCol).as("__text")), Seq("doc_id"))
      .groupBy("pack_group", "bin_id")
      .agg(count(lit(1)).as("n_docs"), sum("n_tokens").as("fill"),
        concat_ws(" ", transform(
          sort_array(collect_list(struct(col("doc_id"), col("__text").as("t")))),
          s => s.getField("t"))).as("seq_text"))
}

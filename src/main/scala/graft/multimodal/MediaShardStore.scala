package graft.multimodal

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame, SparkSession}

/** WebDataset-style sharded blob store for multimodal payloads: media
  * blobs are packed next-fit into byte-budgeted shards and persisted as
  *
  *   - `<path>/manifest` — (doc_id, byte_len, shard_id, byte_off), the
  *     tar-index that locates every blob, and
  *   - `<path>/shards`   — (shard_id, data), one concatenated binary
  *     per shard.
  *
  * This is the storage layout every large multimodal training corpus
  * uses (WebDataset tar shards, TFRecord shards): training readers
  * stream whole shards sequentially, while random access goes
  * manifest → one shard → slice. Both reads are parquet-pruned:
  * [[fetch]] pushes the doc filter into the manifest scan and the
  * (bounded, control-plane) shard-id set into the shards scan, so a
  * k-blob fetch reads ≤ k shard rows no matter how many shards exist —
  * the same probe-pruning discipline as the persisted IVF index.
  *
  * Scale shape of the PACKING: next-fit is inherently a sequential
  * fold, so it runs within doc_id BLOCKS exactly as production packers
  * pack per input partition — one block-keyed shuffle, then a pure
  * Catalyst higher-order `aggregate` fold over the ≤[[blockSize]]-doc
  * array (no UDF, no driver loop). `shard_id = block·blockSize + seq`
  * is globally unique because a block of n docs opens at most n shards.
  */
object MediaShardStore {

  /** Docs per packing block (and the per-block shard-id namespace). */
  val blockSize = 64L

  /** Shard-assignment manifest over (doc_id, payload): next-fit byte
    * packing within doc_id blocks. A blob larger than `budgetBytes`
    * still packs (alone in its shard) — a store must accept any blob.
    *
    * Preconditions: `budgetBytes` must fit an Int (shard offsets feed a
    * 32-bit `substr` slice in [[fetch]]; a wider budget would silently
    * slice wrong bytes — individual blobs are safe because a Spark
    * binary is an `Array[Byte]`, bounded below 2 GiB by the JVM), and
    * `doc_id` must be unique in `media` — duplicates land in the same
    * block with colliding (shard_id, byte_off) and corrupt save/fetch. */
  def manifest(media: DataFrame, budgetBytes: Long): DataFrame = {
    require(budgetBytes > 0 && budgetBytes < Int.MaxValue,
      s"budgetBytes must be in (0, 2^31): $budgetBytes — fetch slices " +
        "shards with 32-bit substr offsets")
    val outT = "array<struct<doc_id:bigint,byte_len:bigint," +
      "seq:bigint,off:bigint>>"
    media
      .select(col("doc_id"),
        octet_length(col("payload")).cast("long").as("byte_len"))
      .withColumn("block", floor(col("doc_id") / blockSize).cast("long"))
      .groupBy("block")
      .agg(array_sort(collect_list(struct(col("doc_id"), col("byte_len"))))
        .as("docs"))
      .withColumn("p",
        explode(aggregate(col("docs"),
          struct(lit(0L).as("seq"), lit(0L).as("fill"),
            array().cast(outT).as("out")),
          (acc, x) => {
            // the first doc of the block always opens seq 0 — even
            // oversize. First-ness is POSITIONAL (nothing packed yet),
            // not fill === 0: after an oversize blob followed by a
            // zero-length payload the fill is 0 mid-fold, and an
            // oversize blob arriving then must still open its own shard
            // (ADVICE r12 — the manifest oracle's recursive step tests
            // strictly fill + byte_len <= budget past the first doc).
            val fits = size(acc.getField("out")) === 0 ||
              acc.getField("fill") + x.getField("byte_len") <=
                lit(budgetBytes)
            val seq2 = when(fits, acc.getField("seq"))
              .otherwise(acc.getField("seq") + 1L)
            val off2 = when(fits, acc.getField("fill")).otherwise(lit(0L))
            val fill2 = when(fits,
              acc.getField("fill") + x.getField("byte_len"))
              .otherwise(x.getField("byte_len"))
            struct(seq2.as("seq"), fill2.as("fill"),
              concat(acc.getField("out"), array(struct(
                x.getField("doc_id").as("doc_id"),
                x.getField("byte_len").as("byte_len"),
                seq2.as("seq"), off2.as("off")))).as("out"))
          },
          acc => acc.getField("out"))))
      .select(col("p.doc_id").as("doc_id"),
        col("p.byte_len").as("byte_len"),
        (col("block") * blockSize + col("p.seq")).as("shard_id"),
        col("p.off").as("byte_off"))
  }

  /** Pack and persist: manifest parquet + one concatenated binary per
    * shard. The per-shard concat is an ordered fold over the shard's
    * (byte_off, payload) pairs — byte_off is unique within a shard, so
    * the array_sort never compares payload bytes.
    *
    * Requires unique `doc_id`s (see [[manifest]]) — a duplicated id
    * would assign two payloads the same (shard_id, byte_off) slot and
    * the concat fold would interleave them; dedupe upstream
    * (`mm_dedup`'s checksum keeper is the standard step before the
    * store write). */
  def save(media: DataFrame, path: String, budgetBytes: Long): Unit = {
    val man = manifest(media, budgetBytes)
    man.write.mode("overwrite").parquet(s"$path/manifest")
    media.join(man, "doc_id")
      .groupBy("shard_id")
      .agg(array_sort(collect_list(struct(col("byte_off"), col("payload"))))
        .as("parts"))
      .select(col("shard_id"),
        aggregate(col("parts"), lit(Array.emptyByteArray),
          (acc, x) => concat(acc, x.getField("payload"))).as("data"))
      .write.mode("overwrite").parquet(s"$path/shards")
  }

  /** Random access: (doc_id, payload) for the requested blobs. Reads the
    * manifest with the doc filter PUSHED to the scan, collects the
    * touched shard-id set (bounded: ≤ |docIds|, control-plane), reads
    * only those shard rows (pushed IN-filter), and slices. */
  def fetch(s: SparkSession, path: String, docIds: Seq[Long]): DataFrame = {
    val man = s.read.parquet(s"$path/manifest")
      .filter(col("doc_id").isin(docIds: _*))
    val sids = man.select("shard_id").distinct().collect()
      .map(_.getLong(0)).toSeq
    val shards = s.read.parquet(s"$path/shards")
      .filter(col("shard_id").isin(sids: _*))
    man.join(shards, "shard_id")
      .select(col("doc_id"),
        col("data").substr(
          (col("byte_off") + 1L).cast("int"),
          col("byte_len").cast("int")).as("payload"))
  }
}

package graft.core

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Stable row-id ("pointer") derivation.
  *
  * The reference keys every row with a 128-bit hash of the primary-key columns
  * (reference: src/engine/value.rs:41 `pub struct Key`, python_api.rs:4294 `ref_scalar`;
  * exposed as `Pointer`, python/pathway/internals/dtype.py:304). We derive ids with
  * Spark's codegen'd `xxhash64` — stable across runs, partitions and cluster sizes
  * (unlike `monotonically_increasing_id`, which depends on partitioning and must never
  * be used for ids). 64-bit is plenty below ~10^8 rows per key-space; for 100 TB-scale
  * universes use [[pointer128]], which concatenates two independently-seeded xxhash64
  * runs into 16 bytes (collision odds ~n^2/2^129).
  */
object Keys {
  /** Canonical id column carried by every [[PwTable]]. */
  val IdCol = "_pw_id"

  /** id = hash of the given columns (Pathway `Table.pointer_from`, table.py:2633). */
  def pointerFrom(cols: Column*): Column = xxhash64(cols: _*)

  /** 128-bit variant: binary(16) from two xxhash64 passes with distinct salts. */
  def pointer128(cols: Column*): Column = {
    val lo = xxhash64(cols :+ lit(0x9e3779b97f4a7c15L): _*)
    val hi = xxhash64(cols :+ lit(0xc2b2ae3d27d4eb4fL): _*)
    concat(to_binary(hex(hi), lit("hex")), to_binary(hex(lo), lit("hex")))
  }

  /** Instance-scoped pointer (Pathway `pointer_from(..., instance=)`). */
  def pointerFromInstance(instance: Column, cols: Column*): Column =
    xxhash64(instance +: cols: _*)
}

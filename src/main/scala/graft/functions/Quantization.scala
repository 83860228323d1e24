package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Symmetric per-vector int8 quantization for embedding columns —
  * the storage/serving scale lever for ANN over 100-TB corpora: a
  * float32 embedding store shrinks 4× (plus one float scale per
  * vector), which is routinely the difference between an index that
  * fits executor memory and one that spills.
  *
  * Scheme: `scale = max|x| / 127`, `q_i = round(x_i / scale)` in
  * [-127, 127], `x̂_i = q_i · scale` — the standard symmetric
  * absmax scheme (the activation/weight-quantization baseline in the
  * LLM.int8 literature). Per-dimension error is bounded by scale/2.
  *
  * Everything is built from codegen'd higher-order functions
  * (`transform`/`aggregate`) over the raw array — no UDF, no UDT —
  * and every step is a deterministic per-row pure function of the
  * input, so the whole scheme is replayable in an independent SQL
  * engine (q_quantize hash-checks scale, the integer L1 mass of the
  * quantized codes, and the sequential-fold reconstruction SSE).
  *
  * Zero vectors quantize to all-zero codes with scale 0 (guarded —
  * no NaN leaks into the store).
  */
object Quantization {

  /** `max|x| / 127` as double (0.0 for empty/zero vectors). */
  def absmaxScale(vec: Column): Column =
    aggregate(vec, lit(0.0),
      (acc, x) => greatest(acc, abs(x.cast("double")))) / lit(127.0)

  /** int8 codes (as array<tinyint>): round(x/scale) clamped to
    * [-127, 127]; all-zero when scale is 0.
    */
  def quantizeInt8(vec: Column, scale: Column): Column =
    transform(vec, x =>
      when(scale === 0.0, lit(0))
        .otherwise(
          greatest(lit(-127.0),
            least(lit(127.0), round(x.cast("double") / scale))))
        .cast("tinyint"))

  /** Reconstruction: codes × scale, as array<double>. */
  def dequantize(codes: Column, scale: Column): Column =
    transform(codes, q => q.cast("double") * scale)

  /** Sum of squared reconstruction errors, folded sequentially in
    * dimension order (bit-replayable as an ordered `list_reduce`).
    */
  def reconstructionSse(vec: Column, codes: Column, scale: Column): Column =
    aggregate(
      zip_with(vec, dequantize(codes, scale),
        (x, xhat) => (x.cast("double") - xhat) * (x.cast("double") - xhat)),
      lit(0.0), (acc, v) => acc + v)
}

"""One-pass chunk staging for ORDER-FREE file-stream sources (r15).

The incremental stream harnesses stage a batch relation as `n_chunks`
key-ranged parquet files and replay them with maxFilesPerTrigger=1.
The original form ran one filtered scan + coalesce(1) write PER CHUNK
(n_chunks jobs). For merge logic that COMMUTES across micro-batches —
counter addition (quantile histogram, count-min sketch) and pair-set
union (the audio-fingerprint probe, where a cross-batch pair is
emitted exactly once, by whichever batch arrives second, and the
final reader unions every committed version — so the emitted SET is
delivery-order-invariant) — batch delivery order is explicitly not
part of the stream's contract, and those sources can be staged in ONE
job: a derived chunk id, repartition("chunk") so each chunk's rows
hash to a single task, and a partitionBy("chunk") write. Each chunk
directory then holds exactly one data file, so the micro-batch count
and per-batch contents are unchanged; only the file MTIME ORDER is no
longer meaningful (all files commit together), which is exactly what
"order-free" licenses.

The ORDERED streams (URL frontier: first-writer-wins; in-order
semantic dedup: earlier-batch tie-break) may ALSO use this helper,
but their delivery-order contract does not live in write order — it
lives in the explicitly spoofed ascending file mtimes their staging
sites set AFTER the one-pass write (advisor r9), backed by the loud
out-of-order guards in their probe() bodies. Each such site also
stages one schema-only file when the source is empty, so the stream
still triggers and its result stores exist (the empty-twin sweeps
exercise this).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def stage_chunks_one_pass(
    df: DataFrame, key: str, lo: int, step: int, src_dir: str
) -> None:
    """Write `df` under src_dir/chunk=<i>/ with i = (key - lo) div
    step, one data file per chunk, in ONE job. Matches the per-chunk
    range filters `lo + i*step <= key < lo + (i+1)*step` exactly:
    every non-null key lands in the same chunk, and null keys are
    dropped just as they fell through every range filter."""
    (
        df.filter(F.col(key).isNotNull())
        .withColumn("chunk", F.expr(f"({key} - {lo}) div {step}").cast("int"))
        .repartition("chunk")
        .write.mode("overwrite")
        .partitionBy("chunk")
        .parquet(src_dir)
    )

"""Streaming sketch maintenance: mergeable sketches updated micro-batch
by micro-batch — the reason the sketch operators (operators/sketches.py)
are built on algebraic merge laws in the first place.

Per micro-batch, ``foreachBatch`` computes the batch's OWN sketch (the
per-group HLL register table and the log2 value histogram — both bounded
state) and folds it into the persisted state with the sketch's merge
law:

  HLL        register-wise MAX   (max is idempotent AND commutative, so
                                  an at-least-once replay of a batch is
                                  absorbed, not double-counted)
  histogram  cell-wise SUM, with per-batch_id subdirectory overwrite —
                                  the same per-partition idempotency
                                  contract as the convert manifest sink
                                  (a replayed batch rewrites its own
                                  cells instead of appending)

The batch-parity property (tested): after the stream drains, the merged
HLL state is EXACTLY equal — registers and integer estimate — to the
batch ``hll_register_table`` over the full corpus, because max-merge of
per-batch register tables is associative over any batch split. Same for
the histogram under sum-merge. That equality is the streaming analogue
of the oracle parity the batch queries carry.

State size: |groups| * 64 registers + |groups| * ~64 histogram cells —
independent of stream length; reading the state is a driver-friendly
small-table scan, so downstream consumers (dashboards, admission
control) never touch raw history.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from ..operators.sketches import (
    hll_estimate_from_registers,
    hll_registers,
    log2_histogram,
)

_REG_SCHEMA = "group string, bucket int, register bigint"


def merge_hll_state(state_path: str, batch_regs: DataFrame) -> None:
    """Fold a batch's register table into the persisted state with
    register-wise MAX, swapping the (tiny) state via temp-path rename.
    Idempotent: max(x, x) = x, so batch replays are absorbed."""
    spark = batch_regs.sparkSession
    if os.path.exists(state_path):
        prev = spark.read.schema(_REG_SCHEMA).parquet(state_path)
        merged = (
            prev.union(batch_regs.select("group", "bucket", "register"))
            .groupBy("group", "bucket")
            .agg(F.max("register").cast("bigint").alias("register"))
        )
    else:
        merged = batch_regs
    tmp = state_path + ".tmp"
    merged.coalesce(1).write.mode("overwrite").parquet(tmp)
    old = state_path + ".old"
    if os.path.exists(state_path):
        os.rename(state_path, old)
    os.rename(tmp, state_path)
    if os.path.exists(old):
        shutil.rmtree(old)


def hll_estimate_from_state(spark: SparkSession, state_dir: str) -> DataFrame:
    """Cardinality estimates from the persisted registers — the same
    exact-integer arithmetic as the batch hll_register_table."""
    regs = spark.read.schema(_REG_SCHEMA).parquet(
        os.path.join(state_dir, "hll_registers")
    )
    return hll_estimate_from_registers(regs, ["group"])


def histogram_from_state(spark: SparkSession, state_dir: str) -> DataFrame:
    """Sum-merge the per-batch histogram cells into the corpus histogram
    (batch_id is a partition column, dropped after the rollup)."""
    cells = spark.read.parquet(os.path.join(state_dir, "hist_cells"))
    return cells.groupBy("group", "bucket").agg(
        F.sum("cnt").cast("bigint").alias("cnt")
    )


def sketch_stream(
    spark: SparkSession,
    input_path: str,
    state_dir: str,
    checkpoint_path: str,
    item_col: str = "text",
    group_col: str = "source",
    value_col: str = "n_chars",
    available_now: bool = True,
) -> StreamingQuery:
    """Maintain HLL registers (distinct ``item_col`` per ``group_col``)
    and a log2 ``value_col`` histogram over a parquet directory stream."""
    os.makedirs(state_dir, exist_ok=True)
    hll_path = os.path.join(state_dir, "hll_registers")
    hist_dir = os.path.join(state_dir, "hist_cells")

    stream = (
        spark.readStream.schema(
            "doc_id string, text string, lang string, source string, n_chars bigint"
        )
        .parquet(input_path)
    )

    def _fold(batch: DataFrame, batch_id: int) -> None:
        if batch.isEmpty():
            return
        grouped = batch.withColumn("group", F.col(group_col).cast("string"))
        merge_hll_state(hll_path, hll_registers(grouped, item_col, "group"))
        log2_histogram(grouped, value_col, "group").coalesce(1).write.mode(
            "overwrite"
        ).parquet(os.path.join(hist_dir, "batch_id=%d" % batch_id))

    writer = stream.writeStream.foreachBatch(_fold).option(
        "checkpointLocation", checkpoint_path
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()

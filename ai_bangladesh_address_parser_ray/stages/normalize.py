"""Stage: canonical normalization + node ids (stateless, zero-copy Arrow).

map_batches over ``batch_format="pyarrow"`` with ``zero_copy_batch=True`` —
the whole batch transform is a chain of pyarrow.compute kernels
(``kernel.normalizer.normalize_array``), no Python per row. At 10^12 turns
this stage is pure streaming compute: no shuffle, no state, no
materialization.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

from ..kernel.normalizer import normalize_array


def _normalize_batch(batch: pa.Table) -> pa.Table:
    norm = normalize_array(pc.cast(batch["text"], pa.string()))
    # stable node id for linkage graph nodes: "conv:turn" with zero-padded
    # turn (lexicographic min == numeric min within a conversation)
    turn = pc.utf8_lpad(pc.cast(batch["turn_idx"], pa.string()), 8, "0")
    node = pc.binary_join_element_wise(
        pc.cast(batch["conv_id"], pa.string()), turn, ":")
    return batch.append_column("norm_text", norm).append_column("node_id", node)


def normalize_stage(ds, batch_size: int = 4096):
    return ds.map_batches(
        _normalize_batch,
        batch_format="pyarrow",
        zero_copy_batch=True,
        batch_size=batch_size,
    )

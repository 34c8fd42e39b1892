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


def _hash64(values) -> pa.Array:
    """Stable 64-bit content hash (blake2b/8) — the *shuffle key* stand-in
    for long strings: joins/groupbys on fixed-width uint64 move and compare
    far less than variable-length text. 64 bits is collision-safe to ~10^8
    distinct values; at the 10^12-turn design point widen to 128-bit
    (digest_size=16, two uint64 columns) — same code shape."""
    import hashlib
    return pa.array(
        [int.from_bytes(hashlib.blake2b(v.encode("utf-8"),
                                        digest_size=8).digest(), "big")
         for v in values], pa.uint64())


def _normalize_batch(batch: pa.Table) -> pa.Table:
    norm = normalize_array(pc.cast(batch["text"], pa.string()))
    # stable node id for linkage graph nodes: "conv:turn" with zero-padded
    # turn (lexicographic min == numeric min within a conversation)
    turn = pc.utf8_lpad(pc.cast(batch["turn_idx"], pa.string()), 8, "0")
    node = pc.binary_join_element_wise(
        pc.cast(batch["conv_id"], pa.string()), turn, ":")
    return (batch
            .append_column("norm_text", norm)
            .append_column("node_id", node)
            .append_column("text_h", _hash64(norm.to_pylist()))
            .append_column("node_h", _hash64(node.to_pylist())))


def normalize_stage(ds, batch_size: int = 4096):
    return ds.map_batches(
        _normalize_batch,
        batch_format="pyarrow",
        zero_copy_batch=True,
        batch_size=batch_size,
    )

"""Stage: canonical normalization + node ids (stateless, zero-copy Arrow).

map_batches over ``batch_format="pyarrow"`` with ``zero_copy_batch=True`` —
the whole batch transform is a chain of pyarrow.compute kernels
(``kernel.normalizer.normalize_array``) plus a vectorized string hash
(polars/xxhash over the Arrow buffers), no Python per row. At 10^12 turns
this stage is pure streaming compute: no shuffle, no state, no
materialization.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

from ..kernel.normalizer import normalize_array

# Join keys are 128-bit (two uint64 columns hashed with independent seeds):
# a single 64-bit key is collision-safe only to ~10^8 distinct values, and a
# silent collision would attach the wrong extraction/cluster to a turn. At
# the 10^12-turn design point the paired key keeps P[any collision] < 1e-13.
HASH_SEED_LO = 0
HASH_SEED_HI = 1


def _hash64(values, seed: int = HASH_SEED_LO) -> pa.Array:
    """Vectorized 64-bit content hash of a string array (polars/xxhash over
    the Arrow buffers — C speed, no Python per row). Deterministic for a
    given seed within an environment; used only as intra-run shuffle/join
    keys, never persisted as a contract."""
    import polars as pl
    if isinstance(values, list):                      # test/tool convenience
        values = pa.array(values, pa.string())
    out = pl.from_arrow(values).hash(seed=seed).to_arrow()
    if isinstance(out, pa.ChunkedArray):
        out = out.combine_chunks()
    return out.cast(pa.uint64())


def hash_probe() -> tuple:
    """Environment fingerprint of the _hash64 kernel: the hash of a sentinel
    string under both seeds. polars ``.hash()`` is documented as unstable
    across polars releases, and text_h/node_h are persisted in Parquet
    checkpoints — a checkpoint resumed under a polars that hashes
    differently would silently miss every join. Mixing this probe into the
    checkpoint fingerprint turns that into a clean invalidation instead."""
    sentinel = ["abap-hash-probe:ঢাকা-1205"]
    return (_hash64(sentinel, HASH_SEED_LO)[0].as_py(),
            _hash64(sentinel, HASH_SEED_HI)[0].as_py())


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
            .append_column("text_h", _hash64(norm, HASH_SEED_LO))
            .append_column("text_h2", _hash64(norm, HASH_SEED_HI))
            .append_column("node_h", _hash64(node, HASH_SEED_LO))
            .append_column("node_h2", _hash64(node, HASH_SEED_HI)))


def normalize_stage(ds, batch_size: int = 4096):
    return ds.map_batches(
        _normalize_batch,
        batch_format="pyarrow",
        zero_copy_batch=True,
        batch_size=batch_size,
    )

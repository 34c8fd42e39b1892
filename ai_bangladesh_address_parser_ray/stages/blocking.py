"""Stage: composite blocking-key generation (stateless batch explode).

Re-expresses the reference's fuzzy lookup scans (``gazetteer.py:321-377``,
``bangladesh_geo_offline.py:309-325``) as shuffle keys (SURVEY.md J4->J5).
One input row (an extracted turn) fans out to 0..N ``(block_key, node_id,
<components>)`` rows:

  ad: area|district           exact normalized-token key
  pc: postal                  postal-code key
  sx: soundex(area)|district  phonetic key (collides typo'd areas)
  hd: house|district          fallback when area extraction failed
  mh: minhash band keys       LSH over the component-token set (catch-all)

Rows with no extracted components emit nothing: filler turns never enter the
pair shuffle (they trivially form singleton clusters). Keys are emitted as a
batch-level explode (map_batches, not per-row flat_map).
"""

from __future__ import annotations

from typing import List

import pyarrow as pa

from .. import COMPONENT_FIELDS
from ..kernel.phonetic import minhash_band_keys, soundex

_CARRY = ["node_id"] + COMPONENT_FIELDS


def keys_for_row(row: dict) -> List[str]:
    """Deterministic blocking keys for one extracted record (also used by the
    oracle and by the F1 evaluator — keys ARE part of the contract).

    The mh (MinHash-band) family is the catch-all for records whose exact
    keys are unreliable — it only fires when area or postal extraction came
    up empty. Complete records rely on ad/sx/pc/hd alone: emitting 4 mh
    bands for every complete record measured ~55% of the blocked-row
    shuffle and ~2x edge multiplicity for zero pair recall (same-entity
    variants already collide on ad after extraction canonicalizes them,
    F1 gate unchanged). hd fires for EVERY house+district record so an
    area-less record still meets its complete twins in one block."""
    from ..kernel.gazetteer import canonical_area
    # the kernel outputs SURFACE area spellings (reference parity);
    # blocking keys canonicalize so variants of one neighborhood collide
    area = canonical_area(row.get("area") or "")
    district = (row.get("district") or "").strip().lower()
    postal = (row.get("postal_code") or "").strip()
    house = (row.get("house_number") or "").strip().lower()

    keys: List[str] = []
    if area:
        keys.append(f"ad:{area}|{district}")
        keys.append(f"sx:{soundex(area)}|{district}")
    if postal:
        keys.append(f"pc:{postal}")
    if house and district:
        keys.append(f"hd:{house}|{district}")

    if not area or not postal:
        tokens = {str(row.get(f) or "").strip().lower()
                  for f in COMPONENT_FIELDS} - {""}
        if len(tokens) >= 2:
            keys.extend(minhash_band_keys(sorted(tokens)))
    return keys


def _norm_lower(col):
    import pyarrow.compute as pc
    return pc.utf8_lower(pc.utf8_trim_whitespace(pc.fill_null(col, "")))


def _explode(batch: pa.Table) -> pa.Table:
    """Vectorized twin of per-row ``keys_for_row`` (the oracle contract —
    tests assert per-row multiset equality). ad/pc/hd keys are Arrow
    ``binary_join_element_wise`` concats; canonical_area + soundex run once
    per DISTINCT area (dictionary-encode), not per row; only the gated
    mh subset (incomplete records) walks rows in Python. This stage fans
    out every extracted mention — at 10^12 turns a per-row Python loop
    here was the widest hot path in the linkage pipeline."""
    import numpy as np
    import pyarrow.compute as pc
    from ..kernel.gazetteer import canonical_area

    n = batch.num_rows
    if not n:
        return batch.select(_CARRY).append_column(
            "block_key", pa.array([], pa.string()))

    area_l = _norm_lower(batch["area"])
    if isinstance(area_l, pa.ChunkedArray):
        area_l = area_l.combine_chunks()
    district = _norm_lower(batch["district"])
    house = _norm_lower(batch["house_number"])
    postal = pc.utf8_trim_whitespace(pc.fill_null(batch["postal_code"], ""))

    # canonical_area + soundex once per DISTINCT surface spelling
    dict_area = pc.dictionary_encode(area_l)
    uniq = dict_area.dictionary.to_pylist()
    indices = dict_area.indices.to_numpy(zero_copy_only=False)
    canon_u = [canonical_area(u) for u in uniq]
    sx_u = [soundex(c) for c in canon_u]
    area_can = pa.array([canon_u[i] for i in indices]
                        if uniq else [""] * n, pa.string())
    area_sx = pa.array([sx_u[i] for i in indices]
                       if uniq else [""] * n, pa.string())

    has_area = pc.greater(pc.utf8_length(area_can), 0).to_numpy(
        zero_copy_only=False)
    has_postal = pc.greater(pc.utf8_length(postal), 0).to_numpy(
        zero_copy_only=False)
    has_hd = np.logical_and(
        pc.greater(pc.utf8_length(house), 0).to_numpy(zero_copy_only=False),
        pc.greater(pc.utf8_length(district), 0).to_numpy(
            zero_copy_only=False))

    sep = pa.scalar("", pa.string())
    ad_keys = pc.binary_join_element_wise(
        pa.scalar("ad:"), area_can, pa.scalar("|"), district, sep)
    sx_keys = pc.binary_join_element_wise(
        pa.scalar("sx:"), area_sx, pa.scalar("|"), district, sep)
    pc_keys = pc.binary_join_element_wise(pa.scalar("pc:"), postal, sep)
    hd_keys = pc.binary_join_element_wise(
        pa.scalar("hd:"), house, pa.scalar("|"), district, sep)

    all_rows = np.arange(n, dtype=np.int64)
    idx_parts: List[np.ndarray] = []
    key_parts: List[pa.Array] = []
    for mask, keys in ((has_area, ad_keys), (has_area, sx_keys),
                       (has_postal, pc_keys), (has_hd, hd_keys)):
        rows = all_rows[mask]
        if len(rows):
            idx_parts.append(rows)
            key_parts.append(keys.take(pa.array(rows)))

    # mh catch-all: only rows with a missing area or postal (the gated
    # incomplete-record subset) need the per-row signature
    mh_rows = all_rows[~np.logical_and(has_area, has_postal)]
    if len(mh_rows):
        sub = batch.select(COMPONENT_FIELDS).take(
            pa.array(mh_rows)).to_pylist()
        mh_idx: List[int] = []
        mh_keys: List[str] = []
        for r, row in zip(mh_rows, sub):
            tokens = {str(row.get(f) or "").strip().lower()
                      for f in COMPONENT_FIELDS} - {""}
            if len(tokens) >= 2:
                for k in minhash_band_keys(sorted(tokens)):
                    mh_idx.append(r)
                    mh_keys.append(k)
        if mh_idx:
            idx_parts.append(np.asarray(mh_idx, dtype=np.int64))
            key_parts.append(pa.array(mh_keys, pa.string()))

    if not idx_parts:
        return batch.select(_CARRY).take(pa.array([], pa.int64())) \
            .append_column("block_key", pa.array([], pa.string()))
    idx = np.concatenate(idx_parts)
    keys_arr = pa.concat_arrays(
        [k.combine_chunks() if isinstance(k, pa.ChunkedArray) else k
         for k in key_parts])
    taken = batch.select(_CARRY).take(pa.array(idx))
    return taken.append_column("block_key", keys_arr)


def blocking_stage(ds, batch_size: int = 4096):
    return ds.map_batches(
        _explode,
        batch_format="pyarrow",
        zero_copy_batch=True,
        batch_size=batch_size,
    )

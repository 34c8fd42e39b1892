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


def _explode(batch: pa.Table) -> pa.Table:
    rows = batch.select(_CARRY).to_pylist()
    out_keys: List[str] = []
    idx: List[int] = []
    for i, row in enumerate(rows):
        for k in keys_for_row(row):
            out_keys.append(k)
            idx.append(i)
    taken = batch.select(_CARRY).take(pa.array(idx, pa.int64()))
    return taken.append_column("block_key", pa.array(out_keys, pa.string()))


def blocking_stage(ds, batch_size: int = 4096):
    return ds.map_batches(
        _explode,
        batch_format="pyarrow",
        zero_copy_batch=True,
        batch_size=batch_size,
    )

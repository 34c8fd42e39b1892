"""Deterministic synthetic transcript corpus (fixtures + bench input).

Implements FIXTURES.md T1-T3 over the ``input_hint`` schema
``(conv_id:string, turn_idx:int32, role:string, text:string, tool:string,
ts:timestamp[us])``:

- plants K underlying *entities* (Bangladeshi-address-shaped, assembled from
  the kernel gazetteer fixture) with a Zipfian area distribution so blocking
  skew (Dhaka-sized blocks) is exercised at test scale;
- renders each entity through multiple surface-form families (canonical,
  compact ``H-12, R-5``, ``#`` notation, Bangla script + numerals, typo'd
  spellings from the normalizer's correction list, noisy extras) — the same
  families as the reference smoke corpus (``tests/simple_test.py:63-76``);
- embeds mentions in multi-turn conversations among filler turns;
- emits the ground-truth ``mentions (conv_id, turn_idx, entity_id)`` and
  ``entities`` tables for pairwise-F1 evaluation.

Everything derives from ``random.Random(seed)`` — same args, same bytes, in
any process (the basis of the resume/byte-identity tests).

Entity-separability guarantee: within one area, each entity gets a UNIQUE
road value, so two distinct entities share at most
{area, district, postal} = weight 0.75 < 0.85 match threshold under the
kernel scorer, while same-entity variant pairs score ~1.0. This makes the
planted clustering information-theoretically recoverable, which is what the
pairwise-F1 >= 0.99 gate measures.
"""

from __future__ import annotations

import os
import random
from typing import Dict, List, Tuple

import pyarrow as pa

from ..kernel.gazetteer import AREAS, area_display
from ..kernel.geo import UPAZILAS

# bump when the generator's output changes for the same args: cached synth
# dirs from an older generator are regenerated, never silently reused
_GEN_VERSION = 7

_BN_DIGITS = {"0": "০", "1": "১", "2": "২", "3": "৩", "4": "৪",
              "5": "৫", "6": "৬", "7": "৭", "8": "৮", "9": "৯"}
_BN_AREA = {"dhanmondi": "ধানমন্ডি", "mirpur": "মিরপুর", "banani": "বনানী",
            "gulshan": "গুলশান", "uttara": "উত্তরা", "jigatola": "জিগাতলা",
            "mohammadpur": "মোহাম্মদপুর", "halishahar": "হালিশহর",
            "agrabad": "আগ্রাবাদ", "bashundhara": "বসুন্ধরা"}
_BN_DISTRICT = {"Dhaka": "ঢাকা", "Chattogram": "চট্টগ্রাম", "Sylhet": "সিলেট",
                "Rajshahi": "রাজশাহী", "Khulna": "খুলনা", "Barisal": "বরিশাল",
                "Rangpur": "রংপুর", "Mymensingh": "ময়মনসিংহ"}
_TYPO_AREA = {"gulshan": "gulisthan", "jigatola": "zigatola",
              "mirpur": "mirpoor", "dhanmondi": "dhanmondy",
              "uttara": "uttora", "banani": "bonani",
              "mohammadpur": "mohammedpur"}
_TYPO_DISTRICT = {"Dhaka": "daka", "Chattogram": "chittagong"}

_TEMPLATES = [
    "Please deliver the package to {addr} before noon.",
    "Customer shipping address: {addr}",
    "The pickup location is {addr}, call on arrival.",
    "Invoice billed to {addr}.",
    "Meet me at {addr} tomorrow.",
    "Registered address on file - {addr}",
    "Send the documents to {addr} by courier.",
    "New drop-off point: {addr}",
]

_FILLER_WORDS = (
    "okay thanks let me check that for you one moment please the order "
    "status shows pending confirm payment received will update shortly "
    "could you share more details about the issue we are looking into it "
    "system restarted job finished without errors metrics look nominal"
).split()

_TOOLS = ["", "", "", "search", "geocode", "crm_lookup", "ticket"]
_ROLES = ["user", "assistant", "tool"]

_BASE_TS = 1_700_000_000_000_000  # fixed epoch micros; no wall-clock reads


def _bn_digits(s: str) -> str:
    return "".join(_BN_DIGITS.get(c, c) for c in s)


def _zipf_cum_weights(n: int, a: float = 1.2) -> List[float]:
    from itertools import accumulate
    return list(accumulate(1.0 / (i + 1) ** a for i in range(n)))


def _zipf_choice(rng: random.Random, items: List, a: float = 1.2,
                 cum_weights: List[float] = None):
    # rng.choices(weights=w) internally accumulates w then bisects, so
    # passing a precomputed cum_weights yields the IDENTICAL random stream
    # and output — it just drops the O(len(items)) rebuild per call, which
    # at bench scale (~10^5 entities x 10^6 mentions) is the difference
    # between seconds and hours of generation.
    if cum_weights is None:
        cum_weights = _zipf_cum_weights(len(items), a)
    return rng.choices(items, cum_weights=cum_weights, k=1)[0]


def generate_entities(n_entities: int, seed: int = 42,
                      upazila_fraction: float = 0.15) -> List[Dict[str, str]]:
    """K gold entities with Zipf-skewed areas; unique road per area.

    ``upazila_fraction`` of entities live in geo-hierarchy upazilas (e.g.
    Savar) instead of gazetteer city areas: their area is absent from the
    gazetteer dim, so extraction must recover district/division/postal via
    the stage-7 geographic engine — the corpus exercises that path
    end-to-end under the F1 gate."""
    rng = random.Random(seed)
    areas = sorted(AREAS)  # deterministic rank order for the Zipf skew
    area_cum = _zipf_cum_weights(len(areas))
    upazilas = sorted(UPAZILAS)
    road_counter: Dict[str, int] = {}
    house_pool: Dict[str, List[int]] = {}
    entities = []
    for i in range(n_entities):
        if rng.random() < upazila_fraction:
            area = rng.choice(upazilas)
            district, division, code = UPAZILAS[area]
            codes = [code]
        else:
            area = _zipf_choice(rng, areas, cum_weights=area_cum)
            district, division, codes = AREAS[area]
        road_counter[area] = road_counter.get(area, 0) + 1
        road = str(road_counter[area])  # unique per area => separability
        if not house_pool.get(area):
            house_pool[area] = rng.sample(range(1, 10_000), k=2_000)
        house = str(house_pool[area].pop())  # unique per area as well
        if rng.random() < 0.25:
            house += "/" + rng.choice("ABCDE")
        ent = {
            "entity_id": f"ent-{i:06d}",
            "house_number": house,
            "road": road,
            "area": area_display(area),
            "district": district,
            "division": division,
            "postal_code": codes[0],
            "flat_number": rng.choice(["", "", f"{rng.choice('ABCD')}{rng.randint(1, 9)}"]),
            "floor_number": rng.choice(["", "", str(rng.randint(1, 12))]),
            "block_number": rng.choice(["", "", "", rng.choice("ABCDEFG")]),
        }
        entities.append(ent)
    return entities


def render_mention(ent: Dict[str, str], variant: int, rng: random.Random) -> str:
    """Render one surface form of an entity (variant family in 0..9)."""
    h, r = ent["house_number"], ent["road"]
    area, district, postal = ent["area"], ent["district"], ent["postal_code"]
    extras = []
    if ent["flat_number"] and rng.random() < 0.5:
        extras.append(f"Flat {ent['flat_number']}")
    if ent["floor_number"] and rng.random() < 0.5:
        extras.append(f"{ent['floor_number']}th floor")
    if ent["block_number"] and rng.random() < 0.5:
        extras.append(f"Block {ent['block_number']}")
    prefix = (", ".join(extras) + ", ") if extras else ""

    v = variant % 10
    if v == 0:      # canonical
        addr = f"{prefix}House {h}, Road {r}, {area}, {district}-{postal}"
    elif v == 1:    # compact
        addr = f"{prefix}H-{h}, R-{r}, {area.lower()}, {district.lower()}"
    elif v == 2:    # hash notation
        addr = f"{prefix}House# {h}, Road# {r}, {area}, {district} {postal}"
    elif v == 3:    # Bangla keywords + numerals
        bn_area = _BN_AREA.get(area.lower(), area)
        bn_dist = _BN_DISTRICT.get(district, district)
        addr = (f"{prefix}বাড়ি {_bn_digits(h)}, রোড {_bn_digits(r)}, "
                f"{bn_area}, {bn_dist}-{_bn_digits(postal)}")
    elif v == 4:    # typos
        t_area = _TYPO_AREA.get(area.lower(), area.lower())
        t_dist = _TYPO_DISTRICT.get(district, district.lower())
        addr = f"{prefix}Hose {h}, Raod {r}, {t_area}, {t_dist}"
    elif v == 5:    # Banglish house prefix (Kha-32, Ga/7 ...)
        bp = rng.choice(["Kha", "Ka", "Ga", "Cha", "Kh"])
        sep = rng.choice(["-", "/", " "])
        addr = (f"{prefix}{bp}{sep}{h}, Road {r}, {area}, "
                f"{district}-{postal}")
    elif v == 6:    # plot / goli forms
        addr = (f"{prefix}Plot No {h}, {r} No Goli, {area}, "
                f"{district} {postal}")
    elif v == 7:    # noisy / building name
        addr = (f'{prefix}"{rng.choice(["Greenhouse", "Dream Tower", "Rose Villa"])}", '
                f"House No {h}, Road No {r}, {area}, {district}-{postal} "
                f"(Near {rng.choice(['Station', 'Market', 'School'])})")
    elif v == 8:    # reversed "N no house" (reference :228-231)
        kw = rng.choice(["house", "basa"])
        addr = (f"{prefix}{h} no {kw}, Road {r}, {area}, "
                f"{district}-{postal}")
    else:           # Line/Avenue road forms (road_processor.py:149-157)
        rkw = rng.choice(["Line-{0}", "Line #{0}", "Avenue {0}"])
        addr = (f"{prefix}House {h}, {rkw.format(r)}, {area}, "
                f"{district} {postal}")
    return rng.choice(_TEMPLATES).format(addr=addr)


def _filler(rng: random.Random) -> str:
    n = rng.randint(5, 18)
    return " ".join(rng.choice(_FILLER_WORDS) for _ in range(n))


def generate_transcripts(
    n_convs: int = 100,
    turns_per_conv: int = 10,
    n_entities: int = 40,
    mention_fraction: float = 0.35,
    seed: int = 42,
) -> Tuple[pa.Table, pa.Table, pa.Table]:
    """-> (transcripts, mentions, entities) Arrow tables. Fully deterministic."""
    rng = random.Random(seed * 1_000_003 + 17)
    entities = generate_entities(n_entities, seed)
    ent_cum = _zipf_cum_weights(len(entities))

    conv_ids, turn_idxs, roles, texts, tools, tss = [], [], [], [], [], []
    m_conv, m_turn, m_ent = [], [], []

    for ci in range(n_convs):
        conv_id = f"conv-{ci:07d}"
        for ti in range(turns_per_conv):
            role = _ROLES[ti % 3] if rng.random() < 0.8 else rng.choice(_ROLES)
            tool = rng.choice(_TOOLS) if role == "tool" else ""
            if rng.random() < mention_fraction:
                ent = _zipf_choice(rng, entities, cum_weights=ent_cum)
                text = render_mention(ent, rng.randint(0, 9), rng)
                m_conv.append(conv_id)
                m_turn.append(ti)
                m_ent.append(ent["entity_id"])
            else:
                text = _filler(rng)
            conv_ids.append(conv_id)
            turn_idxs.append(ti)
            roles.append(role)
            texts.append(text)
            tools.append(tool)
            tss.append(_BASE_TS + ci * 3_600_000_000 + ti * 45_000_000)

    transcripts = pa.table({
        "conv_id": pa.array(conv_ids, pa.string()),
        "turn_idx": pa.array(turn_idxs, pa.int32()),
        "role": pa.array(roles, pa.string()),
        "text": pa.array(texts, pa.string()),
        "tool": pa.array(tools, pa.string()),
        "ts": pa.array(tss, pa.timestamp("us")),
    })
    mentions = pa.table({
        "conv_id": pa.array(m_conv, pa.string()),
        "turn_idx": pa.array(m_turn, pa.int32()),
        "entity_id": pa.array(m_ent, pa.string()),
    })
    ent_table = pa.table({
        k: pa.array([e[k] for e in entities], pa.string())
        for k in entities[0]
    }) if entities else pa.table({"entity_id": pa.array([], pa.string())})
    return transcripts, mentions, ent_table


# scale presets keyed by the testdata sf dirs so `queries(sf_dir)` and bench
# derive transcript volume from the driver-chosen scale factor
_SF_PRESETS = {
    "sf0.001": dict(n_convs=120, turns_per_conv=8, n_entities=40),
    "sf0.01": dict(n_convs=1_200, turns_per_conv=8, n_entities=300),
    "sf0.1": dict(n_convs=12_000, turns_per_conv=8, n_entities=2_500),
    # scaling-efficiency runs need compute >> fixed Ray latencies (actor
    # spin-up, shuffle aggregator startup, phase barriers ~ tens of sec)
    "sf-scaling": dict(n_convs=60_000, turns_per_conv=8, n_entities=12_000),
    # ~4.8M turns: sized so the parallel fraction dominates the ~30s of
    # per-session serial overhead (Amdahl: measured p~309s/480k turns at
    # 1 cpu-eq, s~33s -> projected N->4N efficiency ~0.8 at this scale)
    "sf-scaling-xl": dict(n_convs=600_000, turns_per_conv=8,
                          n_entities=120_000),
    # ~19.2M turns: the two-cluster-size scaling evidence preset — enough
    # parallel compute (~6,700 cpu-s) that the measured ~47s of per-run
    # fixed cost (phase barriers, driver folds, actor spin-up) amortizes
    # the way it would at the 10^12-turn design point
    "sf-scaling-xxl": dict(n_convs=2_400_000, turns_per_conv=8,
                           n_entities=480_000),
}


def synth_params_for(sf_dir: str) -> dict:
    name = os.path.basename(os.path.normpath(sf_dir))
    name = os.environ.get("GRAFT_SYNTH_PRESET", name)
    return dict(_SF_PRESETS.get(name, _SF_PRESETS["sf0.001"]))


def synth_dir_for(sf_dir: str, root: str = "/tmp/abap_synth") -> str:
    """Materialize (once) the deterministic transcript tables for an sf dir;
    returns the directory containing transcripts/ mentions/ entities/."""
    params = synth_params_for(sf_dir)
    name = os.path.basename(os.path.normpath(sf_dir)) or "default"
    name = os.environ.get("GRAFT_SYNTH_PRESET", name)
    out = os.path.join(root, name)
    return write_transcript_tables(out, seed=42, **params)


def write_transcript_tables(out_dir: str, seed: int = 42,
                            shards: int = 8, **params) -> str:
    """Write transcripts (sharded by conv hash -> resumable read layout),
    mentions and entities as Parquet under ``out_dir``. Idempotent: if the
    marker file exists the existing tables are reused."""
    import pyarrow.parquet as pq

    marker = os.path.join(out_dir, "_COMPLETE")
    stamp = f"v{_GEN_VERSION}"
    if os.path.exists(marker):
        with open(marker) as f:
            if f.read().strip() == stamp:
                return out_dir
        import shutil
        shutil.rmtree(out_dir)   # stale generator version: rebuild
    os.makedirs(os.path.join(out_dir, "transcripts"), exist_ok=True)
    transcripts, mentions, entities = generate_transcripts(seed=seed, **params)
    # shard by conv hash: one file per shard = the partition unit the
    # linkage pipeline's manifests track
    import zlib
    convs = transcripts["conv_id"].to_pylist()
    shard_of = [zlib.crc32(c.encode()) % shards for c in convs]
    import pyarrow.compute as pc_
    sh = pa.array(shard_of, pa.int32())
    for s in range(shards):
        part = transcripts.filter(pc_.equal(sh, s))
        pq.write_table(part, os.path.join(out_dir, "transcripts", f"part-{s:05d}.parquet"))
    pq.write_table(mentions, os.path.join(out_dir, "mentions.parquet"))
    pq.write_table(entities, os.path.join(out_dir, "entities.parquet"))
    with open(marker, "w") as f:
        f.write(stamp)
    return out_dir

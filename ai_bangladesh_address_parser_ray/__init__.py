"""Ray-Data-native record-linkage engine.

A from-scratch rebuild of the query/data-processing capabilities of the
reference ``ai-bangladesh-address-parser`` (entity extraction, canonical
normalization, fuzzy comparison, duplicate detection, statistics) as a
distributed Ray Data pipeline over Parquet transcript tables, extended with
blocking + pairwise scoring + transitive clustering (record linkage) and the
standard large-scale training-data operators (dedup, similarity search, text
analysis).

Layout
------
- ``kernel/``    pure-Python extraction/comparison kernel — no Ray imports.
                 This is simultaneously the single-process *oracle* used by
                 tests and the body of every distributed UDF.
- ``sources/``   Parquet IO + the deterministic synthetic transcript generator.
- ``stages/``    Ray Data stages (map_batches UDFs, actor classes, shuffles).
- ``functions/`` generic table operators (dedup, text analysis, ANN, stats).
- ``pipelines/`` end-to-end pipeline builders (linkage, statistics).
- ``state/``     checkpoint manifests / lineage for resumable runs.
"""

__version__ = "0.1.0"

COMPONENT_FIELDS = [
    "house_number",
    "road",
    "area",
    "district",
    "division",
    "postal_code",
    "flat_number",
    "floor_number",
    "block_number",
]

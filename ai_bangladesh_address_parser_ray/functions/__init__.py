"""Generic large-scale table operators (training-data-pipeline family).

Beyond the reference's own operator set (SURVEY.md §2), these are the
operations a 100 TB training-data pipeline needs, each expressed
Ray-Data-first over the ``documents`` / ``embeddings`` tables:

- ``dedup``          exact, MinHash+LSH, SimHash, n-gram Jaccard,
                     embedding-cosine near-dup
- ``text_analysis``  language-ID, quality scoring, token counting,
                     winnowing fingerprints, repetition/boilerplate
                     signals, PII redaction
- ``similarity``     brute-force cosine top-k + LSH-bucketed ANN
- ``stats``          corpus statistics / grouped aggregates / top-k
- ``multimodal``     binary-column plumbing with stubbed codecs
- ``hashing``        shared deterministic hash primitives (no Ray)
- ``relational``     broadcast hash join, join+top-k, gap sessionization,
                     as-of join, static range join, tumbling windows
- ``gazetteer_build`` dimension built from a labels table (A2/S7)
"""

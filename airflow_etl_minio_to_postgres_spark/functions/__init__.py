"""LLM-data-pipeline operator library.

Everything here is expression-first: built-in ``pyspark.sql.functions``
(JVM, whole-stage codegen) wherever the semantics allow, Arrow-batched
``mapInPandas`` only where Python is genuinely required (multimodal decode).

Modules:

* :mod:`.text` — tokenization, quality scoring, language id, fingerprints.
* :mod:`.dedup` — exact dedup, MinHash+LSH banding, SimHash.
* :mod:`.similarity` — cosine top-k (brute force + sign-LSH bucketed).
* :mod:`.multimodal` — opaque binary payload columns + decode plumbing.
"""

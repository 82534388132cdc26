"""PySpark-native document conversion/extraction engine.

A from-scratch re-expression of the computation performed by the reference
document converter (``deh-sys/modern-document-converter-for-ai-library``,
surveyed in /root/repo/SURVEY.md) as a vectorized Spark DataFrame job over
tables of interleaved text + media documents::

    documents(doc_id: string,
              spans: array<struct<kind:string, text:string,
                                  media_ref:string, offset:int>>)

Layout
------
``reference_semantics``   pure-Python kernels (single source of truth for both
                          golden-fixture generation and the pandas/Arrow UDF
                          bodies; zero Spark imports)
``functions``             column-expression builders (classification scoring,
                          code math, filename formatting, hashing) — JVM-side,
                          whole-stage-codegen friendly
``operators``             DataFrame -> DataFrame operators (convert, classify,
                          rename, codes, dedup, similarity, text stats,
                          multimodal plumbing, checkpoint manifests)
``sources``               readers/writers + the deterministic synthetic
                          interleaved-corpus generator
``plans``                 SparkSession builder (AQE, Arrow, shuffle sizing)
                          and skew/salting helpers
``streaming``             Structured Streaming variant of the convert job
"""

__version__ = "0.1.0"

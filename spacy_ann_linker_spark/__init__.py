"""spacy_ann_linker_spark — a from-scratch PySpark-native record-linkage engine.

Recreates the query/data-processing capabilities of microsoft/spacy-ann-linker
(reference at /root/reference, cited by file:line in docstrings) as an
idiomatic Spark pipeline:

    transcripts -> mentions -> candidate generation (exact + similarity join)
                -> threshold filter -> alias->entity expansion
                -> context disambiguation -> links -> connected components

The reference is a single-process spaCy component (TF-IDF + nmslib HNSW);
this engine re-expresses its *semantics* as DataFrame transforms so the same
queries run on a multi-executor cluster over ~100 TB of transcript turns.
"""

__version__ = "0.1.0"

from spacy_ann_linker_spark.session import get_spark  # noqa: F401

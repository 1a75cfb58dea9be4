"""LLM-data-pipeline operators (SURVEY.md §2.10 + BASELINE north star).

Deduplication (exact / MinHash-LSH / n-gram Jaccard / fingerprint),
similarity search (brute-force + LSH-bucketed ANN), text analysis
(stats, lang-id, tokenization, fingerprinting), and multimodal binary
column plumbing. Importing this package registers their queries.
"""

from bigdata_project_spark.operators import (  # noqa: F401
    afp,
    bloom,
    bpe,
    chunking,
    clustering,
    corpus,
    corpus_ext,
    dedup,
    dedup_ext,
    dsir,
    graph_ann,
    ivfpq_trained,
    kmeans,
    lm,
    matryoshka,
    multimodal,
    nb,
    packing,
    pq,
    pq_residual,
    quality_ext,
    quantile,
    retrieval,
    rewrite,
    semdedup,
    sketch,
    similarity,
    skew,
    text,
    unigram,
    urlcanon,
)

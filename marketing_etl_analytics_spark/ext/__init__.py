"""LLM-data-pipeline extension library (engine-facing API).

Generalized, column-parameterized versions of the operators exercised
by the suite (``suite/ext.py``): deduplication, embedding similarity,
text analysis, and multimodal payload handling.
"""

from marketing_etl_analytics_spark.ext.dedup import (  # noqa: F401
    exact_dedup,
    lsh_candidate_pairs,
    minhash_bands,
    shingles,
)
from marketing_etl_analytics_spark.ext.similarity import (  # noqa: F401
    cosine_topk,
    with_norm,
    with_sign_bucket,
)
from marketing_etl_analytics_spark.ext.text import (  # noqa: F401
    quality_features,
    token_counts,
)
from marketing_etl_analytics_spark.ext.multimodal import (  # noqa: F401
    attach_payload,
    extract_features,
)

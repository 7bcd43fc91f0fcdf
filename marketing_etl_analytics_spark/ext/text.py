"""Text analysis: quality features and token statistics.

Everything is built-in column expressions (JVM-side, codegen'd) —
no Python in the hot path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DEFAULT_STOPWORDS = ("the", "a", "of", "and", "to", "in")
TOKEN_RE = "[a-z]+|[0-9]+|[^a-z0-9 ]"


def quality_features(
    df: DataFrame, text: str = "text", stopwords: tuple[str, ...] = DEFAULT_STOPWORDS
) -> DataFrame:
    tokens = F.split(F.lower(F.col(text)), " ")
    n_tokens = F.size(tokens)
    n_stop = F.size(F.filter(tokens, lambda w: w.isin(*stopwords)))
    return df.withColumns(
        {
            "n_tokens": n_tokens.cast("long"),
            "stopword_ratio": n_stop.cast("double") / n_tokens,
            "quality": F.when(n_tokens < 5, "too_short")
            .when(n_stop.cast("double") / n_tokens > 0.5, "low_content")
            .otherwise("ok"),
        }
    )


def token_counts(df: DataFrame, text: str = "text") -> DataFrame:
    return df.withColumns(
        {
            "ws_tokens": F.size(F.split(F.lower(F.col(text)), " ")).cast("long"),
            "re_tokens": F.size(
                F.regexp_extract_all(F.lower(F.col(text)), F.lit(TOKEN_RE), 0)
            ).cast("long"),
        }
    )

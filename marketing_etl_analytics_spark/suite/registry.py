"""Suite registry: name -> (spark implementation, oracle SQL)."""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class SuiteEntry:
    name: str
    fn: QueryFn
    oracle: str | None  # DuckDB SQL twin; None -> driver does rows-only check
    doc: str = ""


SUITE: dict[str, SuiteEntry] = {}


def register(name: str, oracle: str | None, doc: str = ""):
    """Decorator: add a (spark, sf_dir) -> DataFrame query to the suite."""

    def wrap(fn: QueryFn) -> QueryFn:
        SUITE[name] = SuiteEntry(name=name, fn=fn, oracle=oracle, doc=doc)
        return fn

    return wrap

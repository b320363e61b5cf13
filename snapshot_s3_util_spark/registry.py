"""Operator registry.

Each operator from SURVEY.md §2B registers here with:
- a Spark callable ``(spark, sf_dir) -> DataFrame``
- an optional DuckDB oracle SQL string (None => rows-only check)

The driver harness consumes this via ``__spark_entry__.queries()`` /
``oracle_sql()``.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Callable, Optional

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass
class Op:
    name: str
    fn: QueryFn
    oracle: Optional[str]
    category: str = ""
    doc: str = field(default="", repr=False)


REGISTRY: dict[str, Op] = {}


def register(name: str, oracle: Optional[str] = None, category: str = ""):
    """Decorator: register a query callable under ``name``.

    ``oracle`` is DuckDB SQL over the pre-registered views
    (region nation customer supplier part orders lineitem events
    documents embeddings). None marks a rows-only op.
    """

    def deco(fn: QueryFn) -> QueryFn:
        if name in REGISTRY:
            raise ValueError(f"duplicate operator name: {name}")
        REGISTRY[name] = Op(name, fn, oracle, category, fn.__doc__ or "")
        return fn

    return deco

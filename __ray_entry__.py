"""Driver contract for the graft builder (Ray Data target).

The driver calls ``ray.init(...)`` itself BEFORE importing this module —
nothing here (or in pdf_parser_ray) calls ``ray.init``/``ray.shutdown``.

* ``entry()``       — flagship extraction pipeline over the self-
  synthesized CC-style corpus at sf0.001 scale (500 docs); returns a
  ``ray.data.Dataset``.
* ``queries()``     — one callable per implemented operator/pipeline
  (SURVEY.md §2 + the corpus-scale operators), each taking ``sf_dir``.
* ``oracle_sql()``  — DuckDB-equivalent SQL for the SQL-expressible
  entries (same column names/types); non-SQL pipelines (extraction,
  MinHash/SimHash banding, approximate kNN, HLL, media stages) are
  intentionally absent → rows-only check.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any


def entry() -> Any:
    """Flagship: synth corpus @ sf0.001 → extraction Dataset (≥0 rows)."""
    from pdf_parser_ray.corpus import ensure_corpus, sf_to_n_docs
    from pdf_parser_ray.pipelines import extract_corpus, read_corpus

    corpus_dir = ensure_corpus(sf_to_n_docs(0.001))
    return extract_corpus(read_corpus(corpus_dir), include_spans=True)


def queries() -> dict[str, Callable[[str], Any]]:
    from pdf_parser_ray.queries import QUERIES

    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    from pdf_parser_ray.queries import SQL

    return dict(SQL)

"""Driver contract for the graft builder (Ray Data target).

The driver calls ``ray.init`` itself before importing this module; nothing
here (or in q_digest_ray) calls ``ray.init()`` / ``ray.shutdown()``.

- ``entry()``     — flagship sketch pipeline on /root/testdata/sf0.001.
- ``queries()``   — one callable per implemented operator/pipeline
  (SURVEY.md §2); each takes ``sf_dir`` and returns a DataFrame.
- ``oracle_sql()``— DuckDB-equivalent SQL for every *exact* query; sketch
  queries (sk_*) are approximate and intentionally have no SQL oracle
  (rows-only check; accuracy bounds are asserted in tests/).
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any


def entry() -> Any:
    from q_digest_ray.pipelines.flagship import run_documents_flagship

    return run_documents_flagship("/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[str], Any]]:
    from q_digest_ray.pipelines.queries import EXACT_QUERIES, SKETCH_QUERIES

    out: dict[str, Callable[[str], Any]] = {}
    for name, (fn, _sql) in EXACT_QUERIES.items():
        out[name] = fn
    out.update(SKETCH_QUERIES)
    return out


def oracle_sql() -> dict[str, str]:
    from q_digest_ray.pipelines.queries import EXACT_QUERIES

    return {name: sql for name, (_fn, sql) in EXACT_QUERIES.items()}

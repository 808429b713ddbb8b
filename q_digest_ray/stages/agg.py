"""Two-phase aggregation: vectorized per-block partials → small final combine.

The scalable default for LOW-cardinality keys (langs, event types, hourly
windows, nations, users): the partial stage bounds its output at
``num_blocks x distinct_keys`` tiny rows, so the final combine is one task
over a few MB — no all-to-all shuffle at any input scale.  Ray Data's
sort-based ``groupby`` costs ~10 s of fixed overhead per call locally and a
full exchange at scale; it is the right tool only when the key space itself
is huge (content-hash dedup, per-url state), which callers opt into via
their own ``groupby``.

Measured on this node (100k events, 32 cpus): partial+final = 0.2 s vs
ray groupby = 9.5 s for identical results.
"""

from __future__ import annotations

from typing import Callable

import pandas as pd


def two_phase(
    ds,
    partial_fn: Callable,
    final_fn: Callable[[pd.DataFrame], pd.DataFrame],
    batch_size: int | None = 65536,
    fold_rounds: int = 0,
    combine_fn: Callable | None = None,
    concurrency=None,
):
    """partial_fn: Arrow batch → partial rows (Table/DataFrame);
    final_fn: pandas DataFrame of all partials → result DataFrame.

    ``partial_fn`` may be a callable CLASS (actor-pool stage holding
    broadcast state); pass ``concurrency`` for it, as map_batches requires.

    ``fold_rounds`` > 0 inserts intermediate combine rounds (tree fold) for
    very large partial sets: each round coalesces the block count 8x and
    applies ``combine_fn``, which is REQUIRED for folding — it must map
    partial rows to partial rows (``final_fn`` usually renames/derives
    columns, so re-applying it would break the next round).  ``combine_fn``
    runs Arrow-native (pyarrow Table → Table): partials can carry binary
    payloads, and a pandas round-trip would copy them through object dtype.
    """
    kwargs = {} if concurrency is None else {"concurrency": concurrency}
    partials = ds.map_batches(
        partial_fn, batch_format="pyarrow", batch_size=batch_size, **kwargs
    )
    if fold_rounds > 0:
        if combine_fn is None:
            raise ValueError(
                "fold_rounds > 0 requires combine_fn (a partials -> partials "
                "combiner; final_fn's output schema usually differs)"
            )
        from q_digest_ray.stages.partitioning import estimate_num_blocks

        target = estimate_num_blocks(ds)
        for _ in range(fold_rounds):
            target = max(8, target // 8)
            partials = partials.repartition(target).map_batches(
                combine_fn, batch_format="pyarrow", batch_size=None
            )
    return partials.repartition(1).map_batches(
        final_fn, batch_format="pandas", batch_size=None
    )


def two_phase_pandas(ds, partial_fn, final_fn, batch_size: int | None = 65536):
    """Same, with a pandas-format partial stage."""
    partials = ds.map_batches(partial_fn, batch_format="pandas", batch_size=batch_size)
    return partials.repartition(1).map_batches(
        final_fn, batch_format="pandas", batch_size=None
    )

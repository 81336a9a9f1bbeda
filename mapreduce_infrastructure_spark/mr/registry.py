"""User-task registry (reference parity: ``src/mr_task_factory.cc:28-88``).

The reference maps a ``user_id`` string to mapper/reducer factory lambdas in
a process-wide singleton, populated by static initializers before main
(``test/user_tasks.cc:45-58``). Here it's a plain module-level dict;
closures ship to executors automatically, so no worker-side registration
step exists (the reference needed the same registration compiled into the
worker binary).
"""

from __future__ import annotations

from collections.abc import Callable

from .api import BaseMapper, BaseReducer, WordCountMapper, WordCountReducer

MapperFactory = Callable[[], BaseMapper]
ReducerFactory = Callable[[], BaseReducer]

_TASKS: dict[str, tuple[MapperFactory, ReducerFactory]] = {}


def register_tasks(
    user_id: str, mapper_factory: MapperFactory, reducer_factory: ReducerFactory
) -> bool:
    """Register a (mapper, reducer) pair under a user id
    (reference: ``external/include/mr_task_factory.h:47``)."""
    _TASKS[user_id] = (mapper_factory, reducer_factory)
    return True


def get_factories(user_id: str) -> tuple[MapperFactory, ReducerFactory]:
    """The registered (mapper, reducer) factory pair — the runner
    instantiates one fresh mapper/reducer per task from these
    (reference: ``mr_task_factory.cc:57-70``)."""
    return _TASKS[user_id]


# The reference registers its demo word-count task as "cs6210"
# (test/config.ini:7, test/user_tasks.cc:45-58); same default here.
register_tasks("cs6210", WordCountMapper, WordCountReducer)
# Second registered task: inverted index under "invidx" (shows the registry
# is general — any (mapper, reducer) pair per user_id, like the reference).
from .api import InvertedIndexMapper, InvertedIndexReducer  # noqa: E402

register_tasks("invidx", InvertedIndexMapper, InvertedIndexReducer)
# Third task: distributed grep under "grep" (the MapReduce paper's §2.3
# first example — mapper filters, reducer is the identity).
from .api import GrepMapper, IdentityReducer  # noqa: E402

register_tasks("grep", GrepMapper, IdentityReducer)
# Fourth task: bigram count under "bigram" (sequential per-record mapper
# state; reuses the demo's integer-sum reducer — factories compose).
from .api import BigramCountMapper  # noqa: E402

register_tasks("bigram", BigramCountMapper, WordCountReducer)
# Fifth task: per-source length stats under "doclenstats" (an ALGEBRAIC
# reducer — count+sum in one pass, composite "n|total" value through the
# string channel; the demo reducer is distributive-only).
from .api import DoclenStatsMapper, DoclenStatsReducer  # noqa: E402

register_tasks("doclenstats", DoclenStatsMapper, DoclenStatsReducer)
# Sixth registered task: per-key top-k under "topk" — the SELECTIVE-emit
# reducer shape (bounded heap state, emits <= K of n inputs), completing
# the reducer-shape coverage the other five user_ids span.
from .api import DocTopKMapper, TopKDocsReducer  # noqa: E402

register_tasks("topk", DocTopKMapper, TopKDocsReducer)
# Seventh registered task: per-key distinct count under "distinct" — the
# HOLISTIC reducer shape (value-cardinality-bounded set state folded to
# one integer), pairing the generic tab-split mapper with a dedup fold.
from .api import DistinctCountReducer, KeyValuePairMapper  # noqa: E402

register_tasks("distinct", KeyValuePairMapper, DistinctCountReducer)
# Eighth registered task: per-key bounded histogram under "histogram" —
# the MULTI-EMIT algebraic reducer shape (≤N_BUCKETS emits per key, each
# from O(1) bucket state); reuses the generic tab-split mapper, showing
# factory reuse on the mapper side like "bigram" does on the reducer side.
from .api import HistogramReducer  # noqa: E402

register_tasks("histogram", KeyValuePairMapper, HistogramReducer)

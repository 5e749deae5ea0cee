"""Process-level cache hygiene for the handful of fixture-keyed caches.

The engine caches four things per process, all pure functions of an
immutable fixture directory (the ``registry._n_docs`` precedent):

- ``plans.registry._N_DOCS_CACHE`` — one count per corpus (scalar).
- ``plans.queries_events._BPE_MERGE_CACHE`` — the trained merge table
  (12 driver-blocking Spark jobs to rebuild).
- ``plans.queries_similarity._IVF_INDEX_CACHE`` — the registered
  bucketed-index table name + coarse centroids + the int8 slice's
  quantization params (a corpus shuffle + write to rebuild).
- ``operators.similarity._LSH_SIZING_CACHE`` — sampled per-bucket
  occupancy sizing (performance-only; a stale entry changes replication
  cost, never output values).

Two hygiene rules live here:

1. **Key normalization** (``sf_key``): spelling variants of the same
   directory (``/x/sf0.1`` vs ``/x/sf0.1/`` vs a symlink) must hit one
   entry — otherwise the BPE trainer retrains and the IVF build leaks an
   extra bucketed corpus copy per spelling until process exit.
2. **An escape hatch** (``clear_caches``): an interactive session that
   rewrites fixture files IN PLACE (impossible under the driver contract,
   legal at a notebook) would otherwise probe a stale IVF index — the one
   cache whose staleness is correctness-visible. Clearing forces every
   derivation fresh on next use; the IVF rebuild overwrites its prior
   table/path (sequential re-builds are idempotent by mode=overwrite).
"""

from __future__ import annotations

import os


def sf_key(sf_dir: str) -> str:
    """Canonical cache key for a fixture directory: realpath resolves
    symlinks and redundant separators; rstrip kills the trailing-slash
    spelling (realpath already drops it everywhere except the root)."""
    return os.path.realpath(sf_dir).rstrip("/") or "/"


def clear_caches() -> None:
    """Drop every process-level fixture cache so the next use re-derives
    from the files as they are NOW. Safe at any time; the only cost is
    re-paying the derivations (n_docs count, BPE training jobs, IVF index
    build, LSH sizing pre-pass) once each."""
    from .operators import similarity as _sim
    from .plans import queries_events as _qe
    from .plans import queries_similarity as _qs
    from .plans import registry as _reg

    _reg._N_DOCS_CACHE.clear()
    _qe._BPE_MERGE_CACHE.clear()
    _qs._IVF_INDEX_CACHE.clear()
    _sim._LSH_SIZING_CACHE.clear()

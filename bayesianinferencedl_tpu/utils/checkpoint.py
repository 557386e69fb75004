"""Unified npz checkpoint/resume (SURVEY.md §5 checkpoint row).

One flat-npz format for every stateful artifact: NN params + optimizer state,
POD basis + reduced operators, and MCMC chain state bundles (chain states,
RNG keys, step counter) — so a killed inversion resumes exactly
(SURVEY.md §5 "Failure detection / elastic recovery": chain state is a pure
value; restart = reload + continue).

Pytrees are flattened to 'leaf_<i>' arrays plus a JSON treedef descriptor;
arbitrary (registered) pytrees round-trip as long as their static structure
is reconstructible, which we guarantee by re-providing a structure exemplar
at load time.
"""

from __future__ import annotations

import json
from pathlib import Path
from typing import Any, Dict, Optional

import jax
import numpy as np


def save_checkpoint(path: str | Path, pytree: Any, meta: Optional[Dict[str, Any]] = None) -> None:
    leaves = jax.tree.leaves(pytree)
    arrays = {f"leaf_{i}": np.asarray(l) for i, l in enumerate(leaves)}
    arrays["__meta__"] = np.frombuffer(
        json.dumps(meta or {}).encode(), dtype=np.uint8
    )
    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    np.savez_compressed(path, **arrays)


def load_checkpoint(path: str | Path, exemplar: Any) -> tuple[Any, Dict[str, Any]]:
    """Load into the structure of ``exemplar`` (same pytree shape)."""
    z = np.load(path)
    meta = json.loads(bytes(z["__meta__"]).decode()) if "__meta__" in z else {}
    treedef = jax.tree.structure(exemplar)
    n = treedef.num_leaves
    leaves = [z[f"leaf_{i}"] for i in range(n)]
    ex_leaves = jax.tree.leaves(exemplar)
    leaves = [
        np.asarray(l).astype(np.asarray(e).dtype) if hasattr(e, "dtype") else l
        for l, e in zip(leaves, ex_leaves)
    ]
    return jax.tree.unflatten(treedef, leaves), meta

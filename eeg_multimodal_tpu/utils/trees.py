"""Pytree utilities: sizing and name-predicate partitioning.

The reference splits parameters into DP / non-DP groups by name substring
(ref: base_train.py:168-169, train.py:71-72, past_acc.py:155-156). Params here
are nested dicts; partitioning works on flattened path strings.
"""
from __future__ import annotations

from typing import Any, Callable

import jax
import jax.numpy as jnp


def tree_size(tree: Any) -> int:
    """Total number of scalar elements in a pytree."""
    return sum(x.size for x in jax.tree_util.tree_leaves(tree))


def path_str(path) -> str:
    """Render a jax key path as a '/'-joined string of dict keys/indices."""
    parts = []
    for p in path:
        if hasattr(p, "key"):
            parts.append(str(p.key))
        elif hasattr(p, "idx"):
            parts.append(str(p.idx))
        else:
            parts.append(str(p))
    return "/".join(parts)


def tree_partition(tree: Any, predicate: Callable[[str], bool]):
    """Split a pytree into (matching, rest) by a path-string predicate.

    Non-matching leaves are replaced with None in each half, so the two halves
    re-merge with ``tree_merge`` and optax can mask on them.
    """
    flat = jax.tree_util.tree_flatten_with_path(tree)[0]
    treedef = jax.tree_util.tree_structure(tree)
    match_leaves, rest_leaves = [], []
    for path, leaf in flat:
        if predicate(path_str(path)):
            match_leaves.append(leaf)
            rest_leaves.append(None)
        else:
            match_leaves.append(None)
            rest_leaves.append(leaf)
    return (
        jax.tree_util.tree_unflatten(treedef, match_leaves),
        jax.tree_util.tree_unflatten(treedef, rest_leaves),
    )


def tree_merge(a: Any, b: Any) -> Any:
    """Merge two same-structure trees where exactly one side is non-None."""
    return jax.tree_util.tree_map(
        lambda x, y: x if x is not None else y, a, b, is_leaf=lambda x: x is None
    )


def tree_mask(tree: Any, predicate: Callable[[str], bool]) -> Any:
    """Boolean mask tree for optax.masked: True where path matches."""
    flat = jax.tree_util.tree_flatten_with_path(tree)[0]
    treedef = jax.tree_util.tree_structure(tree)
    return jax.tree_util.tree_unflatten(
        treedef, [predicate(path_str(p)) for p, _ in flat]
    )


def tree_cast(tree: Any, dtype) -> Any:
    """Cast all floating-point leaves to dtype."""
    def cast(x):
        if jnp.issubdtype(x.dtype, jnp.floating):
            return x.astype(dtype)
        return x
    return jax.tree_util.tree_map(cast, tree)

"""Model introspection (replaces the reference's Graphviz dump of the Chainer
computational graph, srgan_train.py:1363-1377): parameter-tree tables and an
optional DOT rendering of the module hierarchy."""

from __future__ import annotations

from typing import List, Tuple

import jax
import numpy as np


def param_table(params) -> List[Tuple[str, Tuple[int, ...], int]]:
    """[(path, shape, size)] for every parameter leaf, sorted by path."""
    rows = []
    for path, leaf in jax.tree_util.tree_leaves_with_path(params):
        name = jax.tree_util.keystr(path)
        rows.append((name, tuple(np.shape(leaf)), int(np.size(leaf))))
    return sorted(rows)


def summary(params, title: str = "model") -> str:
    """Human-readable parameter summary (total matches the reference's
    count_params doctests)."""
    rows = param_table(params)
    width = max(len(r[0]) for r in rows) if rows else 10
    lines = [f"{title}: {sum(r[2] for r in rows):,} parameters"]
    for name, shape, size in rows:
        lines.append(f"  {name:<{width}}  {str(shape):<20} {size:>12,}")
    return "\n".join(lines)


def to_dot(params, title: str = "model") -> str:
    """Graphviz DOT of the parameter tree (module hierarchy as clusters)."""
    lines = [f'digraph "{title}" {{', "  rankdir=LR;", '  node [shape=box];']
    for name, shape, size in param_table(params):
        clean = name.strip("[]'").replace("']['", "/").replace("'", "")
        lines.append(
            f'  "{clean}" [label="{clean}\\n{shape} = {size:,}"];'
        )
    lines.append("}")
    return "\n".join(lines)

"""Model summary text blob — run-start provenance.

Behavioral analog of the reference's ``print_model``
(`/root/reference/gnn_local_stress/models.py:33-41`), which renders
``torch_geometric.nn.summary(model, sample)`` and logs it at run start
(`/root/reference/scripts/gnn_train.py:413-419`). Flax has no nn.Module
instance tree to introspect post-init, so the table is built from the
param pytree: one row per parameter with its module path, shape and
count, plus the total — the information content the reference's summary
carries (layer structure + per-layer param counts).
"""

from __future__ import annotations

from typing import Any

import numpy as np


def model_summary(model: Any, params: Any) -> str:
    """Render a per-parameter table of ``params`` with a total count.

    ``model`` supplies the header line (class name + the config fields
    that shape the computation); ``params`` is the flax variables dict
    (or just its ``params`` collection).
    """
    from flax.traverse_util import flatten_dict

    tree = params.get("params", params) if isinstance(params, dict) else params
    flat = flatten_dict(tree)
    rows = []
    total = 0
    for path, leaf in sorted(flat.items(), key=lambda kv: kv[0]):
        # shapes only — device leaves are never materialized to host
        shape = tuple(int(s) for s in np.shape(leaf))
        count = int(np.prod(shape)) if shape else 1
        total += count
        rows.append(("/".join(str(p) for p in path), shape, count))

    name = type(model).__name__
    cfg = []
    for field in ("latent_size", "message_passing_steps", "scatter_impl",
                  "stream_dtype"):
        if hasattr(model, field):
            cfg.append(f"{field}={getattr(model, field)}")
    header = f"{name} ({', '.join(cfg)})" if cfg else name

    w = max((len(r[0]) for r in rows), default=10)
    lines = [header, "=" * len(header),
             f"{'Parameter':<{w}}  {'Shape':>16}  {'Count':>10}",
             "-" * (w + 30)]
    for path, shape, count in rows:
        lines.append(f"{path:<{w}}  {str(shape):>16}  {count:>10,}")
    lines.append("-" * (w + 30))
    lines.append(f"Total params: {total:,}")
    return "\n".join(lines)

"""Checkpointing: params + optimizer state + epoch + the 8 normalization
stats, mirroring the reference checkpoint contract
(`/root/reference/gnn_local_stress/models.py:44-95`): a best-on-test
checkpoint and a last-epoch checkpoint, loader restores stats, optimizer
restore optional, and the epoch is returned for resume.

Format: msgpack via flax.serialization (framework-native, no torch).
"""

from __future__ import annotations

from pathlib import Path
from typing import Any

import flax.serialization
import jax
import numpy as np

from p_div_gnn_tpu.graphs.container import NormStats

BEST_CHECKPOINT = "model_weights.ckpt"
LAST_CHECKPOINT = "last_epoch_model_weights.ckpt"


def save_checkpoint(
    path: str | Path,
    params: Any,
    opt_state: Any,
    epoch: int,
    stats: NormStats,
) -> None:
    payload = {
        "model_state_dict": flax.serialization.to_state_dict(
            jax.tree.map(np.asarray, params)
        ),
        "optimizer_state_dict": flax.serialization.to_state_dict(
            jax.tree.map(np.asarray, opt_state)
        ),
        "epoch": epoch,
        "stats": stats.to_dict(),
    }
    data = flax.serialization.msgpack_serialize(payload)
    # atomic write: a crash/kill mid-save must not corrupt the checkpoint
    # a restart resumes from
    path = Path(path)
    tmp = path.with_suffix(path.suffix + ".tmp")
    tmp.write_bytes(data)
    tmp.replace(path)


def load_checkpoint(
    path: str | Path,
    params_template: Any,
    opt_state_template: Any | None = None,
) -> tuple[Any, Any | None, int, NormStats]:
    """Returns (params, opt_state_or_None, epoch, stats)."""
    payload = flax.serialization.msgpack_restore(Path(path).read_bytes())
    params = flax.serialization.from_state_dict(
        params_template, payload["model_state_dict"]
    )
    opt_state = None
    if opt_state_template is not None:
        try:
            opt_state = flax.serialization.from_state_dict(
                opt_state_template, payload["optimizer_state_dict"]
            )
        except (ValueError, KeyError) as exc:
            # Toggling skip_nonfinite_updates wraps the opt state in
            # ApplyIfFiniteState, so a checkpoint written under the other
            # setting has a different pytree structure. ONLY that specific
            # wrapper-presence mismatch falls back to a params-only restore
            # (fresh optimizer) — so an unattended watchdog-driven resume
            # survives the toggle — while any other structural mismatch
            # (corrupted or wrong-model checkpoint) re-raises instead of
            # silently resetting Adam moments (ADVICE r3).
            def _is_wrapped(sd: Any) -> bool:
                wrapper = {"notfinite_count", "last_finite",
                           "total_notfinite", "inner_state"}
                return isinstance(sd, dict) and wrapper <= set(sd)

            saved_sd = payload["optimizer_state_dict"]
            tmpl_sd = flax.serialization.to_state_dict(opt_state_template)
            if _is_wrapped(saved_sd) == _is_wrapped(tmpl_sd):
                raise  # not the documented toggle — fail loudly
            print(
                "WARNING: checkpoint optimizer state was saved with the "
                f"opposite skip_nonfinite_updates setting ({exc}); "
                "restoring params only with a FRESH optimizer state (Adam "
                "moments reset — expect a brief loss bump after resume)."
            )
            opt_state = None
    stats = NormStats.from_dict(payload["stats"])
    return params, opt_state, int(payload["epoch"]), stats

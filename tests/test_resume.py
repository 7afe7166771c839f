"""Checkpoint resume: continuing from the last checkpoint reproduces the
optimizer trajectory (capability the reference stores but never uses —
`models.py:66-87` returns the epoch, no script resumes)."""

import numpy as np
import pytest
import jax

from p_div_gnn_tpu.graphs import MeshStressFieldDataset
from p_div_gnn_tpu.models import EncodeProcessDecode
from p_div_gnn_tpu.train import GraphLoader, Trainer, load_checkpoint
from p_div_gnn_tpu.train.checkpoint import LAST_CHECKPOINT

from test_train_e2e import _write_toy_dataset


@pytest.mark.slow
def test_resume_continues_trajectory(tmp_path):
    df = _write_toy_dataset(tmp_path, n_samples=4, seed=7)
    ds = MeshStressFieldDataset(df)
    mk_loader = lambda s: GraphLoader(ds.samples, 2, shuffle=True, seed=s)

    model = EncodeProcessDecode(latent_size=8, message_passing_steps=1)

    def make_trainer():
        return Trainer(
            model=model, stats=ds.stats, optimize_divergence=False,
            monitor_divergence_in_test=False,
        )

    # run A: 4 epochs straight
    tr = make_trainer()
    params, opt = tr.init(jax.random.PRNGKey(0), next(iter(mk_loader(0))))
    pa, oa, _, _ = tr.fit(
        params, opt, mk_loader(1), mk_loader(2), epochs=4,
        weights_folder=tmp_path / "a", verbose=False,
    )

    # run B: 2 epochs, then resume for 2 more (same shuffle streams)
    tr = make_trainer()
    params, opt = tr.init(jax.random.PRNGKey(0), next(iter(mk_loader(0))))
    pb, ob, _, _ = tr.fit(
        params, opt, mk_loader(1), mk_loader(2), epochs=2,
        weights_folder=tmp_path / "b", verbose=False,
    )
    p2, o2, epoch, stats = load_checkpoint(
        tmp_path / "b" / LAST_CHECKPOINT, pb, ob
    )
    assert epoch == 2
    # recreate loaders whose rngs have consumed 2 epochs
    lt, le = mk_loader(1), mk_loader(2)
    for _ in range(2):
        for _b in lt:
            pass
        for _b in le:
            pass
    tr2 = make_trainer()
    tr2.stats = stats
    pb2, ob2, _, _ = tr2.fit(
        p2, o2, lt, le, epochs=4, weights_folder=tmp_path / "b",
        verbose=False, start_epoch=2,
    )
    for x, y in zip(jax.tree.leaves(pa), jax.tree.leaves(pb2)):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y), rtol=1e-6,
                                   atol=1e-7)

"""Headline benchmark: edges/s/chip on the flagship P-DivGNN training step.

Runs on the real TPU chip (do NOT force JAX_PLATFORMS). Workload: the
reference's published configuration — latent 128, 10 weight-tied
message-passing steps, batch 16 periodic plate-with-hole meshes, NMSE +
divergence-penalty loss (λ=10), Adam — i.e. one full fwd+bwd+update train
step (`configs_train/config_train_div.yml`; `BASELINE.md` north star).

Metric: real (non-padding) edges processed per second through the train
step. ``vs_baseline``: speedup of the best kernel path over the same
framework's XLA-scatter reference path (the reference repo publishes no
numeric baselines — BASELINE.json "published": {} — so the XLA path is the
baseline the kernel work is measured against).

Protocol (the ONE canonical measurement, docs/evidence/PROTOCOL.md):
two implementations only — "xla" (baseline) and the production kernel
path — each timed as K=10 train steps under ONE jit dispatch
(lax.scan), interleaved across rounds, per-impl best block wins. The
5-way impl × layout sweep lives in scripts/bench_sweep.py, NOT here.

Driver safety: the result JSON is printed incrementally — after every
timing round the best-so-far line is re-emitted (LAST line wins), so a
timeout mid-run still leaves a parseable number. A wall-clock budget
(PDG_BENCH_BUDGET_S, default 480 s) stops timing early if the chip or
tunnel is slow.
"""

from __future__ import annotations

import json
import os
import sys
import time

# NB: the JAX_COMPILATION_CACHE_DIR env var is a no-op here — the axon
# sitecustomize imports jax before this file runs, so the cache must be
# enabled via jax.config.update (utils/cache.enable_persistent_cache,
# called in main()). The cache directory is IN-REPO and committed, so the
# driver's cold-/tmp environment still starts warm (the r3 driver run
# spent 444 of 480 budget seconds on a cold compile).

T0 = time.perf_counter()
BUDGET_S = float(os.environ.get("PDG_BENCH_BUDGET_S", "480"))
SCAN_STEPS = 10


def _impls() -> list[str]:
    """Baseline + THE production case. Entries are ``impl`` or
    ``impl:stream_dtype``. bf16 streams REPLACE fp32 as the production
    case ONLY once the multi-seed paired A/B for the PRODUCTION kernel
    generation (docs/evidence/ab_bf16_fused3.json — 3 seeds, gaps
    -0.49% / +0.03% / -0.36%, mean -0.27%) exists and clears the bar with
    >=2 complete pairs — the bench never headlines a dtype the accuracy
    evidence hasn't cleared (PROTOCOL.md §Metric; ab_bf16_seeds.json is
    the v2-kernel 3-seed evidence the bar was first cleared on)."""
    env = os.environ.get("PDG_BENCH_IMPLS")
    if env:
        return env.split(",")
    # production path since round 5: fused3 (raw-x kernels; ~1.77x the v2
    # fused step measured interleaved — see the r5 evidence). PROTOCOL.md:
    # the canonical run is TWO implementations — the xla baseline and THE
    # production case: fused3:bfloat16 when the accuracy evidence gate
    # clears, else fused3 fp32 (with main() dropping EDGE_BLOCK to the
    # largest fp32-safe block).
    impls = ["xla", "fused3"]
    # resolve relative to this file, NOT the cwd — running bench.py from
    # outside the repo root must not silently disable the evidence-cleared
    # bf16 case (advisor round-4 finding). PDG_BF16_AB_PATH overrides for
    # tests.
    gate = os.environ.get("PDG_BF16_AB_PATH") or os.path.join(
        os.path.dirname(os.path.abspath(__file__)),
        "docs/evidence/ab_bf16_fused3.json",
    )
    try:
        ab = json.load(open(gate))
        if len(ab.get("pairs", [])) >= 2 and ab.get("mean_gap_pct", 99) < 5:
            impls[impls.index("fused3")] = "fused3:bfloat16"
    except Exception as exc:  # noqa: BLE001 — gate absence just skips bf16
        print(f"bench: bf16 evidence gate unreadable ({gate}): {exc}",
              file=sys.stderr, flush=True)
    return impls


IMPLS = _impls()


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def elapsed() -> float:
    return time.perf_counter() - T0


def build_workload(n_graphs: int = 16, seed: int = 0,
                   pair_blocks: bool = False):
    import numpy as np

    from p_div_gnn_tpu.datagen.mesher import hole_plate_mesh
    from p_div_gnn_tpu.datagen.opdiv import compute_op_div_matrix
    from p_div_gnn_tpu.graphs import (
        compute_node_labels,
        compute_periodic_graph,
        mesh_to_graph,
        pack_batch,
    )
    from p_div_gnn_tpu.graphs.batching import GraphSample

    rng = np.random.default_rng(seed)
    samples = []
    for i in range(n_graphs):
        mesh = hole_plate_mesh(
            100.0, 100.0,
            radius=float(rng.uniform(15, 30)),
            hole_center=(50.0, 50.0),
            hole_refinement_factor=8.0,
            global_mesh_refinement_size=2.5,
            seed=seed + i,
        )
        g = compute_periodic_graph(mesh_to_graph(mesh))
        op = compute_op_div_matrix(mesh.points[:, :2], mesh.faces)
        n = g.num_nodes
        samples.append(
            GraphSample(
                graph=g,
                mean_stress=rng.normal(size=3).astype(np.float32),
                local_stress=rng.normal(size=(n, 3)).astype(np.float32),
                node_labels=compute_node_labels(mesh),
                div_data=op.data.astype(np.float32),
                div_row=op.row.astype(np.int64),
                div_col=op.col.astype(np.int64),
            )
        )
    batch = pack_batch(samples, n_graphs=n_graphs, pair_blocks=pair_blocks,
                       reorder="rcm")
    n_real_edges = sum(s.num_edges for s in samples)
    n_real_nodes = sum(s.num_nodes for s in samples)
    return batch, n_real_edges, n_real_nodes


def make_scanned_train_step(scatter_impl: str, batch,
                            stream_dtype: str = "float32",
                            remat: bool | None = None):
    """K train steps under ONE jit dispatch (lax.scan over the step body).

    The remote-TPU tunnel charges a large per-dispatch/sync latency that a
    per-step Python loop pays on every step but pipelined training mostly
    hides (docs/evidence/ROOFLINE.md "Step decomposition"); scanning K
    steps device-side measures actual device throughput. Same weights,
    same optimizer, same batch — the quantity reported (edges/s through
    the full fwd+bwd+Adam step) is unchanged, only the transport overhead
    is out of the way."""
    import jax

    from p_div_gnn_tpu.graphs.container import NormStats
    from p_div_gnn_tpu.models import EncodeProcessDecode
    from p_div_gnn_tpu.train.loop import Trainer

    if remat is None:
        # The bench workload (43k nodes / 264k edge slots, batch 16) fits
        # HBM WITHOUT per-step rematerialization, and skipping the remat
        # replay saves ~21 ms/step (docs/evidence/decompose.json
        # train_noremat); training runs default to remat_steps=True for
        # larger-than-bench workloads (models/epd.py).
        remat = os.environ.get("PDG_BENCH_REMAT", "0") == "1"
    model = EncodeProcessDecode(
        latent_size=128, message_passing_steps=10,
        scatter_impl=scatter_impl, stream_dtype=stream_dtype,
        remat_steps=remat,
    )
    trainer = Trainer(
        model=model, stats=NormStats.ones(), learning_rate=1e-3,
        divergence_penalty=10.0, optimize_divergence=True,
    )
    params, opt_state = trainer.init(jax.random.PRNGKey(0), batch)
    log(f"{scatter_impl}/{stream_dtype}: init done "
        f"(t={time.perf_counter() - T0:.0f}s); compiling scanned step")

    def body(carry, _):
        p, o = carry
        p, o, aux = trainer._train_step_impl(p, o, batch)
        return (p, o), aux["total"]

    scanned = jax.jit(
        lambda p, o: jax.lax.scan(body, (p, o), None, length=SCAN_STEPS)
    )
    _, totals = scanned(params, opt_state)  # compile
    jax.block_until_ready(totals)
    return scanned, params, opt_state


def emit(n_edges: int, best_t: dict) -> None:
    """Print the best-so-far result line (LAST printed line wins)."""
    finite = {k: v for k, v in best_t.items() if v < float("inf")}
    if not finite:
        return
    best = min(finite.values())
    t_xla = finite.get("xla")
    result = {
        "metric": ("edges/s/chip (P-DivGNN train fwd+bwd, L=128, "
                   "10 MP steps, batch 16)"),
        "value": round(n_edges / best, 1),
        "unit": "edges/s",
        # null (not a fabricated 1.0) until the xla baseline has a timing
        "vs_baseline": round(t_xla / best, 4) if t_xla else None,
    }
    # %speed-of-light against the roofline matching the winning case
    # (scripts/roofline.py writes one JSON per (impl, stream_dtype))
    best_case = min(finite, key=finite.get)
    result["best_impl"] = best_case
    for roof_path in (
        "docs/evidence/roofline.json",
        "docs/evidence/roofline_bf16.json",
    ):
        try:
            roof = json.load(open(roof_path))
        except Exception:
            continue
        case = roof["impl"]
        if roof.get("stream_dtype", "float32") != "float32":
            case += ":" + roof["stream_dtype"]
        if case != best_case:
            continue
        result["pct_speed_of_light"] = round(
            100.0 * roof["speed_of_light_ms"] / (finite[case] * 1e3), 1
        )
        result["sol_impl"] = case
        result["sol_bound"] = roof["bound"]
        break
    print(json.dumps(result), flush=True)


def main() -> None:
    # Layout guard: the round-5 default layout is 768×256 (fastest for the
    # bf16 production path), but the fp32 fused kernels' backward VMEM
    # exceeds the 16 MB scoped limit at 768-row blocks. If the bf16 gate
    # did NOT clear (fp32 fused3 is about to be timed), drop to the
    # largest fp32-safe block BEFORE the package binds the constants.
    if (
        any(i in IMPLS for i in ("fused3", "fused", "fused2"))
        and "PDG_EDGE_BLOCK" not in os.environ
    ):
        # NB: the drop is process-wide — a hand-picked PDG_BENCH_IMPLS
        # mixing fp32 and bf16 fused cases times BOTH at 512 (correctness
        # over the bf16 case's ~5% layout edge); the default production
        # set never mixes dtypes.
        os.environ["PDG_EDGE_BLOCK"] = "512"
        log("bench: fp32 fused case in the set -> EDGE_BLOCK=512 "
            "(fp32 backward VMEM exceeds the scoped limit at 768; "
            "applies to every impl in this process)")

    import jax

    from p_div_gnn_tpu.utils.cache import enable_persistent_cache

    cache_dir = enable_persistent_cache()
    log(f"devices: {jax.devices()}; compile cache {cache_dir}  "
        f"(t={elapsed():.0f}s)")
    batch, n_edges, n_nodes = build_workload()
    log(
        f"workload: {n_nodes} nodes, {n_edges} edges "
        f"(padded {batch.num_nodes_padded}/{batch.num_edges_padded})"
        f"  (t={elapsed():.0f}s)"
    )
    best_t: dict[str, float] = {}
    cases = {}
    # compile the PRODUCTION impl(s) first (likely-fastest first) so a
    # budget/timeout cut mid-compile of the baseline still leaves the
    # headline number measurable
    for impl in sorted(IMPLS, key=lambda i: (i == "xla", ":" not in i)):
        if cases and elapsed() > BUDGET_S - 120:
            # a headline impl is compiled and timed; don't risk the
            # whole run on another compile with <120 s of budget left
            log(f"skipping {impl}: only {BUDGET_S - elapsed():.0f}s of "
                "budget left after the production impl")
            continue
        name, _, dtype = impl.partition(":")
        try:
            cases[impl] = make_scanned_train_step(
                name, batch, stream_dtype=dtype or "float32"
            )
            best_t[impl] = float("inf")
            log(f"{impl}: compiled (t={elapsed():.0f}s)")
        except Exception as exc:  # pragma: no cover
            log(f"{impl} path failed ({type(exc).__name__}: {exc})")
        # one quick timing block right after each compile → a printable
        # number exists as early as possible
        if impl in cases:
            scanned, params, opt_state = cases[impl]
            t0 = time.perf_counter()
            _, totals = scanned(params, opt_state)
            jax.block_until_ready(totals)
            best_t[impl] = (time.perf_counter() - t0) / SCAN_STEPS
            log(f"r- {impl}: {best_t[impl]*1e3:.2f} ms (t={elapsed():.0f}s)")
            emit(n_edges, best_t)
    # The tunneled chip shows large (up to ~5x) run-to-run contention
    # noise, so each implementation is timed in short blocks, INTERLEAVED
    # across several rounds, and the per-impl best block is used.
    for r in range(5):
        if elapsed() > BUDGET_S:
            log(f"budget {BUDGET_S}s exhausted at round {r}")
            break
        for impl, (scanned, params, opt_state) in cases.items():
            t0 = time.perf_counter()
            _, totals = scanned(params, opt_state)
            jax.block_until_ready(totals)
            t = (time.perf_counter() - t0) / SCAN_STEPS
            best_t[impl] = min(best_t[impl], t)
            log(f"r{r} {impl}: {t*1e3:.2f} ms (t={elapsed():.0f}s)")
        emit(n_edges, best_t)
    for impl, t in best_t.items():
        log(f"best {impl} train step: {t*1e3:.2f} ms")
    emit(n_edges, best_t)


if __name__ == "__main__":
    main()

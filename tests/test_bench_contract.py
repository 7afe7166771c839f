"""Driver-contract tests for bench.py that need no chip: the bf16
production gate (A/B-evidence-driven impl selection) and the result-line
emitter (vs_baseline null-ness, best_impl, %SoL case matching)."""

import importlib.util
import json
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent


def _load_bench(monkeypatch, tmp_path, ab=None, rooflines=()):
    """Import bench.py fresh against a synthetic evidence tree. The bf16
    gate resolves relative to bench.py itself (advisor round-4: a cwd-
    relative read silently disabled the gate off-root), so the test
    points it at the synthetic file via PDG_BF16_AB_PATH; the roofline
    emitter still reads cwd-relative paths."""
    ev = tmp_path / "docs" / "evidence"
    ev.mkdir(parents=True)
    monkeypatch.setenv("PDG_BF16_AB_PATH", str(ev / "ab_bf16_seeds.json"))
    if ab is not None:
        (ev / "ab_bf16_seeds.json").write_text(json.dumps(ab))
    for name, payload in rooflines:
        (ev / name).write_text(json.dumps(payload))
    monkeypatch.chdir(tmp_path)
    monkeypatch.delenv("PDG_BENCH_IMPLS", raising=False)
    spec = importlib.util.spec_from_file_location(
        "bench_under_test", REPO / "bench.py"
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_bf16_gate_requires_two_clear_pairs(monkeypatch, tmp_path):
    # no A/B file → fp32-only production set
    m = _load_bench(monkeypatch, tmp_path)
    assert m.IMPLS == ["xla", "fused3"]

    # one pair only → still gated off
    ab = {"pairs": [{"seed": 1}], "mean_gap_pct": -0.3}
    m = _load_bench(monkeypatch, tmp_path / "a", ab=ab)
    assert "fused3:bfloat16" not in m.IMPLS

    # two pairs but accuracy bar missed → gated off
    ab = {"pairs": [{"seed": 1}, {"seed": 2}], "mean_gap_pct": 7.0}
    m = _load_bench(monkeypatch, tmp_path / "b", ab=ab)
    assert "fused3:bfloat16" not in m.IMPLS

    # two pairs inside the bar → bf16 REPLACES fp32 as the production
    # case (PROTOCOL: the canonical run is exactly baseline + production)
    ab = {"pairs": [{"seed": 1}, {"seed": 2}], "mean_gap_pct": -0.33}
    m = _load_bench(monkeypatch, tmp_path / "c", ab=ab)
    assert m.IMPLS == ["xla", "fused3:bfloat16"]


def test_env_override_wins(monkeypatch, tmp_path):
    monkeypatch.setenv("PDG_BENCH_IMPLS", "fused")
    spec = importlib.util.spec_from_file_location(
        "bench_under_test2", REPO / "bench.py"
    )
    mod = importlib.util.module_from_spec(spec)
    monkeypatch.chdir(tmp_path)
    spec.loader.exec_module(mod)
    assert mod.IMPLS == ["fused"]


def test_emit_null_baseline_and_sol_case_matching(
    monkeypatch, tmp_path, capsys
):
    roof = {
        "impl": "fused", "stream_dtype": "bfloat16",
        "speed_of_light_ms": 12.1, "bound": "hbm",
    }
    m = _load_bench(
        monkeypatch, tmp_path,
        rooflines=(("roofline_bf16.json", roof),),
    )
    # xla never timed → vs_baseline must be null, never a fabricated 1.0
    m.emit(1000, {"fused:bfloat16": 0.160, "xla": float("inf")})
    line = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert line["vs_baseline"] is None
    assert line["best_impl"] == "fused:bfloat16"
    # %SoL matched the bf16 roofline case
    assert line["sol_impl"] == "fused:bfloat16"
    assert abs(line["pct_speed_of_light"] - 100 * 12.1 / 160.0) < 0.11

    # fp32 roofline must NOT be applied to a bf16 winner
    m2 = _load_bench(
        monkeypatch, tmp_path / "x",
        rooflines=(
            ("roofline.json",
             {"impl": "fused", "stream_dtype": "float32",
              "speed_of_light_ms": 13.8, "bound": "hbm"}),
        ),
    )
    m2.emit(1000, {"fused:bfloat16": 0.160, "xla": 0.353})
    line = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert "pct_speed_of_light" not in line
    assert line["vs_baseline"] == round(0.353 / 0.160, 4)

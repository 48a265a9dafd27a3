"""experiments/run.py CLI contract: flag gating and entry-point wiring.

The queue scripts drive multi-hour chip runs through this CLI; a silently
ignored flag (or a typo'd entry) must fail at argparse time, not after
hours of training (run.py `supports` table).
"""

import pytest

from pde_control_tpu.experiments import run as run_cli


def _main(argv, monkeypatch):
    import sys

    monkeypatch.setattr(sys, "argv", ["run.py"] + argv)
    run_cli.main()


@pytest.mark.parametrize("argv", [
    ["burgers_chain", "--num-train", "8"],      # not in supports[num_train]
    ["burgers_chain", "--datadir", "/tmp/x"],
    ["compare_burgers", "--seed", "1"],
    # 0-valued flags must still error: 0 == False in Python, and a guard
    # written as `not in (None, False)` silently passed them (review fix).
    ["compare_burgers", "--seed", "0"],
    ["burgers_chain", "--num-train", "0"],
    ["burgers_chain", "--e2e-iterations", "5"],
    ["burgers_chain", "--resume"],
    # Round-5 flags gate like the rest: --batch/--lr-scale/--sequence on
    # entries that don't thread them, --datadir/--force-reg on rings_ft.
    ["burgers_chain", "--batch", "64"],
    ["shape_transition", "--lr-scale", "2.83"],
    ["smoke_indirect", "--sequence", "refined"],
    ["shape_transition_rings_ft", "--datadir", "/tmp/x"],
    ["shape_transition_rings_ft", "--force-reg", "1e-5"],
])
def test_unsupported_flags_error(argv, monkeypatch, capsys):
    with pytest.raises(SystemExit) as e:
        _main(argv, monkeypatch)
    assert e.value.code == 2
    assert "not supported" in capsys.readouterr().err


@pytest.mark.parametrize("name", [
    "smoke3d_ft", "smoke3d_indirect_ft", "natural_flow_128_ft",
    "smoke_indirect_ft", "smoke_128_ft", "shape_transition_ft",
    "shape_transition_rings_ft",
])
def test_finetune_entries_require_init_from(name, monkeypatch, capsys):
    with pytest.raises(SystemExit) as e:
        _main([name, "--smoke-test"], monkeypatch)
    assert e.value.code == 2
    assert "--init-from" in capsys.readouterr().err


def test_unknown_experiment_errors(monkeypatch, capsys):
    with pytest.raises(SystemExit):
        _main(["no_such_experiment"], monkeypatch)


def test_burgers_adjoint_smoke(monkeypatch, tmp_path, capsys):
    """One real CLI entry end-to-end at smoke size (the cheapest one)."""
    import json

    _main(["burgers_adjoint", "--smoke-test", "--iterations", "5",
           "--workdir", str(tmp_path / "w")], monkeypatch)
    out = json.loads(capsys.readouterr().out)
    assert out["final_obs_mse"] < out["initial_obs_mse"]


def test_comparison_resume(tmp_path):
    """run_comparison with resume=True reuses completed rows from
    comparison.json and retrains nothing (round-3 crash recovery)."""
    from pde_control_tpu.experiments.compare_schemes import compare_burgers

    wd = str(tmp_path / "cmp")
    first = compare_burgers(wd, smoke_test=True)
    second = compare_burgers(wd, smoke_test=True, resume=True)
    assert set(second) == set(first)
    for scheme in ("chain_final", "staggered", "refined", "adjoint"):
        assert second[scheme]["final_state_mse"] == pytest.approx(
            first[scheme]["final_state_mse"]), scheme


def test_adjoint_row_microbatched_fill_on_resume(tmp_path):
    """The round-4 n=64 repair path: a comparison whose adjoint row was
    skipped (adjoint_iterations=0) gets the row FILLED on a resumed rerun
    with microbatching — without retraining the supervised stages or the
    scheme rows, even when their checkpoints are gone (VM reset)."""
    import shutil

    from pde_control_tpu.control.pde_burgers import BurgersPDE
    from pde_control_tpu.data.generate import generate_burgers_dataset
    from pde_control_tpu.experiments.burgers import BURGERS_CFG
    from pde_control_tpu.experiments.compare_schemes import run_comparison

    wd = str(tmp_path / "cmp")
    n = 4
    train = generate_burgers_dataset(BURGERS_CFG, 32, n, seed=0,
                                     force_amplitude=0.5)
    val = generate_burgers_dataset(BURGERS_CFG, 16, n, seed=999,
                                   force_amplitude=0.5)
    kw = dict(batch_size=8, iterations=20, force_reg=1e-4, adjoint_lr=0.1)
    first = run_comparison(BurgersPDE(BURGERS_CFG), n, train, val, wd,
                           adjoint_iterations=0, **kw)
    assert first["adjoint"]["skipped"]
    # Simulate the VM reset: checkpoints wiped, comparison.json survives.
    for name in ("ckpt_cfe", "ckpt_ops", "ckpt_chain_final",
                 "ckpt_staggered", "ckpt_refined"):
        shutil.rmtree(f"{wd}/{name}", ignore_errors=True)
    second = run_comparison(BurgersPDE(BURGERS_CFG), n, train, val, wd,
                            adjoint_iterations=10, adjoint_microbatch=4,
                            resume=True, **kw)
    adj = second["adjoint"]
    assert not adj.get("skipped")
    assert adj["microbatch"] == 4 and adj["num_trajectories"] == 16
    assert adj["final_state_mse"] > 0 and adj["final_state_mse"] < 1e3
    for scheme in ("chain_final", "staggered", "refined"):
        assert second[scheme]["final_state_mse"] == pytest.approx(
            first[scheme]["final_state_mse"]), scheme

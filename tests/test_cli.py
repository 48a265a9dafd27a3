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
])
def test_unsupported_flags_error(argv, monkeypatch, capsys):
    with pytest.raises(SystemExit) as e:
        _main(argv, monkeypatch)
    assert e.value.code == 2
    assert "not supported" in capsys.readouterr().err


@pytest.mark.parametrize("name", [
    "smoke3d_ft", "smoke3d_indirect_ft", "natural_flow_128_ft",
    "smoke_indirect_ft", "smoke_128_ft", "shape_transition_ft",
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

"""run_curriculum integration: staged e2e horizon growth + eval.

The quality runs (experiments/fluid2d.py) rely on the staged-growth restore
chain (e2e_stage_ns): each horizon's e2e stage restores the previous
horizon's refined CFE/OPs and ckpt_ops for the newly introduced top-level
OP. This pins that composition end-to-end on a tiny Burgers problem
(reference: the staged curriculum of SURVEY.md §3.4, notebooks [R]).
"""

import json
import os

from pde_control_tpu.control.pde_burgers import BurgersPDE
from pde_control_tpu.data.generate import generate_burgers_dataset
from pde_control_tpu.experiments.curriculum import (
    CurriculumConfig,
    run_curriculum,
)
from pde_control_tpu.physics.burgers import BurgersConfig

CFG = BurgersConfig(n=16, dt=0.5, viscosity=0.05)


def test_staged_curriculum_runs_and_evaluates(tmp_path):
    train = generate_burgers_dataset(CFG, num=16, n_steps=4, seed=0)
    val = generate_burgers_dataset(CFG, num=8, n_steps=4, seed=1)
    pde = BurgersPDE(CFG)
    ccfg = CurriculumConfig(
        n=4, batch_size=4, cfe_iterations=3, op_iterations=3,
        e2e_iterations=4, e2e_stage_ns=(2, 4), steps_per_call=2,
    )
    workdir = str(tmp_path / "curr")
    results = run_curriculum(pde, ccfg, train, val, workdir)

    # every stage ran, including both staged-e2e horizons
    for key in ("cfe_supervised", "op2_supervised", "op4_supervised",
                "end_to_end_n2", "end_to_end_n4", "end_to_end", "eval"):
        assert key in results, key
    # staged checkpoints exist and the final one carries every network
    assert os.path.isdir(os.path.join(workdir, "ckpt_e2e_n2"))
    for net in ("CFE", "OP2", "OP4"):
        assert os.path.exists(
            os.path.join(workdir, "ckpt_final", f"{net}.msgpack")), net
    ev = results["eval"]
    assert ev["final_state_mse"] == ev["final_state_mse"]  # finite
    assert ev["zero_force_final_mse"] > 0
    # Per-frame curve consistency (round-3 fix: curves were averaged over
    # batch AND re-divided by sample count — eval_batch× too small): the
    # last per-frame entry IS the final-state MSE, for both rollouts.
    import numpy as np

    np.testing.assert_allclose(ev["per_frame_mse"][-1],
                               ev["final_state_mse"], rtol=1e-5)
    np.testing.assert_allclose(ev["per_frame_zero_force_mse"][-1],
                               ev["zero_force_final_mse"], rtol=1e-5)
    assert len(ev["per_frame_mse"]) == 4
    assert results["end_to_end"]["loss"] == results["end_to_end_n4"]["loss"]
    with open(os.path.join(workdir, "results.json")) as f:
        assert "eval" in json.load(f)


def test_stage_ns_must_end_at_n(tmp_path):
    train = generate_burgers_dataset(CFG, num=8, n_steps=4, seed=0)
    pde = BurgersPDE(CFG)
    ccfg = CurriculumConfig(n=4, batch_size=4, e2e_stage_ns=(2,))
    import pytest

    with pytest.raises(ValueError, match="e2e_stage_ns"):
        run_curriculum(pde, ccfg, train, train, str(tmp_path / "x"))


def test_resume_skips_completed_stages_and_restarts_partial(tmp_path):
    """Stage-granular restart of a killed curriculum (round 3): a full
    rerun with resume=True retrains nothing; deleting the last e2e
    checkpoint (simulating a kill mid-stage) retrains exactly that stage,
    restoring the earlier stages' checkpoints."""
    import shutil

    train = generate_burgers_dataset(CFG, num=16, n_steps=4, seed=0)
    val = generate_burgers_dataset(CFG, num=8, n_steps=4, seed=1)
    pde = BurgersPDE(CFG)
    ccfg = CurriculumConfig(
        n=4, batch_size=4, cfe_iterations=3, op_iterations=3,
        e2e_iterations=4, e2e_stage_ns=(2, 4), steps_per_call=2,
    )
    workdir = str(tmp_path / "curr")
    first = run_curriculum(pde, ccfg, train, val, workdir)

    # Everything checkpointed -> resume trains nothing, eval still runs.
    res = run_curriculum(pde, ccfg, train, val, workdir, resume=True)
    for key in ("cfe_supervised", "op2_supervised", "op4_supervised",
                "end_to_end_n2", "end_to_end_n4"):
        assert res[key] == {"resumed": True}, key
    assert "final_state_mse" in res["eval"]
    # The resumed eval restores the final stage's own checkpoint — same
    # params, same deterministic val protocol, same number.
    assert (res["eval"]["final_state_mse"]
            == first["eval"]["final_state_mse"])

    # Kill the final e2e stage: only it retrains (supervised stages and
    # e2e_n2 stay resumed), composing from the surviving checkpoints.
    shutil.rmtree(os.path.join(workdir, "ckpt_e2e_n4"))
    res2 = run_curriculum(pde, ccfg, train, val, workdir, resume=True)
    assert res2["end_to_end_n2"] == {"resumed": True}
    assert "loss" in res2["end_to_end_n4"]
    assert res2["cfe_supervised"] == {"resumed": True}
    assert os.path.exists(
        os.path.join(workdir, "ckpt_e2e_n4", "OP4.msgpack"))


def test_resume_from_scratch_trains_every_op_stage(tmp_path):
    """Round-3 regression: with resume=True on a FRESH workdir (the normal
    crash-safe invocation), the first OP stage's save used to write ALL
    nets — including the later spans at random init — into the shared
    ckpt_ops, and `_ckpt_has` then skipped the later OP supervised stages
    as 'resumed'. Every OP stage must actually train."""
    train = generate_burgers_dataset(CFG, num=16, n_steps=4, seed=0)
    val = generate_burgers_dataset(CFG, num=8, n_steps=4, seed=1)
    pde = BurgersPDE(CFG)
    ccfg = CurriculumConfig(
        n=4, batch_size=4, cfe_iterations=3, op_iterations=3,
        e2e_iterations=4, steps_per_call=2,
    )
    workdir = str(tmp_path / "fresh_resume")
    res = run_curriculum(pde, ccfg, train, val, workdir, resume=True)
    for key in ("cfe_supervised", "op2_supervised", "op4_supervised"):
        assert "loss" in res[key], f"{key} was skipped on a fresh run"
    # ckpt_ops carries ONLY the supervised-trained OP nets (no stray CFE
    # or untrained-span msgpacks that would confuse a later resume)
    files = {f for f in os.listdir(os.path.join(workdir, "ckpt_ops"))
             if f.endswith(".msgpack")}
    assert files == {"OP2.msgpack", "OP4.msgpack"}


def test_finetune_e2e_restores_trains_and_evals(tmp_path):
    """finetune_e2e (force-reg annealing entry): restores every net from a
    finished run's ckpt_final, trains one e2e stage at the NEW force_reg,
    writes its own ckpt_final + results.json, and is resume-idempotent."""
    import numpy as np

    from pde_control_tpu.experiments.curriculum import finetune_e2e

    train = generate_burgers_dataset(CFG, num=16, n_steps=4, seed=0)
    val = generate_burgers_dataset(CFG, num=8, n_steps=4, seed=1)
    pde = BurgersPDE(CFG)
    base_cfg = CurriculumConfig(
        n=4, batch_size=4, cfe_iterations=3, op_iterations=3,
        e2e_iterations=4, steps_per_call=2,
    )
    base_dir = str(tmp_path / "base")
    run_curriculum(pde, base_cfg, train, val, base_dir)
    init_ckpt = os.path.join(base_dir, "ckpt_final")

    ft_cfg = CurriculumConfig(
        n=4, batch_size=4, e2e_iterations=4, steps_per_call=2,
        force_reg=base_cfg.force_reg / 2,
    )
    ft_dir = str(tmp_path / "ft")
    res = finetune_e2e(pde, ft_cfg, train, val, ft_dir, init_ckpt)
    assert res["force_reg"] == ft_cfg.force_reg
    assert "loss" in res["finetune"]
    assert res["finetune"]["iterations_run"] == 4
    assert np.isfinite(res["eval"]["final_state_mse"])
    for net in ("CFE", "OP2", "OP4"):
        assert os.path.exists(
            os.path.join(ft_dir, "ckpt_final", f"{net}.msgpack")), net
    # the fine-tuned params moved off the init checkpoint (byte-compare
    # the serialized nets — identical bytes would mean no training)
    with open(os.path.join(init_ckpt, "CFE.msgpack"), "rb") as f:
        init_bytes = f.read()
    with open(os.path.join(ft_dir, "ckpt_final", "CFE.msgpack"), "rb") as f:
        ft_bytes = f.read()
    assert init_bytes != ft_bytes

    # resume on the finished workdir: skips training, re-evals same number
    res2 = finetune_e2e(pde, ft_cfg, train, val, ft_dir, init_ckpt,
                        resume=True)
    assert res2["finetune"] == {"resumed": True}
    assert res2["eval"]["final_state_mse"] == res["eval"]["final_state_mse"]

    # a missing/incomplete init checkpoint fails fast
    import pytest

    with pytest.raises(FileNotFoundError):
        finetune_e2e(pde, ft_cfg, train, val, str(tmp_path / "ft2"),
                     str(tmp_path / "nonexistent"))

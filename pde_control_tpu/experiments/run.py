"""CLI for the benchmark experiments.

    python -m pde_control_tpu.experiments.run <name> [--smoke-test] \
        [--workdir DIR] [--iterations N] [--mesh N_DEVICES]

Names: burgers_chain, burgers_hierarchical, shape_transition,
smoke_indirect, natural_flow_128 (the five BASELINE.json configs).

`--smoke-test` shrinks every dimension for a fast CI-sized run.
"""

from __future__ import annotations

import argparse
import json

from pde_control_tpu.experiments import burgers, fluid2d


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("name", choices=[
        "burgers_chain", "burgers_hierarchical", "shape_transition",
        "smoke_indirect", "natural_flow_128"])
    p.add_argument("--workdir", default=None)
    p.add_argument("--iterations", type=int, default=None)
    p.add_argument("--smoke-test", action="store_true")
    p.add_argument("--mesh", type=int, default=None,
                   help="data-parallel over N devices")
    args = p.parse_args()

    workdir = args.workdir or f"runs/{args.name}"
    mesh = None
    if args.mesh:
        from pde_control_tpu.parallel.mesh import make_mesh

        mesh = make_mesh(args.mesh)

    st = args.smoke_test
    it = args.iterations

    if args.name == "burgers_chain":
        result = burgers.run_chain_supervised(
            workdir, n=4 if st else 32,
            iterations=it or (30 if st else 2000),
            num_train=64 if st else 1024, num_val=16 if st else 128,
            batch_size=8 if st else 32)
    elif args.name == "burgers_hierarchical":
        result = burgers.run_hierarchical(
            workdir, n=4 if st else 32,
            iterations=it or (30 if st else 1000),
            num_train=64 if st else 1024, num_val=16 if st else 128,
            batch_size=8 if st else 32)
    elif args.name == "shape_transition":
        result = fluid2d.run_shape_transition(
            workdir, size=16 if st else 64, n=4 if st else 16,
            iterations=it or (10 if st else 500),
            num_train=16 if st else 256, num_val=8 if st else 32,
            batch_size=4 if st else 8, mesh=mesh)
    elif args.name == "smoke_indirect":
        result = fluid2d.run_smoke_indirect(
            workdir, size=16 if st else 64, n=4 if st else 16,
            iterations=it or (10 if st else 500),
            num_train=16 if st else 256, num_val=8 if st else 32,
            batch_size=4 if st else 8, mesh=mesh)
    else:
        result = fluid2d.run_natural_flow_128(
            workdir, size=16 if st else 64, n=8 if st else 128,
            iterations=it or (10 if st else 300),
            num_train=16 if st else 128, num_val=8 if st else 16,
            batch_size=4 if st else 8, mesh=mesh)

    print(json.dumps(result, indent=2, default=float))


if __name__ == "__main__":
    main()

"""Command-line entry point.

The reference's main() is empty (main.cpp:32-36); this is the CLI it never
had:

    python -m gnn_tpu.train.cli --dataset sbm --model.name gcn \
        --train.epochs 100 --optim.lr 0.01

Any Config field is overridable with a dotted flag. --config loads a JSON
config file first; dotted flags override it.
"""

from __future__ import annotations

import argparse
import sys

from gnn_tpu.graphs.datasets import load_dataset
from gnn_tpu.train.config import Config
from gnn_tpu.train.loop import fit


def parse_args(argv=None) -> Config:
    parser = argparse.ArgumentParser(
        prog="gnn_tpu.train", description="Train a GNN on TPU"
    )
    parser.add_argument("--config", type=str, default="", help="JSON config path")
    parser.add_argument("--dataset", type=str, default=None)
    parser.add_argument("--data-root", type=str, default=None)
    args, unknown = parser.parse_known_args(argv)

    if args.config:
        with open(args.config) as f:
            cfg = Config.from_json(f.read())
    else:
        cfg = Config()
    if args.dataset:
        cfg.dataset = args.dataset
    if args.data_root:
        cfg.data_root = args.data_root

    # dotted overrides: --model.name gat --optim.lr 0.005
    overrides = []
    i = 0
    while i < len(unknown):
        tok = unknown[i]
        if not tok.startswith("--"):
            raise SystemExit(f"unexpected argument: {tok}")
        key = tok[2:]
        if "=" in key:
            overrides.append(key)
            i += 1
        else:
            if i + 1 >= len(unknown):
                raise SystemExit(f"flag --{key} needs a value")
            overrides.append(f"{key}={unknown[i + 1]}")
            i += 2
    return cfg.apply_overrides(overrides)


def main(argv=None) -> int:
    cfg = parse_args(argv)
    print(f"config:\n{cfg.to_json()}", file=sys.stderr)
    data = load_dataset(cfg.dataset, cfg.data_root)
    print(
        f"dataset: {cfg.dataset}: {data.num_nodes} nodes, "
        f"{data.num_edges} edges, {data.num_features} features",
        file=sys.stderr,
    )
    model, state, history = fit(cfg, data)
    if history:
        final = history[-1]
        print(
            "final: "
            + "  ".join(f"{k}={v:.4f}" for k, v in final.items() if isinstance(v, float))
        )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

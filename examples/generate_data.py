#!/usr/bin/env python3
"""Generate a simulated single-cell mutation dataset in the reference's
simulation-folder convention (SURVEY.md C13; libs/dpmmIO.py:119-154):

    <out>/data.csv          noisy mutations x cells matrix (3 = missing)
    <out>/data_raw.csv      true genotypes, mutations x cells
    <out>/attachments.txt   true cluster per cell (space-separated)
    <out>/tree.gv           clone tree with cell attachments

so `python run_bnpc_tpu.py <out>/ ...` auto-wires truth for ARI/V-measure/
Hamming scoring and tree coloring.

Usage:
    python examples/generate_data.py out_dir [--cells 100] [--muts 100]
        [--clones 5] [--fn 0.1] [--fp 0.001] [--missing 0.1] [--seed 0]
"""

import argparse
import os

import numpy as np
import pandas as pd


def simulate(n_cells, n_muts, n_clones, fn, fp, missing, seed):
    rng = np.random.default_rng(seed)

    # Clone tree: random parent among earlier clones; mutations partitioned
    # over tree edges so genotypes nest along lineages.
    parents = [-1] + [int(rng.integers(0, i)) for i in range(1, n_clones)]
    edge_muts = np.array_split(rng.permutation(n_muts), n_clones)
    genotypes = np.zeros((n_clones, n_muts), dtype=int)
    for c in range(n_clones):
        if parents[c] >= 0:
            genotypes[c] = genotypes[parents[c]]
        genotypes[c, edge_muts[c]] = 1

    assignment = rng.integers(0, n_clones, size=n_cells)
    clean = genotypes[assignment]

    noisy = clean.astype(float).copy()
    noisy[(clean == 1) & (rng.random(noisy.shape) < fn)] = 0
    noisy[(clean == 0) & (rng.random(noisy.shape) < fp)] = 1
    noisy[rng.random(noisy.shape) < missing] = 3
    return genotypes, parents, assignment, clean, noisy.astype(int)


def write_tree_gv(path, parents, assignment):
    lines = [
        "digraph G {",
        "node [width=0.75, style=filled, shape=circle];",
    ]
    for c, p in enumerate(parents):
        if p >= 0:
            lines.append(f"{p + 1} -> {c + 1};")
    for cell, clone in enumerate(assignment):
        lines.append(f"{clone + 1} -> s{cell:02d};")
    lines.append("}")
    with open(path, "w") as fh:
        fh.write(";\n".join(lines[:2]) + ";\n"
                 + ";\n".join(lines[2:-1]) + ";\n" + lines[-1])


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("out_dir")
    ap.add_argument("--cells", type=int, default=100)
    ap.add_argument("--muts", type=int, default=100)
    ap.add_argument("--clones", type=int, default=5)
    ap.add_argument("--fn", type=float, default=0.1)
    ap.add_argument("--fp", type=float, default=0.001)
    ap.add_argument("--missing", type=float, default=0.1)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()

    os.makedirs(args.out_dir, exist_ok=True)
    genotypes, parents, assignment, clean, noisy = simulate(
        args.cells, args.muts, args.clones, args.fn, args.fp,
        args.missing, args.seed,
    )

    # Files are mutations x cells (the CLI transposes by default).
    pd.DataFrame(noisy.T).to_csv(
        os.path.join(args.out_dir, "data.csv"),
        sep=" ", header=False, index=False,
    )
    pd.DataFrame(clean.T).to_csv(
        os.path.join(args.out_dir, "data_raw.csv"),
        sep=" ", header=False, index=False,
    )
    with open(os.path.join(args.out_dir, "attachments.txt"), "w") as fh:
        fh.write(" ".join(str(int(a)) for a in assignment))
    write_tree_gv(os.path.join(args.out_dir, "tree.gv"), parents, assignment)

    with open(os.path.join(args.out_dir, "data_params.txt"), "w") as fh:
        fh.write(
            "Parameters employed to generate the data file (data.csv):\n\n"
            f"Cells: {args.cells}\nMutations: {args.muts}\n"
            f"Clusters: {args.clones}\n\n"
            f"False Positives: {args.fp * 100} %\n"
            f"False Negatives: {args.fn * 100} %\n"
            f"Missing Values: {args.missing * 100} %\n"
            f"Seed: {args.seed}\n"
        )
    print(f"wrote simulation folder: {args.out_dir}")


if __name__ == "__main__":
    main()

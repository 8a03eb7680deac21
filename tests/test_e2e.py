"""End-to-end CLI runs on a simulated dataset (SURVEY.md section 4, item 3-4):
recovers known clusters and writes the reference's output-file contract."""

import os

import numpy as np
import pandas as pd
import pytest

from bnpc_tpu import cli


def write_sim_folder(tmp_path, n=40, m=30, k_clones=3, seed=11,
                     fn_rate=0.1, fp_rate=0.01, missing=0.1):
    rng = np.random.default_rng(seed)
    while True:
        genotypes = rng.integers(0, 2, size=(k_clones, m))
        true_assign = rng.integers(0, k_clones, size=n)
        if np.unique(true_assign).size == k_clones:
            break
    clean = genotypes[true_assign].astype(float)
    noisy = clean.copy()
    noisy[(clean == 1) & (rng.random((n, m)) < fn_rate)] = 0
    noisy[(clean == 0) & (rng.random((n, m)) < fp_rate)] = 1
    noisy[rng.random((n, m)) < missing] = 3  # missing marker

    # Files are mutations x cells (the CLI transposes by default).
    pd.DataFrame(noisy.T.astype(int)).to_csv(
        tmp_path / "data.csv", sep=" ", header=False, index=False
    )
    pd.DataFrame(clean.T.astype(int)).to_csv(
        tmp_path / "data_raw.csv", sep=" ", header=False, index=False
    )
    (tmp_path / "attachments.txt").write_text(
        " ".join(str(c) for c in true_assign)
    )
    return true_assign


@pytest.mark.slow
def test_cli_end_to_end(tmp_path):
    true_assign = write_sim_folder(tmp_path)
    out_dir = tmp_path / "out"

    args = cli.parse_args([
        str(tmp_path), "-FP", "0.01", "-FN", "0.1",
        "-s", "250", "-b", "0.4", "--seed", "42",
        "-e", "posterior", "ML", "MAP",
        "-o", str(out_dir), "-v", "0", "-np",
        "--block_size", "64",
    ])
    cli.main(args)

    for fname in ["args.txt", "errors.txt", "assignment.txt",
                  "ARI.txt", "V_measure.txt", "hammingDist.txt"]:
        assert (out_dir / fname).exists(), fname
    # One genotype file per estimator.
    for est in ["posterior", "ML", "MAP"]:
        assert (out_dir / f"genotypes_{est}_mean.tsv").exists() or any(
            f.startswith(f"genotypes_{est}") for f in os.listdir(out_dir)
        )

    ari_df = pd.read_csv(out_dir / "ARI.txt", sep="\t")
    assert set(ari_df.columns) == {"chain", "estimator", "ARI"}
    best_ari = ari_df["ARI"].max()
    assert best_ari > 0.9, f"ARI {best_ari}\n{ari_df}"

    ham = pd.read_csv(out_dir / "hammingDist.txt", sep="\t")
    assert ham["1 - norm Hamming distance"].max() > 0.9

    assign_df = pd.read_csv(out_dir / "assignment.txt", sep="\t")
    assert list(assign_df.columns) == ["chain", "estimator", "Assignment"]
    first = [int(x) for x in assign_df["Assignment"][0].split(" ")]
    assert len(first) == len(true_assign)

    # args.txt carries the run config incl. seeds and PSRF.
    args_txt = (out_dir / "args.txt").read_text()
    assert "chain_seeds" in args_txt and "PSRF" in args_txt
    # Fixed-error run: prior-mean fields pruned (libs/dpmmIO.py:437-447).
    assert "falseNegative_mean" not in args_txt


@pytest.mark.slow
def test_cli_learned_errors_and_plots(tmp_path):
    write_sim_folder(tmp_path, n=20, m=16, k_clones=2, seed=5)
    out_dir = tmp_path / "out"
    args = cli.parse_args([
        str(tmp_path / "data.csv"),
        "-s", "80", "-b", "0.5", "--seed", "7",
        "-e", "ML", "-o", str(out_dir), "-v", "2",
        "--block_size", "40",
    ])
    cli.main(args)
    assert (out_dir / "Traces.pdf").exists()
    assert any(
        f.startswith("genoCluster_ML") for f in os.listdir(out_dir)
    )
    assert (out_dir / "Posterior_similarity_mean.pdf").exists()
    # Learned-error run: fixed-value fields pruned.
    args_txt = (out_dir / "args.txt").read_text()
    assert "falseNegative_mean" in args_txt


@pytest.mark.slow
def test_cli_single_chains_posterior(tmp_path):
    """-sc + posterior: the reference's double burn-in slicing IndexErrors
    here (libs/utils.py:228-230); ours aligns the parameter trace."""
    write_sim_folder(tmp_path, n=24, m=20, k_clones=2, seed=13)
    out_dir = tmp_path / "out"
    args = cli.parse_args([
        str(tmp_path), "-FP", "0.01", "-FN", "0.1",
        "-s", "60", "-b", "0.4", "--seed", "3", "-n", "2", "-sc",
        "-e", "posterior", "-o", str(out_dir), "-v", "0", "-np",
        "--block_size", "32",
    ])
    cli.main(args)
    ari_df = pd.read_csv(out_dir / "ARI.txt", sep="\t")
    assert len(ari_df) == 2  # one row per chain
    assert ari_df["ARI"].max() > 0.8
    assert (out_dir / "genotypes_posterior_00.tsv").exists()
    assert (out_dir / "genotypes_posterior_01.tsv").exists()


@pytest.mark.slow
def test_cli_mesh_lugsail(tmp_path):
    """A multi-block lugsail CLI run on a 2x4 chains-x-muts mesh (8 virtual
    CPU devices) produces the same output-file contract (VERDICT round 1,
    item 4: the flagship parallelism must be reachable from the CLI)."""
    true_assign = write_sim_folder(tmp_path, n=24, m=18, k_clones=2, seed=21)
    out_dir = tmp_path / "out"
    args = cli.parse_args([
        str(tmp_path), "-FP", "0.01", "-FN", "0.1",
        "-ls", "1.3", "--seed", "11", "-n", "4",
        "-e", "posterior", "ML", "-o", str(out_dir), "-v", "0", "-np",
        "--mesh", "2,4",
    ])
    cli.main(args)
    for fname in ["args.txt", "errors.txt", "assignment.txt", "ARI.txt"]:
        assert (out_dir / fname).exists(), fname
    ari_df = pd.read_csv(out_dir / "ARI.txt", sep="\t")
    assert ari_df["ARI"].max() > 0.8
    assign_df = pd.read_csv(out_dir / "assignment.txt", sep="\t")
    first = [int(x) for x in assign_df["Assignment"][0].split(" ")]
    assert len(first) == len(true_assign)


def test_cli_mesh_validation(tmp_path):
    write_sim_folder(tmp_path, n=10, m=8, k_clones=2, seed=2)
    with pytest.raises(SystemExit, match="must divide"):
        cli.main(cli.parse_args([
            str(tmp_path / "data.csv"), "-FP", "0.01", "-FN", "0.1",
            "-s", "4", "-n", "3", "--mesh", "2,4", "-v", "0", "-np",
            "-o", str(tmp_path / "o"),
        ]))
    with pytest.raises(SystemExit, match="CHAINS,MUTS"):
        cli.main(cli.parse_args([
            str(tmp_path / "data.csv"), "-FP", "0.01", "-FN", "0.1",
            "-s", "4", "--mesh", "bogus", "-v", "0", "-np",
            "-o", str(tmp_path / "o2"),
        ]))


def test_cli_debug_is_eager(tmp_path, monkeypatch):
    """--debug disables jit for the whole run: a planted exception in a
    kernel propagates with the real Python frame (pdb-able), which is
    impossible under jit tracing (reference: run_BnpC.py:53-56)."""
    write_sim_folder(tmp_path, n=8, m=6, k_clones=2, seed=4)

    from bnpc_tpu.models import updates

    calls = {"n": 0}
    real = updates.update_parameters

    def boom(*a, **k):
        calls["n"] += 1
        import jax

        # Under jit this would be a tracer; eagerly it is concrete data.
        assert not isinstance(a[1].params, jax.core.Tracer)
        raise RuntimeError("planted-in-update-parameters")

    monkeypatch.setattr("bnpc_tpu.mcmc.update_parameters", boom)
    args = cli.parse_args([
        str(tmp_path / "data.csv"), "-FP", "0.01", "-FN", "0.1",
        "-s", "3", "--debug", "--seed", "1", "-v", "0", "-np",
        "-o", str(tmp_path / "o"),
    ])
    with pytest.raises(RuntimeError, match="planted-in-update-parameters"):
        cli.main(args)
    assert calls["n"] == 1
    del real

"""I/O contracts: loader sniffing rules, termination config, writers."""

import os
from datetime import datetime
from types import SimpleNamespace

import numpy as np
import pandas as pd
import pytest

from bnpc_tpu import io


def test_load_data_plain_space(tmp_path):
    f = tmp_path / "d.csv"
    f.write_text("1 0 3\n0 1 1\n1 1 0\n0 3 1\n")
    # File is muts x cells; default transpose -> cells x muts.
    data = io.load_data(f)
    assert data.shape == (3, 4)
    assert np.isnan(data[2, 0]) and np.isnan(data[1, 3])
    assert data[0, 0] == 1 and data[1, 0] == 0


def test_load_data_transpose_off(tmp_path):
    f = tmp_path / "d.csv"
    f.write_text("1 0\n0 1\n1 1\n")
    data = io.load_data(f, transpose=False)
    assert data.shape == (3, 2)


def test_load_data_tab_with_header_and_index(tmp_path):
    f = tmp_path / "d.tsv"
    f.write_text(
        "idx\tcellA\tcellB\nmut1\t1\t0\nmut2\t2\t3\nmut3\t0\t1\n"
    )
    data, (names_r, names_c) = io.load_data(f, get_names=True)
    assert data.shape == (2, 3)  # transposed: cells x muts
    assert list(names_r) == ["cellA", "cellB"]
    # 2 -> 1 (hom -> het), 3 -> NaN
    assert data[0, 1] == 1.0
    assert np.isnan(data[1, 1])


def test_load_data_comma(tmp_path):
    f = tmp_path / "d.csv"
    f.write_text("1,0,1\n0,1,3\n")
    data = io.load_data(f, transpose=False)
    assert data.shape == (2, 3)
    assert np.isnan(data[1, 2])


def test_load_assignment_txt_variants(tmp_path):
    plain = tmp_path / "a.txt"
    plain.write_text("0 1 1 2 0")
    assert io.load_assignment_txt(plain) == [0, 1, 1, 2, 0]

    tsv = tmp_path / "assignment.txt"
    pd.DataFrame(
        [["mean", "posterior", "0 0 1 2"]],
        columns=["chain", "estimator", "Assignment"],
    ).to_csv(tsv, sep="\t", index=False)
    assert io.load_assignment_txt(tsv) == [0, 0, 1, 2]


def test_process_sim_folder(tmp_path):
    (tmp_path / "data.csv").write_text("1 0\n0 1\n")
    (tmp_path / "attachments.txt").write_text("0 1")
    (tmp_path / "data_raw.csv").write_text("1 0\n0 1\n")
    (tmp_path / "tree.gv").write_text("digraph G {\n1 -> 2;\n}")
    args = SimpleNamespace(
        input=str(tmp_path), transpose=True, true_clusters="",
        true_data="", tree="",
    )
    io.process_sim_folder(args)
    assert args.input.endswith("data.csv")
    assert args.true_clusters.endswith("attachments.txt")
    assert args.true_data.endswith("data_raw.csv")
    assert args.tree.endswith("tree.gv")


def test_get_mcmc_termination_modes():
    now = datetime.now()
    args = SimpleNamespace(runtime=-1, lugsail=-1, steps=100, burn_in=0.25,
                           time=[now])
    (steps, bi), s = io.get_mcmc_termination(args)
    assert steps == 100 and bi == 25 and "100 steps" in s

    args.lugsail = 1.05
    (cutoff, z), s = io.get_mcmc_termination(args)
    assert cutoff == 1.05 and z == 0 and "PSRF" in s

    args.runtime = 2
    (end, bi_t), s = io.get_mcmc_termination(args)
    assert (end - now).total_seconds() == pytest.approx(120)
    assert (bi_t - now).total_seconds() == pytest.approx(30)


def test_save_config_prunes_error_fields(tmp_path):
    args = SimpleNamespace(
        time=[datetime.now(), datetime.now()],
        falseNegative=0.2, falsePositive=0.001,
        falseNegative_mean=0.25, falseNegative_std=0.1,
        falsePositive_mean=0.01, falsePositive_std=0.01,
        steps=10,
    )
    io.save_config(vars(args), str(tmp_path))
    txt = (tmp_path / "args.txt").read_text()
    assert "falseNegative: 0.2" in txt
    assert "falseNegative_mean" not in txt
    assert "falsePositive_mean" not in txt

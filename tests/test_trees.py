"""Tree-format utilities (reference: libs/utils.py:295-424)."""

import numpy as np

from bnpc_tpu.utils import trees
from bnpc_tpu import plotting


def test_newick_to_gv(tmp_path):
    nwk = tmp_path / "t.newick"
    nwk.write_text("((Acell1:0.1,Acell2:0.2):0.3,Acell3:0.4);")
    gv = trees.newick_to_gv(nwk)
    assert gv.startswith("digraph G {")
    assert gv.rstrip().endswith("}")
    # Three leaf cells plus internal nodes; edges carry scaled labels.
    assert gv.count("->") >= 4


def test_edges_from_newick():
    edges, cells = trees.edges_from_newick(
        "((Acell1:0.1,Acell2:0.2):0.3,Acell3:0.4)"
    )
    assert cells == ["Acell1", "Acell2", "Acell3"]
    assert (3, 0, 0.1) in edges and (3, 1, 0.2) in edges


def test_edges_from_gv_and_collapse(tmp_path):
    # Real .gv files start with a node-style statement; the parser discards
    # the first ';'-segment (header) and the last ('}').
    gv = (
        "digraph G {\n"
        "node [shape=circle];\n"
        "1 -> 2;\n"
        "2 -> 3;\n"
        "2 -> s0;\n"
        "3 -> s1;\n"
        "3 -> s2;\n"
        "}"
    )
    (tmp_path / "tree.gv").write_text(gv)
    mut_edges, muts, cell_edges, cells = trees.edges_from_gv(gv)
    assert (0, 1) in mut_edges and (1, 2) in mut_edges
    assert (1, "s0") in cell_edges and (2, "s1") in cell_edges
    out = trees.collapse_cells_on_tree(str(tmp_path))
    content = open(out).read()
    assert "digraph G" in content and "-> s" in content


def test_color_tree_nodes(tmp_path):
    gv = "digraph G {\n1 -> 2;\n2 -> s00;\n2 -> s01;\n}"
    tree_file = tmp_path / "tree.gv"
    tree_file.write_text(gv)
    out = plotting.color_tree_nodes(
        str(tree_file), [0, 1], str(tmp_path), transpose=True
    )
    content = open(out).read()
    assert 's00 [fillcolor="#' in content
    assert 's01 [fillcolor="#' in content
    assert content.rstrip().endswith("}")


def test_newick_parity_with_reference():
    """The recursive-descent parser reproduces the reference's edge list
    (incl. internal-node numbering) on nested binary trees."""
    import sys

    sys.path.insert(0, "/root/repo/benchmarks/bn_shim")
    sys.path.insert(0, "/root/reference")
    try:
        from libs import utils as ref
    except Exception:
        import pytest

        pytest.skip("reference not importable")
    cases = [
        "((Acell1:0.1,Acell2:0.2):0.3,Acell3:0.4)",
        "(((Xcell1:0.11,Xcell2:0.22):0.5,(Xcell3:0.1,Xcell4:0.3):0.7):0.2,"
        "(Xcell5:0.9,Xcell6:0.01):0.6)",
        "(Bcell2:0.5,(Bcell1:0.25,Bcell3:0.75):0.125)",
    ]
    for case in cases:
        e_ref, c_ref = ref.get_edges_from_newick(case)
        e_new, c_new = trees.edges_from_newick(case)
        assert c_ref == c_new
        assert e_ref == e_new
